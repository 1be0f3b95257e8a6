"""spark-submit entry point: maintain a content-digest membership index
off a CDC base table (digestindex.py's deployment shape)::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_digestindex.py <base_table_dir> <index_root> \
        [text_col] [n_cells]

First run bootstraps (hash-bucketed digest layout + forward map); every
later run refreshes from the base changelog at O(|changes|) and folds
any bucket whose delta count exceeds the depth trigger.  Idempotent per
base version.  Prints one JSON summary line.
"""

from __future__ import annotations

import glob
import json
import os
import sys

from pyspark.sql import SparkSession

from tap_postgres_spark.digestindex import (
    bootstrap_digest_index,
    compact_digest_index,
    refresh_digest_index,
)
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.inverted import read_inverted_meta

CELL_COMPACT_DEPTH = 8


def main() -> None:
    base_dir, root = sys.argv[1:3]
    text_col = sys.argv[3] if len(sys.argv) > 3 else "content"
    n_cells = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    spark = SparkSession.builder.getOrCreate()
    base = LakeTable(spark, base_dir)
    if not os.path.exists(os.path.join(root, "index.json")):
        res = bootstrap_digest_index(
            spark, base, root, text_col=text_col, n_cells=n_cells
        )
        mode = "bootstrap"
    else:
        res = refresh_digest_index(base, root)
        mode = "refresh"
        compacted = []
        if not res.get("skipped"):
            for d in glob.glob(os.path.join(root, "cells", "bucket=*")):
                if len(glob.glob(os.path.join(d, "*.parquet"))) > CELL_COMPACT_DEPTH:
                    compacted.append(int(d.rsplit("=", 1)[1]))
            if compacted:
                compact_digest_index(spark, root, cells=compacted)
        res["cells_compacted"] = compacted
    meta = read_inverted_meta(root)
    print(
        json.dumps(
            {
                "mode": mode,
                "base_version": base.current_version(),
                "cells": int(meta["n_cells"]),
                "skipped": bool(res.get("skipped")),
                **{
                    k: v
                    for k, v in res.items()
                    if k in ("from", "to", "cells_compacted")
                },
            }
        )
    )


if __name__ == "__main__":
    main()
