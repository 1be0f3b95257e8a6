"""spark-submit entry point: maintain an IVF vector index off a CDC base
table (vectorindex.py's deployment shape — run beside submit_replay /
submit_derived on the maintenance schedule)::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_vectorindex.py <base_table_dir> <index_root> \
        [vec_col] [n_cells]

First run bootstraps: trains ``n_cells`` centroids on the base head
(deterministic Lloyd — vectorops.train_centroids) and writes the
cell-partitioned inverted file + forward map.  Every later run refreshes
from the base changelog at O(|changes|) — new/changed vectors re-assign,
moved/dead vectors tombstone their old cell — and compacts any cell
whose delta count exceeds the depth trigger.  Idempotent per base
version (the forward map's epoch guard).  Prints one JSON summary line.
"""

from __future__ import annotations

import glob
import json
import os
import sys

from pyspark.sql import SparkSession

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.vectorindex import (
    bootstrap_ivf_index,
    compact_cells,
    read_index_meta,
    refresh_ivf_index,
)

# a cell with more delta files than this gets folded after refresh —
# the inverted file's own tiered maintenance cadence
CELL_COMPACT_DEPTH = 8


def main() -> None:
    base_dir, root = sys.argv[1:3]
    vec_col = sys.argv[3] if len(sys.argv) > 3 else "embedding"
    n_cells = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    spark = SparkSession.builder.getOrCreate()
    base = LakeTable(spark, base_dir)
    if not os.path.exists(os.path.join(root, "index.json")):
        from pyspark.sql import functions as F

        from tap_postgres_spark.vectorops import train_centroids

        # deterministic seed ids from the key columns (train_centroids
        # seeds on the k smallest ids), so a re-run of bootstrap trains
        # identical centroids
        head = (
            base.read()
            .filter(F.col(vec_col).isNotNull())
            .select(
                F.xxhash64(*base.key_columns).alias("vec_id"), vec_col
            )
        )
        centroids = train_centroids(
            head, k=n_cells, vec_col=vec_col, n_iter=2
        )
        res = bootstrap_ivf_index(
            spark, base, root, centroids, vec_col=vec_col
        )
        mode = "bootstrap"
    else:
        res = refresh_ivf_index(base, root)
        mode = "refresh"
        compacted = []
        if not res.get("skipped"):
            for d in glob.glob(os.path.join(root, "cells", "centroid_id=*")):
                if len(glob.glob(os.path.join(d, "*.parquet"))) > CELL_COMPACT_DEPTH:
                    compacted.append(int(d.rsplit("=", 1)[1]))
            if compacted:
                compact_cells(spark, root, cells=compacted)
        res["cells_compacted"] = compacted
    meta = read_index_meta(root)
    print(
        json.dumps(
            {
                "mode": mode,
                "base_version": base.current_version(),
                "cells": len(meta["centroids"]),
                "skipped": bool(res.get("skipped")),
                **{k: v for k, v in res.items() if k in ("from", "to", "cells_compacted")},
            }
        )
    )


if __name__ == "__main__":
    main()
