"""spark-submit entry point: maintain an incremental aggregate view off
a CDC base table.

The deployment shape for lake/aggview.py — run after (or on a schedule
beside) the replay job::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_aggview.py <base_table_dir> <view_dir> \
        <group_col[,group_col...]> [agg_spec[,agg_spec...]]

``agg_spec`` is ``kind:col:name`` (``count::n`` takes no input column;
kinds: count / count_col / sum / avg / min / max — extrema delta-maintain on
insert-only ranges and recompute only the churned groups otherwise).  Default:
``count::n_rows,sum:size_bytes:sum_size`` falls back to plain
``count::n_rows`` when the base has no ``size_bytes`` column.

First run bootstraps (one full GROUP BY pass); every later run
delta-applies only the base changelog since the view's recorded base
version — O(changes + touched groups).  Idempotent per base version
(epoch guard).  Prints one JSON summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.aggview import (
    Agg,
    bootstrap_aggregate_view,
    refresh_aggregate_view,
)
from tap_postgres_spark.lake.derived import refreshed_base_version


def _parse_aggs(spec: str) -> list[Agg]:
    out = []
    for part in spec.split(","):
        kind, col, name = part.split(":")
        out.append(Agg(kind, col or None, name))
    return out


def main() -> None:
    base_dir, view_dir, groups_arg = sys.argv[1:4]
    group_cols = groups_arg.split(",")
    spark = SparkSession.builder.getOrCreate()
    base = LakeTable(spark, base_dir)
    if len(sys.argv) > 4:
        aggs = _parse_aggs(sys.argv[4])
    elif "size_bytes" in base.schema.fieldNames():
        aggs = [Agg("count", None, "n_rows"), Agg("sum", "size_bytes", "sum_size")]
    else:
        aggs = [Agg("count", None, "n_rows")]
    compacted = False
    if LakeTable.exists(view_dir):
        view = LakeTable(spark, view_dir)
        res = refresh_aggregate_view(base, view, aggs)
        mode = "refresh"
        # each refresh appends one delta dir per touched bucket; tiered
        # compaction on a depth trigger keeps the view's merge-on-read
        # amplification bounded, same policy as the ingest pipeline
        if view.delta_depth() > 12:
            compacted = not view.compact(include_base=False).get("skipped")
    else:
        view = bootstrap_aggregate_view(spark, base, view_dir, group_cols, aggs)
        res = {"skipped": False}
        mode = "bootstrap"
    print(
        json.dumps(
            {
                "mode": mode,
                "groups": group_cols,
                "aggs": [f"{a.kind}:{a.col or ''}:{a.name}" for a in aggs],
                "base_version": base.current_version(),
                "view_at_base_version": refreshed_base_version(
                    view, "aggview-from-base-v"
                ),
                "view_version": view.current_version(),
                "skipped": bool(res.get("skipped")),
                "compacted": compacted,
                "view_groups": view.read().count(),
            }
        )
    )


if __name__ == "__main__":
    main()
