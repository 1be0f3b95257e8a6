"""spark-submit entry point: streaming point-in-time enrichment of a
fact feed against a CDC dimension table's version history.

The deployment shape for streaming/enrich.py — run beside the replay
job that maintains the dimension table::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_enrich.py <fact_feed_dir> <dim_table_dir> \
        <out_dir> <checkpoint_dir> <fact_lsn_col> <value_col:out_name>...

Join keys are the dimension table's key columns (they must be present
on the fact rows under the same names).  Each invocation drains the
feed (``availableNow``) and exits — idempotent per feed state: a rerun
with the same checkpoint processes only files added since, and a
replayed crash rewrites identical batch dirs.  Dimension commits that
land between invocations (or between micro-batches) are picked up
because the history relation is re-read per batch.  Prints one JSON
summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.streaming.enrich import StreamingPointInTimeEnricher


def main() -> None:
    feed_dir, dim_dir, out_dir, ckpt_dir, fact_lsn_col = sys.argv[1:6]
    value_cols = dict(spec.split(":", 1) for spec in sys.argv[6:])
    if not value_cols:
        raise SystemExit("need at least one value_col:out_name mapping")
    spark = SparkSession.builder.getOrCreate()
    dim = LakeTable(spark, dim_dir)
    # the file stream source needs an explicit schema: take it from the
    # feed's existing files (a batch read infers it once, driver-side)
    schema = spark.read.parquet(feed_dir).schema
    enricher = StreamingPointInTimeEnricher(
        spark, feed_dir, out_dir, ckpt_dir,
        schema=schema,
        history_loader=lambda: dim.read_changes(0, fold=False),
        on=dim.key_columns,
        fact_lsn_col=fact_lsn_col,
        value_cols=value_cols,
    )
    batches = enricher.run_available_now()
    try:
        total = enricher.enriched().count()
    except Exception:  # no batch has ever landed (empty feed)
        total = 0
    print(
        json.dumps(
            {
                "batches": len(batches),
                "dim_version": dim.current_version(),
                "enriched_rows_total": total,
                "keys": dim.key_columns,
                "values": value_cols,
            }
        )
    )


if __name__ == "__main__":
    main()
