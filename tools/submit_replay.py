"""spark-submit entry point: WAL-feed replay into a lake table.

The north-rule deployment shape — run via::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_replay.py <feed_dir> <table_dir> <checkpoint_dir> <state_path>

On a real cluster only ``--master``/executor flags change; the job code
is identical (the engine holds no local-mode assumptions beyond conf
defaults).  Prints one JSON summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore
from tap_postgres_spark.streaming import StreamingCdcRunner

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
FQN = "public.source_code_repos"


def main() -> None:
    feed_dir, table_dir, checkpoint_dir, state_path = sys.argv[1:5]
    spark = SparkSession.builder.appName("tps-replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if LakeTable.exists(table_dir):
        table = LakeTable(spark, table_dir)
    else:
        table = LakeTable.create(
            spark, table_dir, widen_for_cdc(SCHEMA), ["repo", "path"], num_buckets=64
        )
    stream = StreamDef("public", "source_code_repos", SCHEMA, ("repo", "path"))
    import os

    pipeline = CdcPipeline(
        spark,
        [stream],
        {FQN: {f.name: "text" for f in SCHEMA.fields}},
        {FQN: table},
        StateStore(state_path),
        metrics_dir=f"{table_dir}/_metrics",
        # wal2json realities, opt-in per deployment (decode.py docs):
        # unchanged-TOAST column omission and key-changing UPDATEs
        partial_updates=os.environ.get("SPARK_GRAFT_PARTIAL_UPDATES") == "1",
        key_updates=os.environ.get("SPARK_GRAFT_KEY_UPDATES") == "1",
    )
    runner = StreamingCdcRunner(
        pipeline, feed_dir, checkpoint_dir, max_files_per_trigger=32
    )
    results = runner.run_available_now()
    total_ok = sum(
        m["n"] for r in results for m in r["metrics"] if m["_status"] == "ok"
    )
    print(
        json.dumps(
            {
                "batches": len(results),
                "events_applied": total_ok,
                "table_version": table.current_version(),
                "final_rows": table.read().count(),
            }
        )
    )


if __name__ == "__main__":
    main()
