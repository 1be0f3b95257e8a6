"""spark-submit entry point: export a lake table's changelog as a WAL
feed for downstream pipelines (lake/changefeed.py).

Run after (or on a schedule beside) the replay job::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_changefeed.py <table_dir> <feed_dir> <schema.table>

Each run exports only the changelog since the last export (pointer in
``<feed_dir>/_CHANGEFEED.json``); a run with nothing new prints
``"skipped": true``.  The emitted files are a valid input feed for
``tools/submit_replay.py`` — replication chains compose.  Prints one
JSON summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.changefeed import export_changefeed


def main() -> None:
    table_dir, feed_dir, fqn = sys.argv[1:4]
    schema_name, table_name = fqn.split(".", 1)
    spark = SparkSession.builder.getOrCreate()
    base = LakeTable(spark, table_dir)
    res = export_changefeed(base, feed_dir, schema_name, table_name)
    print(json.dumps({"table": fqn, **res}))


if __name__ == "__main__":
    main()
