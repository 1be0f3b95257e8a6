"""FULL_TABLE / INCREMENTAL mode tests.

Ports the reference's pinned semantics:
- tests/test_replication_key.py:49-99 — with start_date only rows past it
  sync and NULL-keyed rows are excluded
- tests/test_replication_key.py:102-155 — without start_date ALL rows
  sync including NULL replication keys
- tests/test_stream_class.py:29-76 — custom WHERE clauses AND-combined
  with LIMIT (golden compiled query)
- tests/test_selected_columns_only.py:15-35 — deselected columns absent
- client.py:287-315 — forward-only bookmark advance
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from tap_postgres_spark.modes import full_table_scan, incremental_scan
from tap_postgres_spark.modes.incremental import commit_bookmark
from tap_postgres_spark.schema import StreamDef
from tap_postgres_spark.state import StateStore

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)


@pytest.fixture()
def source(spark):
    # the reference's three-row table: Alpha (old), Bravo (new), NULL-key
    rows = [
        (1, datetime(2022, 1, 1, 0, 0, 0), "Alpha"),
        (2, datetime(2023, 6, 1, 0, 0, 0), "Bravo"),
        (3, None, "NullKey"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _stream(**kw):
    defaults = dict(
        schema_name="public",
        table_name="test_replication_key",
        spark_schema=SCHEMA,
        key_properties=("id",),
        replication_method="INCREMENTAL",
        replication_key="updated_at",
    )
    defaults.update(kw)
    return StreamDef(**defaults)


def test_start_date_excludes_old_and_null(source, tmp_path):
    # test_replication_key.py:49-99: start_date ⇒ only "Bravo"
    state = StateStore(str(tmp_path / "s.json"))
    got = incremental_scan(
        source, _stream(), state, start_value=datetime(2023, 1, 1)
    ).collect()
    assert [r["name"] for r in got] == ["Bravo"]


def test_no_start_date_includes_all_and_null(source, tmp_path):
    # test_replication_key.py:102-155: no bookmark ⇒ all rows incl. NULL key
    state = StateStore(str(tmp_path / "s.json"))
    got = incremental_scan(source, _stream(), state).collect()
    assert sorted(r["name"] for r in got) == ["Alpha", "Bravo", "NullKey"]


def test_bookmark_resume_and_forward_only(source, tmp_path):
    state = StateStore(str(tmp_path / "s.json"))
    stream = _stream()
    synced = incremental_scan(source, stream, state)
    commit_bookmark(synced, stream, state)
    assert state.bookmark(stream.fqn) == "2023-06-01T00:00:00"
    # second run: only rows >= bookmark (the bookmark row itself replays —
    # at-least-once, idempotent upsert downstream)
    again = incremental_scan(source, stream, state).collect()
    assert [r["name"] for r in again] == ["Bravo"]
    # forward-only: a stale smaller value must not regress (client.py:287-315)
    assert not state.advance(stream.fqn, "updated_at", "2020-01-01T00:00:00")
    assert state.bookmark(stream.fqn) == "2023-06-01T00:00:00"


def test_incremental_merge_into_lake(spark, tmp_path):
    """INCREMENTAL → lake upsert: second sync sees only new rows, upserts
    by key, advances the bookmark; re-running is idempotent."""
    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.modes.incremental import incremental_merge
    from tap_postgres_spark.schema import widen_for_cdc

    stream = _stream()
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), widen_for_cdc(SCHEMA), ["id"], num_buckets=2
    )
    state = StateStore(str(tmp_path / "s.json"))

    v1 = spark.createDataFrame(
        [(1, datetime(2022, 1, 1), "Alpha"), (2, datetime(2023, 6, 1), "Bravo"),
         (3, None, "NullKey")],
        SCHEMA,
    )
    incremental_merge(v1, stream, table, state, epoch_id="sync-1")
    assert {r["name"] for r in table.read().collect()} == {"Alpha", "Bravo", "NullKey"}
    assert state.bookmark(stream.fqn) == "2023-06-01T00:00:00"

    # source evolves: row 2 updated later, row 4 inserted, row 1 untouched
    v2 = spark.createDataFrame(
        [(1, datetime(2022, 1, 1), "Alpha"), (2, datetime(2024, 1, 1), "Bravo2"),
         (3, None, "NullKey"), (4, datetime(2024, 2, 1), "Delta")],
        SCHEMA,
    )
    incremental_merge(v2, stream, table, state, epoch_id="sync-2")
    got = {r["id"]: r["name"] for r in table.read().collect()}
    assert got == {1: "Alpha", 2: "Bravo2", 3: "NullKey", 4: "Delta"}
    # replay of a committed sync is a no-op
    res = incremental_merge(v2, stream, table, state, epoch_id="sync-2")
    assert res["skipped"]


def test_full_table_custom_where_and_limit(spark):
    # golden query semantics (test_stream_class.py:29-76):
    # WHERE id % 2 = 0 AND id % 3 = 0 LIMIT 1
    df = spark.range(1, 100).withColumnRenamed("id", "id")
    stream = StreamDef(
        schema_name="public",
        table_name="test_table",
        spark_schema=T.StructType([T.StructField("id", T.LongType())]),
        key_properties=("id",),
        replication_method="FULL_TABLE",
        custom_where_clauses=("id % 2 = 0", "id % 3 = 0"),
        max_record_count=1,
    )
    got = full_table_scan(df, stream).collect()
    assert len(got) == 1 and got[0]["id"] % 6 == 0


def test_selected_columns_only(spark):
    # test_selected_columns_only.py:15-35: deselected column absent
    df = spark.createDataFrame([(1, "x", "secret")], ["id", "name", "hidden"])
    stream = StreamDef(
        schema_name="public",
        table_name="t",
        spark_schema=T.StructType([]),
        key_properties=("id",),
        replication_method="FULL_TABLE",
        selected_columns=("id", "name"),
    )
    out = full_table_scan(df, stream)
    assert out.columns == ["id", "name"]


def test_projection_pushdown_reaches_scan(spark, tmp_path):
    # the Spark analog of "only selected columns in the SELECT list":
    # ReadSchema of the parquet scan must contain only the projected cols
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "x", "y")], ["a", "b", "c"]).write.parquet(p)
    df = spark.read.parquet(p).select("a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<a:" in plan


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "t2.parquet")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("id") > 50)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,50)]" in plan
