"""Catalog discovery (S1) + Singer message export (S6) tests."""

from __future__ import annotations

import io
import json
from datetime import date, datetime

from pyspark.sql import types as T

from tap_postgres_spark.catalog import apply_overrides, discover_parquet_dir
from tap_postgres_spark.schema import StreamDef
from tap_postgres_spark.singer import emit_stream, record_messages, schema_message
from tap_postgres_spark.state import StateStore

SF_DIR = "/root/testdata/sf0.001"


def test_discover_parquet_dir(spark):
    streams = discover_parquet_dir(
        spark, SF_DIR, key_properties={"events": ["event_id"]}
    )
    by_name = {s.table_name: s for s in streams}
    assert set(by_name) == {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    ev = by_name["events"]
    assert ev.key_properties == ("event_id",)
    assert "user_id" in [f.name for f in ev.spark_schema.fields]


def test_discover_filter_tables(spark):
    # filter_schemas analog (client.py:180-193 / tests/test_core.py:538-562)
    streams = discover_parquet_dir(spark, SF_DIR, filter_tables=["events"])
    assert [s.table_name for s in streams] == ["events"]


def test_apply_overrides(spark):
    streams = discover_parquet_dir(spark, SF_DIR, filter_tables=["events"])
    out = apply_overrides(
        streams,
        {
            "public.events": {
                "replication_method": "INCREMENTAL",
                "replication_key": "ts",
                "selected_columns": ["event_id", "ts"],
            }
        },
    )
    assert out[0].replication_method == "INCREMENTAL"
    assert out[0].effective_replication_key == "ts"
    assert out[0].selected_columns == ("event_id", "ts")


def _stream():
    return StreamDef(
        schema_name="public",
        table_name="t",
        spark_schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("d", T.DateType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("name", T.StringType()),
            ]
        ),
        key_properties=("id",),
    )


def test_schema_message_shape():
    msg = schema_message(_stream())
    assert msg["type"] == "SCHEMA"
    assert msg["key_properties"] == ["id"]
    props = msg["schema"]["properties"]
    assert props["id"]["type"] == ["integer", "null"]
    assert props["d"]["format"] == "date"
    assert props["ts"]["format"] == "date-time"


def test_record_messages_singer_formats(spark):
    # temporal string forms pinned by reference tests/test_core.py:196-206
    df = spark.createDataFrame(
        [(1, date(2022, 3, 19), datetime(1918, 2, 3, 13, 0, 1), "x")],
        _stream().spark_schema,
    )
    line = record_messages(df, _stream()).collect()[0]["message"]
    rec = json.loads(line)
    assert rec["type"] == "RECORD" and rec["stream"] == "public.t"
    assert rec["record"]["d"] == "2022-03-19"
    assert rec["record"]["ts"] == "1918-02-03T13:00:01.000000+00:00"


def test_emit_stream_ordering(spark, tmp_path):
    # SCHEMA before RECORDs, STATE last (tap.py:782-797 /
    # tests/test_wal_reader.py:479-545)
    df = spark.createDataFrame(
        [(1, None, None, "a"), (2, None, None, "b")], _stream().spark_schema
    )
    state = StateStore(str(tmp_path / "s.json"))
    state.advance("public.t", "id", 2)
    buf = io.StringIO()
    n = emit_stream(df, _stream(), buf, state)
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert n == 2
    assert [l["type"] for l in lines] == ["SCHEMA", "RECORD", "RECORD", "STATE"]
    assert lines[-1]["value"]["bookmarks"]["public.t"]["replication_key_value"] == 2
