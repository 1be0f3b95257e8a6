"""JDBC discovery (S1 against a live PG): the discovery query contract
and the information_schema → StreamDef fold.

No PostgreSQL server or JDBC driver exists in the sandbox, so the live
path is exercised with a RECORDED information_schema result (a local
DataFrame with the exact DISCOVERY_COLUMNS shape the query produces) —
mirroring how the reference pins discovery against its golden fixture
``tests/resources/data.json`` (stream ``public-test_replication_key``:
id integer PK, updated_at timestamp, name nullable text).
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from tap_postgres_spark.catalog import discover_parquet_dir
from tap_postgres_spark.sources import (
    DISCOVERY_COLUMNS,
    discovery_dbtable,
    streamdefs_from_columns,
)

# the golden-fixture table, as information_schema would report it
_FIXTURE_ROWS = [
    # table_schema, table_name, column_name, data_type, ordinal, nullable, pk
    ("public", "test_replication_key", "id", "integer", 1, False, True),
    ("public", "test_replication_key", "updated_at",
     "timestamp without time zone", 2, True, False),
    ("public", "test_replication_key", "name", "text", 3, True, False),
]


def _recorded_df(spark):
    schema = T.StructType([
        T.StructField("table_schema", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("ordinal_position", T.IntegerType()),
        T.StructField("is_nullable", T.BooleanType()),
        T.StructField("is_primary_key", T.BooleanType()),
    ])
    return spark.createDataFrame(_FIXTURE_ROWS, schema)


def test_discovery_query_shape():
    q = discovery_dbtable(("public", "analytics"))
    assert q.startswith("(") and q.endswith(") AS discovery")
    assert "information_schema.columns" in q
    assert "key_column_usage" in q and "PRIMARY KEY" in q
    assert "IN ('public', 'analytics')" in q
    for col in DISCOVERY_COLUMNS:
        assert col in q
    # schema names are SQL-escaped
    assert "'we''ird'" in discovery_dbtable(("we'ird",))


def test_streamdefs_match_golden_fixture(spark):
    df = _recorded_df(spark)
    streams = streamdefs_from_columns(
        (r.asDict() for r in df.collect()),
        replication={"test_replication_key": {"method": "INCREMENTAL",
                                              "key": "updated_at"}},
    )
    assert len(streams) == 1
    s = streams[0]
    # matches reference tests/resources/data.json: id is the key property,
    # id integer / updated_at date-time / name nullable string
    assert s.fqn == "public.test_replication_key"
    assert s.key_properties == ("id",)
    assert s.replication_method == "INCREMENTAL"
    assert s.replication_key == "updated_at"
    fields = {f.name: f for f in s.spark_schema.fields}
    assert [f.name for f in s.spark_schema.fields] == ["id", "updated_at", "name"]
    assert fields["id"].dataType == T.IntegerType() and not fields["id"].nullable
    assert fields["updated_at"].dataType == T.TimestampNTZType()
    assert fields["name"].dataType == T.StringType() and fields["name"].nullable


def test_streamdefs_agree_with_parquet_feed_catalog(spark, tmp_path):
    """The two S1 front ends (live information_schema vs parquet feed)
    must produce the same StreamDef for the same table."""
    base = str(tmp_path / "feed")
    schema = T.StructType([
        T.StructField("id", T.IntegerType(), nullable=False),
        T.StructField("updated_at", T.TimestampNTZType(), nullable=True),
        T.StructField("name", T.StringType(), nullable=True),
    ])
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), "x")], schema
    ).write.parquet(base + "/test_replication_key.parquet")

    from_parquet = discover_parquet_dir(
        spark, base,
        key_properties={"test_replication_key": ["id"]},
        replication={"test_replication_key": {"method": "INCREMENTAL",
                                              "key": "updated_at"}},
    )[0]
    from_jdbc = streamdefs_from_columns(
        (r.asDict() for r in _recorded_df(spark).collect()),
        replication={"test_replication_key": {"method": "INCREMENTAL",
                                              "key": "updated_at"}},
    )[0]
    assert from_jdbc.fqn == from_parquet.fqn
    assert from_jdbc.key_properties == from_parquet.key_properties
    assert from_jdbc.replication_method == from_parquet.replication_method
    assert from_jdbc.replication_key == from_parquet.replication_key
    # same columns and Spark types (nullability may differ: parquet footers
    # written by Spark mark everything nullable)
    assert [(f.name, f.dataType) for f in from_jdbc.spark_schema.fields] == [
        (f.name, f.dataType) for f in from_parquet.spark_schema.fields
    ]


def test_streamdefs_multiple_tables_and_type_modes(spark):
    rows = _FIXTURE_ROWS + [
        ("public", "with_json", "id", "bigint", 1, False, True),
        ("public", "with_json", "payload", "jsonb", 2, True, False),
        ("public", "with_json", "tags", "text[]", 3, True, False),
    ]
    streams = streamdefs_from_columns(dict(zip(DISCOVERY_COLUMNS, r)) for r in rows)
    assert [s.table_name for s in streams] == ["test_replication_key", "with_json"]
    wj = {f.name: f.dataType for f in streams[1].spark_schema.fields}
    assert wj["payload"] == T.StringType()  # jsonb → JSON text by default
    assert wj["tags"] == T.ArrayType(T.StringType())

    obj = streamdefs_from_columns(
        (dict(zip(DISCOVERY_COLUMNS, r)) for r in rows), json_as_object=True
    )[1]
    assert {f.name: f.dataType for f in obj.spark_schema.fields}["payload"] == (
        T.MapType(T.StringType(), T.StringType())
    )
