"""Mid-stream type widening: Postgres ``ALTER COLUMN ... TYPE int4→int8``
reflected in wal2json events, detected and applied WITHOUT a catalog
re-discover.

A retype never changes the event's column count, so the width trigger
can't fire; the signal is the value-level ``__overflow`` probe
(decode.py ``_overflow_probe``): a value that parses as BIGINT but not
as the column's declared narrow integral type.  The probe rides the
existing decode projection (lit(0) — zero cost — for all-string
streams), fires the existing full-schema discovery pass, and the
correction re-merge supersedes the narrow-decoded rows via the
``_sdc_gen`` tie-break — the exact machinery of the additive-evolution
path (reference analog tap.py:693-741; the reference itself has no
retype handling at all: a wal2json type change silently keeps the old
JSON schema).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.decode import classify, decode_projection, parse_raw_payloads
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

FQN = "public.metrics"

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("stars", T.IntegerType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
PG = {"repo": "text", "path": "text", "stars": "integer", "content": "text"}


def _payload(repo, path, stars, stars_type="integer", action="U",
             extra=None, content="c"):
    cols = [
        {"name": "repo", "type": "text", "value": repo},
        {"name": "path", "type": "text", "value": path},
        {"name": "stars", "type": stars_type,
         "value": None if stars is None else str(stars)},
        {"name": "content", "type": "text", "value": content},
    ]
    if extra is not None:
        cols.append({"name": extra[0], "type": extra[1], "value": extra[2]})
    return json.dumps(
        {"action": action, "schema": "public", "table": "metrics",
         "columns": cols}
    )


def _raw(spark, rows):
    """rows: (lsn, payload)"""
    return spark.createDataFrame(
        [(l, 1, p) for l, p in rows], "lsn long, txid long, payload string"
    )


def _pipeline(spark, tmp_path, schema=SCHEMA, keys=("repo", "path"), pg=PG):
    stream = StreamDef(
        schema_name="public", table_name="metrics",
        spark_schema=schema, key_properties=tuple(keys),
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), widen_for_cdc(schema), list(keys),
        num_buckets=4,
    )
    pipe = CdcPipeline(
        spark, [stream], {FQN: dict(pg)}, {FQN: table},
        StateStore(str(tmp_path / "state.json")),
        metrics_dir=str(tmp_path / "metrics"),
    )
    return pipe, table


# ---------------------------------------------------------------- unit

def test_overflow_probe_fires_only_on_narrow_integral_overflow(spark):
    stream = StreamDef(
        schema_name="public", table_name="metrics",
        spark_schema=SCHEMA, key_properties=("repo", "path"),
    )
    raw = _raw(spark, [
        (10, _payload("r", "a", 5)),                      # fits int
        (20, _payload("r", "b", 2**40, "bigint")),        # needs long
        (30, _payload("r", "c", None)),                   # NULL
        (40, _payload("r", "d", "garbage")),              # malformed numeric
    ])
    proj = decode_projection(
        classify(parse_raw_payloads(raw), [FQN]), stream, PG
    )
    got = {r["path"]: r["__overflow"] for r in proj.collect()}
    assert got == {"a": 0, "b": 1, "c": 0, "d": 0}


def test_overflow_probe_is_literal_zero_for_all_string_streams(spark):
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ])
    stream = StreamDef(
        schema_name="public", table_name="metrics",
        spark_schema=schema, key_properties=("repo", "path"),
    )
    proj = decode_projection(
        classify(parse_raw_payloads(_raw(spark, [(10, _payload("r", "a", 1))])), [FQN]),
        stream, {k: "text" for k in ("repo", "path", "content")},
    )
    # compiled away: the probe column is a foldable literal in the plan
    plan = proj._jdf.queryExecution().optimizedPlan().toString()
    assert "__overflow" in proj.columns
    assert proj.collect()[0]["__overflow"] == 0
    assert "cast" not in plan.split("__overflow")[0].rsplit("\n", 1)[-1].lower()


# ----------------------------------------------------------------- e2e

def test_mid_stream_int_to_bigint_widening_e2e(spark, tmp_path):
    pipe, table = _pipeline(spark, tmp_path)

    r1 = pipe.apply_batch(_raw(spark, [
        (10, _payload("r1", "a", 5, action="I")),
        (20, _payload("r1", "b", 7, action="I")),
    ]), epoch_id="b0")
    assert "evolution" not in r1["streams"][FQN]
    assert {f.name: f.dataType for f in table.schema.fields}["stars"] == T.IntegerType()

    # ALTER COLUMN stars TYPE bigint, then an UPDATE with a value only a
    # long can hold (plus one small-valued update in the same batch)
    big = 2**40
    r2 = pipe.apply_batch(_raw(spark, [
        (30, _payload("r1", "a", big, "bigint")),
        (40, _payload("r2", "c", 9, "bigint", action="I")),
    ]), epoch_id="b1")
    assert r2["streams"][FQN]["retyped_columns"] == {"stars": "bigint (bigint)"}
    assert not r2["streams"][FQN]["evolution"].get("skipped")
    assert {f.name: f.dataType for f in table.schema.fields}["stars"] == T.LongType()
    got = {(r["repo"], r["path"]): r["stars"] for r in table.read().collect()}
    assert got == {("r1", "a"): big, ("r1", "b"): 7, ("r2", "c"): 9}

    # stream + pg baseline evolved: the NEXT bigint batch decodes
    # directly, no correction pass
    assert pipe.pg_types[FQN]["stars"] == "bigint"
    r3 = pipe.apply_batch(_raw(spark, [
        (50, _payload("r1", "b", 2**41, "bigint")),
    ]), epoch_id="b2")
    assert "evolution" not in r3["streams"][FQN]
    got = {(r["repo"], r["path"]): r["stars"] for r in table.read().collect()}
    assert got[("r1", "b")] == 2**41


def test_widening_composes_with_new_column_in_same_batch(spark, tmp_path):
    pipe, table = _pipeline(spark, tmp_path)
    pipe.apply_batch(_raw(spark, [(10, _payload("r1", "a", 5, action="I"))]),
                     epoch_id="b0")
    r = pipe.apply_batch(_raw(spark, [
        (20, _payload("r1", "a", 2**40, "bigint", extra=("forks", "integer", "3"))),
    ]), epoch_id="b1")
    assert r["streams"][FQN]["evolved_columns"] == ["forks"]
    assert r["streams"][FQN]["retyped_columns"] == {"stars": "bigint (bigint)"}
    row = table.read().collect()[0]
    assert row["stars"] == 2**40 and row["forks"] == 3


def test_non_widening_type_change_raises(spark, tmp_path):
    pipe, table = _pipeline(spark, tmp_path)
    pipe.apply_batch(_raw(spark, [(10, _payload("r1", "a", 5, action="I"))]),
                     epoch_id="b0")
    # stars: integer → text is destructive; fired via the width trigger
    # (a new column in the same batch) since a text value can't overflow
    with pytest.raises(TypeError, match="not a lossless widening"):
        pipe.apply_batch(_raw(spark, [
            (20, _payload("r1", "a", "five", "text",
                          extra=("forks", "integer", "3"))),
        ]), epoch_id="b1")


def test_widening_a_key_column_raises(spark, tmp_path):
    schema = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
    ])

    def pl(id_val, id_type="integer", action="I"):
        return json.dumps({
            "action": action, "schema": "public", "table": "metrics",
            "columns": [
                {"name": "id", "type": id_type, "value": str(id_val)},
                {"name": "content", "type": "text", "value": "c"},
            ]})

    pipe, table = _pipeline(
        spark, tmp_path, schema=schema, keys=("id",),
        pg={"id": "integer", "content": "text"},
    )
    pipe.apply_batch(_raw(spark, [(10, pl(1))]), epoch_id="b0")
    with pytest.raises(TypeError, match="key column"):
        pipe.apply_batch(_raw(spark, [(20, pl(2**40, "bigint"))]),
                         epoch_id="b1")
