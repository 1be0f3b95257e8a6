"""Plan-expression memoization (tap_postgres_spark/plancache.py).

The CDC hot loop reuses memoized Column lists across micro-batches; these
tests pin that the cache (a) actually hits for identical structural
inputs, (b) misses for different ones, and (c) never changes decode
semantics — including the one batch-varying column (_sdc_deleted_at's
batch_time literal), which must stay OUT of the cached part.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark import plancache
from tap_postgres_spark.decode import (
    classify,
    decode_projection,
    finish_decode,
    parse_raw_payloads,
)
from tap_postgres_spark.schema import StreamDef


def _mk_stream(name: str = "t1", extra_field: bool = False) -> StreamDef:
    fields = [
        T.StructField("id", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
    ]
    if extra_field:
        fields.append(T.StructField("w", T.StringType(), True))
    return StreamDef(
        schema_name="public",
        table_name=name,
        spark_schema=T.StructType(fields),
        key_properties=("id",),
    )


def _raw(spark, payloads):
    return spark.createDataFrame(
        [(i + 1, 10, p) for i, p in enumerate(payloads)],
        "lsn long, txid long, payload string",
    )


PAYLOAD_I = (
    '{"action":"I","schema":"public","table":"t1",'
    '"columns":[{"name":"id","value":"k1"},{"name":"v","value":"a"}]}'
)
PAYLOAD_D = (
    '{"action":"D","schema":"public","table":"t1",'
    '"identity":[{"name":"id","value":"k1"}]}'
)


def test_memo_hit_and_miss_by_key():
    plancache.clear()
    built = []

    def make(tag):
        def build():
            built.append(tag)
            return tag

        return build

    assert plancache.memo(("k", 1), make("a")) == "a"
    assert plancache.memo(("k", 1), make("a2")) == "a"  # hit: not rebuilt
    assert plancache.memo(("k", 2), make("b")) == "b"  # different key
    assert built == ["a", "b"]


def test_decode_projection_cached_across_batches(spark):
    plancache.clear()
    stream = _mk_stream()
    pg = {"id": "text", "v": "text"}

    t1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    t2 = datetime(2026, 2, 2, tzinfo=timezone.utc)

    def run(batch_time):
        cls = classify(parse_raw_payloads(_raw(spark, [PAYLOAD_I, PAYLOAD_D])),
                       ["public.t1"])
        out = finish_decode(
            decode_projection(cls, stream, pg, batch_time=batch_time), stream
        )
        return {r["id"]: r for r in out.collect()}

    r1 = run(t1)
    r2 = run(t2)  # second call hits the memoized projection
    # the batch-varying column still reflects EACH call's batch_time
    deleted_1 = [r for r in r1.values() if r["_sdc_deleted_at"] is not None]
    deleted_2 = [r for r in r2.values() if r["_sdc_deleted_at"] is not None]
    assert deleted_1[0]["_sdc_deleted_at"] == "2026-01-01T00:00:00Z"
    assert deleted_2[0]["_sdc_deleted_at"] == "2026-02-02T00:00:00Z"
    # and the decoded values are identical run to run
    assert set(r1) == set(r2) == {"k1"}


def test_schema_change_misses_cache(spark):
    """A widened stream schema must build a NEW projection (not reuse the
    narrower cached one) — the evolution path depends on this."""
    plancache.clear()
    pg = {"id": "text", "v": "text"}
    cls = classify(parse_raw_payloads(_raw(spark, [PAYLOAD_I])), ["public.t1"])

    narrow = decode_projection(cls, _mk_stream(), pg)
    wide = decode_projection(
        cls, _mk_stream(extra_field=True), {**pg, "w": "text"}
    )
    assert "w" not in narrow.columns
    assert "w" in wide.columns
    row = wide.filter(F.col("__status") == "ok").collect()[0]
    assert row["w"] is None  # absent in payload → NULL


def test_pg_type_change_misses_cache(spark):
    """Same column name, different pg type → different coercion expr."""
    plancache.clear()
    stream = StreamDef(
        schema_name="public",
        table_name="t1",
        spark_schema=T.StructType(
            [
                T.StructField("id", T.StringType(), False),
                T.StructField("v", T.IntegerType(), True),
            ]
        ),
        key_properties=("id",),
    )
    payload = (
        '{"action":"I","schema":"public","table":"t1",'
        '"columns":[{"name":"id","value":"k1"},{"name":"v","value":""}]}'
    )
    cls = classify(parse_raw_payloads(_raw(spark, [payload])), ["public.t1"])
    as_text = decode_projection(cls, stream, {"id": "text", "v": "text"})
    as_num = decode_projection(cls, stream, {"id": "text", "v": "integer"})
    # numeric pg type: "" → NULL pre-cast; text pg type: "" casts (to NULL
    # for int anyway) — the plans must be DISTINCT cache entries
    r_text = as_text.collect()[0]
    r_num = as_num.collect()[0]
    assert r_text["v"] is None and r_num["v"] is None
    assert plancache._cache  # populated
    keys = [k for k in plancache._cache if k[1] == "decode_projection"]
    assert len(keys) == 2
