"""Type round-trip tier — the decode-level port of the reference's
tests/test_core.py type suites (temporal :153-206, jsonb/json :209-417,
numeric :420-473, hstore :476-535, BC dates :576-653) over wal2json-style
events instead of a live Postgres.
"""

from __future__ import annotations

import json
from datetime import date, datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from tap_postgres_spark.decode import classify, decode_stream, parse_raw_payloads
from tap_postgres_spark.functions import _parse_hstore_one
from tap_postgres_spark.schema import StreamDef, pg_type_to_spark


def _mk_stream(cols: list[tuple[str, str]], *, dates_as_string=False, json_as_object=False):
    fields = [
        T.StructField(n, pg_type_to_spark(t, dates_as_string=dates_as_string,
                                          json_as_object=json_as_object))
        for n, t in cols
    ]
    return (
        StreamDef("public", "tt", T.StructType(fields), (cols[0][0],)),
        {n: t for n, t in cols},
    )


def _decode_one(spark, stream, pg_types, values: dict):
    payload = json.dumps(
        {
            "action": "I",
            "schema": "public",
            "table": "tt",
            "columns": [
                {"name": k, "type": pg_types[k], "value": v} for k, v in values.items()
            ],
        }
    )
    raw = spark.createDataFrame([(1, 1, payload)], "lsn long, txid long, payload string")
    out = decode_stream(classify(parse_raw_payloads(raw), [stream.fqn]), stream, pg_types)
    return out.collect()[0]


def test_temporal_types(spark):
    # tests/test_core.py:153-206: date '2022-03-19', time as string,
    # timestamp '1918-02-03 13:00:01'
    stream, pg = _mk_stream(
        [("id", "integer"), ("c_date", "date"), ("c_time", "time without time zone"),
         ("c_ts", "timestamp without time zone")]
    )
    row = _decode_one(spark, stream, pg, {
        "id": "1", "c_date": "2022-03-19", "c_time": "06:04:19.222",
        "c_ts": "1918-02-03 13:00:01",
    })
    assert row["c_date"] == date(2022, 3, 19)
    assert row["c_time"] == "06:04:19.222"  # TIME stays string
    assert row["c_ts"] == datetime(1918, 2, 3, 13, 0, 1)


def test_bc_dates_require_string_mode(spark):
    # tests/test_core.py:576-653: '4713-04-03 BC' / 'infinity' are
    # unrepresentable — dates_as_string passes them through verbatim
    stream, pg = _mk_stream([("id", "integer"), ("d", "date")], dates_as_string=True)
    row = _decode_one(spark, stream, pg, {"id": "1", "d": "4713-04-03 BC"})
    assert row["d"] == "4713-04-03 BC"
    # without string mode the unparseable date degrades to NULL (permissive
    # casts), never a crash
    stream2, pg2 = _mk_stream([("id", "integer"), ("d", "date")])
    row2 = _decode_one(spark, stream2, pg2, {"id": "1", "d": "infinity"})
    assert row2["d"] is None


def test_numeric_decimal(spark):
    # tests/test_core.py:420-473: 3.14 / 12 / 10000.00001 as numeric
    stream, pg = _mk_stream([("id", "integer"), ("n", "numeric(20,8)")])
    row = _decode_one(spark, stream, pg, {"id": "1", "n": "10000.00001"})
    assert row["n"] == Decimal("10000.00001000")


def test_json_default_is_text(spark):
    # tests/test_core.py:209-280: json/jsonb round-trip as JSON text
    stream, pg = _mk_stream([("id", "integer"), ("j", "jsonb")])
    row = _decode_one(spark, stream, pg, {"id": "1", "j": '{"foo": "bar"}'})
    assert json.loads(row["j"]) == {"foo": "bar"}


def test_json_as_object_mode(spark):
    # tests/test_core.py:344-417: json_as_object → object (map)
    stream, pg = _mk_stream([("id", "integer"), ("j", "jsonb")], json_as_object=True)
    row = _decode_one(spark, stream, pg, {"id": "1", "j": '{"a": "x", "b": "y"}'})
    assert row["j"] == {"a": "x", "b": "y"}


def test_hstore(spark):
    # tests/test_core.py:476-535
    stream, pg = _mk_stream([("id", "integer"), ("h", "hstore")])
    row = _decode_one(spark, stream, pg, {"id": "1", "h": '"baz"=>"foo", "qux"=>"quux"'})
    assert row["h"] == {"baz": "foo", "qux": "quux"}


def test_hstore_grammar():
    assert _parse_hstore_one('"foo"=>"bar"') == {"foo": "bar"}
    assert _parse_hstore_one('"k"=>NULL') == {"k": None}
    assert _parse_hstore_one('"a b"=>"c, d", "e\\"q"=>"f"') == {"a b": "c, d", 'e"q': "f"}
    assert _parse_hstore_one(None) is None
    assert _parse_hstore_one("") == {}


def test_bytea_hex(spark):
    stream, pg = _mk_stream([("id", "integer"), ("b", "bytea")])
    row = _decode_one(spark, stream, pg, {"id": "1", "b": "\\x48656c6c6f"})
    assert bytes(row["b"]) == b"Hello"


def test_boolean_and_bigint(spark):
    stream, pg = _mk_stream(
        [("id", "integer"), ("flag", "boolean"), ("big", "bigint")]
    )
    row = _decode_one(spark, stream, pg, {"id": "1", "flag": "true", "big": "9007199254740993"})
    assert row["flag"] is True
    assert row["big"] == 9007199254740993


def test_int_array(spark):
    # recursive array mapping (client.py:80-89) with typed cast
    stream, pg = _mk_stream([("id", "integer"), ("xs", "integer[]")])
    row = _decode_one(spark, stream, pg, {"id": "1", "xs": "{1,2,3}"})
    assert row["xs"] == [1, 2, 3]
