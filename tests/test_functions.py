"""Scalar-function tests: PG array-literal grammar, LSN codec, enum repair.

Ports /root/reference/tests/test_wal_helpers.py and the array/value cases
of test_log_based.py:66-112 and test_consume.py:131-162.
"""

from pyspark.sql import functions as F

from tap_postgres_spark.functions import (
    _parse_pg_array_one,
    lsn_long_to_str,
    lsn_str_to_long,
    md5_60bit,
    parse_pg_array,
    repair_enum_quotes,
)


def test_pg_array_grammar_pure():
    assert _parse_pg_array_one("{a,b,c}") == ["a", "b", "c"]
    assert _parse_pg_array_one("{}") == []
    assert _parse_pg_array_one(None) is None
    # embedded quotes (test_log_based.py:66-112)
    assert _parse_pg_array_one('{"This is a \\"test\\"",plain}') == [
        'This is a "test"', "plain",
    ]
    assert _parse_pg_array_one('{"a,b",c}') == ["a,b", "c"]
    assert _parse_pg_array_one("{NULL,x}") == [None, "x"]
    assert _parse_pg_array_one('{"NULL"}') == ["NULL"]  # quoted NULL is literal
    assert _parse_pg_array_one('{"with space","tab\\\\slash"}') == [
        "with space", "tab\\slash",
    ]
    assert _parse_pg_array_one("not an array") is None


def test_pg_array_udf(spark):
    df = spark.createDataFrame(
        [('{a,b,"c d"}',), (None,), ("{}",)], ["v"]
    ).select(parse_pg_array("v").alias("arr"))
    rows = [r["arr"] for r in df.collect()]
    assert rows == [["a", "b", "c d"], None, []]


def test_lsn_roundtrip(spark):
    # _wal_helpers.py:135-138: '6/4A3B2C10' → (6<<32) + 0x4A3B2C10
    df = spark.createDataFrame([("6/4A3B2C10",), ("0/0",)], ["s"])
    got = df.select(lsn_str_to_long(F.col("s")).alias("lsn")).collect()
    assert got[0]["lsn"] == (6 << 32) + 0x4A3B2C10
    assert got[1]["lsn"] == 0
    back = (
        df.select(lsn_long_to_str(lsn_str_to_long(F.col("s"))).alias("s2")).collect()
    )
    assert back[0]["s2"] == "6/4A3B2C10"


def test_enum_quote_repair(spark):
    # _wal_helpers.py:17-19,92-99 / test_consume.py:149-162
    broken = '{"action":"I","columns":[{"name":"lang","type":""CodeLang"","value":"py"}]}'
    df = spark.createDataFrame([(broken,)], ["p"]).select(
        repair_enum_quotes(F.col("p")).alias("fixed")
    )
    fixed = df.collect()[0]["fixed"]
    assert '"type":"CodeLang"' in fixed
    assert '""' not in fixed
    # parses now
    import json

    assert json.loads(fixed)["columns"][0]["type"] == "CodeLang"


def test_md5_60bit_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "", "hello world", "tap-postgres"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], ["v"])
        .select("v", md5_60bit(F.col("v")).alias("h"))
        .collect()
    }
    for v in vals:
        expected = duckdb.sql(
            f"select ('0x'||substr(md5('{v}'),1,15))::bigint"
        ).fetchone()[0]
        assert got[v] == expected, v
