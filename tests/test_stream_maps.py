"""Stream maps + schema flattening (reference README.md:13-14 declares the
stream-maps / schema-flattening capabilities; semantics ported from the
Meltano SDK stream-map spec: exclusions, computed/renamed properties, row
filters, aliasing, __else__ removal, key overrides, nested flattening with
max_depth + JSON-stringify past the limit)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark import stream_maps as sm


def _df(spark):
    return spark.createDataFrame(
        [(1, "alice", "a@x.com", 10.0), (2, "bob", "b@y.org", 20.0)],
        "id long, name string, email string, amount double",
    )


def test_exclude_and_computed_and_passthrough_order(spark):
    out = sm.apply_stream_map(
        _df(spark),
        {
            "email": None,  # exclude (PII drop — the SDK's canonical example)
            "email_domain": "split_part(email, '@', 2)",  # computed from excluded col
            "amount": "amount * 100",  # redefine in place
        },
    )
    assert out.columns == ["id", "name", "amount", "email_domain"]
    rows = {r["id"]: (r["amount"], r["email_domain"]) for r in out.collect()}
    assert rows == {1: (1000.0, "x.com"), 2: (2000.0, "y.org")}


def test_filter_and_config_interpolation(spark):
    out = sm.apply_stream_map(
        _df(spark),
        {"__filter__": "amount >= {min_amount}"},
        config={"min_amount": 15},
    )
    assert [r["id"] for r in out.collect()] == [2]


def test_collection_alias_removal_and_else_null(spark):
    df = _df(spark)
    dfs = {"public-users": df, "public-logs": df, "public-other": df}
    out = sm.apply_stream_maps(
        dfs,
        {
            "public-users": {"__alias__": "users_v2", "email": None},
            "public-logs": "__NULL__",  # removed explicitly
            "__else__": "__NULL__",  # public-other removed implicitly
        },
    )
    assert set(out) == {"users_v2"}
    assert "email" not in out["users_v2"].columns


def test_else_defaults_to_passthrough(spark):
    df = _df(spark)
    out = sm.apply_stream_maps({"a": df, "b": df}, {"a": {"name": None}})
    assert set(out) == {"a", "b"}
    assert out["b"].columns == df.columns


def test_key_properties_override():
    assert sm.mapped_key_properties({"__key_properties__": ["k"]}, ["id"]) == ("k",)
    assert sm.mapped_key_properties({}, ["id"]) == ("id",)


def test_flatten_two_levels_and_depth_limit(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField(
                            "stats",
                            T.StructType(
                                [
                                    T.StructField("stars", T.LongType()),
                                    T.StructField("forks", T.LongType()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame([(1, ("py", (5, 2)))], schema)

    full = sm.flatten(df, max_depth=2)
    assert full.columns == ["id", "meta__lang", "meta__stats__stars", "meta__stats__forks"]
    assert full.collect()[0]["meta__stats__stars"] == 5

    # at the depth limit the still-nested struct is JSON-stringified
    lim = sm.flatten(df, max_depth=1)
    assert lim.columns == ["id", "meta__lang", "meta__stats"]
    assert json.loads(lim.collect()[0]["meta__stats"]) == {"stars": 5, "forks": 2}

    # schema-only flattening agrees with the data path
    assert [f.name for f in sm.flatten_schema(schema, 2).fields] == full.columns
    assert sm.flatten_schema(schema, 1)["meta__stats"].dataType == T.StringType()


def test_flatten_is_single_projection(spark):
    df = spark.createDataFrame(
        [(1, ("a", "b"))], "id long, s struct<x:string,y:string>"
    )
    plan = sm.flatten(df, 2)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") <= 1
