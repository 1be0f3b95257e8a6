"""Stream maps + schema flattening (reference README.md:13-14 declares the
stream-maps / schema-flattening capabilities; semantics ported from the
Meltano SDK stream-map spec: exclusions, computed/renamed properties, row
filters, aliasing, __else__ removal, key overrides, nested flattening with
max_depth + JSON-stringify past the limit)."""

from __future__ import annotations

import json

import pytest

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


def test_stream_map_inside_cdc_pipeline(spark, tmp_path):
    """Maps apply to decoded CDC rows before the merge — the SDK's
    record-level mapping, as one extra projection on the decode plan."""
    import json as _json

    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.schema import StreamDef, widen_for_cdc
    from tap_postgres_spark.state import StateStore

    base = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    mapped_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("v", T.StringType()),
            T.StructField("v_upper", T.StringType()),
        ]
    )
    stream = StreamDef("public", "t_a", base, ("id",))
    table = LakeTable.create(
        spark, str(tmp_path / "t_a"), widen_for_cdc(mapped_schema), ["id"], num_buckets=2
    )
    pipe = CdcPipeline(
        spark,
        [stream],
        {"public.t_a": {c: "text" for c in ("id", "email", "v")}},
        {"public.t_a": table},
        StateStore(str(tmp_path / "state.json")),
        stream_maps={
            "public.t_a": {"email": None, "v_upper": "upper(v)"}  # PII drop + computed
        },
    )

    def _payload(**cols):
        return _json.dumps(
            {"action": "I", "schema": "public", "table": "t_a",
             "columns": [{"name": k, "type": "text", "value": v} for k, v in cols.items()]}
        )

    raw = spark.createDataFrame(
        [(10, 1, _payload(id="a", email="x@y.z", v="hi"))],
        "lsn long, txid long, payload string",
    )
    pipe.apply_batch(raw, epoch_id="e0")
    rows = table.read().collect()
    assert "email" not in table.read().columns
    assert [(r["id"], r["v"], r["v_upper"]) for r in rows] == [("a", "hi", "HI")]


def test_stream_map_cannot_drop_key_or_sdc_columns(spark, tmp_path):
    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.schema import StreamDef, widen_for_cdc
    from tap_postgres_spark.state import StateStore

    base = T.StructType([T.StructField("id", T.StringType())])
    stream = StreamDef("public", "t_a", base, ("id",))
    table = LakeTable.create(
        spark, str(tmp_path / "t_a"), widen_for_cdc(base), ["id"], num_buckets=2
    )
    pipe = CdcPipeline(
        spark, [stream], {"public.t_a": {"id": "text"}}, {"public.t_a": table},
        StateStore(str(tmp_path / "s.json")),
        stream_maps={"public.t_a": {"id": None}},
    )
    raw = spark.createDataFrame([(1, 1, "{}")], "lsn long, txid long, payload string")
    with pytest.raises(ValueError, match="protected"):
        pipe.apply_batch(raw, epoch_id="e0")


def test_config_interpolation_types(spark):
    df = _df(spark)
    out = sm.apply_stream_map(
        df,
        {"__filter__": "(name = {who}) = {flag}"},
        config={"who": "bob", "flag": True},
    )
    assert [r["id"] for r in out.collect()] == [2]
    # single quotes in string config values are escaped, not injected
    out2 = sm.apply_stream_map(
        df, {"__filter__": "name <> {who}"}, config={"who": "o'brien"}
    )
    assert out2.count() == 2
