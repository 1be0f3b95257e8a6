"""Fused multi-stream commit (lake/grouped.py): N tables' MOR deltas
decoded, folded and written in ONE Spark job, committed per-table
through the same _commit_delta tail merge_into uses.

Pins: (1) fused ≡ per-stream final state, replay included — a pure
plan-shape change; (2) partial-commit crash replay skips only the
already-committed streams; (3) un-fusable schemas (same column name,
conflicting types) fall back to the per-stream path transparently.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from tap_postgres_spark.decode import classify, parse_raw_payloads
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.grouped import (
    execute_grouped_fused,
    prepare_grouped_fused,
)
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore


def _payload(action, table, **cols):
    d = {"action": action, "schema": "public", "table": table}
    key = "identity" if action == "D" else "columns"
    d[key] = [{"name": k, "type": "text", "value": v} for k, v in cols.items()]
    return json.dumps(d)


def _schema(*names):
    return T.StructType([T.StructField(n, T.StringType()) for n in names])


def _build(spark, root, grouped: bool):
    # three streams with DIFFERENT column sets — exercises the
    # unionByName null-fill — one of which (t_c) goes quiet in batch 2
    # (zero-row branch still commits its epoch)
    streams = [
        StreamDef("public", "t_a", _schema("id", "v"), ("id",)),
        StreamDef("public", "t_b", _schema("id", "w", "x"), ("id",)),
        StreamDef("public", "t_c", _schema("id", "y"), ("id",)),
    ]
    tables = {
        s.fqn: LakeTable.create(
            spark, str(root / s.table_name), widen_for_cdc(s.spark_schema),
            ["id"], num_buckets=4,
        )
        for s in streams
    }
    pipe = CdcPipeline(
        spark, streams,
        {s.fqn: {f.name: "text" for f in s.spark_schema.fields} for s in streams},
        tables, StateStore(str(root / "state.json")),
        grouped_commit=grouped,
    )
    b1 = [
        (10, 1, _payload("I", "t_a", id="a1", v="x")),
        (11, 1, _payload("I", "t_b", id="b1", w="y", x="q")),
        (12, 1, _payload("I", "t_c", id="c1", y="z")),
        (13, 2, _payload("U", "t_a", id="a1", v="x2")),
        (14, 2, _payload("I", "t_a", id="a2", v="m")),
        (15, 2, _payload("D", "t_b", id="b1")),
    ]
    b2 = [
        (20, 3, _payload("I", "t_b", id="b2", w="n", x="r")),
        (21, 3, _payload("D", "t_a", id="a2")),
        (22, 3, _payload("U", "t_a", id="a1", v="x3")),
    ]
    for i, rows in enumerate((b1, b2)):
        raw = spark.createDataFrame(rows, "lsn long, txid long, payload string")
        pipe.apply_batch(raw, epoch_id=f"e{i}")
    # crash-replay of the last epoch must be a no-op
    raw = spark.createDataFrame(b2, "lsn long, txid long, payload string")
    res = pipe.apply_batch(raw, epoch_id="e1")
    assert all(r.get("skipped") for r in res["streams"].values())
    return pipe, {
        fqn: sorted(map(tuple, t.read().collect()))
        for fqn, t in tables.items()
    }


def test_grouped_matches_per_stream(spark, tmp_path):
    _, grouped = _build(spark, tmp_path / "g", grouped=True)
    _, classic = _build(spark, tmp_path / "c", grouped=False)
    assert grouped == classic
    assert sorted(map(tuple, grouped["public.t_a"])) != []  # non-trivial


def test_grouped_zero_row_stream_commits_epoch(spark, tmp_path):
    pipe, _ = _build(spark, tmp_path / "z", grouped=True)
    # t_c saw no events in e1, but its epoch committed (exactly-once
    # bookkeeping must not depend on data presence)
    assert "e1:public.t_c" in pipe.tables["public.t_c"].committed_epochs()


def _decoded(spark, rows, schema_cols):
    fields = "id string, " + ", ".join(f"{c} string" for c in schema_cols)
    fields += ", _sdc_lsn long, _sdc_deleted_at string"
    return spark.createDataFrame(rows, fields)


def _classified(spark, rows, fqns):
    raw = spark.createDataFrame(rows, "lsn long, txid long, payload string")
    return classify(parse_raw_payloads(raw), fqns)


def test_fused_partial_commit_replay(spark, tmp_path):
    """Crash between table commits: the already-committed stream is
    skipped on replay (excluded from the fused write), the rest commit."""
    sa_def = StreamDef("public", "t_a", _schema("id", "v"), ("id",))
    sb_def = StreamDef("public", "t_b", _schema("id", "w"), ("id",))
    ta = LakeTable.create(
        spark, str(tmp_path / "a"), widen_for_cdc(sa_def.spark_schema),
        ["id"], num_buckets=2,
    )
    tb = LakeTable.create(
        spark, str(tmp_path / "b"), widen_for_cdc(sb_def.spark_schema),
        ["id"], num_buckets=2,
    )
    tables = {"public.t_a": ta, "public.t_b": tb}
    rows = [
        (10, 1, _payload("I", "t_a", id="k1", v="v1")),
        (11, 1, _payload("I", "t_b", id="k9", w="w1")),
    ]
    cls = _classified(spark, rows, list(tables))
    # simulate: epoch e5 already landed on table b (crash after its
    # commit, before a's)
    tb.merge_into(
        _decoded(spark, [("k9", "w1", 11, None)], ["w"]), epoch_id="e5"
    )

    def plan():
        return prepare_grouped_fused(
            spark, cls, [sa_def, sb_def],
            {f: {"id": "text"} for f in tables}, tables,
            {f: "e5" for f in tables}, {f: None for f in tables},
            staging_root=str(tmp_path / "stage"),
        )

    res = execute_grouped_fused(plan())
    assert res["public.t_b"]["skipped"] is True
    assert res["public.t_a"]["skipped"] is False
    assert res["public.t_a"]["rows_written"] == 1
    assert [tuple(r) for r in ta.read().select("id", "v").collect()] == [("k1", "v1")]
    assert [tuple(r) for r in tb.read().select("id", "w").collect()] == [("k9", "w1")]
    # full replay: everything skips, no write job
    res2 = execute_grouped_fused(plan())
    assert all(r["skipped"] for r in res2.values())


def test_fused_type_conflict_returns_none_and_pipeline_falls_back(
    spark, tmp_path
):
    # same column name "v", string in one table / long in the other:
    # prepare_grouped_fused refuses (None) …
    sa = widen_for_cdc(_schema("id", "v"))
    sb_struct = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("v", T.LongType())]
    )
    sb = widen_for_cdc(sb_struct)
    sa_def = StreamDef("public", "t_a", _schema("id", "v"), ("id",))
    sb_def = StreamDef("public", "t_b", sb_struct, ("id",))
    ta = LakeTable.create(spark, str(tmp_path / "a"), sa, ["id"], num_buckets=2)
    tb = LakeTable.create(spark, str(tmp_path / "b"), sb, ["id"], num_buckets=2)
    tables2 = {"public.t_a": ta, "public.t_b": tb}
    cls = _classified(
        spark, [(10, 1, _payload("I", "t_a", id="k1", v="s"))], list(tables2)
    )
    assert (
        prepare_grouped_fused(
            spark, cls, [sa_def, sb_def],
            {"public.t_a": {"id": "text", "v": "text"},
             "public.t_b": {"id": "text", "v": "int8"}},
            tables2, {f: "e0" for f in tables2}, {f: None for f in tables2},
            staging_root=str(tmp_path / "stage"),
        )
        is None
    )
    # … and the pipeline still applies the batch via the per-stream path
    streams = [
        StreamDef("public", "t_a", _schema("id", "v"), ("id",)),
        StreamDef("public", "t_b", sb_struct, ("id",)),
    ]
    tables = {
        "public.t_a": LakeTable.create(
            spark, str(tmp_path / "pa"), sa, ["id"], num_buckets=2
        ),
        "public.t_b": LakeTable.create(
            spark, str(tmp_path / "pb"), sb, ["id"], num_buckets=2
        ),
    }
    pipe = CdcPipeline(
        spark, streams,
        {"public.t_a": {"id": "text", "v": "text"},
         "public.t_b": {"id": "text", "v": "int8"}},
        tables, StateStore(str(tmp_path / "state.json")),
        grouped_commit=True,
    )
    rows = [
        (10, 1, _payload("I", "t_a", id="a1", v="str")),
        (11, 1, _payload("I", "t_b", id="b1", v="7")),
    ]
    raw = spark.createDataFrame(rows, "lsn long, txid long, payload string")
    res = pipe.apply_batch(raw, epoch_id="e0")
    assert not any(r.get("skipped") for r in res["streams"].values())
    assert [tuple(r) for r in tables["public.t_a"].read().select("id", "v").collect()] == [("a1", "str")]
    assert [tuple(r) for r in tables["public.t_b"].read().select("id", "v").collect()] == [("b1", 7)]


def test_compact_grouped_matches_per_table(spark, tmp_path):
    """compact_grouped ≡ per-table compact(include_base=False): same
    final contents, same bucket-map shape (base kept + one folded delta
    dir), depth reduced."""
    from tap_postgres_spark.lake.grouped import compact_grouped

    def build(sub):
        tabs = {}
        for t, cols in (("t_a", ("v",)), ("t_b", ("w", "x"))):
            tab = LakeTable.create(
                spark, str(tmp_path / sub / t),
                widen_for_cdc(_schema("id", *cols)), ["id"], num_buckets=2,
            )
            for i in range(4):  # 4 merge deltas per bucket
                rows = [
                    (f"k{j}", *[f"{c}{i}-{j}" for c in cols], 100 * i + j, None)
                    for j in range(6)
                ]
                fields = (
                    "id string, "
                    + ", ".join(f"{c} string" for c in cols)
                    + ", _sdc_lsn long, _sdc_deleted_at string"
                )
                tab.merge_into(
                    spark.createDataFrame(rows, fields), epoch_id=f"e{i}"
                )
            tabs[f"public.{t}"] = tab
        return tabs

    grouped = build("g")
    classic = build("c")
    res = compact_grouped(spark, grouped, max_delta_depth=1)
    for fqn, tab in classic.items():
        r = tab.compact(max_delta_depth=1, include_base=False)
        assert res[fqn]["skipped"] == r["skipped"] == False  # noqa: E712
        assert res[fqn]["compacted"] == r["compacted"]
    for fqn in grouped:
        g = sorted(map(tuple, grouped[fqn].read().collect()))
        c = sorted(map(tuple, classic[fqn].read().collect()))
        assert g == c and len(g) == 6
        assert grouped[fqn].delta_depth() == classic[fqn].delta_depth() == 2
    # nothing left to compact → per-table skipped markers
    res2 = compact_grouped(spark, grouped, max_delta_depth=1)
    assert all(r["skipped"] for r in res2.values())
