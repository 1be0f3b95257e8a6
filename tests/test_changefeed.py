"""Changefeed export (lake/changefeed.py): the engine's own changelog
replays as a valid WAL feed — a second CdcPipeline chained off the
first table converges to identical content, incrementally, with
deletes propagating and idempotent re-export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.changefeed import export_changefeed, exported_version
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

BASE = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("blob", T.BinaryType(), True),
    ]
)
PG_TYPES = {"k": "bigint", "name": "text", "x": "double precision", "blob": "bytea"}


def _batch(spark, rows, lsn0):
    return spark.createDataFrame(
        [
            (k, n, x, b, lsn0 + i, "1970-01-01T00:00:00Z" if dead else None)
            for i, (k, n, x, b, dead) in enumerate(rows)
        ],
        "k long, name string, x double, blob binary, _sdc_lsn long, "
        "_sdc_deleted_at string",
    )


def _rows(t):
    return {
        (r["k"], r["name"], r["x"], bytes(r["blob"]) if r["blob"] else None, r["_sdc_lsn"])
        for r in t.read().collect()
    }


@pytest.fixture()
def chain(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), widen_for_cdc(BASE), ["k"], num_buckets=4)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), widen_for_cdc(BASE), ["k"], num_buckets=4)
    fqn = "pub.downstream"
    pipe = CdcPipeline(
        spark,
        [StreamDef("pub", "downstream", BASE, ("k",))],
        {fqn: PG_TYPES},
        {fqn: dst},
        StateStore(str(tmp_path / "state.json")),
        detect_evolution=False,
    )
    feed = str(tmp_path / "feed")
    return src, dst, pipe, feed


def _replay(spark, pipe, feed, epoch):
    pipe.apply_batch(
        spark.read.schema("lsn long, txid long, payload string").parquet(feed),
        epoch_id=epoch,
    )


def test_chain_converges_and_propagates_deletes(spark, chain):
    src, dst, pipe, feed = chain
    src.merge_into(
        _batch(
            spark,
            [
                (1, "a", 1.5, b"\x00\xff", 0),
                (2, "b", None, None, 0),
                (3, None, 3.0, b"hi", 0),
            ],
            100,
        ),
        epoch_id="e1",
    )
    res = export_changefeed(src, feed, "pub", "downstream", PG_TYPES)
    assert not res["skipped"] and res["files"] >= 1
    _replay(spark, pipe, feed, "c1")
    assert _rows(dst) == _rows(src)

    # churn: update, delete, insert — export is INCREMENTAL (only the
    # new range) and the delete propagates as a D action
    v1 = exported_version(feed)
    src.merge_into(
        _batch(
            spark,
            [(1, "a2", 9.0, None, 0), (2, None, None, None, 1), (4, "d", 4.0, b"z", 0)],
            200,
        ),
        epoch_id="e2",
    )
    res2 = export_changefeed(src, feed, "pub", "downstream", PG_TYPES)
    assert res2["from_version"] == v1
    _replay(spark, pipe, feed, "c2")
    assert _rows(dst) == _rows(src)
    assert not dst.read().filter(F.col("k") == 2).collect()  # delete arrived

    # idempotent: nothing new to export
    assert export_changefeed(src, feed, "pub", "downstream", PG_TYPES)["skipped"]
    # and replaying the whole feed dir again is a no-op by LWW + epochs
    _replay(spark, pipe, feed, "c3")
    assert _rows(dst) == _rows(src)


def test_typed_columns_round_trip(spark, tmp_path):
    """Arrays with embedded quotes/commas/NULLs, hstore maps, and json
    objects survive export → decode exactly (the renderers are the
    inverses of parse_pg_array / parse_hstore / from_json)."""
    schema = widen_for_cdc(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("tags", T.ArrayType(T.StringType()), True),
                T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
                T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
            ]
        )
    )
    pg = {"k": "bigint", "tags": "text[]", "attrs": "hstore", "props": "jsonb"}
    src = LakeTable.create(spark, str(tmp_path / "src"), schema, ["k"], num_buckets=2)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), schema, ["k"], num_buckets=2)
    fqn = "pub.typed"
    pipe = CdcPipeline(
        spark,
        [StreamDef("pub", "typed", T.StructType(schema.fields[:-2]), ("k",))],
        {fqn: pg},
        {fqn: dst},
        StateStore(str(tmp_path / "state.json")),
        detect_evolution=False,
    )
    rows = [
        (1, ["a", 'qu"ote', "with,comma", None, "", "NULL", "sp ace"],
         {"k1": "v1", "nul": None, 'q"k': 'v\\slash'}, {"a": "1"}),
        (2, None, None, None),
        (3, [], {}, {}),
    ]
    src.merge_into(
        spark.createDataFrame(
            [(k, t, a, p, 100 + i, None) for i, (k, t, a, p) in enumerate(rows)],
            "k long, tags array<string>, attrs map<string,string>, "
            "props map<string,string>, _sdc_lsn long, _sdc_deleted_at string",
        ),
        epoch_id="e1",
    )
    feed = str(tmp_path / "feed")
    export_changefeed(src, feed, "pub", "typed", pg)
    _replay(spark, pipe, feed, "c1")

    def rows_of(t):
        return {
            (r["k"], tuple(r["tags"]) if r["tags"] is not None else None,
             tuple(sorted(r["attrs"].items())) if r["attrs"] is not None else None,
             tuple(sorted(r["props"].items())) if r["props"] is not None else None)
            for r in t.read().collect()
        }

    assert rows_of(dst) == rows_of(src)


def test_live_relay_through_streaming_runner(spark, tmp_path):
    """Pipeline A runs with changefeed_dir set; pipeline B tails A's
    changefeed with its OWN streaming runner — a replication chain of
    two live engines converges to identical content."""
    from tap_postgres_spark.feedgen import FQN, FeedConfig, generate_feed, write_feed
    from tap_postgres_spark.streaming import StreamingCdcRunner
    from tests.test_end_to_end import (
        assert_state_matches_oracle,
        load_snapshot,
        make_pipeline,
    )

    feed = generate_feed(FeedConfig(n_events=300, n_initial_paths=60, n_feed_files=6))
    cf_root = str(tmp_path / "cf")
    pipe_a, table_a, _ = make_pipeline(spark, tmp_path, changefeed_dir=cf_root)
    load_snapshot(spark, pipe_a, table_a, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)
    runner_a = StreamingCdcRunner(
        pipe_a, feed_dir, str(tmp_path / "ckpt_a"), max_files_per_trigger=2
    )
    results = runner_a.run_available_now()
    assert all(r["changefeed"][FQN] is not None for r in results)

    # B: independent pipeline whose WAL source IS A's changefeed
    schema = table_a.schema  # includes evolved cols + _sdc_*
    base = T.StructType(
        [f for f in schema.fields if not f.name.startswith("_sdc")]
    )
    dst = LakeTable.create(
        spark, str(tmp_path / "b"), widen_for_cdc(base), list(table_a.key_columns),
        num_buckets=4,
    )
    sname, tname = FQN.split(".", 1)
    pipe_b = CdcPipeline(
        spark,
        [StreamDef(sname, tname, base, tuple(table_a.key_columns))],
        {FQN: {f.name: "text" for f in base.fields}},
        {FQN: dst},
        StateStore(str(tmp_path / "state_b.json")),
        detect_evolution=False,
    )
    runner_b = StreamingCdcRunner(
        pipe_b, f"{cf_root}/{FQN}", str(tmp_path / "ckpt_b"), max_files_per_trigger=4
    )
    runner_b.run_available_now()

    def content(t):
        keys = list(table_a.key_columns)
        cols = keys + [f.name for f in base.fields if f.name not in keys]
        return {
            tuple(str(r[c]) for c in cols) for r in t.read().select(*cols).collect()
        }

    assert content(dst) == content(table_a)


def test_compaction_only_range_exports_empty(spark, chain):
    """A range containing only maintenance commits (compact) exports no
    rows but still advances the pointer, so the walk never re-covers it."""
    src, dst, pipe, feed = chain
    src.merge_into(_batch(spark, [(1, "a", 1.0, None, 0), (2, "b", 2.0, None, 0)], 100), epoch_id="e1")
    src.merge_into(_batch(spark, [(1, "a2", 1.5, None, 0)], 200), epoch_id="e2")
    export_changefeed(src, feed, "pub", "downstream", PG_TYPES)
    v1 = exported_version(feed)
    assert not src.compact()["skipped"]
    res = export_changefeed(src, feed, "pub", "downstream", PG_TYPES)
    assert not res["skipped"] and res["files"] == 0
    assert exported_version(feed) == src.current_version() > v1
    _replay(spark, pipe, feed, "c1")
    assert _rows(dst) == _rows(src)
