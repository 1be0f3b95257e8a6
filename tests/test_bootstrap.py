"""Snapshot → stream handoff (modes/bootstrap.py).

A bootstrap taken mid-feed at LSN L (or in chunks at L1 < L2) followed by
a WAL tail from the bookmark floor must converge to the same final state
as a full replay from LSN 0 — the DBLog-style overlap-by-LWW invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tap_postgres_spark.feedgen import (
    FQN,
    PG_TYPES,
    SCHEMA_NAME,
    TABLE_NAME,
    Feed,
    FeedConfig,
    generate_feed,
    oracle_apply,
)
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.modes.bootstrap import bootstrap_snapshot
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

# stars never appears: the bootstrap tests exercise the handoff, not
# evolution (n_numeric_empty injects stars="" regardless of evolution_at)
CFG = FeedConfig(
    n_events=500,
    n_initial_paths=100,
    evolution_at=2.0,
    n_numeric_empty=0,
    seed=7,
)


def _make(spark, tmp_path):
    stream = StreamDef(
        schema_name=SCHEMA_NAME,
        table_name=TABLE_NAME,
        spark_schema=BASE_SCHEMA,
        key_properties=("repo", "path"),
    )
    table = LakeTable.create(
        spark,
        str(tmp_path / "lake" / TABLE_NAME),
        widen_for_cdc(BASE_SCHEMA),
        ["repo", "path"],
        num_buckets=8,
    )
    state = StateStore(str(tmp_path / "state.json"))
    pipeline = CdcPipeline(
        spark,
        [stream],
        {FQN: {k: v for k, v in PG_TYPES.items() if k != "stars"}},
        {FQN: table},
        state,
        detect_evolution=False,
    )
    return stream, table, state, pipeline


def _source_state_at(feed: Feed, lsn: int) -> dict:
    """Source-table contents at WAL position ``lsn`` (what a consistent
    snapshot transaction started at that LSN would read)."""
    trunc = Feed(
        snapshot=feed.snapshot,
        events=[e for e in feed.events if e["lsn"] <= lsn],
        config=feed.config,
    )
    return oracle_apply(trunc)


def _snapshot_df(spark, rows: dict, extra: dict | None = None):
    data = [
        (
            r["repo"], r["path"], r["commit"], r["lang"], r["content"],
            r["tags"], *(extra or {}).get((r["repo"], r["path"]), ()),
        )
        for r in rows.values()
    ]
    schema = "repo string, path string, commit string, lang string, content string, tags array<string>"
    if extra is not None:
        schema += ", cap_lsn long"
    return spark.createDataFrame(data, schema)


def _raw(spark, events):
    return spark.createDataFrame(
        [(e["lsn"], e["txid"], e["payload"]) for e in events],
        "lsn long, txid long, payload string",
    )


def _assert_final(table, feed):
    expected = oracle_apply(feed)
    got = {
        (r["repo"], r["path"]): r
        for r in table.read().collect()
    }
    assert set(got) == set(expected), (
        f"missing={set(expected) - set(got)} extra={set(got) - set(expected)}"
    )
    for key, exp in expected.items():
        g = got[key]
        assert g["content"] == exp["content"], key
        assert g["commit"] == exp["commit"], key
        assert g["lang"] == exp["lang"], key
        assert list(g["tags"] or []) == list(exp["tags"] or []), key


def _event_lsns(feed):
    return sorted(e["lsn"] for e in feed.events if e["_kind"] in ("I", "U", "D"))


def test_bootstrap_midstream_matches_full_replay(spark, tmp_path):
    feed = generate_feed(CFG)
    lsns = _event_lsns(feed)
    snap_lsn = lsns[len(lsns) // 2]  # snapshot taken halfway into the WAL

    stream, table, state, pipeline = _make(spark, tmp_path)
    res = bootstrap_snapshot(
        _snapshot_df(spark, _source_state_at(feed, snap_lsn)),
        stream, table, state, snapshot_lsn=snap_lsn,
    )
    assert res["bookmark"] == snap_lsn
    assert state.bookmark(FQN) == snap_lsn
    # the bookmark floor makes the pre-snapshot prefix a no-op even though
    # the tail replays the WHOLE feed (slot retained from before snapshot)
    pipeline.apply_batch(_raw(spark, feed.events), epoch_id="tail-0")
    _assert_final(table, feed)


def test_bootstrap_chunked_capture_lsns(spark, tmp_path):
    """DBLog-style chunked snapshot: two key-range chunks captured at
    different LSNs, every row stamped with ITS chunk's capture LSN;
    the tail overlap resolves per row via LWW."""
    feed = generate_feed(CFG)
    lsns = _event_lsns(feed)
    l1, l2 = lsns[len(lsns) // 3], lsns[2 * len(lsns) // 3]

    s1 = _source_state_at(feed, l1)
    s2 = _source_state_at(feed, l2)
    half = lambda key: hash(key) % 2  # noqa: E731
    chunk_a = {k: v for k, v in s1.items() if half(k) == 0}
    chunk_b = {k: v for k, v in s2.items() if half(k) == 1}
    merged = {**chunk_a, **chunk_b}
    caps = {k: (l1,) for k in chunk_a} | {k: (l2,) for k in chunk_b}

    stream, table, state, pipeline = _make(spark, tmp_path)
    res = bootstrap_snapshot(
        _snapshot_df(spark, merged, extra=caps),
        stream, table, state, capture_lsn_col="cap_lsn",
    )
    assert res["bookmark"] == l1  # min capture LSN, computed from the column
    pipeline.apply_batch(_raw(spark, feed.events), epoch_id="tail-0")
    _assert_final(table, feed)


def test_bootstrap_idempotent_and_forward_only(spark, tmp_path):
    feed = generate_feed(CFG)
    lsns = _event_lsns(feed)
    snap_lsn = lsns[len(lsns) // 2]
    stream, table, state, pipeline = _make(spark, tmp_path)
    snap = _snapshot_df(spark, _source_state_at(feed, snap_lsn))

    r1 = bootstrap_snapshot(snap, stream, table, state, snapshot_lsn=snap_lsn)
    v1 = table.current_version()
    # crash-replay of the same bootstrap epoch: no new version
    r2 = bootstrap_snapshot(snap, stream, table, state, snapshot_lsn=snap_lsn)
    assert r2["skipped"] and table.current_version() == v1
    # a stale bootstrap with a LOWER lsn cannot regress the bookmark
    bootstrap_snapshot(
        snap, stream, table, state, snapshot_lsn=lsns[0], epoch_id="stale",
    )
    assert state.bookmark(FQN) == snap_lsn


def test_bootstrap_rejects_ambiguous_args(spark, tmp_path):
    feed = generate_feed(CFG)
    stream, table, state, _ = _make(spark, tmp_path)
    snap = _snapshot_df(spark, _source_state_at(feed, 0))
    with pytest.raises(ValueError, match="snapshot_lsn / capture_lsn_col"):
        bootstrap_snapshot(snap, stream, table, state)
    with pytest.raises(ValueError, match="collides"):
        bootstrap_snapshot(
            snap.withColumnRenamed("commit", "cap_lsn"),
            StreamDef(
                schema_name=SCHEMA_NAME,
                table_name=TABLE_NAME,
                spark_schema=T.StructType(
                    [T.StructField("cap_lsn", T.StringType(), True)]
                ),
                key_properties=("cap_lsn",),
            ),
            table, state, capture_lsn_col="cap_lsn",
        )
