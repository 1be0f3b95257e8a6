"""Live-replication source over recorded walsender traffic.

The sandbox ships no PostgreSQL/psycopg2, so these tests drive
:class:`ReplicationFeedWriter` with recorded protocol messages — the
same record-the-wire strategy test_jdbc_discovery.py uses for
information_schema.  The trace is derived from feedgen's transaction-
wrapped feed, i.e. exactly the wal2json commit-order contract
(reference wal_reader.py:194-305 consumes the live equivalent).
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from tap_postgres_spark.feedgen import FeedConfig, generate_feed, wrap_transactions
from tap_postgres_spark.sources.replication import (
    ReaderConfig,
    ReplicationFeedWriter,
    build_add_tables_option,
    escape_for_add_tables,
    read_reader_state,
    validate_slot_name,
)


class Msg:
    """Recorded replication message (psycopg2 ReplicationMessage shape)."""

    def __init__(self, payload: str, data_start: int):
        self.payload = payload
        self.data_start = data_start


class FakeCursor:
    """Replays a recorded message list; records send_feedback calls."""

    def __init__(self, messages):
        self._messages = list(messages)
        self.feedback = []

    def read_message(self):
        return self._messages.pop(0) if self._messages else None

    def send_feedback(self, flush_lsn):
        self.feedback.append(flush_lsn)


def _trace(events):
    """feedgen events → recorded wire messages.  Marker payloads gain the
    xid field wal2json emits with include-xids (feedgen's replay path
    reads txid from the feed column instead, so its markers omit it)."""
    msgs = []
    for e in events:
        payload = e["payload"]
        if e["_kind"] == "txn_marker":
            d = json.loads(payload)
            if d.get("action") in ("B", "C"):
                d["xid"] = e["txid"]
                payload = json.dumps(d)
        msgs.append(Msg(payload, e["lsn"]))
    return msgs


def _read_feed(feed_dir):
    import glob

    rows = []
    for f in sorted(glob.glob(f"{feed_dir}/feed-*.parquet")):
        t = pq.read_table(f)
        rows.extend(zip(*(t.column(c).to_pylist() for c in ("lsn", "txid", "payload"))))
    return rows


@pytest.fixture(scope="module")
def wrapped():
    return wrap_transactions(
        generate_feed(FeedConfig(n_events=300, n_initial_paths=40))
    )


def _cfg(**kw):
    base = dict(
        slot_name="tps_slot",
        tables=[("public", "source_code_repos")],
        max_run_seconds=60,
        idle_exit_seconds=0.0,  # recorded trace: exit as soon as drained
        flush_messages=100,
        flush_seconds=0.0,
    )
    base.update(kw)
    return ReaderConfig(**base)


def test_trace_reproduces_feed_rows_byte_identical(tmp_path, wrapped):
    """Every wire message becomes one (lsn, txid, payload) feed row:
    payload bytes unchanged, lsn = data_start, txid = enclosing B..C
    transaction's xid (tracked from the markers, no JSON parse)."""
    msgs = _trace(wrapped.events)
    cur = FakeCursor(msgs)
    writer = ReplicationFeedWriter(cur, str(tmp_path / "feed"), _cfg())
    stats = writer.run()

    got = _read_feed(str(tmp_path / "feed"))
    # lsn = data_start, payload = wire bytes unchanged, txid = the value
    # feedgen assigned (the reader re-derives it from the markers alone)
    expected = [
        (e["lsn"], e["txid"], m.payload)
        for e, m in zip(wrapped.events, msgs)
    ]
    assert got == expected
    assert stats["messages"] == len(msgs)
    assert stats["exit_reason"] == "idle"
    assert stats["files"] >= 2  # flush_messages=100 < |trace| → multiple files


def test_rows_outside_transactions_get_null_txid(tmp_path):
    msgs = [
        Msg(json.dumps({"action": "I", "schema": "public", "table": "t",
                        "columns": [{"name": "k", "value": 1}]}), 50),
        Msg(json.dumps({"action": "B", "xid": 9}), 60),
        Msg(json.dumps({"action": "I", "schema": "public", "table": "t",
                        "columns": [{"name": "k", "value": 2}]}), 61),
        Msg(json.dumps({"action": "C", "xid": 9}), 62),
    ]
    w = ReplicationFeedWriter(FakeCursor(msgs), str(tmp_path / "f"), _cfg())
    w.run()
    rows = _read_feed(str(tmp_path / "f"))
    assert [r[1] for r in rows] == [None, 9, 9, 9]


def test_feedback_only_advances_to_durable_commit_boundary(tmp_path):
    """A trailing open transaction (B + rows, no C) must never advance
    the slot past the last C — restart re-sends the open txn whole."""
    msgs = [
        Msg(json.dumps({"action": "B", "xid": 5}), 100),
        Msg(json.dumps({"action": "I", "columns": []}), 101),
        Msg(json.dumps({"action": "C", "xid": 5}), 102),
        Msg(json.dumps({"action": "B", "xid": 6}), 110),
        Msg(json.dumps({"action": "I", "columns": []}), 111),
        # no C for xid 6 (crash before commit relay)
    ]
    cur = FakeCursor(msgs)
    w = ReplicationFeedWriter(cur, str(tmp_path / "f"), _cfg())
    w.run()
    assert cur.feedback and cur.feedback[-1] == 102
    assert read_reader_state(str(tmp_path / "f"))["flushed_lsn"] == 102


def test_resume_continues_file_sequence(tmp_path, wrapped):
    feed = str(tmp_path / "feed")
    msgs = _trace(wrapped.events)
    half = len(msgs) // 2
    ReplicationFeedWriter(FakeCursor(msgs[:half]), feed, _cfg()).run()
    seq_after_first = read_reader_state(feed)["file_seq"]
    ReplicationFeedWriter(FakeCursor(msgs[half:]), feed, _cfg()).run()
    state = read_reader_state(feed)
    assert state["file_seq"] > seq_after_first
    # lexical filename order == LSN order across BOTH runs
    rows = _read_feed(feed)
    assert [r[0] for r in rows] == sorted(r[0] for r in rows)
    assert len(rows) == len(msgs)


def test_max_run_seconds_budget(tmp_path):
    """Clock injection: the loop exits on budget even with endless data."""

    class EndlessCursor(FakeCursor):
        def read_message(self):
            return Msg(json.dumps({"action": "I", "columns": []}), 1)

    t = [0.0]

    def clock():
        t[0] += 0.5
        return t[0]

    w = ReplicationFeedWriter(
        EndlessCursor([]), str(tmp_path / "f"),
        _cfg(max_run_seconds=10), clock=clock,
    )
    stats = w.run()
    assert stats["exit_reason"] == "max_run_seconds"
    assert stats["messages"] > 0


def test_slot_name_validation():
    """Reference tests/test_slot_name.py:21-29 parity."""
    assert validate_slot_name("tps_slot_01") == "tps_slot_01"
    for bad in ("", "UPPER", "has-dash", "has.dot", "x" * 64, "späce"):
        with pytest.raises(ValueError):
            validate_slot_name(bad)
    with pytest.raises(ValueError):
        ReaderConfig(slot_name="Bad-Name")


def test_add_tables_escaping():
    """Reference _wal_helpers.py:39-66 semantics: backslash doubles,
    comma and dot escape (closes SURVEY §2 F7)."""
    assert escape_for_add_tables(r"a\b") == r"a\\b"
    assert escape_for_add_tables("a,b") == r"a\,b"
    assert escape_for_add_tables("a.b") == r"a\.b"
    assert (
        build_add_tables_option([("public", "users"), ("public", "orders")])
        == "public.users,public.orders"
    )
    assert (
        build_add_tables_option([("we,ird", "ta.ble")])
        == r"we\,ird.ta\.ble"
    )


def test_reader_feed_replays_to_oracle_state(spark, tmp_path, wrapped):
    """End-to-end: recorded wire traffic → reader feed parquet → the
    standard CDC replay → final table equals the row-at-a-time oracle.
    Proves a live slot and the synthetic feed drive the SAME engine."""
    from tap_postgres_spark.feedgen import (
        FQN, PG_TYPES, SCHEMA_NAME, TABLE_NAME, oracle_apply,
    )
    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.schema import StreamDef, widen_for_cdc
    from tap_postgres_spark.state import StateStore
    from tap_postgres_spark.streaming import StreamingCdcRunner
    from pyspark.sql import types as T

    feed = str(tmp_path / "feed")
    ReplicationFeedWriter(FakeCursor(_trace(wrapped.events)), feed, _cfg()).run()

    base = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField("stars", T.IntegerType(), True),
        ]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), widen_for_cdc(base),
        ["repo", "path"], num_buckets=4,
    )
    pipe = CdcPipeline(
        spark,
        [StreamDef(SCHEMA_NAME, TABLE_NAME, base, ("repo", "path"))],
        {FQN: PG_TYPES},
        {FQN: table},
        StateStore(str(tmp_path / "state.json")),
        detect_evolution=False,
        txn_boundary_dir=str(tmp_path / "txn"),
    )
    StreamingCdcRunner(
        pipe, feed, str(tmp_path / "ckpt"), max_files_per_trigger=4
    ).run_available_now()

    expected = oracle_apply(wrapped)  # deleted keys are absent
    live = {
        (r["repo"], r["path"]): r["commit"]
        for r in table.read().where("_sdc_deleted_at is null").collect()
    }
    assert live == {k: v["commit"] for k, v in expected.items()}
