"""Live logical-replication source: walsender → LSN-ordered feed parquet.

The reference's flagship I/O path is a single ``LogicalReplicationConnection``
reading wal2json messages and emitting Singer RECORDs row-at-a-time inline
(reference wal_reader.py:31-192, client.py:341-451) — parse, coerce, and
serialize all happen on that one thread, which is the ~10-20k ev/s ceiling
BASELINE.md documents.

This module keeps ONLY the part of that job that is physically
single-connection (PostgreSQL serves one walsender per slot) and moves
everything else into Spark:

- :class:`ReplicationFeedWriter` is a deliberately *parse-free* byte
  mover: each wal2json message becomes one ``(lsn, txid, payload)`` row
  appended to an LSN-ordered parquet feed file.  No JSON parse, no value
  coercion, no routing — the only per-message Python work is a buffer
  append plus a cheap regex peek at transaction markers for the xid.
  All decoding/coercion/routing runs distributed in ``decode.py`` /
  ``modes/log_based.py`` exactly as for the synthetic feed, so a live
  slot and the test feed exercise the *same* engine.
- Slot feedback (``send_feedback(flush_lsn=…)``, reference
  wal_reader.py:227-232, 307-344) advances only to the last COMMIT
  boundary that is durably on disk: wal2json (non-streaming mode) emits
  whole transactions after commit, so restarting from a flushed commit
  boundary can only re-send transactions whose rows may already be in
  the feed — at-least-once at the file layer, made exactly-once by the
  downstream idempotent MERGE + epoch dedup (lake/table.py).
- Run bounds mirror the reference: a hard ``max_run_seconds`` budget and
  an ``idle_exit_seconds`` early-out (wal_reader.py:210-257).

The connection itself is opened by :func:`open_replication_cursor`
(psycopg2 ``LogicalReplicationConnection``, import-gated: the sandbox
ships no psycopg2/PostgreSQL).  Everything below the connection is
tested against recorded protocol traffic — any object with
``read_message()`` / ``send_feedback(flush_lsn=)`` duck-types as the
cursor (tests/test_replication_source.py replays feedgen-derived
traces), the same record-the-wire strategy as tests/test_jdbc_discovery.

Live-PG recipe (documented, not runnable in this sandbox)::

    SELECT pg_create_logical_replication_slot('tps_slot', 'wal2json');
    python tools/run_wal_reader.py \
        "host=db port=5432 dbname=app user=rep password=…" \
        tps_slot /data/feed public.source_code_repos
    # then the standard replay job over the same feed dir:
    spark-submit tools/submit_replay.py /data/feed …
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

# ---------------------------------------------------------------------------
# Slot-name + add-tables plumbing (reference _wal_helpers.py:39-66,
# tests/test_slot_name.py:21-29)
# ---------------------------------------------------------------------------

# PostgreSQL replication slot names: lowercase letters, digits, and
# underscore only, 1..63 bytes (NAMEDATALEN-1).
_SLOT_NAME_RE = re.compile(r"^[a-z0-9_]{1,63}$")


def validate_slot_name(name: str) -> str:
    """Validate a replication slot name against PostgreSQL's rules.

    Mirrors the reference's config-time validation
    (tests/test_slot_name.py:21-29): lowercase letters, digits and
    underscores, at most 63 characters.  Returns the name so callers can
    validate inline; raises ``ValueError`` otherwise.
    """
    if not _SLOT_NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid replication slot name {name!r}: must match [a-z0-9_]{{1,63}}"
        )
    return name


def escape_for_add_tables(identifier: str) -> str:
    """Escape one identifier for wal2json's ``add-tables`` option.

    Backslash is the escape character; ``,`` and ``.`` separate entries,
    so all three must be escaped (reference _wal_helpers.py:39-50;
    wal2json README "parameters").
    """
    return identifier.replace("\\", "\\\\").replace(",", "\\,").replace(".", "\\.")


def build_add_tables_option(fqn_pairs: Iterable[tuple[str, str]]) -> str:
    """``[(schema, table), …]`` → the wal2json ``add-tables`` value
    (reference _wal_helpers.py:53-66)."""
    return ",".join(
        f"{escape_for_add_tables(s)}.{escape_for_add_tables(t)}"
        for s, t in fqn_pairs
    )


# ---------------------------------------------------------------------------
# Reader configuration + resume state
# ---------------------------------------------------------------------------


@dataclass
class ReaderConfig:
    """Knobs for one reader run (reference wal_reader.py:56-93 analog)."""

    slot_name: str
    tables: list[tuple[str, str]] = field(default_factory=list)
    start_lsn: int = 0
    max_run_seconds: float = 300.0
    idle_exit_seconds: float = 10.0
    # feed-file batching: flush when this many messages are buffered …
    flush_messages: int = 50_000
    # … or when the buffer is non-empty and this much time has passed
    # since the last flush (keeps end-to-end latency bounded when the
    # change rate is low)
    flush_seconds: float = 5.0
    status_interval: int = 10  # walsender keep-alive cadence (seconds)

    def __post_init__(self) -> None:
        validate_slot_name(self.slot_name)


_STATE_FILE = "_reader_state.json"


def read_reader_state(feed_dir: str) -> dict[str, int]:
    """Resume point for a feed dir: highest durably-flushed commit LSN and
    the next file sequence number.  ``{"flushed_lsn": 0, "file_seq": 0}``
    for a fresh dir."""
    path = os.path.join(feed_dir, _STATE_FILE)
    if not os.path.exists(path):
        return {"flushed_lsn": 0, "file_seq": 0}
    with open(path) as f:
        return json.load(f)


# xid peek on transaction-marker payloads — the ONLY content inspection
# the reader does.  wal2json format-version 2 emits {"action":"B"|"C",
# "xid":N} markers (include-transaction + include-xids); data rows
# between a B and its C belong to that xid.
_XID_RE = re.compile(rb'"xid"\s*:\s*(\d+)')
_ACTION_B = rb'"action"\s*:\s*"B"'
_ACTION_C = rb'"action"\s*:\s*"C"'
_B_RE = re.compile(_ACTION_B)
_C_RE = re.compile(_ACTION_C)
# markers are tiny; skip the regex entirely for payloads that can't be one
_MARKER_MAX_LEN = 256


class ReplicationFeedWriter:
    """Consume a replication cursor into LSN-ordered parquet feed files.

    ``cursor`` duck-types psycopg2's ``ReplicationCursor``: it must
    provide ``read_message() -> msg | None`` where ``msg`` has
    ``.payload`` (str or bytes) and ``.data_start`` (int LSN), and
    ``send_feedback(flush_lsn=int)``.  ``wait`` is called with a timeout
    when no message is available and returns True if data may be ready
    (defaults to ``select.select`` on the cursor — the psycopg2 shape,
    reference wal_reader.py:242-247); inject a fake for recorded traces.

    Feed rows are ``(lsn, txid, payload)`` with ``txid`` = the xid of the
    enclosing B…C transaction (NULL outside one — such rows apply
    immediately, the modes/txn.py standalone contract).
    """

    def __init__(
        self,
        cursor: Any,
        feed_dir: str,
        config: ReaderConfig,
        *,
        wait: Callable[[float], bool] | None = None,
        clock: Callable[[], float] = time.monotonic,
        select_timeout: float = 1.0,
    ) -> None:
        self.cursor = cursor
        self.feed_dir = feed_dir
        self.config = config
        self._clock = clock
        self._select_timeout = select_timeout
        self._wait = wait if wait is not None else self._select_wait

        os.makedirs(feed_dir, exist_ok=True)
        state = read_reader_state(feed_dir)
        self._file_seq = int(state["file_seq"])
        self._flushed_lsn = int(state["flushed_lsn"])

        # in-flight buffer (column-wise, append-only)
        self._lsns: list[int] = []
        self._txids: list[int | None] = []
        self._payloads: list[str] = []
        # last COMMIT boundary lsn seen (feedback never passes this)
        self._last_commit_lsn = 0
        # last commit boundary that is durably inside a written file
        self._flushed_commit_lsn = self._flushed_lsn
        self._open_xid: int | None = None

        self.stats: dict[str, Any] = {
            "messages": 0,
            "commits": 0,
            "files": 0,
            "max_lsn_seen": 0,
            "exit_reason": None,
        }

    # -- wiring -------------------------------------------------------------

    def _select_wait(self, timeout: float) -> bool:
        if not hasattr(self.cursor, "fileno"):
            return False  # recorded-trace cursors have no socket
        import select

        try:
            return bool(select.select([self.cursor], [], [], timeout)[0])
        except InterruptedError:
            return True

    # -- the loop -----------------------------------------------------------

    def run(self) -> dict[str, Any]:
        """Read until idle or the time budget expires; return stats.

        Loop shape mirrors reference wal_reader.py:194-257 — hard
        ``max_run_seconds`` budget, ``idle_exit_seconds`` early-out when
        the backlog is drained — but the body is an O(1) buffer append
        instead of parse+emit."""
        cfg = self.config
        start = self._clock()
        last_data = start
        last_flush = start

        while True:
            now = self._clock()
            if now - start > cfg.max_run_seconds:
                self.stats["exit_reason"] = "max_run_seconds"
                break

            msg = self.cursor.read_message()
            if msg is not None:
                last_data = self._clock()
                self._ingest(msg)
                if len(self._lsns) >= cfg.flush_messages:
                    self._flush()
                    last_flush = self._clock()
                continue

            # nothing buffered on the connection: time-based flush, then
            # block briefly and check the idle exit
            if self._lsns and self._clock() - last_flush >= cfg.flush_seconds:
                self._flush()
                last_flush = self._clock()
            if not self._wait(self._select_timeout):
                if self._clock() - last_data >= cfg.idle_exit_seconds:
                    self.stats["exit_reason"] = "idle"
                    break

        self._flush()
        return dict(self.stats)

    # -- message ingestion ----------------------------------------------------

    def _ingest(self, msg: Any) -> None:
        payload = msg.payload
        raw = payload if isinstance(payload, bytes) else payload.encode()
        lsn = int(msg.data_start)

        # txid assignment: markers carry their own xid (wal2json emits it
        # on both B and C with include-xids); data rows inherit the open
        # B's xid; rows outside any transaction get NULL (= standalone
        # auto-commit, the modes/txn.py contract)
        txid = self._open_xid
        if len(raw) <= _MARKER_MAX_LEN:
            if _B_RE.search(raw):
                m = _XID_RE.search(raw)
                txid = self._open_xid = int(m.group(1)) if m else None
            elif _C_RE.search(raw):
                m = _XID_RE.search(raw)
                txid = int(m.group(1)) if m else self._open_xid
                self._open_xid = None
                self._last_commit_lsn = lsn
                self.stats["commits"] += 1

        self._lsns.append(lsn)
        self._txids.append(txid)
        self._payloads.append(raw.decode())

        self.stats["messages"] += 1
        if lsn > self.stats["max_lsn_seen"]:
            self.stats["max_lsn_seen"] = lsn

    # -- durability -----------------------------------------------------------

    def _flush(self) -> None:
        """Write the buffer as one feed parquet file (atomic rename), then
        advance slot feedback to the last durably-written commit boundary.

        File names embed (sequence, first-lsn) zero-padded so lexical
        filename order == LSN order — the contract Spark's file stream
        source relies on (feedgen.write_feed documents the same)."""
        if not self._lsns:
            # even with nothing new, push feedback if a commit boundary
            # from an earlier flush hasn't been acknowledged yet
            self._send_feedback()
            return

        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"feed-{self._file_seq:08d}-{self._lsns[0]:016d}.parquet"
        tmp = os.path.join(self.feed_dir, f"._tmp.{name}")
        tbl = pa.table(
            {
                "lsn": pa.array(self._lsns, pa.int64()),
                "txid": pa.array(self._txids, pa.int64()),
                "payload": pa.array(self._payloads, pa.string()),
            }
        )
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(self.feed_dir, name))
        self._file_seq += 1
        self.stats["files"] += 1
        self._lsns, self._txids, self._payloads = [], [], []

        # every commit boundary seen so far is now durably on disk
        self._flushed_commit_lsn = max(
            self._flushed_commit_lsn, self._last_commit_lsn
        )
        self._write_state()
        self._send_feedback()

    def _write_state(self) -> None:
        path = os.path.join(self.feed_dir, _STATE_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"flushed_lsn": self._flushed_commit_lsn, "file_seq": self._file_seq},
                f,
            )
        os.replace(tmp, path)

    def _send_feedback(self) -> None:
        """Advance the slot's flush position to the last commit boundary
        that is durably inside a feed file — never further (reference
        wal_reader.py:307-344 advances analogously, but to its in-memory
        max; here durability gates the advance, so a reader crash can
        only re-send, never skip)."""
        if self._flushed_commit_lsn <= self._flushed_lsn:
            return
        try:
            self.cursor.send_feedback(flush_lsn=self._flushed_commit_lsn)
        except Exception:
            return  # transient; retried on the next flush
        self._flushed_lsn = self._flushed_commit_lsn


# ---------------------------------------------------------------------------
# Live connection (import-gated; the sandbox has no psycopg2/PostgreSQL)
# ---------------------------------------------------------------------------


def open_replication_cursor(
    dsn: str,
    config: ReaderConfig,
):
    """Open a psycopg2 ``LogicalReplicationConnection`` and start
    replication on the slot (reference wal_reader.py:149-166,
    client.py:341-451): wal2json format-version 2, transaction markers
    ON (``include-transaction`` + ``include-xids`` — the feed's txid
    column and modes/txn.py's atomic apply consume them), server-side
    table filter via ``add-tables``.

    Returns ``(connection, cursor)``; the caller owns both.  Raises
    ``ImportError`` with install guidance when psycopg2 is absent.
    """
    try:
        import psycopg2
        from psycopg2 import extras
    except ImportError as exc:  # pragma: no cover - absent in sandbox
        raise ImportError(
            "psycopg2 is required for the live replication source; "
            "pip install psycopg2-binary (the rest of the engine runs "
            "without it — feed-parquet replay has no PG dependency)"
        ) from exc

    conn = psycopg2.connect(
        dsn, connection_factory=extras.LogicalReplicationConnection
    )
    cursor = conn.cursor()
    cursor.send_feedback(flush_lsn=config.start_lsn)
    cursor.start_replication(
        slot_name=config.slot_name,
        decode=True,
        start_lsn=config.start_lsn,
        status_interval=config.status_interval,
        options={
            "format-version": 2,
            "include-transaction": True,
            "include-xids": True,
            "add-tables": build_add_tables_option(config.tables),
        },
    )
    return conn, cursor


def run_replication_feed(
    dsn: str,
    feed_dir: str,
    config: ReaderConfig,
) -> dict[str, Any]:
    """One live reader run: connect, resume from the feed dir's durable
    state, stream into feed parquet, return stats.  The downstream replay
    job (tools/submit_replay.py) consumes the same directory."""
    resume = read_reader_state(feed_dir)
    if resume["flushed_lsn"] > config.start_lsn:
        config = ReaderConfig(**{**config.__dict__, "start_lsn": resume["flushed_lsn"]})
    conn, cursor = open_replication_cursor(dsn, config)
    try:
        return ReplicationFeedWriter(cursor, feed_dir, config).run()
    finally:
        cursor.close()
        conn.close()
