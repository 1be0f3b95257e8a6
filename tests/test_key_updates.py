"""Primary-key-changing UPDATEs (decode.py ``key_updates``).

wal2json attaches ``identity`` (the OLD key values) to a U event exactly
when the replica-identity columns changed.  The reference ignores that
field on U events entirely (client.py:556-562), so a key-change UPDATE
leaves a stale ghost row under the old key in any keyed target.  With
``CdcPipeline(key_updates=True)`` the event expands to tombstone(old
key) + upsert(new key) — the Debezium delete+create model — via a
conditional explode that is a 1-element array for every normal event.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tap_postgres_spark.decode import (
    classify,
    decode_stream,
    parse_raw_payloads,
)
from tap_postgres_spark.feedgen import (
    FQN,
    FeedConfig,
    generate_feed,
    oracle_apply,
)

from tests.test_end_to_end import (
    assert_state_matches_oracle,
    load_snapshot,
    make_pipeline,
)
from tests.test_partial_updates import (
    _assert_partial_oracle,
    _raw,
    _replay,
    _stream,
)


def _ku_payload(old_path, new_path, **cols):
    entries = [
        {"name": "repo", "type": "text", "value": "r"},
        {"name": "path", "type": "text", "value": new_path},
    ] + [
        {"name": k, "type": "text", "value": v} for k, v in cols.items()
    ]
    return {
        "action": "U", "schema": "public", "table": "source_code_repos",
        "columns": entries,
        "identity": [
            {"name": "repo", "type": "text", "value": "r"},
            {"name": "path", "type": "text", "value": old_path},
        ],
    }


def test_key_change_update_explodes_to_tombstone_plus_upsert(spark):
    stream = _stream()
    payloads = [_ku_payload("a.py", "b.py", content="X")]
    classified = classify(parse_raw_payloads(_raw(spark, payloads)), [FQN])
    rows = (
        decode_stream(classified, stream, {}, key_updates=True)
        .orderBy("path")
        .collect()
    )
    assert len(rows) == 2
    upsert = next(r for r in rows if r["path"] == "b.py")
    tombstone = next(r for r in rows if r["path"] == "a.py")
    assert upsert["_sdc_deleted_at"] is None
    assert upsert["content"] == "X"
    assert tombstone["_sdc_deleted_at"] is not None
    assert tombstone["content"] is None  # identity carries keys only
    assert upsert["_sdc_lsn"] == tombstone["_sdc_lsn"]


def test_same_key_identity_stays_one_row(spark):
    """REPLICA IDENTITY FULL attaches identity to EVERY U — when the key
    did not change, no tombstone must be synthesized."""
    stream = _stream()
    p = _ku_payload("a.py", "a.py", content="X")  # identity == new key
    classified = classify(parse_raw_payloads(_raw(spark, [p])), [FQN])
    rows = decode_stream(classified, stream, {}, key_updates=True).collect()
    assert len(rows) == 1
    assert rows[0]["_sdc_deleted_at"] is None


def test_without_flag_matches_reference_and_leaves_ghost(spark, tmp_path):
    """Flag off = reference parity (client.py:556-562 ignores identity on
    U): the old key's row survives as a ghost.  Pins why the flag
    exists."""
    feed = generate_feed(
        FeedConfig(n_events=300, n_initial_paths=60, n_key_updates=8)
    )
    pipeline, table, _ = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    _replay(pipeline, spark, feed)
    expected = oracle_apply(feed)  # true PG semantics: old keys popped
    got = {(r["repo"], r["path"]): r for r in table.read().collect()}
    ghosts = set(got) - set(expected)
    assert ghosts, "expected at least one ghost row under an old key"


def test_key_update_feed_matches_oracle(spark, tmp_path):
    feed = generate_feed(
        FeedConfig(n_events=300, n_initial_paths=60, n_key_updates=8)
    )
    pipeline, table, _ = make_pipeline(spark, tmp_path, key_updates=True)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    _replay(pipeline, spark, feed)
    assert_state_matches_oracle(spark, table, feed)


def test_key_updates_compose_with_partial_updates(spark, tmp_path):
    """Renames + TOAST-omitting updates in one feed, both flags on:
    final state equals the per-column oracle (key-change events carry
    full images; the documented honest corner — omission AND key change
    in ONE event — is not generated here)."""
    feed = generate_feed(
        FeedConfig(
            n_events=400,
            n_initial_paths=80,
            toast_omit_prob=0.35,
            n_key_updates=8,
        )
    )
    pipeline, table, _ = make_pipeline(
        spark, tmp_path, key_updates=True, partial_updates=True
    )
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    _replay(pipeline, spark, feed)
    _assert_partial_oracle(table, feed)
