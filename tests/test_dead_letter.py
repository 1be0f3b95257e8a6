"""Dead-letter quarantine: unappliable raw payloads (malformed JSON,
unknown action, unroutable FQN) are preserved for audit instead of only
counted — and the clean-batch path pays zero extra work."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from tap_postgres_spark.feedgen import (
    FQN,
    PG_TYPES,
    SCHEMA_NAME,
    TABLE_NAME,
    FeedConfig,
    generate_feed,
)
from tap_postgres_spark.lake import LakeTable
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


def _make(spark, tmp_path, dead_letter_dir):
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
    return CdcPipeline(
        spark,
        [stream],
        {FQN: {k: v for k, v in PG_TYPES.items() if k != "stars"}},
        {FQN: table},
        StateStore(str(tmp_path / "state.json")),
        detect_evolution=False,
        dead_letter_dir=dead_letter_dir,
    )


def _raw(spark, events):
    return spark.createDataFrame(
        [(e["lsn"], e["txid"], e["payload"]) for e in events],
        "lsn long, txid long, payload string",
    )


def test_dead_letter_captures_quarantine_statuses(spark, tmp_path):
    feed = generate_feed(
        FeedConfig(n_events=300, n_initial_paths=50, evolution_at=2.0,
                   n_numeric_empty=0)
    )
    dl_dir = str(tmp_path / "dead_letter")
    pipeline = _make(spark, tmp_path, dl_dir)
    res = pipeline.apply_batch(_raw(spark, feed.events), epoch_id="b:0")

    c = feed.expected_counts
    expect = c["malformed"] + c["unknown_action"] + c["other_table"]
    assert res["dead_letter"]["rows"] == expect

    dl = spark.read.parquet(res["dead_letter"]["path"])
    assert dl.count() == expect
    reasons = {r["reason"] for r in dl.select("reason").distinct().collect()}
    assert reasons == {"malformed", "unknown_action", "unroutable"}
    # quarantined payloads are byte-identical to the input (replayable)
    inputs = {e["payload"] for e in feed.events}
    assert all(r["payload"] in inputs for r in dl.collect())
    # the epoch path is filesystem-safe despite ':' in the epoch id
    assert "epoch=b_0" in res["dead_letter"]["path"]


def test_dead_letter_clean_batch_writes_nothing(spark, tmp_path):
    feed = generate_feed(
        FeedConfig(
            n_events=120, n_initial_paths=30, evolution_at=2.0,
            n_malformed=0, n_unknown_action=0, n_other_table=0,
            n_numeric_empty=0,
        )
    )
    dl_dir = str(tmp_path / "dead_letter")
    pipeline = _make(spark, tmp_path, dl_dir)
    res = pipeline.apply_batch(_raw(spark, feed.events), epoch_id="clean-0")
    assert res["dead_letter"] is None
    assert not os.path.exists(dl_dir)


def test_dead_letter_crash_replay_idempotent(spark, tmp_path):
    feed = generate_feed(
        FeedConfig(n_events=200, n_initial_paths=40, evolution_at=2.0,
                   n_numeric_empty=0)
    )
    dl_dir = str(tmp_path / "dead_letter")
    pipeline = _make(spark, tmp_path, dl_dir)
    r1 = pipeline.apply_batch(_raw(spark, feed.events), epoch_id="b-0")
    n1 = spark.read.parquet(r1["dead_letter"]["path"]).count()
    # same epoch replayed after a crash: merges are epoch-deduped no-ops,
    # the quarantine overwrite converges to the same contents
    r2 = pipeline.apply_batch(_raw(spark, feed.events), epoch_id="b-0")
    assert r2["dead_letter"]["rows"] == r1["dead_letter"]["rows"]
    assert spark.read.parquet(r2["dead_letter"]["path"]).count() == n1


def test_replay_dead_letters_after_fix(spark, tmp_path):
    """The recovery half of the quarantine contract: fix a quarantined
    payload, replay the dead-letter dir under a fresh epoch, and the
    row lands; still-broken rows re-quarantine without duplication."""
    import json as _json

    dl_dir = str(tmp_path / "dead_letter")
    pipeline = _make(spark, tmp_path, dl_dir)
    good = _json.dumps({
        "action": "I", "schema": SCHEMA_NAME, "table": TABLE_NAME,
        "columns": [
            {"name": "repo", "type": "text", "value": "rX"},
            {"name": "path", "type": "text", "value": "pX"},
            {"name": "commit", "type": "text", "value": "c1"},
            {"name": "lang", "type": "text", "value": "py"},
            {"name": "content", "type": "text", "value": "fixed!"},
        ],
    })
    broken = good[:-5]  # truncated JSON → malformed
    rows = [(100, 1, broken), (101, 1, "{not json at all")]
    res = pipeline.apply_batch(_raw_payloads(spark, rows), epoch_id="b0")
    assert res["dead_letter"]["rows"] == 2
    table = list(pipeline.tables.values())[0]
    assert table.read().filter("repo = 'rX'").count() == 0

    # operator fixes ONE payload in the quarantine dir, leaves the other
    dl_path = res["dead_letter"]["path"]
    fixed = spark.createDataFrame(
        [(100, 1, good, "malformed"), (101, 1, "{not json at all", "malformed")],
        "lsn long, txid long, payload string, reason string",
    )
    fixed.write.mode("overwrite").parquet(dl_path)

    res2 = pipeline.replay_dead_letters(dl_path, epoch_id="dl-retry-1")
    got = table.read().filter("repo = 'rX'").collect()
    assert len(got) == 1 and got[0]["content"] == "fixed!"
    # the still-broken row re-quarantined under the new epoch
    assert res2["dead_letter"]["rows"] == 1
    # replaying the same epoch again is a no-op (epoch guard)
    v = table.current_version()
    res3 = pipeline.replay_dead_letters(dl_path, epoch_id="dl-retry-1")
    assert table.current_version() == v


def _raw_payloads(spark, rows):
    return spark.createDataFrame(rows, "lsn long, txid long, payload string")
