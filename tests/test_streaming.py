"""Structured-Streaming runner tests: drain-and-stop replay, checkpoint
resume after an injected crash, and exactly-once across the restart.

Mirrors the reference's idle-exit / timeout-exit advance semantics
(tests/test_wal_reader.py:408-442) — with Spark's offset log, "never
advance past unread WAL" holds by construction; these tests pin the rest:
identical final state regardless of where the run was interrupted.
"""

from __future__ import annotations

import pytest

from tap_postgres_spark.feedgen import FQN, FeedConfig, generate_feed, write_feed
from tap_postgres_spark.streaming import StreamingCdcRunner
from tests.test_end_to_end import (
    assert_state_matches_oracle,
    load_snapshot,
    make_pipeline,
)


@pytest.fixture()
def feed():
    return generate_feed(FeedConfig(n_events=400, n_initial_paths=80, n_feed_files=8))


def test_streaming_replay_matches_oracle(spark, tmp_path, feed):
    pipeline, table, state = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)

    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    results = runner.run_available_now()
    assert len(results) >= 3  # several micro-batches
    assert_state_matches_oracle(spark, table, feed)
    assert state.bookmark(FQN) == max(e["lsn"] for e in feed.events)


def test_tailing_picks_up_new_files(spark, tmp_path, feed):
    """run_tailing (processingTime trigger) applies files that arrive
    while the query is live — the reference's long-poll loop analog."""
    import os
    import shutil

    pipeline, table, _ = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    staged = str(tmp_path / "staged")
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir, exist_ok=True)
    write_feed(feed, staged)
    files = sorted(os.listdir(staged))
    # half the feed present at start
    for f in files[: len(files) // 2]:
        shutil.copy(os.path.join(staged, f), os.path.join(feed_dir, f))

    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=4
    )
    runner.run_tailing(processing_time="1 seconds")
    n_first = len(runner.batch_results)
    # rest of the feed "arrives"; tail again on the same checkpoint
    for f in files[len(files) // 2 :]:
        shutil.copy(os.path.join(staged, f), os.path.join(feed_dir, f))
    runner.run_tailing(processing_time="1 seconds")
    assert len(runner.batch_results) > n_first
    pipeline.advance_to_tip(max(e["lsn"] for e in feed.events))
    assert_state_matches_oracle(spark, table, feed)


def test_crash_resume_from_checkpoint(spark, tmp_path, feed):
    """Kill the query mid-stream; restart must resume from the checkpoint
    and converge to the identical oracle state (exactly-once end to end)."""
    pipeline, table, _ = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)

    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    runner.run_available_now(fail_after_batches=3)
    n_first = len(runner.batch_results)
    assert n_first == 3  # crashed mid-stream
    # restart: resumes at the first uncommitted batch
    runner.run_available_now()
    assert_state_matches_oracle(spark, table, feed)


def test_replayed_batch_after_crash_is_deduped(spark, tmp_path, feed):
    """Crash BETWEEN sink commit and checkpoint commit: the sink applied
    batch N but Spark replays it on restart — the epoch guard must no-op."""
    pipeline, table, _ = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)

    # crash *after* the sink commit of batch 2 by raising inside foreachBatch
    # post-apply: simulate by failing after 2 results, then check versions
    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )

    orig = runner._foreach_batch
    crashed = {"done": False}

    def crashing_fb(df, bid):
        orig(df, bid)  # sink commit happens
        if bid == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("crash after sink commit, before offset commit")

    runner._foreach_batch = crashing_fb
    try:
        runner.run_available_now()
    except Exception:
        pass
    versions_after_crash = table.current_version()
    runner._foreach_batch = orig
    runner.run_available_now()
    # batch 1 was replayed by Spark but merged exactly once
    skipped = [
        r
        for res in runner.batch_results
        for r in res["streams"].values()
        if r.get("skipped")
    ]
    assert len(skipped) >= 1
    assert_state_matches_oracle(spark, table, feed)
