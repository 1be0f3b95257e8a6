"""Production-config end-to-end drill: EVERY opt-in pipeline feature at
once — txn-boundary atomicity, cross-table snapshots, auto-compaction +
retention, dead-letter quarantine — through the streaming runner with a
mid-stream crash.  Pins that the features compose: the final state still
matches the row-at-a-time oracle, every published snapshot stays
readable inside the retention window, and replay stays exactly-once."""

from __future__ import annotations

from tap_postgres_spark.feedgen import (
    FQN,
    FeedConfig,
    generate_feed,
    wrap_transactions,
    write_feed,
)
from tap_postgres_spark.lake.snapshots import PipelineSnapshots
from tap_postgres_spark.streaming import StreamingCdcRunner
from tests.test_end_to_end import (
    assert_state_matches_oracle,
    load_snapshot,
    make_pipeline,
)


def test_full_production_config_with_crash(spark, tmp_path):
    feed = wrap_transactions(
        generate_feed(
            FeedConfig(n_events=400, n_initial_paths=80, n_feed_files=8)
        )
    )
    pipeline, table, state = make_pipeline(
        spark,
        tmp_path,
        txn_boundary_dir=str(tmp_path / "txn"),
        snapshots_dir=str(tmp_path / "snaps"),
        changefeed_dir=str(tmp_path / "cf"),
        dead_letter_dir=str(tmp_path / "dl"),
        auto_compact_depth=2,
        full_compact_every=2,
        retention_keep_last=6,
    )
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)

    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    runner.run_available_now(fail_after_batches=3)  # crash mid-stream
    snaps = PipelineSnapshots(spark, str(tmp_path / "snaps"))
    mid = snaps.latest()
    assert mid is not None  # crashed run still published whole epochs
    runner.run_available_now()  # resume from the checkpoint

    # 1. final state: row-at-a-time oracle equality (txn split + crash
    #    + compaction + retention changed nothing about the contract)
    assert_state_matches_oracle(spark, table, feed)

    # 2. the latest snapshot IS the head (published after the last epoch)
    last = snaps.latest()
    assert last["tables"][FQN]["version"] == table.current_version()
    head_n = table.read().count()
    assert snaps.read(FQN).count() == head_n

    # 3. every retained manifest is readable — retention expired only
    #    versions no live manifest pins after snaps.expire() aligns the
    #    horizons (manifests older than the table floor raise, which is
    #    why the horizons must be kept aligned)
    snaps.expire(keep_last=3)
    for m in snaps.history():
        assert snaps.read(FQN, seq=m["seq"]).count() >= 0

    # 4. txn accounting: the drained feed ends with nothing pending and
    #    markers counted exactly once across crash + resume
    assert runner.batch_results[-1]["txn"]["deferred"] == 0
    # runner.batch_results spans crash + resume, but a batch REPLAYED
    # after the crash appears twice there; the per-epoch metrics docs
    # are keyed by epoch id (replays overwrite their own doc), so they
    # are the authoritative exactly-once count
    import json as _json
    import os as _os

    mdir = str(tmp_path / "metrics")
    total_markers = 0
    for name in _os.listdir(mdir):
        with open(_os.path.join(mdir, name)) as f:
            doc = _json.load(f)
        total_markers += sum(
            c["n"] for c in doc["counts"] if c["_status"] == "txn_marker"
        )
    assert total_markers == feed.expected_counts["txn_marker"]

    # 5. bookmark advanced to the feed tip
    assert state.bookmark(FQN) == max(e["lsn"] for e in feed.events)

    # 6. the live changefeed relay kept up: replaying the exported feed
    #    into a FRESH pipeline reproduces the table (fan-out composes
    #    with txn atomicity + compaction + retention + crash-resume)
    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.lake.changefeed import exported_version
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.schema import StreamDef, widen_for_cdc
    from tap_postgres_spark.state import StateStore
    from pyspark.sql import types as T

    assert exported_version(str(tmp_path / "cf" / FQN)) == table.current_version()
    base = T.StructType(
        [f for f in table.schema.fields if not f.name.startswith("_sdc")]
    )
    dst = LakeTable.create(
        spark, str(tmp_path / "relay"), widen_for_cdc(base),
        list(table.key_columns), num_buckets=4,
    )
    sname, tname = FQN.split(".", 1)
    pipe_b = CdcPipeline(
        spark,
        [StreamDef(sname, tname, base, tuple(table.key_columns))],
        {FQN: {f.name: "text" for f in base.fields}},
        {FQN: dst},
        StateStore(str(tmp_path / "state_b.json")),
        detect_evolution=False,
    )
    pipe_b.apply_batch(
        spark.read.schema("lsn long, txid long, payload string")
        .parquet(str(tmp_path / "cf" / FQN)),
        epoch_id="relay",
    )
    assert dst.read().count() == head_n
