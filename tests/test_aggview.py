"""Incremental aggregate views (lake/aggview.py): delta-maintained
GROUP BY equals a full recompute of the base head after every refresh,
under inserts, updates, deletes, group migrations, NULL groups and NULL
inputs — including across compaction and no-op ranges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.aggview import (
    Agg,
    bootstrap_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from tap_postgres_spark.schema import widen_for_cdc

AGGS = [
    Agg("count", None, "n"),
    Agg("sum", "x", "sx"),
    Agg("avg", "x", "ax"),
    Agg("count_col", "x", "nx"),
]

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("g", T.StringType(), True),
            T.StructField("x", T.DoubleType(), True),
        ]
    )
)


def _batch(spark, rows, lsn0):
    return spark.createDataFrame(
        [
            (k, g, x, lsn0 + i, "1970-01-01T00:00:00Z" if dead else None)
            for i, (k, g, x, dead) in enumerate(rows)
        ],
        "k long, g string, x double, _sdc_lsn long, _sdc_deleted_at string",
    )


def _round(rows):
    # double sums are delta-maintained: addition reorders vs a full
    # recompute, so equality holds to ~1e-12, not bit-exactly (use
    # decimals on the base column for exact money-grade sums)
    return {
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in rows
    }


def _oracle(base):
    return _round(
        base.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.avg("x").alias("ax"),
            F.count("x").alias("nx"),
        )
        .collect()
    )


def _view_rows(view):
    return _round(read_aggregate_view(view, AGGS).collect())


def test_bootstrap_equals_full_groupby(spark, tmp_path):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(
            spark,
            [(1, "a", 1.0, 0), (2, "a", 2.0, 0), (3, "b", None, 0), (4, None, 4.0, 0)],
            100,
        ),
        epoch_id="e1",
    )
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    assert _view_rows(view) == _oracle(base)
    # SQL NULL semantics: group b has only NULL inputs → sum/avg NULL, nx 0
    row = {r["g"]: r for r in read_aggregate_view(view, AGGS).collect()}
    assert row["b"]["sx"] is None and row["b"]["ax"] is None and row["b"]["nx"] == 0


def test_refresh_matches_recompute_under_random_churn(spark, tmp_path):
    """Seeded churn: every refresh leaves the view equal to a full
    recompute — inserts, updates, deletes, group migrations, NULL
    groups/inputs, keys resurrected after deletion."""
    rng = random.Random(42)
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    groups = ["a", "b", "c", None]
    live: dict[int, tuple] = {}
    lsn = 100
    base.merge_into(
        _batch(spark, [(k, rng.choice(groups), float(k), 0) for k in range(20)], lsn),
        epoch_id="seed",
    )
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    for epoch in range(4):
        lsn += 1000
        rows = []
        for _ in range(15):
            k = rng.randrange(30)
            op = rng.random()
            if op < 0.25:
                rows.append((k, None, None, 1))  # delete (maybe non-existent)
            else:
                g = rng.choice(groups)
                x = None if rng.random() < 0.3 else round(rng.uniform(-5, 5), 3)
                rows.append((k, g, x, 0))
        base.merge_into(_batch(spark, rows, lsn), epoch_id=f"churn{epoch}")
        # refresh every other epoch: ranges spanning 2 base versions
        if epoch % 2 == 1:
            res = refresh_aggregate_view(base, view, AGGS)
            assert not res["skipped"]
            assert _view_rows(view) == _oracle(base)
    # idempotent replay
    assert refresh_aggregate_view(base, view, AGGS)["skipped"]


def test_refresh_across_compaction(spark, tmp_path):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(spark, [(k, "a" if k % 2 else "b", 1.0 * k, 0) for k in range(10)], 100),
        epoch_id="e1",
    )
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    base.merge_into(_batch(spark, [(1, "b", 7.0, 0), (11, "a", 3.0, 0)], 200), epoch_id="e2")
    base.compact()
    base.merge_into(_batch(spark, [(2, None, None, 0), (3, "a", None, 1)], 300), epoch_id="e3")
    res = refresh_aggregate_view(base, view, AGGS)
    assert not res["skipped"]
    assert _view_rows(view) == _oracle(base)


def test_noop_range_advances_marker(spark, tmp_path):
    """A range whose changes cancel out (same value re-upserted) still
    commits the refresh epoch so the next refresh's changelog walk
    starts at the new head, and the view content is unchanged."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(_batch(spark, [(1, "a", 1.0, 0)], 100), epoch_id="e1")
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    before = _view_rows(view)
    base.merge_into(_batch(spark, [(1, "a", 1.0, 0)], 200), epoch_id="e2")
    res = refresh_aggregate_view(base, view, AGGS)
    assert not res["skipped"] and res["to_version"] == base.current_version()
    assert _view_rows(view) == before
    nxt = refresh_aggregate_view(base, view, AGGS)
    assert nxt["skipped"] and nxt["refreshed_version"] == base.current_version()


def test_group_death_and_resurrection(spark, tmp_path):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(_batch(spark, [(1, "a", 1.0, 0), (2, "b", 2.0, 0)], 100), epoch_id="e1")
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    base.merge_into(_batch(spark, [(1, None, None, 1)], 200), epoch_id="e2")
    refresh_aggregate_view(base, view, AGGS)
    assert {r[0] for r in _view_rows(view)} == {"b"}
    base.merge_into(_batch(spark, [(3, "a", 9.0, 0)], 300), epoch_id="e3")
    refresh_aggregate_view(base, view, AGGS)
    assert _view_rows(view) == _oracle(base)


MINMAX_AGGS = [
    Agg("count", None, "n"),
    Agg("min", "x", "mn"),
    Agg("max", "x", "mx"),
]


def _minmax_oracle(base):
    return {
        tuple(r)
        for r in base.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }


def test_minmax_on_append_only_base(spark, tmp_path):
    """Insert-monotone extrema: new keys only → refresh matches a full
    recompute, including all-NULL input groups and fresh groups."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(spark, [(1, "a", 3.0, 0), (2, "a", 1.0, 0), (3, "b", None, 0)], 100),
        epoch_id="e1",
    )
    view = bootstrap_aggregate_view(
        spark, base, str(tmp_path / "v"), ["g"], MINMAX_AGGS
    )
    base.merge_into(
        _batch(
            spark,
            [(4, "a", 0.5, 0), (5, "b", 9.0, 0), (6, "c", -2.0, 0), (7, "b", None, 0)],
            200,
        ),
        epoch_id="e2",
    )
    res = refresh_aggregate_view(base, view, MINMAX_AGGS)
    assert not res["skipped"]
    got = _round(read_aggregate_view(view, MINMAX_AGGS).collect())
    assert got == _round(_minmax_oracle(base))


def test_minmax_retracts_deleted_minimum(spark, tmp_path):
    """Deleting a group's current minimum refreshes to the TRUE new min
    (round-5: churned groups recompute from the base head instead of
    raising), and the refresh reports the recompute path."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(spark, [(1, "a", 1.0, 0), (2, "a", 5.0, 0), (3, "b", 7.0, 0)], 100),
        epoch_id="e1",
    )
    view = bootstrap_aggregate_view(
        spark, base, str(tmp_path / "v"), ["g"], MINMAX_AGGS
    )
    # delete the current min of 'a'; 'b' untouched
    base.merge_into(_batch(spark, [(1, None, None, 1)], 200), epoch_id="e2")
    res = refresh_aggregate_view(base, view, MINMAX_AGGS)
    assert res["extremal_recompute"] is True
    got = _round(read_aggregate_view(view, MINMAX_AGGS).collect())
    assert got == _round(_minmax_oracle(base))
    assert ("a", 1, 5.0, 5.0) in got


def test_minmax_update_moves_only_extremal_input(spark, tmp_path):
    """An update that changes ONLY x (count delta zero) must still be
    caught: the churned group reaches the overwrite via the churned-set
    union, not the additive-delta filter."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(spark, [(1, "a", 3.0, 0), (2, "a", 8.0, 0)], 100), epoch_id="e1"
    )
    view = bootstrap_aggregate_view(
        spark, base, str(tmp_path / "v"), ["g"], MINMAX_AGGS
    )
    base.merge_into(_batch(spark, [(1, "a", 99.0, 0)], 200), epoch_id="e2")
    res = refresh_aggregate_view(base, view, MINMAX_AGGS)
    assert res["extremal_recompute"] is True
    got = _round(read_aggregate_view(view, MINMAX_AGGS).collect())
    assert got == _round(_minmax_oracle(base)) == {("a", 2, 8.0, 99.0)}


def test_minmax_churn_equals_full_recompute_mixed(spark, tmp_path):
    """Mixed range — inserts into fresh groups + churn in others, group
    migration, a group dying, all-NULL survivors — ≡ full recompute."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(
        _batch(
            spark,
            [(1, "a", 1.0, 0), (2, "a", 5.0, 0), (3, "b", 2.0, 0), (4, "c", None, 0)],
            100,
        ),
        epoch_id="e1",
    )
    view = bootstrap_aggregate_view(
        spark, base, str(tmp_path / "v"), ["g"], MINMAX_AGGS
    )
    base.merge_into(
        _batch(
            spark,
            [
                (1, "b", 0.5, 0),   # migrates a→b AND becomes b's new min
                (3, None, None, 1),  # delete b's old row
                (5, "d", -9.0, 0),  # fresh group (pure insert)
                (2, None, None, 1),  # 'a' shrinks to nothing → dies
            ],
            200,
        ),
        epoch_id="e2",
    )
    refresh_aggregate_view(base, view, MINMAX_AGGS)
    got = _round(read_aggregate_view(view, MINMAX_AGGS).collect())
    assert got == _round(_minmax_oracle(base))
    assert "a" not in {r[0] for r in got}  # dead group tombstoned


def test_minmax_pure_insert_skips_recompute(spark, tmp_path):
    """Append-only ranges keep the O(|changes|) monotone path — no
    head scan (reported via extremal_recompute=False)."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(_batch(spark, [(1, "a", 3.0, 0)], 100), epoch_id="e1")
    view = bootstrap_aggregate_view(
        spark, base, str(tmp_path / "v"), ["g"], MINMAX_AGGS
    )
    base.merge_into(_batch(spark, [(2, "a", 1.0, 0)], 200), epoch_id="e2")
    res = refresh_aggregate_view(base, view, MINMAX_AGGS)
    assert res["extremal_recompute"] is False
    got = _round(read_aggregate_view(view, MINMAX_AGGS).collect())
    assert got == _round(_minmax_oracle(base)) == {("a", 2, 1.0, 3.0)}


def test_unknown_kind_rejected():
    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        Agg("median", "x", "md")


def test_refresh_range_below_retention_floor_raises(spark, tmp_path):
    """If retention expired the changelog below the view's refreshed
    version, refresh raises (read_changes floor guard) instead of
    committing a silently-partial view."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(_batch(spark, [(1, "a", 1.0, 0)], 100), epoch_id="e1")
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    for i in range(6):
        base.merge_into(_batch(spark, [(i + 10, "b", 1.0, 0)], 200 + i), epoch_id=f"e{i+2}")
    base.expire_versions(keep_last=2)
    with pytest.raises(ValueError, match="retention floor"):
        refresh_aggregate_view(base, view, AGGS)


def test_view_self_compaction_between_refreshes(spark, tmp_path):
    """Compacting the VIEW table between refreshes (the maintenance the
    submit job runs on a depth trigger) must not disturb delta math."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    base.merge_into(_batch(spark, [(k, "a" if k % 2 else "b", 1.0, 0) for k in range(8)], 100), epoch_id="e1")
    view = bootstrap_aggregate_view(spark, base, str(tmp_path / "v"), ["g"], AGGS)
    for i in range(3):
        base.merge_into(
            _batch(spark, [(10 + i, "a", 2.0 + i, 0), (i, None, None, 1)], 200 + 10 * i),
            epoch_id=f"e{i+2}",
        )
        refresh_aggregate_view(base, view, AGGS)
        view.compact()
        assert _view_rows(view) == _oracle(base)


def test_view_follows_a_live_stream(spark, tmp_path):
    """Maintenance riding the streaming replay: refresh after every
    micro-batch (the foreachBatch composition a deployment runs), view
    equals a full recompute of the final head."""
    from tap_postgres_spark.feedgen import FQN, FeedConfig, generate_feed, write_feed
    from tap_postgres_spark.streaming import StreamingCdcRunner
    from tests.test_end_to_end import load_snapshot, make_pipeline

    feed = generate_feed(FeedConfig(n_events=300, n_initial_paths=60, n_feed_files=6))
    pipeline, table, _state = make_pipeline(spark, tmp_path)
    load_snapshot(spark, pipeline, table, feed, tmp_path)
    feed_dir = str(tmp_path / "feed")
    write_feed(feed, feed_dir)

    aggs = [Agg("count", None, "n_paths")]
    view = bootstrap_aggregate_view(spark, table, str(tmp_path / "v"), ["repo"], aggs)
    runner = StreamingCdcRunner(
        pipeline, feed_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    refreshes = []
    inner = runner._foreach_batch

    def fb(df, bid):
        inner(df, bid)
        refreshes.append(refresh_aggregate_view(table, view, aggs))

    runner._foreach_batch = fb
    runner.run_available_now()
    assert len([r for r in refreshes if not r["skipped"]]) >= 3
    got = {tuple(r) for r in read_aggregate_view(view, aggs).collect()}
    oracle = {
        tuple(r)
        for r in table.read().groupBy("repo").agg(F.count(F.lit(1)).alias("n_paths")).collect()
    }
    assert got == oracle
