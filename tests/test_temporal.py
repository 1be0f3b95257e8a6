"""As-of join and range join: correctness vs brute force, tie/tolerance
semantics, segmented-plan equivalence (hot key), and plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tap_postgres_spark.operators.temporal import asof_join, range_join


def _brute_asof(spark, left_rows, right_rows, tolerance_s=None):
    """Reference: for each (k, t, i) left row pick right (k, rt, v)
    with max rt <= t; python, O(n*m)."""
    out = []
    for (k, t, i) in left_rows:
        best = None
        for (rk, rt, v) in right_rows:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, v)
        val = None
        if best is not None and (tolerance_s is None or t - best[0] <= tolerance_s):
            val = best[1]
        out.append((i, k, t, val))
    return sorted(out)


def _run_asof(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k long, t double, i long").select(
        "i", "k", "t"
    )
    right = spark.createDataFrame(right_rows, "k long, t double, v double")
    got = asof_join(
        left, right, ["k"], "t", "t", {"v": "last_v"}, **kw
    )
    assert got.columns == ["i", "k", "t", "last_v"]
    return sorted(
        (r.i, r.k, r.t, r.last_v) for r in got.collect()
    )


def test_asof_matches_brute_force(spark):
    rng = random.Random(7)
    left_rows = [(rng.randrange(5), float(rng.randrange(100)), i)
                 for i in range(120)]
    # unique (k, t) on the right per the operator contract
    right_keys = {(rng.randrange(5), float(rng.randrange(100)))
                  for _ in range(80)}
    right_rows = [(k, t, round(rng.uniform(0, 10), 3))
                  for (k, t) in sorted(right_keys)]
    want = _brute_asof(spark, left_rows, right_rows)
    assert _run_asof(spark, left_rows, right_rows) == want


def test_asof_tie_is_inclusive_and_misses_are_null(spark):
    got = _run_asof(
        spark,
        [(1, 10.0, 1), (1, 9.0, 2), (2, 5.0, 3)],
        [(1, 10.0, 42.0), (1, 1.0, 7.0)],
    )
    assert got == [(1, 1, 10.0, 42.0), (2, 1, 9.0, 7.0), (3, 2, 5.0, None)]


def test_asof_tolerance_nulls_stale_matches(spark):
    left_rows = [(1, 100.0, 1), (1, 10.5, 2)]
    right_rows = [(1, 10.0, 3.0)]
    got = _run_asof(spark, left_rows, right_rows, tolerance_s=5.0)
    assert got == _brute_asof(spark, left_rows, right_rows, tolerance_s=5.0)
    assert got[0][3] is None and got[1][3] == 3.0


def test_asof_chunked_equals_plain_on_hot_key(spark):
    rng = random.Random(11)
    # one dominant key (0) plus a few cold ones — the case the segmented
    # plan exists for
    left_rows = [(0 if rng.random() < 0.8 else rng.randrange(1, 4),
                  float(rng.randrange(1000)), i) for i in range(300)]
    right_keys = {(0 if rng.random() < 0.8 else rng.randrange(1, 4),
                   float(rng.randrange(1000))) for _ in range(150)}
    right_rows = [(k, t, round(rng.uniform(0, 10), 3))
                  for (k, t) in sorted(right_keys)]
    plain = _run_asof(spark, left_rows, right_rows)
    for chunk in (50.0, 137.0, 10000.0):
        assert _run_asof(spark, left_rows, right_rows,
                         chunk_seconds=chunk) == plain
    assert _run_asof(spark, left_rows, right_rows, chunk_seconds=50.0,
                     tolerance_s=30.0) == _brute_asof(
        spark, left_rows, right_rows, tolerance_s=30.0)


def test_asof_left_rows_all_survive_and_empty_right(spark):
    left_rows = [(1, 1.0, 1), (2, 2.0, 2)]
    got = _run_asof(spark, left_rows, [])
    assert got == [(1, 1, 1.0, None), (2, 2, 2.0, None)]


def _run_range(spark, left_rows, right_rows, width, on=None):
    left = spark.createDataFrame(left_rows, "lid long, val double, g long")
    right = spark.createDataFrame(right_rows, "rid long, lo double, hi double, g2 long")
    if on:
        right = right.withColumnRenamed("g2", "g_r")
        left = left.withColumn("g_r", F.col("g"))
        keys = ["g_r"]
    else:
        keys = None
    got = range_join(left, right, "val", "lo", "hi",
                     on=keys, bucket_width=width)
    return sorted((r.lid, r.rid) for r in got.collect())


def test_range_join_matches_naive_filter(spark):
    rng = random.Random(3)
    left_rows = [(i, round(rng.uniform(0, 100), 2), rng.randrange(3))
                 for i in range(150)]
    right_rows = []
    for j in range(60):
        lo = round(rng.uniform(0, 95), 2)
        right_rows.append((j, lo, round(lo + rng.uniform(0, 8), 2),
                           rng.randrange(3)))
    naive = sorted(
        (lid, rid)
        for (lid, v, _) in left_rows
        for (rid, lo, hi, _) in right_rows
        if lo <= v <= hi
    )
    for width in (1.0, 5.0, 50.0):
        assert _run_range(spark, left_rows, right_rows, width) == naive


def test_range_join_boundaries_inclusive_and_inverted_empty(spark):
    left_rows = [(1, 10.0, 0), (2, 20.0, 0), (3, 10.5, 0)]
    right_rows = [(7, 10.0, 20.0, 0), (8, 30.0, 25.0, 0)]  # 8 inverted
    got = _run_range(spark, left_rows, right_rows, 4.0)
    assert got == [(1, 7), (2, 7), (3, 7)]


def test_range_join_with_equi_key(spark):
    rng = random.Random(5)
    left_rows = [(i, round(rng.uniform(0, 50), 2), rng.randrange(2))
                 for i in range(80)]
    right_rows = [(j, float(j % 40), float(j % 40) + 6.0, rng.randrange(2))
                  for j in range(40)]
    naive = sorted(
        (lid, rid)
        for (lid, v, g) in left_rows
        for (rid, lo, hi, g2) in right_rows
        if g == g2 and lo <= v <= hi
    )
    assert _run_range(spark, left_rows, right_rows, 6.0, on=True) == naive


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    left = spark.range(1000).select(
        F.col("id").alias("lid"), (F.col("id") % 97).cast("double").alias("val")
    )
    right = spark.range(200).select(
        F.col("id").alias("rid"),
        (F.col("id") % 90).cast("double").alias("lo"),
        ((F.col("id") % 90) + 5).cast("double").alias("hi"),
    )
    # hatch disabled → pure hash-join plan, no nested loop anywhere
    out = range_join(left, right, "val", "lo", "hi", bucket_width=5.0,
                     max_span_buckets=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan, plan
    # hatch enabled → the bucketed branch stays a hash join; exactly ONE
    # nested-loop node exists and it is the declared broadcast escape
    # branch for oversized intervals
    out2 = range_join(left, right, "val", "lo", "hi", bucket_width=5.0)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("BroadcastNestedLoopJoin") == 1, plan2
    assert "Cartesian" not in plan2, plan2


def test_point_in_time_join_against_lake_history(spark, tmp_path):
    """Temporal-table join over LakeTable.read_changes(fold=False):
    facts resolve to the dimension state current at their LSN, with
    deletes windowing the key out and re-inserts bringing it back."""
    from pyspark.sql import types as T

    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.operators.temporal import point_in_time_join
    from tap_postgres_spark.schema import widen_for_cdc

    schema = widen_for_cdc(T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]))
    bsch = ("repo string, path string, content string, _sdc_lsn long, "
            "_sdc_deleted_at string")

    def batch(rows):
        return spark.createDataFrame(
            [(r, p, c, l, d) for r, p, c, l, d in rows], bsch)

    t = LakeTable.create(spark, str(tmp_path / "dim"), schema,
                         ["repo", "path"], num_buckets=4)
    t.merge_into(batch([("r", "a", "v1", 10, None),
                        ("r", "b", "v1", 11, None)]), epoch_id="e1")
    t.merge_into(batch([("r", "a", "v2", 20, None),
                        ("r", "b", None, 21, "2024-01-01"),
                        ("r", "c", "v1", 22, None)]), epoch_id="e2")
    t.merge_into(batch([("r", "b", "v3", 30, None)]), epoch_id="e3")

    hist = t.read_changes(0, fold=False)
    # raw mode keeps every per-commit version: a×2, b×3, c×1
    assert hist.count() == 6

    facts = spark.createDataFrame(
        [(i, k, lsn) for i, (k, lsn) in enumerate([
            ("a", 5), ("a", 10), ("a", 15), ("a", 25),
            ("b", 11), ("b", 21), ("b", 25), ("b", 30), ("b", 35),
            ("c", 21), ("c", 22), ("z", 40),
        ])], "fact_id long, path string, lsn long",
    ).withColumn("repo", F.lit("r"))

    for chunk in (None, 8.0):
        got = {
            (r.path, r.lsn): r.content_then
            for r in point_in_time_join(
                facts, hist, ["repo", "path"], "lsn",
                {"content": "content_then"}, chunk_lsns=chunk,
            ).collect()
        }
        assert got == {
            ("a", 5): None, ("a", 10): "v1", ("a", 15): "v1",
            ("a", 25): "v2",
            ("b", 11): "v1", ("b", 21): None, ("b", 25): None,
            ("b", 30): "v3", ("b", 35): "v3",
            ("c", 21): None, ("c", 22): "v1", ("z", 40): None,
        }


def test_range_join_oversized_interval_escape_hatch(spark):
    """Intervals spanning more than max_span_buckets route through the
    broadcast branch; results equal the naive filter regardless of the
    split, and the bucketed branch never enumerates the giant span."""
    rng = random.Random(9)
    left_rows = [(i, round(rng.uniform(0, 1000), 2), 0) for i in range(100)]
    right_rows = [(j, lo := round(rng.uniform(0, 990), 2),
                   round(lo + rng.uniform(0, 8), 2), 0) for j in range(20)]
    right_rows.append((99, 0.0, 1000.0, 0))  # corpus-wide interval
    naive = sorted(
        (lid, rid)
        for (lid, v, _) in left_rows
        for (rid, lo, hi, _) in right_rows
        if lo <= v <= hi
    )
    # width 1.0 → the wide interval spans 1001 buckets; cap at 64 forces
    # it through the escape hatch (and the tiny cap also pushes a few
    # mid-size intervals there — equality must hold for any split)
    for cap in (64, 4096):
        left = spark.createDataFrame(left_rows, "lid long, val double, g long")
        right = spark.createDataFrame(
            right_rows, "rid long, lo double, hi double, g2 long")
        got = sorted(
            (r.lid, r.rid)
            for r in range_join(left, right, "val", "lo", "hi",
                                bucket_width=1.0,
                                max_span_buckets=cap).collect()
        )
        assert got == naive


def _brute_asof_fwd(left_rows, right_rows, tolerance_s=None):
    out = []
    for (k, t, i) in left_rows:
        best = None
        for (rk, rt, v) in right_rows:
            if rk == k and rt >= t and (best is None or rt < best[0]):
                best = (rt, v)
        val = None
        if best is not None and (tolerance_s is None or best[0] - t <= tolerance_s):
            val = best[1]
        out.append((i, k, t, val))
    return sorted(out)


def test_asof_forward_matches_brute_force(spark):
    rng = random.Random(13)
    left_rows = [(rng.randrange(4), float(rng.randrange(80)), i)
                 for i in range(100)]
    right_keys = {(rng.randrange(4), float(rng.randrange(80)))
                  for _ in range(60)}
    right_rows = [(k, t, round(rng.uniform(0, 10), 3))
                  for (k, t) in sorted(right_keys)]
    for kw in ({}, {"chunk_seconds": 13.0}, {"tolerance_s": 7.0},
               {"chunk_seconds": 13.0, "tolerance_s": 7.0}):
        got = _run_asof(spark, left_rows, right_rows,
                        direction="forward", **kw)
        assert got == _brute_asof_fwd(
            left_rows, right_rows, tolerance_s=kw.get("tolerance_s"))


def test_asof_forward_tie_is_inclusive(spark):
    got = _run_asof(
        spark,
        [(1, 10.0, 1), (1, 11.0, 2)],
        [(1, 10.0, 42.0)],
        direction="forward",
    )
    assert got == [(1, 1, 10.0, 42.0), (2, 1, 11.0, None)]


def _brute_asof_nearest(left_rows, right_rows, tolerance_s=None):
    out = []
    for (k, t, i) in left_rows:
        back = fwd = None
        for (rk, rt, v) in right_rows:
            if rk != k:
                continue
            if rt <= t and (back is None or rt > back[0]):
                back = (rt, v)
            if rt >= t and (fwd is None or rt < fwd[0]):
                fwd = (rt, v)
        if tolerance_s is not None:  # pandas: filter each side first
            if back is not None and t - back[0] > tolerance_s:
                back = None
            if fwd is not None and fwd[0] - t > tolerance_s:
                fwd = None
        if back is None:
            pick = fwd
        elif fwd is None:
            pick = back
        else:  # tie -> backward
            pick = back if (t - back[0]) <= (fwd[0] - t) else fwd
        out.append((i, k, t, pick[1] if pick else None))
    return sorted(out)


def test_asof_nearest_matches_brute_force(spark):
    rng = random.Random(17)
    left_rows = [(rng.randrange(4), float(rng.randrange(60)), i)
                 for i in range(90)]
    right_keys = {(rng.randrange(4), float(rng.randrange(60)))
                  for _ in range(50)}
    right_rows = [(k, t, round(rng.uniform(0, 10), 3))
                  for (k, t) in sorted(right_keys)]
    for kw in ({}, {"chunk_seconds": 11.0}, {"tolerance_s": 6.0},
               {"chunk_seconds": 11.0, "tolerance_s": 6.0}):
        got = _run_asof(spark, left_rows, right_rows,
                        direction="nearest", **kw)
        assert got == _brute_asof_nearest(
            left_rows, right_rows, tolerance_s=kw.get("tolerance_s")), kw


def test_asof_nearest_tie_prefers_backward_and_tolerance_falls_back(spark):
    # equidistant: 8 and 12 around t=10 -> backward (8) wins
    got = _run_asof(spark, [(1, 10.0, 1)],
                    [(1, 8.0, 1.0), (1, 12.0, 2.0)], direction="nearest")
    assert got == [(1, 1, 10.0, 1.0)]
    # tolerance filters each side BEFORE choosing (pandas semantics):
    # far side (14, dist 4 > 3) dropped, near side (9, dist 1) survives
    got = _run_asof(spark, [(1, 10.0, 1)],
                    [(1, 9.0, 1.0), (1, 14.0, 2.0)],
                    direction="nearest", tolerance_s=3.0)
    assert got == [(1, 1, 10.0, 1.0)]
    # both sides beyond tolerance (dists 5 and 4 > 3) -> null
    got = _run_asof(spark, [(1, 10.0, 1)],
                    [(1, 5.0, 1.0), (1, 14.0, 2.0)],
                    direction="nearest", tolerance_s=3.0)
    assert got == [(1, 1, 10.0, None)]
    # backward in tolerance, forward out -> backward even if forward is
    # nearer: forward (11, dist 1) dropped by tolerance 0 applied... use
    # asymmetric case: backward dist 2 <= 2, forward dist 1 but we drop
    # nothing at tolerance 2 -> forward wins by distance
    got = _run_asof(spark, [(1, 10.0, 1)],
                    [(1, 8.0, 1.0), (1, 11.0, 2.0)],
                    direction="nearest", tolerance_s=2.0)
    assert got == [(1, 1, 10.0, 2.0)]


def test_asof_nearest_plan_one_shuffle_two_sorts(spark):
    """The nearest plan's claim: both window picks ride ONE key shuffle;
    the second window only re-sorts (different order, same
    partitioning)."""
    left = spark.range(100).select(
        F.col("id").alias("i"), (F.col("id") % 5).alias("k"),
        (F.col("id") % 37).cast("double").alias("t"))
    right = spark.range(40).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 41).cast("double").alias("t"),
        F.col("id").cast("double").alias("v"))
    out = asof_join(left, right, ["k"], "t", "t", {"v": "nv"},
                    direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(k") == 1, plan
    assert plan.count("Window") == 2, plan
