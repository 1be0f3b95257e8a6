"""Stateful out-of-order monitor: batch-window form vs the
applyInPandasWithState cross-batch form (SURVEY.md §2.10 T3
observability)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tap_postgres_spark.streaming.stateful import (
    monotonicity_violations,
    streaming_order_monitor,
)


def test_batch_violations_window_form(spark):
    rows = [
        # (key, ordinal, arrival)
        ("a", 10, 1),
        ("a", 30, 2),
        ("a", 20, 3),   # regression: 20 < 30
        ("a", 40, 4),
        ("b", 5, 5),
        ("b", 6, 6),    # monotone — no violation
        ("b", 2, 7),    # regression: 2 < 6
    ]
    df = spark.createDataFrame(rows, "k string, o long, arr long")
    got = {
        (r["key"], r["ordinal"], r["max_seen"], r["lag"])
        for r in monotonicity_violations(df, "k", "o", "arr").collect()
    }
    assert got == {("a", 20, 30, 10), ("b", 2, 6, 4)}


def test_streaming_monitor_catches_cross_batch_regression(spark, tmp_path):
    """An event lower than a maximum applied in a PREVIOUS micro-batch is
    only catchable with persistent state — the applyInPandasWithState
    path.  Batch 1: (a,100); batch 2: (a,50) → regression."""
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("a", 100), ("b", 10)], "key string, ordinal long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(feed, "f1"))
    spark.createDataFrame(
        [("a", 50), ("b", 20), ("b", 15)], "key string, ordinal long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(feed, "f2"))

    stream = (
        spark.readStream.schema("key string, ordinal long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed + "/*/")
    )
    q = (
        streaming_order_monitor(stream, "key", "ordinal")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["ordinal"], r["max_seen"], r["lag"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # a: 50 regressed vs 100 from the earlier batch; b: 15 vs 20 within
    # the later file (within-batch order)
    assert ("a", 50, 100, 50) in got
    assert ("b", 15, 20, 5) in got
    assert all(k in ("a", "b") for k, *_ in got)
