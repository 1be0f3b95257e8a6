"""Watermarked tumbling-window rollup: append-mode window finalization,
late-event drop, and value parity with the batch twin
(pipelineops.window_rollup) on the closed prefix."""

from __future__ import annotations

import datetime as dt
import os

from tap_postgres_spark import pipelineops
from tap_postgres_spark.streaming.windowed import streaming_window_rollup

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _ts(minute, second=0):
    return dt.datetime(2024, 3, 1, 0, minute, second)


def test_streaming_window_rollup_watermark(spark, tmp_path):
    feed = str(tmp_path / "wfeed")
    os.makedirs(feed)
    out_dir = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")

    # 10-min windows, 2-min allowed lateness.
    # batch 1: window W0 = [00:00, 00:10) — types a and b
    b1 = [
        (1, _ts(0), "a", 1.0),
        (2, _ts(2), "b", 2.5),
        (3, _ts(5), "a", 4.0),
    ]
    # batch 2: W1 = [00:10, 00:20) opens; after this batch the watermark
    # is 00:12 = max(00:14) - 2 min > W0's end, so W0 is finalized (and
    # emitted) at the start of batch 3
    b2 = [(4, _ts(14), "a", 10.0)]
    # batch 3: sentinel pushes the watermark to 00:38, so W0 finalizes
    # (emitted at end of this batch) and W1 finalizes in batch 4
    b3 = [(6, _ts(40), "b", 0.25)]
    # batch 4: event_id=5 is TOO-LATE for the already-finalized W0 →
    # dropped by the late-record gate (Spark admits by the PREVIOUS
    # trigger's watermark, 00:12 here, which is past W0's end; a merge
    # within lateness would have been fine — after finalization nothing
    # may change the emitted row).  The far-future event's own window
    # stays open → never emitted.
    b4 = [
        (5, _ts(1), "a", 100.0),  # must NOT appear anywhere
        (7, _ts(0) + dt.timedelta(hours=1), "b", 9.0),
    ]

    for i, rows in enumerate((b1, b2, b3, b4), 1):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            feed + f"/f{i}"
        )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed + "/*/")
    )
    q = (
        streaming_window_rollup(stream, window_s=600, lateness_s=120)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.window_start_us, r.event_type): (r.n, r.sum_value_cents)
        for r in spark.read.parquet(out_dir).collect()
    }
    closed_starts = {w for (w, _t) in got}

    # W0, W1 and the 00:40 window closed (availableNow runs a final
    # no-data flush batch with the last watermark, 00:58); the 01:00
    # window is still open and must NOT have been emitted
    assert len(closed_starts) == 3
    last_start = int(
        (_ts(0) + dt.timedelta(hours=1)).replace(
            tzinfo=dt.timezone.utc
        ).timestamp()
    ) // 600 * 600 * 1_000_000
    assert last_start not in closed_starts

    # batch twin over the events the watermark admitted (everything but
    # the too-late row), restricted to the closed windows → exact parity
    admitted = [r for r in b1 + b2 + b3 + b4 if r[0] != 5]
    twin = {
        (r.window_start_us, r.event_type): (r.n, r.sum_value_cents)
        for r in pipelineops.window_rollup(
            spark.createDataFrame(admitted, SCHEMA), window_s=600
        ).collect()
        if r.window_start_us in closed_starts
    }
    assert got == twin

    # the late row was dropped, not merged: W0/'a' counts 2 events (ids
    # 1 and 3), total 5.0 — not 3 events / 105.0
    w0a = [(w, t) for (w, t) in got if t == "a" and (w, "b") in got][0]
    assert got[w0a] == (2, 500)


def test_streaming_dedup_exact_first_arrival_and_batch_parity(spark, tmp_path):
    """streaming_dedup_exact: later copies of a text drop across
    micro-batches, first arrivals survive, and (with ids in arrival
    order) the surviving id set equals the batch twin's keep-lowest."""
    from tap_postgres_spark import textops
    from tap_postgres_spark.streaming.windowed import streaming_dedup_exact

    feed = str(tmp_path / "dfeed")
    os.makedirs(feed)
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    schema = "doc_id long, ts timestamp, text string"

    # batch 1: three originals; batch 2: one dup of 'aaa', one original;
    # batch 3: dup of 'bbb' AND dup of the batch-2 original — all within
    # the watermark horizon
    b1 = [(1, _ts(0), "aaa"), (2, _ts(1), "bbb"), (3, _ts(2), "ccc")]
    b2 = [(4, _ts(10), "aaa"), (5, _ts(11), "ddd")]
    b3 = [(6, _ts(20), "bbb"), (7, _ts(21), "ddd"), (8, _ts(22), "eee")]
    for i, rows in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            feed + f"/f{i}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed + "/*/")
    )
    q = (
        streaming_dedup_exact(stream, lateness_s=3600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    survivors = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert survivors == {1, 2, 3, 5, 8}

    # parity with the batch twin (ids assigned in arrival order →
    # first-arrival ≡ keep-lowest)
    all_rows = spark.createDataFrame(b1 + b2 + b3, schema)
    batch = {
        r.doc_id for r in textops.dedup_exact(all_rows).collect()
    }
    assert survivors == batch


def test_streaming_neardup_probe_matches_batch_probe(spark, tmp_path):
    """streaming_neardup_probe: per-micro-batch stream-static join of
    row-wise-banded new docs against a static corpus index; candidate
    pairs equal the batch probe's (uncapped) over the same inputs."""
    from tap_postgres_spark import textops
    from tap_postgres_spark.streaming.windowed import streaming_neardup_probe

    body_a = "the quick brown fox jumps over the lazy dog again and again"
    body_b = "completely different content about spark structured streaming"
    corpus = spark.createDataFrame(
        [(100, body_a), (200, body_b), (300, "short text")],
        "doc_id long, text string",
    )
    index = textops.minhash_banded(corpus, bands=4)

    feed = str(tmp_path / "pfeed")
    os.makedirs(feed)
    out_dir = str(tmp_path / "pout")
    ckpt = str(tmp_path / "pckpt")
    schema = "doc_id long, text string"
    b1 = [(1, body_a), (2, "unrelated entirely")]
    b2 = [(3, body_b), (4, "short text")]
    for i, rows in enumerate((b1, b2), 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            feed + f"/f{i}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*/")
    )
    q = (
        streaming_neardup_probe(stream, index, bands=4)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.probe_doc_id, r.doc_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.probe_doc_id, r.doc_id)
        for r in textops.probe_minhash_index(
            index, spark.createDataFrame(b1 + b2, schema), bands=4
        ).collect()
    }
    assert got == batch
    assert (1, 100) in got and (3, 200) in got and (4, 300) in got
    assert all(p != 2 for p, _c in got)


def test_minhash_banded_rowwise_equals_aggregated(spark):
    """The shuffle-free per-row banding is byte-identical to the
    exploded-aggregation form, including short/empty-doc fallbacks."""
    from tap_postgres_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "two words"),
            (3, "one"),
            (4, ""),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    a = {
        (r.doc_id, r.band, r.key)
        for r in textops.minhash_banded(docs, bands=4).collect()
    }
    b = {
        (r.doc_id, r.band, r.key)
        for r in textops.minhash_banded_rowwise(docs, bands=4).collect()
    }
    assert a == b
