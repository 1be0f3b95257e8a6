"""Watermarked windowed aggregation — the late-data gate for event streams.

The CDC path tolerates out-of-order delivery via LWW (order never changes
final state), so it needs no watermark.  Event ANALYTICS over the same
feeds do: a tumbling-window rollup must eventually CLOSE each window and
emit exactly one final row for it, discarding events that arrive later
than the allowed lateness.  This is the canonical Structured Streaming
shape — ``withWatermark`` + ``F.window`` + append output — kept entirely
in built-in operators (JVM-side, whole-stage codegen; state store holds
one row per open (window, event_type)).

Semantics (and what the tests pin):

- Append mode emits a window only once the watermark (max event time seen
  minus ``lateness_s``) passes the window's end — each window appears
  exactly once, with its final aggregate.
- An event arriving AFTER its window was finalized is dropped by the
  watermark gate, not double-counted (no retraction needed downstream).
  Spark ≥ 3.4 runs TWO watermarks per trigger: admission of late rows
  uses the PREVIOUS trigger's watermark, eviction/emission the current
  one — so a window absorbs stragglers right up to the trigger in which
  it is emitted, and rejects them from the next trigger on.
- For the closed prefix, the output rows equal
  :func:`tap_postgres_spark.pipelineops.window_rollup` run over the
  non-late events — epoch-aligned ``F.window`` buckets are exactly the
  batch twin's ``ts_us - ts_us % window_us`` arithmetic.

Reference anchor: the reference never solves this (its walsender cursor is
strictly ordered, tap_postgres/wal_reader.py:194-257); it is part of the
training-data-pipeline surface layered on the same feed.

At 10^10-event scale the state store carries only open windows ×
event types (bounded by lateness / window ratio, not by input), and the
aggregation is a map-side-combined hash aggregate per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_rollup(
    events: DataFrame,
    window_s: int = 86_400,
    lateness_s: int = 3_600,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count/sum by event type with an event-time
    watermark; append-mode streaming twin of
    :func:`~tap_postgres_spark.pipelineops.window_rollup`.

    Output columns match the batch twin exactly:
    ``(window_start_us, event_type, n, sum_value_cents)`` — value folded
    as integer cents, so the cross-batch state merge is exact.
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.select(
            ts.alias("_wm_ts"),
            F.col(type_col).alias("event_type"),
            F.round(F.col(value_col).cast("double") * 100)
            .cast("long")
            .alias("value_cents"),
        )
        .withWatermark("_wm_ts", f"{int(lateness_s)} seconds")
        .groupBy(
            F.window("_wm_ts", f"{int(window_s)} seconds"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def streaming_dedup_exact(
    docs: DataFrame,
    lateness_s: int = 3_600,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of :func:`~tap_postgres_spark.textops.dedup_exact`:
    emit each document whose ``md5(text)`` has not been seen before,
    dropping later copies — exact dedup as a continuous filter on an
    ingest stream (the crawl-frontier shape: duplicates arrive near
    their originals, not uniformly over history).

    Built on ``dropDuplicatesWithinWatermark``: the state store keeps
    one row per DISTINCT hash seen within the watermark horizon, and
    the watermark EXPIRES state older than ``lateness_s`` — the knob
    that makes streaming exact-dedup state-bounded at 10^10 docs
    (state ≈ distinct hashes per horizon, not per corpus; corpus-wide
    dedup against all history composes with the batch anti-join
    `dedup_against_corpus` over the lake table instead).

    Duplicate resolution is FIRST-ARRIVAL (keep the copy that came
    first), the natural streaming rule; the batch twin's keep-lowest-id
    rule coincides with it whenever ids are assigned in arrival order
    (pinned in tests).
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            ts.alias("_wm_ts"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .withWatermark("_wm_ts", f"{int(lateness_s)} seconds")
        .dropDuplicatesWithinWatermark(["_h"])
        .select(id_col, text_col, F.col("_wm_ts").alias(ts_col))
    )


def streaming_neardup_probe(
    docs: DataFrame,
    index_banded: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming twin of
    :func:`~tap_postgres_spark.textops.probe_minhash_index`: each
    micro-batch of NEW documents is banded and joined against the
    STATIC corpus index — Spark's stream-static join, the shape a crawl
    ingest uses to flag near-dups against the historical corpus as they
    arrive.

    Append-mode-legal by construction: the stream side bands PER ROW
    (`textops.minhash_banded_rowwise` — pure expressions + explode, no
    streaming aggregation, which could not precede the join).  The
    static side's freshness follows its relation: a directory-based
    parquet source re-lists files per micro-batch, while a
    `LakeTable.read()` relation pins its snapshot's file list (the
    lake's consistent-read contract) — to pick up index refreshes
    mid-query, probe inside `foreachBatch` re-reading the table per
    batch.  Emits one row per (probe doc, corpus doc) candidate pair;
    the per-pair exact verify (`ngram_jaccard`) composes downstream the
    same way.

    The hot-bucket cap is NOT applied here: the cap in the batch probe
    rides a window over the joined candidates, and that aggregation is
    not supported on a stream-static join's output in append mode —
    cap the INDEX side instead (drop oversized buckets at index build /
    refresh time, where the count is a batch aggregation).
    """
    from .. import textops

    ids = (
        [id_col] if isinstance(id_col, str) else list(id_col)
    )
    idx_ids = [
        c for c in index_banded.columns
        if c not in ("band", "key") and not c.startswith("_sdc")
    ]
    probe = textops.minhash_banded_rowwise(
        docs, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
    ).select(
        *[F.col(i).alias(f"probe_{i}") for i in ids], "band", "key"
    )
    hits = probe.join(index_banded.select(*idx_ids, "band", "key"), ["band", "key"])
    if set(ids) == set(idx_ids):
        same = None
        for i in ids:
            c = F.col(i) == F.col(f"probe_{i}")
            same = c if same is None else (same & c)
        hits = hits.filter(~same)
    return hits.select(*[f"probe_{i}" for i in ids], *idx_ids)
