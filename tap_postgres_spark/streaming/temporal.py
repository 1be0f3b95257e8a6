"""Watermarked stream-stream interval join — the dual-stream complement
of the batch temporal operators (:mod:`..operators.temporal`).

Where the batch/foreachBatch legs align a stream against HISTORY at
rest, this is the case where BOTH sides are live event streams and the
match condition is event-time proximity: "pair each left event with the
right events of the same key that happened within [lower, upper] of it"
(ad impressions ↔ clicks, WAL events ↔ audit probes).  This is exactly
the join Spark's Structured Streaming supports natively — equi keys +
an event-time range predicate, with watermarks bounding the buffered
state — so the operator is a thin, correctness-checked composition of
built-ins, not a custom stateful UDF: declare the plan, let the engine
manage state eviction.

State story at scale (why the watermark + range bounds matter): each
side buffers only events younger than its watermark minus the range
slack; without the time bounds the state store would grow without limit
and Spark rejects the plan (it requires the range predicate for
append-mode stream-stream joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    lower_s: float,
    upper_s: float,
    watermark_s: float,
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on equi keys + an event-time interval:
    emit (l, r) where ``l.left_ts + lower_s <= r.right_ts <=
    l.left_ts + upper_s`` within the same key.

    Both inputs must be streaming DataFrames with event-time timestamp
    columns ``left_ts`` / ``right_ts`` (distinct names — rename
    upstream).  ``watermark_s`` is applied to BOTH sides and bounds how
    late an event may arrive and still match; buffered state is evicted
    once the watermark passes the join range.  ``how`` supports
    ``inner`` and ``leftOuter`` (outer emits the unmatched left row with
    NULL right columns once the watermark proves no match can arrive —
    Spark's native semantics).
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, f"{int(watermark_s)} seconds")
    rw = right.withWatermark(right_ts, f"{int(watermark_s)} seconds")
    cond = None
    for k in on:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    lo = F.col(right_ts) >= F.col(left_ts) + F.expr(
        f"INTERVAL {int(lower_s)} SECONDS"
    )
    hi = F.col(right_ts) <= F.col(left_ts) + F.expr(
        f"INTERVAL {int(upper_s)} SECONDS"
    )
    cond = (cond & lo & hi) if cond is not None else (lo & hi)
    joined = lw.join(rw, cond, how)
    for k in on:  # keep one copy of the equi keys (the left's)
        joined = joined.drop(rw[k])
    return joined
