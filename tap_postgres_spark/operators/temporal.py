"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference engine (MeltanoLabs/tap-postgres) streams WAL events and
leaves temporal alignment to the warehouse; at 100-TB scale these two
joins are the alignment primitives a CDC-fed lakehouse actually needs
(attach "state as of the event's timestamp", attribute facts into value
or time windows).  Both are implemented as compositions of built-in
DataFrame ops — no UDFs, fully codegen-able — with an explicit scale
story:

- :func:`asof_join` — per key, attach the most recent right-side row at
  or before each left row's timestamp (backward, inclusive).  The plain
  path is the union-window trick: ONE shuffle on the key, one window
  pass, no join at all.  The scale path (``chunk_seconds``) fixes the
  hot-key hazard: a single dominant key no longer serializes through
  one window task — rows are windowed per (key, time-chunk), and a
  per-chunk "carry-in" summary (≤ one row per key per chunk) is
  prefix-folded and hash-joined back.  Same segmented-scan shape as
  ``pipelineops.pack_sequences``'s two-level cumsum.
- :func:`range_join` — left values into right [lo, hi] intervals
  (inclusive both ends, like SQL BETWEEN).  Naively this is a
  BroadcastNestedLoopJoin (O(n·m)); bucketizing the value space turns
  it into an equi hash join: each interval explodes to the buckets it
  covers ((hi-lo)/width + 1 rows), each probe value hashes to exactly
  one bucket, so a (left, right) pair meets in exactly one bucket and
  the output needs no dedup.

Determinism contract (same as every oracled operator here): no RNG, no
timestamps-of-now; ties on the right side's event time must be resolved
by the caller (pre-aggregate to one row per (key, ts) — e.g. with
``max_by``) or results are tie-ambiguous exactly as they would be in
SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_seconds(c: Column, dtype: T.DataType) -> Column:
    """Numeric (epoch-seconds) view of a timestamp-or-numeric column —
    TIMESTAMP_NTZ refuses a direct double cast in Spark 4."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: dict[str, str],
    *,
    direction: str = "backward",
    tolerance_s: float | None = None,
    chunk_seconds: float | None = None,
) -> DataFrame:
    """Inclusive as-of join, backward (default), forward, or nearest —
    the full pandas ``merge_asof`` direction surface.

    For every left row, attach the right row with the greatest
    ``right_ts`` ≤ the left row's ``left_ts`` (``backward``), the
    smallest ``right_ts`` ≥ it (``forward``), or whichever of the two is
    closer in time (``nearest``; exact tie → backward, pandas'
    tie-break) — within the same ``on`` key, or NULLs when no such row
    exists (LEFT OUTER semantics — every left row survives).  Forward is
    the backward machinery run on NEGATED time (one extra arithmetic
    expression, same plan shape); nearest computes both picks with TWO
    windows over the ONE shuffled relation (same partitioning, a second
    sort order — no extra shuffle) and chooses per row.  With
    ``tolerance_s``, nearest follows pandas: each side's candidate is
    dropped when beyond tolerance BEFORE choosing, so an out-of-range
    nearest side falls back to the other.

    - ``value_cols``: ``{right_column: output_name}`` — the right
      columns to attach and what to call them on the output.
    - ``tolerance_s``: if set, matches further than this many seconds
      from the left timestamp (older for backward, later for forward)
      are nulled out (the row still survives).  Timestamp columns must
      cast to double (timestamps cast to epoch seconds; numerics pass
      through).
    - ``chunk_seconds``: if set, use the segmented two-level plan (see
      module docstring) with time chunks of this width.  Output is
      row-identical to the plain path; choose a width that gives each
      hot key many chunks (e.g. an hour of WAL time).  Cost note: the
      carry-in summary branch recomputes the (column-pruned,
      filter-pushed) input scans — persist the inputs upstream if a
      second scan is dearer than the hot-key fix.

    Right-side rows must be unique per (key, ``right_ts``) for
    deterministic output — pre-aggregate ties (``max_by``) upstream.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    out_cols = list(left.columns) + [value_cols[c] for c in value_cols]
    lts_type = left.schema[left_ts].dataType
    rts_num = _as_seconds(F.col(right_ts), right.schema[right_ts].dataType)
    if direction == "forward":
        # run the backward plan on negated time: smallest rt ≥ t becomes
        # largest (-rt) ≤ (-t); tolerance (l - rts on the negated axis)
        # becomes rt - t, exactly the forward slack
        t_left = -_as_seconds(F.col(left_ts), lts_type)
        rts_num = -rts_num
        t_right = rts_num
    else:
        t_left = F.col(left_ts)
        t_right = F.col(right_ts)
    rstruct = F.struct(
        rts_num.alias("_rts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l2 = left.select(
        *[F.col(k) for k in on],
        t_left.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r2 = right.select(
        *[F.col(k) for k in on],
        t_right.alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
            ).schema["_lrow"].dataType
        ).alias("_lrow"),
        rstruct.alias("_r"),
    )
    u = l2.unionByName(r2)
    # numeric view of _t: in forward mode it is already (negated) seconds
    t_num = (
        F.col("_t").cast("double") if direction == "forward"
        else _as_seconds(F.col("_t"), lts_type)
    )

    def _within_tol(matched: Column, dist: Column) -> Column:
        if tolerance_s is None:
            return matched
        return F.when(dist <= F.lit(float(tolerance_s)), matched)

    def _choose(mb: Column, mf: Column) -> Column:
        # pandas nearest: drop each side beyond tolerance FIRST, then
        # take the closer survivor; exact tie → backward
        db = t_num - mb.getField("_rts")
        df_ = mf.getField("_rts") - t_num
        mb = _within_tol(mb, db)
        mf = _within_tol(mf, df_)
        return (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)
            .otherwise(mf)
        )

    def _finish(matched: Column, base: DataFrame,
                tolerance_done: bool = False) -> DataFrame:
        if not tolerance_done:
            matched = _within_tol(matched, t_num - matched.getField("_rts"))
        picked = base.where(F.col("_side") == 1).select(
            F.col("_lrow").alias("_lrow"),
            matched.alias("_m"),
        )
        return picked.select(
            *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
            *[
                F.col(f"_m._v_{c}").alias(value_cols[c])
                for c in value_cols
            ],
        ).select(*out_cols)

    # window orders: backward pick scans [start, current] with right rows
    # sorting BEFORE a tied left row (side asc → ties inclusive); the
    # forward pick scans [current, end] with right rows sorting AFTER a
    # tied left row (side desc → the tied right lands inside the frame).
    # Same partitioning → nearest's second window re-sorts but does NOT
    # re-shuffle.
    def _back_win(*parts):
        return (
            Window.partitionBy(*parts)
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _fwd_win(*parts):
        return (
            Window.partitionBy(*parts)
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

    if chunk_seconds is None:
        within = u.withColumn(
            "_m0", F.last("_r", ignorenulls=True).over(_back_win(*on))
        )
        if direction != "nearest":
            return _finish(F.col("_m0"), within)
        within = within.withColumn(
            "_m1", F.first("_r", ignorenulls=True).over(_fwd_win(*on))
        )
        return _finish(_choose(F.col("_m0"), F.col("_m1")), within,
                       tolerance_done=True)

    # segmented (hot-key-safe) plan: window within (key, chunk), then a
    # per-chunk carry-in computed on a ≤|keys|·|chunks| summary relation
    chunk = F.floor(t_num / F.lit(float(chunk_seconds)))
    uc = u.withColumn("_c", chunk)
    within = uc.withColumn(
        "_m0", F.last("_r", ignorenulls=True).over(_back_win(*on, "_c"))
    )
    # latest right row per (key, chunk): struct max orders by _rts first.
    # Grouped over the WHOLE union, not just right rows — a chunk with
    # only left rows still needs a summary row so the carry-in window
    # below can hand it the latest right row from earlier chunks
    # (_last is simply NULL there, and max() skips nulls).  For nearest
    # the symmetric _first/min pair carries the NEXT chunks' earliest
    # right row backward.
    aggs = [F.max("_r").alias("_last")]
    if direction == "nearest":
        aggs.append(F.min("_r").alias("_first"))
    summaries = uc.groupBy(*on, "_c").agg(*aggs)
    wprev = (
        Window.partitionBy(*on)
        .orderBy(F.col("_c").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_cols = [F.max("_last").over(wprev).alias("_carry")]
    if direction == "nearest":
        wnext = (
            Window.partitionBy(*on)
            .orderBy(F.col("_c").asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry_cols.append(F.min("_first").over(wnext).alias("_carry_next"))
    carries = summaries.select(*on, "_c", *carry_cols)
    joined = within.join(carries, [*on, "_c"], "left")
    back = F.coalesce(F.col("_m0"), F.col("_carry"))
    if direction != "nearest":
        return _finish(back, joined)
    joined = joined.withColumn(
        "_m1", F.first("_r", ignorenulls=True).over(_fwd_win(*on, "_c"))
    )
    fwd = F.coalesce(F.col("_m1"), F.col("_carry_next"))
    return _finish(_choose(back, fwd), joined, tolerance_done=True)


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: list[str],
    fact_lsn_col: str,
    value_cols: dict[str, str],
    *,
    lsn_col: str = "_sdc_lsn",
    deleted_col: str = "_sdc_deleted_at",
    chunk_lsns: float | None = None,
) -> DataFrame:
    """Temporal-table join (Flink's ``FOR SYSTEM_TIME AS OF`` analog):
    enrich each fact row with the dimension values that were CURRENT at
    the fact's LSN, from the dimension's CDC version history.

    ``history`` is a version-history relation — one row per key per
    change, stamped with ``lsn_col`` and carrying ``deleted_col``
    tombstones — exactly what ``LakeTable.read_changes(0, fold=False)``
    returns.  Facts that precede the key's first version, or land while
    the key was deleted, get NULL enrichment (LEFT-outer; every fact
    survives).  ``chunk_lsns`` forwards to :func:`asof_join`'s segmented
    hot-key-safe plan (width in LSN units).

    History resolution is commit granularity: each CDC merge batch was
    LWW-folded at write time, so a fact LSN falling between two updates
    folded into one commit resolves to the state BEFORE that commit.
    """
    vmap = {c: value_cols[c] for c in value_cols}
    if deleted_col in history.columns:
        vmap[deleted_col] = "_pit_deleted_at"
    out = asof_join(
        facts, history, on, fact_lsn_col, lsn_col, vmap,
        chunk_seconds=chunk_lsns,
    )
    if deleted_col in history.columns:
        for name in value_cols.values():
            out = out.withColumn(
                name,
                F.when(F.col("_pit_deleted_at").isNull(), F.col(name)),
            )
        out = out.drop("_pit_deleted_at")
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    lo_col: str,
    hi_col: str,
    *,
    on: list[str] | None = None,
    bucket_width: float,
    max_span_buckets: int | None = 4096,
) -> DataFrame:
    """Inner join of left rows whose ``left_value`` falls inside the
    right side's ``[lo_col, hi_col]`` interval (inclusive both ends),
    optionally under extra equi keys ``on``.

    Scale shape: both sides bucketize by ``bucket_width`` — intervals
    explode to the buckets they cover, probe values hash to exactly one
    bucket — so Catalyst plans a HASH join on (keys, bucket) instead of
    the BroadcastNestedLoopJoin a raw non-equi predicate forces.  Each
    matching pair meets in exactly one bucket (the probe's), so no
    dedup pass is needed.  Pick ``bucket_width`` near the typical
    interval width: enumeration cost per interval is
    (hi-lo)/width + 1 rows, probe fan-out is always 1.

    Oversized-interval escape hatch (the same structural move as the
    LSH hot-bucket cap): an interval spanning more than
    ``max_span_buckets`` buckets would explode the enumeration (one
    corpus-wide interval = the whole value domain in bucket rows), so
    those few rows are split off and joined via a broadcast non-equi
    join instead — correct for any width choice, and the broadcast is
    bounded because an interval that wide matching a meaningful
    fraction of the left side is a cross-join-shaped query no blocking
    can save.  Results are the union; a pair matches in exactly one
    branch (branches partition the right side).  Pass
    ``max_span_buckets=None`` to disable the hatch (pure hash-join
    plan) when intervals are known-bounded.

    Column names must be disjoint across the two inputs (project first).
    Intervals with hi < lo match nothing.
    """
    keys = list(on or [])
    w = float(bucket_width)
    live = right.where(F.col(hi_col) >= F.col(lo_col))
    blo = F.floor(F.col(lo_col) / F.lit(w))
    bhi = F.floor(F.col(hi_col) / F.lit(w))
    small = (
        live if max_span_buckets is None
        else live.where(bhi - blo < max_span_buckets)
    )
    rb = small.withColumn("_b", F.explode(F.sequence(blo, bhi)))
    lb = left.withColumn("_b", F.floor(F.col(left_value) / F.lit(w)))
    in_range = (F.col(left_value) >= F.col(lo_col)) & (
        F.col(left_value) <= F.col(hi_col)
    )
    bucketed = (
        lb.join(rb, [*keys, "_b"], "inner").where(in_range).drop("_b")
    )
    if max_span_buckets is None:
        return bucketed
    oversized = live.where(bhi - blo >= max_span_buckets)
    cond = in_range
    for k in keys:
        cond = cond & (left[k] == oversized[k])
    escape = left.join(F.broadcast(oversized), cond, "inner")
    if keys:  # drop the duplicated key columns from the broadcast side
        escape = escape.drop(*[oversized[k] for k in keys])
    return bucketed.unionByName(escape)
