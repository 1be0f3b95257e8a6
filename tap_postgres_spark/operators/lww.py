"""Last-writer-wins fold ("foldUp") — the vectorized replacement for the
reference's ordered row-at-a-time application.

The reference applies WAL events strictly in LSN order
(/root/reference/tap_postgres/client.py:242-243 ``is_sorted = True``), so
the last event for a key silently wins.  In Spark a micro-batch holds many
events per key at once; collapsing them to one row per key *before* the
merge both reproduces that semantics and bounds the upsert-stage shuffle
at |distinct keys| instead of |events| — the north-star "foldUp /
compaction of per-microbatch deltas".

D-then-I resurrection, multiple updates to the same key, and
update-then-delete inside one batch are all resolved here by
``(lsn, txid)`` descending.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plancache import memo

DEFAULT_ORDER = ("_sdc_lsn", "txid")


def fold_last_writer_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """One row per key: the event with the highest (lsn, txid)."""
    order_cols = [c for c in order_cols if c in df.columns]
    ordering = [F.col(c).desc() for c in order_cols] or [F.lit(1)]
    w = Window.partitionBy(*key_cols).orderBy(*ordering)
    return (
        df.withColumn("_lww_rn", F.row_number().over(w))
        .filter(F.col("_lww_rn") == 1)
        .drop("_lww_rn")
    )


def fold_last_writer_wins_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = DEFAULT_ORDER,
) -> DataFrame:
    """LWW as a hash aggregation: ``max_by(struct(payload), struct(order))``.

    Semantically identical to the window fold, but executes as ONE shuffle
    with map-side partial aggregation — each map task pre-folds its local
    events per key before anything moves, so a hot key that receives 10^6
    updates in a batch ships ≤ num_map_tasks candidate rows through the
    shuffle instead of 10^6.  This makes the aggregation skew-proof
    without salting and is the default fold on the merge path; the salted
    window variant remains for ordering-sensitive callers.
    """
    order_cols = [c for c in order_cols if c in df.columns]
    if not order_cols:
        return fold_last_writer_wins(df, key_cols, order_cols)
    payload_cols = [c for c in df.columns if c not in key_cols]

    def build() -> tuple[list[Column], Column]:
        winner = F.max_by(
            F.struct(*payload_cols), F.struct(*[F.col(c) for c in order_cols])
        ).alias("_w")
        return [F.col(c) for c in key_cols], winner

    # the agg expressions depend only on the column layout — memoized
    # (plancache.py) because this runs on every CDC micro-batch
    group_cols, winner = memo(
        ("lww_agg", tuple(payload_cols), tuple(key_cols), tuple(order_cols)),
        build,
    )
    return df.groupBy(*group_cols).agg(winner).select(*key_cols, "_w.*")


def salted_fold_last_writer_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = DEFAULT_ORDER,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase LWW for hot keys (SURVEY.md §2.3 R3).

    A single key receiving millions of updates in one batch would make the
    plain window a one-task straggler.  Phase 1 partitions by
    ``(key, salt)`` where salt is derived from the *ordering* columns (so
    events of one key spread across ``num_salts`` reducers) and keeps each
    salt's winner; phase 2 resolves the ≤``num_salts`` survivors per key.
    Phase 2's input is bounded by |keys| × num_salts, so no skew survives.

    Semantically identical to :func:`fold_last_writer_wins` because max is
    associative over any partitioning of the events.
    """
    order_cols = [c for c in order_cols if c in df.columns]
    if not order_cols:
        return fold_last_writer_wins(df, key_cols, order_cols)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(num_salts))
    df1 = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    local = (
        df1.withColumn("_lww_rn", F.row_number().over(w1))
        .filter(F.col("_lww_rn") == 1)
        .drop("_lww_rn", "_salt")
    )
    return fold_last_writer_wins(local, key_cols, order_cols)
