"""TOAST-safe partial-update resolution (per-column last-writer-wins).

The real-world gap this closes: with REPLICA IDENTITY DEFAULT (the
Postgres default), wal2json OMITS unchanged TOASTed columns from UPDATE
events — the event simply does not carry the big ``content`` column when
only ``stars`` changed.  The reference pipeline passes whatever columns
the event carries straight through (client.py:547-570 builds the record
from ``columns`` as-is), so a merge of full records overwrites the
stored value with NULL.  Our wholesale LWW fold (operators/lww.py) has
the same hazard: the latest event wins the whole row, absent columns
decoded as NULL included.

Fix, in three Spark-native steps, all opt-in via
``CdcPipeline(partial_updates=True)``:

1. **Decode** emits a presence bitmask (``decode_projection(with_mask=
   True)``): bit i set ⟺ data column i appeared in the event payload —
   distinguishing "absent" from "explicitly NULL" before the typed
   projection erases it.
2. **Fold** (:func:`fold_partial_lww`): per COLUMN last-writer-wins —
   each data column takes its value from the latest event *in which it
   was present* (``max_by`` with a presence-gated ordering struct; NULL
   ordering keys are ignored by ``max_by``, so events that omitted the
   column never compete).  Row-level fields (``_sdc_lsn``, ``txid``,
   ``_sdc_deleted_at``) come from the globally latest event; the output
   mask is the ``bit_or`` union of contributors.  Still ONE map-side-
   combined shuffle — same cost class as the wholesale fold, just wider
   aggregate expressions.
3. **Fill** (:func:`resolve_partial_images`): keys whose folded mask is
   still incomplete (no event in the batch carried column c) read their
   current image from the table — bucket-pruned + broadcast-semi point
   read, O(|incomplete keys' buckets|), the aggview point-read shape —
   and coalesce per column.  The written delta is therefore always a
   FULL image: the lake keeps wholesale LWW resolution and every
   downstream consumer (changelog, derived tables, aggregate views,
   changefeed) is untouched.

Ordering invariants this relies on (Postgres guarantees, pinned in
tests/test_partial_updates.py):

- an UPDATE never follows a DELETE for the same key without an INSERT
  in between, and INSERTs always carry the full image — so a partial
  event's absent columns always have a resolvable prior image *in LSN
  order*;
- the feed is applied in LSN-ordered batches (the file-source contract
  elsewhere in this repo), so the prior image is either in the same
  batch (resolved by the fold) or already in the table (resolved by the
  fill).  A partial row whose key has NO prior image (bookmark floor
  started mid-stream) keeps NULLs and is counted (``unresolved``) —
  the honest analog of the reference skipping below-bookmark events.

Out-of-order replay stays safe end-to-end: filled rows carry their
event's original ``_sdc_lsn``, so the lake's ``(lsn, gen)`` LWW still
rejects a stale replay against newer committed rows.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from ..plancache import memo
from ..schema import SDC_DELETED_AT, SDC_LSN, SDC_MASK

# row-level (non-data) columns resolved wholesale from the latest event
_ROW_LEVEL = (SDC_LSN, SDC_DELETED_AT, "txid", "_action")


def full_mask(n_cols: int) -> int:
    """The mask value of a complete image over ``n_cols`` data columns."""
    return (1 << n_cols) - 1


def fold_partial_lww(
    df: DataFrame,
    key_cols: Sequence[str],
    data_cols: Sequence[str],
    order_cols: Sequence[str] = (SDC_LSN, "txid"),
) -> DataFrame:
    """One row per key under per-COLUMN last-writer-wins.

    ``df`` is a decoded batch carrying :data:`~..schema.SDC_MASK`;
    ``data_cols`` is the stream's data-column list in MASK BIT ORDER
    (``decode.data_columns(stream)``).  Each non-key data column resolves
    to its value in the latest event where its bit is set; row-level
    columns resolve from the globally latest event; the output mask is
    the union of contributors — an unset output bit means NO event in
    the batch carried that column, i.e. the row needs
    :func:`resolve_partial_images`.

    Executes as ONE hash aggregation with map-side partial combine —
    skew-proof for the same reason as ``fold_last_writer_wins_agg``.
    """
    key_cols = list(key_cols)
    data_cols = list(data_cols)
    order_cols = [c for c in order_cols if c in df.columns]
    row_level = [c for c in _ROW_LEVEL if c in df.columns]

    def build_aggs() -> list[Column]:
        ord_ = F.struct(*[F.col(c) for c in order_cols])
        aggs: list[Column] = []
        for i, c in enumerate(data_cols):
            if c in key_cols:
                continue
            present = F.col(SDC_MASK).bitwiseAND(F.lit(1 << i)) != 0
            aggs.append(F.max_by(F.col(c), F.when(present, ord_)).alias(c))
        aggs.append(
            F.max_by(F.struct(*[F.col(c) for c in row_level]), ord_).alias(
                "_latest"
            )
        )
        aggs.append(F.expr(f"bit_or({SDC_MASK})").alias(SDC_MASK))
        return aggs

    aggs = memo(
        (
            "partial_fold",
            tuple(key_cols),
            tuple(data_cols),
            tuple(order_cols),
            tuple(row_level),
        ),
        build_aggs,
    )
    folded = df.groupBy(*key_cols).agg(*aggs)
    out_cols = (
        key_cols
        + [c for c in data_cols if c not in key_cols]
        + [f"_latest.{c}" for c in row_level]
        + [SDC_MASK]
    )
    return folded.select(*out_cols)


def resolve_partial_images(
    table: Any,
    folded: DataFrame,
    key_cols: Sequence[str],
    data_cols: Sequence[str],
    observation: Observation | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Fill a partially-folded batch to FULL images from the table.

    ``folded`` is :func:`fold_partial_lww` output, persisted by the
    caller (it is re-scanned once here for bucket discovery and once by
    the merge).  Rows whose mask is complete — or that are tombstones,
    whose data columns are irrelevant — pass through unchanged.
    Incomplete live rows LEFT-join their current stored image, read
    bucket-pruned (only the incomplete keys' buckets are scanned) and
    broadcast-semi-filtered below the lake's LWW fold, and take the
    stored value for every unset bit.  Keys with no stored image keep
    NULL; pass ``observation`` to have their count ride the caller's
    merge action as ``partial_unresolved`` (zero extra passes).

    Returns ``(full_image_df_without_mask, summary)`` where ``summary``
    carries the pruned bucket list (empty ⇒ clean batch pass-through).
    """
    key_cols = list(key_cols)
    data_cols = list(data_cols)
    fm = full_mask(len(data_cols))
    incomplete = (F.col(SDC_MASK) != fm) & F.col(SDC_DELETED_AT).isNull()

    # Materialize the persisted fold through a GLOBAL count first.  This
    # is not just bookkeeping: any caller-attached Observation upstream
    # (the CDC batch metrics ride the decode projection) must fire on an
    # action whose FINAL plan still contains the CollectMetrics node — a
    # global aggregate always emits one row, so AQE cannot empty-
    # propagate the subtree away.  The bucket-discovery collect below
    # can legitimately return ZERO rows, and on an empty final stage
    # AQE's PropagateEmptyRelation drops the plan subtree holding
    # CollectMetrics, completing the observation with an EMPTY metrics
    # map (observed: Observation.get then dies in toPyRow).  After this
    # count the cache is warm, so the discovery scan reads
    # InMemoryTableScan — no CollectMetrics in its plan at all.
    n_folded = folded.count()

    # bounded driver action on the PERSISTED folded relation: the set of
    # buckets holding incomplete keys (≤ num_buckets values).  Clean
    # batches (the overwhelming case for non-TOAST workloads) short-
    # circuit to a pass-through here.
    meta = table.metadata()
    bucket_col = table._bucket_expr(
        key_cols, meta["num_buckets"], table._bucket_fn(meta)
    )
    incomplete_buckets = sorted(
        int(r[0])
        for r in folded.filter(incomplete)
        .select(bucket_col.alias("_b"))
        .distinct()
        .collect()
    )
    out_cols = [c for c in folded.columns if c != SDC_MASK]
    if not incomplete_buckets:
        return folded.select(*out_cols), {
            "buckets": [],
            "keys": n_folded,
        }

    old = table.read(
        buckets=incomplete_buckets,
        semi_keys=folded.filter(incomplete).select(*key_cols),
    ).alias("__old")
    b = folded.alias("__b")
    cond = None
    for c in key_cols:
        one = F.col(f"__b.{c}").eqNullSafe(F.col(f"__old.{c}"))
        cond = one if cond is None else (cond & one)
    joined = b.join(old, cond, "left")

    b_incomplete = (F.col(f"__b.{SDC_MASK}") != fm) & F.col(
        f"__b.{SDC_DELETED_AT}"
    ).isNull()
    old_cols = set(old.columns)
    filled: list[Column] = []
    for c in out_cols:
        if c in key_cols or c not in data_cols:
            filled.append(F.col(f"__b.{c}").alias(c))
            continue
        i = data_cols.index(c)
        bit_set = F.col(f"__b.{SDC_MASK}").bitwiseAND(F.lit(1 << i)) != 0
        keep_batch = bit_set | F.col(f"__b.{SDC_DELETED_AT}").isNotNull()
        # a column the stored schema doesn't have yet (schema-evolution
        # correction pass filling from the pre-evolution table) has no
        # prior image anywhere — NULL, typed from the batch side
        fallback = (
            F.col(f"__old.{c}")
            if c in old_cols
            else F.lit(None).cast(folded.schema[c].dataType)
        )
        filled.append(
            F.when(keep_batch, F.col(f"__b.{c}")).otherwise(fallback).alias(c)
        )
    result = joined.select(
        *filled,
        (b_incomplete & F.col(f"__old.{SDC_LSN}").isNull()).alias(
            "__unresolved"
        ),
    )
    if observation is not None:
        result = result.observe(
            observation,
            F.sum(F.when(F.col("__unresolved"), 1).otherwise(0)).alias(
                "partial_unresolved"
            ),
        )
    return result.drop("__unresolved"), {
        "buckets": incomplete_buckets,
        "keys": n_folded,
    }
