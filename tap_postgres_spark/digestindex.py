"""Incrementally-maintained content-DIGEST membership index over a CDC
lake table — the exact-dedup instantiation of
:mod:`~tap_postgres_spark.lake.inverted` (cell = hash bucket of the
md5 digest).

Why it exists: :func:`~tap_postgres_spark.pipelineops.dedup_against_corpus`
is the one-shot form — a sort-merge LEFT ANTI join that shuffles the
corpus digest set per incremental batch.  At 10^10 corpus documents
that is an O(corpus) shuffle every crawl epoch.  This index makes the
same membership question O(|new|):

- the corpus's digests live in ``n_cells`` hash-bucketed partitions,
  maintained off the CDC changelog (a content UPDATE changes the
  digest, which moves the row between buckets — the forward-map +
  move-tombstone machinery handles exactly that);
- a probe hashes the fresh batch's digests, prunes the scan to ≤
  min(|fresh|, n_cells) bucket dirs, and resolves membership with two
  broadcast joins of the (small) fresh digest set — neither the corpus
  nor the index ever shuffles.

The digest is ``md5(text)`` — the same hash `dedup_exact` /
`dedup_against_corpus` use, so the three compose.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import LakeTable
from .lake.inverted import (
    bootstrap_inverted,
    compact_inverted,
    read_inverted_meta,
    refresh_inverted,
    resolved_cells,
)

_CELL = "bucket"
_FP = "fp"


def _assign_fn(text_col: str, n_cells: int):
    def _assign(df: DataFrame) -> DataFrame:
        # digest computed once, bucket = hash of the digest: rows with
        # NULL text carry no digest and are filtered (un-indexable —
        # the generic refresh tombstones their old bucket)
        return (
            df.filter(F.col(text_col).isNotNull())
            .withColumn(_FP, F.md5(F.col(text_col).cast("string")))
            .withColumn(_CELL, F.pmod(F.xxhash64(F.col(_FP)), F.lit(n_cells)))
        )

    return _assign


def bootstrap_digest_index(
    spark: SparkSession,
    base: LakeTable,
    root: str,
    *,
    text_col: str = "content",
    n_cells: int = 256,
) -> dict[str, Any]:
    """Full build over the base head.  ``n_cells`` sizes the partition
    fan-out: pick it so one cell's digests (|corpus| / n_cells rows of
    (keys, 32-char fp)) read in one task comfortably — at 10^10 docs,
    n_cells ≈ 2^14 keeps cells at ~600k rows."""
    # payload on disk is the digest itself (exact membership check, no
    # collision false-positives), never the text; the text column is the
    # SOURCE the assign derives it from
    return bootstrap_inverted(
        spark, base, root, _assign_fn(text_col, n_cells),
        cell_col=_CELL, payload_cols=[_FP], source_cols=[text_col],
        n_cells=n_cells, extra_meta={"text_col": text_col},
    )


def refresh_digest_index(
    base: LakeTable,
    root: str,
    *,
    to_version: int | None = None,
) -> dict[str, Any]:
    """O(|changes|) refresh — see
    :func:`~tap_postgres_spark.lake.inverted.refresh_inverted`."""
    meta = read_inverted_meta(root)
    return refresh_inverted(
        base, root,
        _assign_fn(meta["text_col"], int(meta["n_cells"])),
        to_version=to_version,
    )


def probe_digest_index(
    spark: SparkSession,
    root: str,
    fresh: DataFrame,
    text_col: str = "text",
    *,
    keep: str = "new",
) -> DataFrame:
    """Membership probe of a fresh batch against the maintained corpus
    index.  ``keep='new'`` returns fresh rows whose content does NOT
    appear in the corpus (the incremental-crawl dedup filter);
    ``keep='dup'`` returns the ones that do (the quarantine/report
    side).

    Scale shape: the scan opens only the ≤ min(|fresh digests|,
    n_cells) bucket dirs the fresh digests hash to (driver-side
    partition filter, same contract as ``LakeTable.buckets_for_keys``),
    the probed cells fold per key, and membership resolves with two
    broadcast joins of the fresh digest set (|fresh| rows of 32-char
    strings) — the corpus never shuffles and no text bytes cross the
    wire."""
    if keep not in ("new", "dup"):
        raise ValueError(f"keep must be 'new' or 'dup', got {keep!r}")
    meta = read_inverted_meta(root)
    n_cells = int(meta["n_cells"])
    fr = fresh.withColumn("__fp", F.md5(F.col(text_col).cast("string")))
    cells = [
        int(r[0])
        for r in fr.select(
            F.pmod(F.xxhash64(F.col("__fp")), F.lit(n_cells))
        )
        .distinct()
        .collect()
        if r[0] is not None
    ]
    resolved = resolved_cells(spark, root, cells)
    probe_fps = fr.select(F.col("__fp").alias(_FP)).distinct()
    hit_fps = (
        resolved.join(F.broadcast(probe_fps), _FP, "left_semi")
        .select(F.col(_FP).alias("__hit_fp"))  # fresh may carry its own
        .distinct()                            # 'fp' column — keep the
    )                                          # join key unambiguous
    how = "left_anti" if keep == "new" else "left_semi"
    return fr.join(
        F.broadcast(hit_fps), fr["__fp"] == F.col("__hit_fp"), how
    ).drop("__fp")


def compact_digest_index(
    spark: SparkSession, root: str, *, cells: list[int] | None = None
) -> int:
    """Tiered maintenance — see
    :func:`~tap_postgres_spark.lake.inverted.compact_inverted`."""
    return compact_inverted(spark, root, cells=cells)
