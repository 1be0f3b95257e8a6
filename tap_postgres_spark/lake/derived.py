"""Incrementally-maintained derived tables over a CDC lake table.

At 100 TB the payoff of CDC ingest is downstream: the indexes a training
pipeline hangs off the corpus — content fingerprints, token counts, PQ
codes, quality features — should refresh at O(|changes|) per epoch, not
O(|table|).  This module materializes any per-row column transform as a
second :class:`~tap_postgres_spark.lake.table.LakeTable` keyed like the
base, and keeps it current by reading the base's changelog
(``read_changes`` — only the delta dirs between versions), transforming
ONLY the touched keys, and MERGEing the result with the same
exactly-once epoch guard the ingest path uses.

Reference parity note: the reference tap has no derived-table machinery
(it stops at the Singer message stream); this is the Spark-side
continuation of its LOG_BASED contract (`client.py:234-260`) — the
bookmark that makes incremental extraction possible is exactly what
makes incremental *derivation* possible downstream.

Refresh lineage rides the epoch guard: each refresh commits under epoch
id ``derived-from-base-v{N}``, so (a) a crashed-and-replayed refresh is
a no-op before any data is written, and (b) the derived table itself
records how far it is — no side-channel state file.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SDC_DELETED_AT, SDC_LSN
from .table import LakeTable

_EPOCH_PREFIX = "derived-from-base-v"

Transform = Callable[[DataFrame], DataFrame]


def refreshed_base_version(
    derived: LakeTable, prefix: str = _EPOCH_PREFIX
) -> int:
    """Highest base-table version this derived table has applied (0 if
    never refreshed).  Read from the commit epochs, which double as the
    idempotency guard — one source of truth for both.  ``prefix``
    selects the epoch family (vectorindex.py uses its own)."""
    vs = [
        int(e[len(prefix):])
        for e in derived.committed_epochs()
        if e.startswith(prefix)
    ]
    return max(vs, default=0)


def _check_transform_output(out: DataFrame, keys: list[str]) -> None:
    missing = [c for c in (*keys, SDC_LSN) if c not in out.columns]
    if missing:
        raise ValueError(
            f"transform output must keep key columns and {SDC_LSN}; "
            f"missing: {missing}"
        )


def bootstrap_derived(
    spark: SparkSession,
    base: LakeTable,
    derived_path: str,
    transform: Transform,
    *,
    num_buckets: int | None = None,
    extra_keys: "tuple[str, ...]" = (),
    columns: "list[str] | None" = None,
) -> LakeTable:
    """Create a derived table from a full transform of the base head —
    the one O(|table|) pass; every later :func:`refresh_derived` is
    O(|changes|).  Stamped with the base version it saw, so the first
    incremental refresh picks up exactly where the bootstrap stopped.

    ``extra_keys`` declares a MULTI-ROW derivation: the transform emits
    several rows per base key, disambiguated by the named columns (e.g.
    a banded MinHash index emits one row per ``band``), and the derived
    table is keyed on ``base keys + extra_keys``.  The transform must
    emit a FIXED extra-key set per base key (every update re-emits all
    of them, so LWW overwrites row-for-row and leaves no stale rows);
    refreshes then need an ``expand_tombstones`` callback so a base
    delete tombstones every derived row of that key."""
    to_v = base.current_version()
    # columns= narrows the SCAN (the LWW fold blocks Catalyst's column
    # pruning): pass the transform's input columns so a 2-column
    # derivation of a wide table reads 2 columns, not the row
    live = base.read(columns=columns)  # LWW-folded, tombstones dropped
    out = transform(live)
    keys = base.key_columns + list(extra_keys)
    _check_transform_output(out, keys)
    schema = T.StructType(list(out.schema.fields))
    if SDC_DELETED_AT not in out.columns:
        schema = schema.add(T.StructField(SDC_DELETED_AT, T.StringType(), True))
    derived = LakeTable.create(
        spark,
        derived_path,
        schema,
        keys,
        num_buckets=num_buckets if num_buckets is not None else base.num_buckets,
    )
    derived.merge_into(out, epoch_id=f"{_EPOCH_PREFIX}{to_v}")
    return derived


def refresh_derived(
    base: LakeTable,
    derived: LakeTable,
    transform: Transform,
    *,
    to_version: int | None = None,
    expand_tombstones: Transform | None = None,
    columns: "list[str] | None" = None,
) -> dict[str, Any]:
    """Bring ``derived`` up to the base head by transforming ONLY the
    keys the base changelog touched since the last refresh.

    ``transform`` maps live base rows to derived rows; it must keep the
    key columns and pass ``_sdc_lsn`` through unchanged (select it
    alongside the derived columns) — the LSN is what lets the derived
    merge fold out-of-order refreshes with the same LWW rule as ingest.
    Base deletes become derived tombstones.

    Scale shape: ``read_changes`` opens only the delta dirs of the
    refreshed range (never the full table), the transform runs over
    |changes| rows, and the merge rewrites only the buckets those keys
    hash to.  A nightly full recompute at 100 TB rereads the world;
    this rereads an epoch.
    """
    to_v = to_version if to_version is not None else base.current_version()
    from_v = refreshed_base_version(derived)
    if to_v <= from_v:
        return {
            "skipped": True,
            "reason": f"derived already at base v{from_v} >= v{to_v}",
            "version": derived.current_version(),
        }
    changes = base.read_changes(from_v, to_v, columns=columns)
    keys = derived.key_columns  # base keys + any extra_keys
    extra = [k for k in keys if k not in base.key_columns]
    if extra and expand_tombstones is None:
        raise ValueError(
            f"derived table is keyed on extra columns {extra}; pass "
            "expand_tombstones to map each base delete to all derived "
            "rows of that key"
        )
    live = changes.filter(F.col(SDC_DELETED_AT).isNull())
    ups = transform(live)
    _check_transform_output(ups, keys)
    if SDC_DELETED_AT in ups.columns:
        raise ValueError(
            f"transform must not emit {SDC_DELETED_AT}; deletes are "
            "propagated from the base changelog"
        )
    tombs = changes.filter(F.col(SDC_DELETED_AT).isNotNull()).select(
        *base.key_columns, F.col(SDC_LSN), F.col(SDC_DELETED_AT)
    )
    if expand_tombstones is not None:
        tombs = expand_tombstones(tombs)
        missing = [c for c in keys if c not in tombs.columns]
        if missing:
            raise ValueError(
                f"expand_tombstones output missing key columns: {missing}"
            )
    batch = ups.withColumn(
        SDC_DELETED_AT, F.lit(None).cast("string")
    ).unionByName(tombs, allowMissingColumns=True)
    return derived.merge_into(batch, epoch_id=f"{_EPOCH_PREFIX}{to_v}")
