"""Consistent snapshot → change-stream handoff (bootstrap).

The reference runs a FULL_TABLE initial sync and then switches the
stream to LOG_BASED, trusting the replication slot created *before* the
snapshot to retain every change made while the snapshot ran
(/root/reference/tap_postgres/client.py:196-231 snapshot scan;
wal_reader.py:108 ``start_lsn = bookmark or 0``).  This module is the
lake-side re-creation of that handoff, generalized to the chunked
watermark bootstrap of Netflix's DBLog (Andradottir et al., "DBLog: A
Watermark Based Change-Data-Capture Framework", 2019 — public paper):

- every snapshot row is stamped with the LSN **at which its value was
  captured** (``_sdc_lsn = capture LSN``) — one literal for a
  single-transaction snapshot, a per-chunk column when the snapshot was
  read in key-range chunks at different points in time;
- the stream bookmark is set to the MINIMUM capture LSN, so the WAL
  tail replays every event that *might* not be reflected in some chunk;
- overlap needs no windowing logic at all: the LWW merge resolves it.
  An event with ``lsn ≤`` a row's capture LSN loses to the snapshot row
  (its effect is already inside the captured value); an event with
  ``lsn >`` the capture LSN wins.  Deletes replayed over a chunk that
  already excludes the row fold to a tombstone — same final state.

Scale notes (the 100-TB story): the snapshot write is the existing
bucket-parallel ``LakeTable.overwrite`` (one pass, no shuffle beyond the
bucket repartition); chunked capture means the source is never held in
one long repeatable-read transaction, which is what makes a 10^10-row
initial sync feasible while the WAL keeps flowing.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake import LakeTable
from ..schema import SDC_DELETED_AT, SDC_LSN, StreamDef
from ..state import StateStore
from .full_table import full_table_scan

LSN_KEY = "lsn"


def bootstrap_snapshot(
    snapshot: DataFrame,
    stream: StreamDef,
    table: LakeTable,
    state: StateStore,
    *,
    snapshot_lsn: int | None = None,
    capture_lsn_col: str | None = None,
    epoch_id: str = "bootstrap",
) -> dict[str, Any]:
    """Load ``snapshot`` into ``table`` and hand the stream off to the
    WAL tail at the right bookmark.

    Exactly one capture-LSN source must be given:

    - ``snapshot_lsn``: the whole snapshot is one consistent view at
      this LSN (``pg_current_wal_lsn()`` read inside the snapshot's
      repeatable-read transaction) — every row is stamped with it and
      the bookmark is set to it.
    - ``capture_lsn_col``: chunked (DBLog-style) snapshot; the named
      column carries each row's chunk-capture LSN.  Rows are stamped
      per-chunk and the bookmark floor is ``min(capture_lsn_col)``
      (one column-pruned aggregate over the snapshot).  Pass
      ``snapshot_lsn`` TOO if the minimum is already known — the scan
      is skipped and ``snapshot_lsn`` is used as the floor.

    The load itself is ``full_table_scan`` shaping (projection /
    custom WHERE / limit — SURVEY §2.2 P1-P3) + CDC widening +
    ``LakeTable.overwrite``; idempotent per ``epoch_id``, and the
    bookmark advance is forward-only, so a crashed-and-replayed
    bootstrap converges.
    """
    if (snapshot_lsn is None) and (capture_lsn_col is None):
        raise ValueError("one of snapshot_lsn / capture_lsn_col is required")
    if capture_lsn_col is not None:
        if capture_lsn_col in [f.name for f in stream.spark_schema.fields]:
            raise ValueError(
                f"capture_lsn_col {capture_lsn_col!r} collides with a data column"
            )
        stamp = F.col(capture_lsn_col).cast("long")
        if snapshot_lsn is not None:
            floor = int(snapshot_lsn)
        else:
            floor_row = snapshot.select(
                F.min(F.col(capture_lsn_col).cast("long")).alias("f")
            ).first()
            if floor_row["f"] is None:
                raise ValueError("empty snapshot with no snapshot_lsn: floor unknown")
            floor = int(floor_row["f"])
    else:
        stamp = F.lit(int(snapshot_lsn)).cast("long")
        floor = int(snapshot_lsn)

    # Stamp _sdc_lsn on the RAW snapshot, before full_table_scan shaping:
    # with selected_columns set, the projection would otherwise drop
    # capture_lsn_col and the later stamp would reference a missing
    # column (AnalysisException).  The stamped column is carried through
    # the projection explicitly.
    stamped = snapshot.withColumn(SDC_LSN, stamp)
    shaped_stream = stream
    if stream.selected_columns:
        shaped_stream = dataclasses.replace(
            stream,
            selected_columns=(
                *[c for c in stream.selected_columns if c != SDC_LSN],
                SDC_LSN,
            ),
        )
    shaped = full_table_scan(stamped, shaped_stream)
    widened = shaped.withColumn(
        SDC_DELETED_AT, F.lit(None).cast("string")
    )
    if capture_lsn_col is not None and capture_lsn_col in widened.columns:
        widened = widened.drop(capture_lsn_col)

    result = table.overwrite(widened, epoch_id=epoch_id)
    state.advance(stream.fqn, LSN_KEY, floor)
    state.flush()
    return {**result, "bookmark": floor, "fqn": stream.fqn}
