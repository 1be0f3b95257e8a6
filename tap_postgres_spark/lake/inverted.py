"""Generic maintained INVERTED INDEX over a CDC lake table.

The pattern behind :mod:`~tap_postgres_spark.vectorindex` (IVF cells)
and :mod:`~tap_postgres_spark.digestindex` (content-digest buckets),
extracted once: an index whose on-disk partitioning is some
deterministic function of the ROW VALUE ("cell") — centroid id, digest
hash, language, shard — kept current off the base table's changelog at
O(|changes|) per refresh.

The hard part all such indexes share: when a row's VALUE changes, its
cell can change, and the stale entry sits in a partition a pruned probe
may read without ever seeing the newer version.  The fix is the same
trio everywhere:

- **forward map** — a key-bucketed :class:`LakeTable` recording each
  key's current cell, so the OLD cell of a changed key is a
  bucket-pruned point lookup (never an index scan);
- **move/death tombstones** — a refresh appends the new live row to the
  new cell AND a tombstone to the old cell, both stamped with the
  change LSN;
- **per-key MOR fold on read** — probed cells resolve by max
  ``(_sdc_lsn, live)`` per key (live wins LSN ties: a move's tombstone
  and its new row carry the same LSN, and the live row must win when
  both cells are probed).

Layout under ``root/``::

    cells/<cell_col>=N/*.parquet    inverted file: MOR deltas per cell
    map/                            forward-map LakeTable (key-bucketed)
    index.json                      cell_col, payload_cols, key_columns,
                                    n_cells + instantiation-specific meta

Exactly-once: the forward map commits under epoch
``inv-from-base-v{N}``; a replayed refresh is a no-op before any data is
written, and a crash between the cell append and the map commit replays
into duplicate delta rows the fold collapses.

The ``assign`` callback owns the semantics: given rows carrying the key
columns, ``_sdc_lsn`` and the SOURCE columns, it returns them with the
``cell_col`` and every PAYLOAD column present (payloads may be derived —
a digest index stores md5(text), not text).  It may FILTER OUT rows
that cannot be indexed (NULL payloads); the generic refresh treats an
assignable-before key that no longer assigns exactly like a delete
(tombstone in the old cell, forward-map retains the last known cell for
future tombstoning).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lww import fold_last_writer_wins_agg
from ..schema import SDC_DELETED_AT, SDC_LSN, widen_for_cdc
from .derived import refreshed_base_version
from .table import LakeTable

_EPOCH_PREFIX = "inv-from-base-v"
LIVE = "_live"

Assign = Callable[[DataFrame], DataFrame]


def meta_path(root: str) -> str:
    return os.path.join(root, "index.json")


def cells_path(root: str) -> str:
    return os.path.join(root, "cells")


def read_inverted_meta(root: str) -> dict[str, Any]:
    with open(meta_path(root)) as f:
        return json.load(f)


def write_cells(
    df: DataFrame, root: str, cell_col: str, mode: str
) -> None:
    """One partition dir per cell; task count follows the session's
    shuffle parallelism (AQE coalesces small deltas), each cell's rows
    land in one task → one file per cell per write."""
    (
        df.repartition(F.col(cell_col))
        .write.mode(mode)
        .partitionBy(cell_col)
        .parquet(cells_path(root))
    )


def bootstrap_inverted(
    spark: SparkSession,
    base: LakeTable,
    root: str,
    assign: Assign,
    *,
    cell_col: str,
    payload_cols: list[str],
    n_cells: int,
    source_cols: list[str] | None = None,
    extra_meta: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Full build (the one O(|table|) pass) + forward-map creation,
    stamped with the base version so the first refresh continues from
    exactly here.  ``source_cols`` are what ``assign`` reads from the
    base (default: the payload columns themselves)."""
    to_v = base.current_version()
    keys = base.key_columns
    src = source_cols if source_cols is not None else payload_cols
    # columns= narrows the parquet scan itself (the LWW fold blocks
    # Catalyst's pruning): a content-digest index over a wide table
    # reads only its source columns
    assigned = assign(
        base.read(columns=list(src)).select(*keys, SDC_LSN, *src)
    ).withColumn(LIVE, F.lit(1))
    write_cells(
        assigned.select(*keys, SDC_LSN, cell_col, *payload_cols, LIVE),
        root, cell_col, "overwrite",
    )

    map_schema = widen_for_cdc(assigned.select(*keys, cell_col).schema)
    fmap = LakeTable.create(
        spark, os.path.join(root, "map"), map_schema, keys,
        num_buckets=base.num_buckets,
    )
    fmap.merge_into(
        assigned.select(*keys, cell_col, SDC_LSN).withColumn(
            SDC_DELETED_AT, F.lit(None).cast("string")
        ),
        epoch_id=f"{_EPOCH_PREFIX}{to_v}",
    )
    meta = {
        "cell_col": cell_col,
        "payload_cols": list(payload_cols),
        "source_cols": list(src),
        "key_columns": list(keys),
        "n_cells": int(n_cells),
        # cell-file schema, for reading an index whose corpus was empty
        # at bootstrap (no parquet files yet → nothing to infer from)
        "cell_schema": assigned.select(
            *keys, SDC_LSN, cell_col, *payload_cols, LIVE
        ).schema.jsonValue(),
        **(extra_meta or {}),
    }
    os.makedirs(root, exist_ok=True)
    with open(meta_path(root), "w") as f:
        json.dump(meta, f)
    return {"base_version": to_v, "cells": int(n_cells)}


def refresh_inverted(
    base: LakeTable,
    root: str,
    assign: Assign,
    *,
    to_version: int | None = None,
) -> dict[str, Any]:
    """Bring the index to the base head at O(|changes|): re-assign
    changed rows, look up old cells in the forward map (bucket-pruned),
    append live rows to new cells and tombstones to old cells for
    moves/deaths, merge the forward map under the epoch guard."""
    meta = read_inverted_meta(root)
    keys = meta["key_columns"]
    cell_col = meta["cell_col"]
    payload_cols = meta["payload_cols"]
    source_cols = meta.get("source_cols", payload_cols)
    fmap = LakeTable(base.spark, os.path.join(root, "map"))

    to_v = to_version if to_version is not None else base.current_version()
    from_v = refreshed_base_version(fmap, _EPOCH_PREFIX)
    if to_v <= from_v:
        return {"skipped": True, "from": from_v, "to": to_v}
    changes = base.read_changes(from_v, to_v, columns=list(source_cols))

    live = changes.filter(F.col(SDC_DELETED_AT).isNull())
    assigned = assign(live.select(*keys, SDC_LSN, *source_cols))
    # O(|changes|) rows; localCheckpoint so the assignment runs once
    # across its three consumers (new rows, move detection, map merge)
    assigned = assigned.localCheckpoint()
    changed_keys = changes.select(*keys).distinct()
    old_cells = fmap.read_keys(changed_keys).select(
        *keys, F.col(cell_col).alias("_old_cell")
    )

    new_rows = assigned.withColumn(LIVE, F.lit(1))
    change_lsn = changes.groupBy(*keys).agg(F.max(SDC_LSN).alias(SDC_LSN))
    null_payloads = [
        F.lit(None).cast(new_rows.schema[c].dataType).alias(c)
        for c in payload_cols
    ]
    moved_or_dead = (
        change_lsn.join(old_cells, keys)
        .join(
            assigned.select(*keys, F.col(cell_col).alias("_new_cell")),
            keys, "left",
        )
        .filter(
            F.col("_new_cell").isNull()
            | (F.col("_new_cell") != F.col("_old_cell"))
        )
        .select(
            *keys, SDC_LSN,
            F.col("_old_cell").alias(cell_col),
            *null_payloads,
            F.lit(0).alias(LIVE),
        )
    )
    cols = [*keys, SDC_LSN, cell_col, *payload_cols, LIVE]
    delta = new_rows.select(*cols).unionByName(moved_or_dead.select(*cols))
    write_cells(delta, root, cell_col, "append")

    tombs = changes.filter(F.col(SDC_DELETED_AT).isNotNull()).select(
        *keys, F.col(SDC_LSN), F.col(SDC_DELETED_AT)
    )
    map_batch = assigned.select(*keys, cell_col, SDC_LSN).withColumn(
        SDC_DELETED_AT, F.lit(None).cast("string")
    ).unionByName(tombs, allowMissingColumns=True)
    res = fmap.merge_into(map_batch, epoch_id=f"{_EPOCH_PREFIX}{to_v}")
    return {"skipped": False, "from": from_v, "to": to_v, "map_commit": res}


def resolved_cells(
    spark: SparkSession,
    root: str,
    cell_ids: list[int] | None = None,
) -> DataFrame:
    """Probed cells with the per-key MOR fold applied (tombstones
    dropped).  ``cell_ids=None`` resolves every cell.  The partition
    filter prunes the scan to the probed dirs; the fold is a
    map-side-combined max_by over only those cells' rows."""
    meta = read_inverted_meta(root)
    try:
        cells = spark.read.parquet(cells_path(root))
    except Exception:
        # bootstrapped over an empty corpus: no files to infer from
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(meta["cell_schema"])
        return spark.createDataFrame([], schema)
    if cell_ids is not None:
        cells = cells.filter(
            F.col(meta["cell_col"]).isin([int(c) for c in cell_ids])
        )
    folded = fold_last_writer_wins_agg(
        cells, meta["key_columns"], (SDC_LSN, LIVE)
    )
    return folded.filter(F.col(LIVE) == 1)


def compact_inverted(
    spark: SparkSession, root: str, *, cells: list[int] | None = None
) -> int:
    """Fold the MOR deltas of the given cells (default: all) back to one
    resolved file each via dynamic partition overwrite — untouched cells
    keep their files.  A fully-tombstoned cell keeps its delta files
    (no rows to overwrite the partition with); reads stay correct (the
    fold drops them) and the next refresh touching the cell folds them.
    Returns the number of cells targeted."""
    meta = read_inverted_meta(root)
    cell_col = meta["cell_col"]
    path = cells_path(root)
    try:
        df = spark.read.parquet(path)
    except Exception:
        return 0  # empty-corpus index: nothing to fold
    if cells is not None:
        df = df.filter(F.col(cell_col).isin([int(c) for c in cells]))
    folded = fold_last_writer_wins_agg(
        df, meta["key_columns"], (SDC_LSN, LIVE)
    ).filter(F.col(LIVE) == 1)
    n = len(cells) if cells is not None else int(meta["n_cells"])
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            folded.repartition(F.col(cell_col))
            .write.mode("overwrite")
            .partitionBy(cell_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n
