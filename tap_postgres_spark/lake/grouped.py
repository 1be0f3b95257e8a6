"""Fused multi-stream merge: N tables' CDC deltas in ONE Spark job.

The reference's single-connection multi-table reader (wal_reader.py:
107-160) pays one WAL pass for all subscribed tables.  The Spark twin
shares the scan+parse via a persisted classified batch, but round-4
profiling showed the 8-stream small-batch gap is N-fold duplicated
work and per-JOB fixed overhead: each stream's merge is its own action
(own Catalyst analysis, codegen, scheduling, write-commit protocol) and
— worse — each branch re-reads the ENTIRE parsed batch from the block
store just to decode its 1/N slice (measured ~14 s executor time per
branch at 500k events × 8 streams, identical whether the branch keeps
62k or 250k rows).

The fused plan removes both multipliers:

1. ONE decode projection over the union of the streams' column sets
   (``decode.decode_projection_multi``) — a wal2json event only carries
   its own table's columns, so foreign columns decode to NULL naturally;
2. ONE LWW fold: ``groupBy(__gidx, to_json(struct(stream keys)))`` with
   ``max_by(payload, (lsn, txid))`` — per-stream key semantics inside a
   single map-side-combined shuffle;
3. per-stream ``_sdc_gen`` / ``_bucket`` as CASE expressions, one
   ``repartition(max_buckets, __gidx, _bucket)`` (the same one-task-per-
   bucket write shape the per-stream path buys with N repartitions), and
   ONE ``partitionBy(__gidx, _bucket)`` write into staging — AQE is
   disabled for just this action because it would decompose the job into
   ~2 serial waves of query-stage materialization jobs (measured);
4. each table's ``__gidx=i`` slice renames into the table's own
   ``data/v{N}-…`` dir and commits driver-side through the same
   ``_commit_delta`` tail ``merge_into`` uses — footer-stat watermarks,
   lineage, epoch dedup, optimistic lock, so crash-replay semantics are
   IDENTICAL: a partially-committed grouped epoch replays with the
   already-committed streams excluded from the union and only the rest
   written.

Files written this way carry the UNION of the streams' columns; a
table's reads are unaffected because the lake layer always reads with
an explicit schema (``_read_dirs``: missing → NULL, extra → ignored —
parquet nulls cost ~nothing on disk).

Falls back (``prepare_grouped_fused`` returns ``None``) when streams
share a column name at conflicting types/coercions, when a table's
schema would need a widening cast the fused projection didn't produce,
or when a stream carries a stream_map (caller checks) — the classic
per-stream path handles those.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..decode import STATUS_OK, decode_projection_multi
from ..operators.lww import fold_last_writer_wins_agg
from ..schema import SDC_DELETED_AT, SDC_LSN, merge_schemas
from .table import _BUCKET, SDC_GEN, LakeTable

_GIDX = "__gidx"


@dataclass
class FusedPlan:
    spark: SparkSession
    projected: DataFrame          # decode_projection_multi output
    union_fields: list            # StructField list (data columns)
    live: list[dict]              # per uncommitted stream: plan facts
    skipped: dict[str, dict[str, Any]]
    staging_root: str
    executed_fqns: list[str] = field(default_factory=list)


def prepare_grouped_fused(
    spark: SparkSession,
    classified: DataFrame,
    streams: list,
    pg_types_by_fqn: dict[str, dict[str, str]],
    tables: dict[str, LakeTable],
    epoch_ids: dict[str, str],
    floors: dict[str, int | None],
    staging_root: str,
    *,
    batch_time=None,
) -> FusedPlan | None:
    """Driver-side validation + plan construction.  Returns ``None``
    when the fused plan can't represent these streams (caller falls
    back to per-stream merges); raises nothing Spark-side — no job has
    run yet, so the caller can still attach its ``observe`` to
    ``plan.projected`` before :func:`execute_grouped_fused`."""
    multi = decode_projection_multi(
        classified, streams, pg_types_by_fqn, batch_time=batch_time
    )
    if multi is None:
        return None
    projected, union_fields = multi
    decoded_types = {f.name: f.dataType for f in union_fields}
    decoded_types[SDC_LSN] = T.LongType()
    decoded_types[SDC_DELETED_AT] = T.StringType()

    live: list[dict] = []
    skipped: dict[str, dict[str, Any]] = {}
    for idx, s in enumerate(streams):
        table = tables[s.fqn]
        meta = table.metadata()
        epoch_id = epoch_ids[s.fqn]
        if epoch_id is not None and epoch_id in meta["committed_epochs"]:
            skipped[s.fqn] = {
                "skipped": True,
                "epoch_id": epoch_id,
                "version": meta["committed_epochs"][epoch_id],
            }
            continue
        stream_cols = {f.name for f in s.spark_schema.fields}
        batch_schema = T.StructType(
            [f for f in union_fields if f.name in stream_cols]
            + [
                T.StructField(SDC_LSN, T.LongType(), True),
                T.StructField(SDC_DELETED_AT, T.StringType(), True),
            ]
        )
        table_schema = T.StructType.fromJson(meta["schema"])
        try:
            new_schema = merge_schemas(
                table_schema, batch_schema, frozen=meta["key_columns"]
            )
        except TypeError:
            # destructive or key-frozen evolution → per-stream path
            # (which raises); lossless widenings resolve in merge_schemas
            return None
        # a pre-existing table column whose type differs from the fused
        # decode's output would need a cast the shared projection can't
        # express per-stream
        for f in new_schema.fields:
            if f.name in decoded_types and decoded_types[f.name] != f.dataType:
                return None
        live.append(
            {
                "idx": idx,
                "fqn": s.fqn,
                "table": table,
                "meta": meta,
                "epoch_id": epoch_id,
                "floor": floors.get(s.fqn),
                "key_columns": list(meta["key_columns"]),
                "new_version": meta["version"] + 1,
                "new_schema": new_schema,
            }
        )
    return FusedPlan(spark, projected, union_fields, live, skipped, staging_root)


def execute_grouped_fused(
    plan: FusedPlan, projected: DataFrame | None = None
) -> dict[str, dict[str, Any]]:
    """Fold + write + per-table commit.  ``projected`` lets the caller
    pass the observe-wrapped projection; defaults to the prepared one."""
    results = dict(plan.skipped)
    if not plan.live:
        return results
    df = projected if projected is not None else plan.projected
    spark = plan.spark

    # routing + per-stream bookmark floor (finish_decode semantics),
    # restricted to streams whose epoch isn't already committed
    live_idx = [p["idx"] for p in plan.live]
    cond = (F.col("__status") == STATUS_OK) & F.col(_GIDX).isin(live_idx)
    floor_pred = F.lit(True)
    for p in plan.live:
        if p["floor"] is not None:
            floor_pred = F.when(
                F.col(_GIDX) == p["idx"],
                F.col(SDC_LSN) >= F.lit(int(p["floor"])),
            ).otherwise(floor_pred)
    df = df.filter(cond & floor_pred)

    # ONE LWW fold for all streams: group by (stream, that stream's key
    # tuple).  to_json(struct(keys)) is collision-free per stream and
    # lets streams with different key column sets share the exchange.
    key_repr = F.lit(None).cast("string")
    for p in plan.live:
        key_repr = F.when(
            F.col(_GIDX) == p["idx"],
            F.to_json(F.struct(*[F.col(c) for c in p["key_columns"]])),
        ).otherwise(key_repr)
    data_cols = [f.name for f in plan.union_fields] + [SDC_LSN, SDC_DELETED_AT]
    payload = F.struct(*[F.col(c) for c in data_cols])
    order = F.struct(F.col(SDC_LSN), F.col("txid"))
    folded = (
        df.groupBy(F.col(_GIDX), key_repr.alias("__key"))
        .agg(F.max_by(payload, order).alias("_w"))
        .select(_GIDX, "_w.*")
    )

    # per-stream commit generation + bucket id as CASE expressions
    gen = F.lit(None).cast("long")
    bucket = F.lit(None).cast("int")
    for p in plan.live:
        gen = F.when(
            F.col(_GIDX) == p["idx"], F.lit(p["new_version"])
        ).otherwise(gen)
        bucket = F.when(
            F.col(_GIDX) == p["idx"],
            p["table"]._bucket_expr(
                p["key_columns"],
                p["meta"]["num_buckets"],
                p["table"]._bucket_fn(p["meta"]),
            ),
        ).otherwise(bucket)
    out = folded.select(
        *data_cols, gen.cast("long").alias(SDC_GEN), F.col(_GIDX),
        bucket.alias(_BUCKET),
    )
    width = max(int(p["meta"]["num_buckets"]) for p in plan.live)
    out = out.repartition(width, F.col(_GIDX), F.col(_BUCKET))

    staging = os.path.join(
        plan.staging_root, f"grouped-{uuid.uuid4().hex[:12]}"
    )
    try:
        # AQE off for just this action: it would decompose the single
        # job into serial waves of query-stage materialization jobs
        # (measured 18 jobs / 2 waves at 8 streams); nothing here needs
        # it — the write width is explicit, batch deltas are small
        aqe_key = "spark.sql.adaptive.enabled"
        prev_aqe = spark.conf.get(aqe_key, "true")
        spark.conf.set(aqe_key, "false")
        try:
            out.write.mode("errorifexists").partitionBy(_GIDX, _BUCKET).parquet(
                staging
            )
        finally:
            spark.conf.set(aqe_key, prev_aqe)
        for p in plan.live:
            table: LakeTable = p["table"]
            meta = p["meta"]
            rel_dir = table._next_data_dir(p["new_version"])
            out_abs = os.path.join(table.path, rel_dir)
            src = os.path.join(staging, f"{_GIDX}={p['idx']}")
            os.makedirs(os.path.dirname(out_abs), exist_ok=True)
            if os.path.exists(src):
                try:
                    os.rename(src, out_abs)
                except OSError:
                    shutil.move(src, out_abs)  # cross-device staging
            else:
                os.makedirs(out_abs, exist_ok=True)  # zero-row stream
            written: dict[str, list[str]] = {}
            for entry in os.listdir(out_abs):
                if entry.startswith(f"{_BUCKET}="):
                    b = entry.split("=", 1)[1]
                    written[b] = [os.path.join(rel_dir, entry)]
            current = table.buckets_map(meta["version"])
            buckets = {b: list(dl) for b, dl in current.items()}
            for b, dl in written.items():
                buckets.setdefault(b, [])
                buckets[b] = buckets[b] + dl
            results[p["fqn"]] = table._commit_delta(
                meta,
                p["new_version"],
                p["new_schema"],
                written,
                buckets,
                {"append": written},
                p["epoch_id"],
                "merge-mor",
            )
            plan.executed_fqns.append(p["fqn"])
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return results


def compact_grouped(
    spark: SparkSession,
    tables: dict[str, LakeTable],
    max_delta_depth: int = 1,
    *,
    include_base: bool = False,
) -> dict[str, dict[str, Any]]:
    """TIERED compaction of N tables in ONE Spark job.

    Per-table :meth:`LakeTable.compact` is a separate action per table —
    at 8 streams the end-of-batch maintenance pays 8× the per-job fixed
    overhead for folds that are each tiny.  This builds every table's
    delta-tier fold (same relation ``compact`` folds: everything after
    each over-depth bucket's oldest dir, LWW by ``(lsn, gen)``), tags it
    with ``__gidx``, unions, writes once via ``partitionBy(__gidx,
    _bucket)`` and commits per table with ``compact``'s exact bucket-map
    semantics.  Unlike the merge path there is no shared input to
    re-scan — each branch reads its own files — so the only fused cost
    is the write; branch folds run as concurrent stages of the one job.

    Tombstone dropping is not offered here because tiered mode refuses
    it (see ``compact``); tables needing a FULL compact keep using
    ``compact(include_base=True, drop_tombstones_below=...)``.

    Tables whose column names collide at different types fall back to
    their own ``compact()`` call (same result, one extra job each).
    """
    results: dict[str, dict[str, Any]] = {}
    prepared: list[dict] = []
    col_types: dict[str, Any] = {}
    fallback: list[tuple[str, LakeTable]] = []
    for idx, (fqn, table) in enumerate(tables.items()):
        meta = table.metadata()
        schema = T.StructType.fromJson(meta["schema"])
        key_cols = meta["key_columns"]
        current = table.buckets_map(meta["version"])
        min_len = max_delta_depth if include_base else max_delta_depth + 1
        todo = {b: dl for b, dl in current.items() if len(dl) > min_len}
        if not todo:
            results[fqn] = {"skipped": True, "reason": "nothing to compact"}
            continue
        conflict = False
        for f in list(schema.fields) + [T.StructField(SDC_GEN, T.LongType())]:
            seen = col_types.get(f.name)
            if seen is not None and seen != f.dataType:
                conflict = True
                break
        if conflict:
            fallback.append((fqn, table))
            continue
        for f in list(schema.fields) + [T.StructField(SDC_GEN, T.LongType())]:
            col_types[f.name] = f.dataType
        fold_dirs = [
            d for dl in todo.values() for d in (dl if include_base else dl[1:])
        ]
        df = table._read_dirs(fold_dirs, schema, with_gen=True)
        folded = fold_last_writer_wins_agg(df, key_cols, (SDC_LSN, SDC_GEN))
        folded = folded.withColumn(
            _BUCKET,
            table._bucket_expr(
                key_cols, meta["num_buckets"], table._bucket_fn(meta)
            ),
        ).withColumn(_GIDX, F.lit(idx))
        prepared.append(
            {
                "fqn": fqn,
                "idx": idx,
                "table": table,
                "meta": meta,
                "todo": todo,
                "current": current,
                "key_columns": key_cols,
                "new_version": meta["version"] + 1,
                "df": folded,
            }
        )
    for fqn, table in fallback:
        results[fqn] = table.compact(
            max_delta_depth, include_base=include_base
        )
    if not prepared:
        return results

    union = prepared[0]["df"]
    for p in prepared[1:]:
        union = union.unionByName(p["df"], allowMissingColumns=True)
    width = max(int(p["meta"]["num_buckets"]) for p in prepared)
    union = union.repartition(width, F.col(_GIDX), F.col(_BUCKET))
    # cluster by key within each bucket file (compact's sort_keys): the
    # per-stream key tuple serialized to one string sorts equal keys
    # adjacently, which is what parquet row-group min/max stats need
    key_repr = F.lit(None).cast("string")
    for p in prepared:
        key_repr = F.when(
            F.col(_GIDX) == p["idx"],
            F.to_json(F.struct(*[F.col(c) for c in p["key_columns"]])),
        ).otherwise(key_repr)
    union = union.sortWithinPartitions(F.col(_GIDX), F.col(_BUCKET), key_repr)

    staging = os.path.join(
        prepared[0]["table"].path, "_staging",
        f"compact-{uuid.uuid4().hex[:12]}",
    )
    try:
        aqe_key = "spark.sql.adaptive.enabled"
        prev_aqe = spark.conf.get(aqe_key, "true")
        spark.conf.set(aqe_key, "false")
        try:
            union.write.mode("errorifexists").partitionBy(_GIDX, _BUCKET).parquet(
                staging
            )
        finally:
            spark.conf.set(aqe_key, prev_aqe)
        for p in prepared:
            table: LakeTable = p["table"]
            meta, todo, current = p["meta"], p["todo"], p["current"]
            rel_dir = table._next_data_dir(p["new_version"])
            out_abs = os.path.join(table.path, rel_dir)
            src = os.path.join(staging, f"{_GIDX}={p['idx']}")
            os.makedirs(os.path.dirname(out_abs), exist_ok=True)
            if os.path.exists(src):
                try:
                    os.rename(src, out_abs)
                except OSError:
                    shutil.move(src, out_abs)
            else:
                os.makedirs(out_abs, exist_ok=True)
            written: dict[str, list[str]] = {}
            for entry in os.listdir(out_abs):
                if entry.startswith(f"{_BUCKET}="):
                    b = entry.split("=", 1)[1]
                    written[b] = [os.path.join(rel_dir, entry)]
            buckets = {b: list(dl) for b, dl in current.items() if b not in todo}
            for b, dl in todo.items():
                if include_base:
                    if b in written:
                        buckets[b] = written[b]
                else:
                    buckets[b] = [dl[0]] + (written.get(b) or [])
            buckets_delta = {
                "set": {b: buckets[b] for b in todo if b in buckets},
                "drop": sorted(b for b in todo if b not in buckets),
            }
            base = {
                k: v for k, v in meta.items()
                if k not in ("buckets", "buckets_delta")
            }
            table._write_metadata(
                {
                    **base,
                    "version": p["new_version"],
                    **table._buckets_doc(
                        p["new_version"], buckets, buckets_delta
                    ),
                    "summary": {
                        "operation": "compact",
                        "tiered": not include_base,
                        "buckets_compacted": sorted(todo.keys(), key=int),
                    },
                    "parent": meta["version"],
                },
                expect_parent=meta["version"],
            )
            table._buckets_cache[p["new_version"]] = buckets
            results[p["fqn"]] = {
                "skipped": False,
                "version": p["new_version"],
                "compacted": len(todo),
            }
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return results
