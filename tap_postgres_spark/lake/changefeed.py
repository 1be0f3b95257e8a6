"""Changefeed export: publish a lake table's incremental changelog as a
raw WAL-event feed a downstream :class:`CdcPipeline` can replay.

The fan-out primitive a 100-TB CDC deployment needs: one pipeline
ingests PostgreSQL once, and N downstream consumers (another region's
lake, a search indexer, a training-data curator) each tail the FIRST
table's changelog instead of N replication slots hammering the source
database.  The reference has no analog — its Singer stream is a
one-shot pipe; this closes the loop so the engine's own output is a
valid input (replication chains compose).

Shape: each export reads ``base.read_changes(from_exported, to_v)``
(O(|changes|), never O(|table|)) and writes ``(lsn, txid, payload)``
parquet files into the feed directory — the exact contract the
streaming runner and ``CdcPipeline.apply_batch`` consume:

- ``payload`` is a wal2json-v2-style document rebuilt from the folded
  change rows: upserts → ``{"action":"I","schema":…,"table":…,
  "columns":[{name,type,value}…]}``; tombstones → ``{"action":"D",
  "identity":[key columns]}``.  Values are rendered as JSON strings —
  the downstream decode parses values as strings and casts per ITS
  ``pg_types`` map, so the round trip is exact for every
  column shape decode.py coerces: scalars, bytea hex, text[] PG array
  literals (quote/escape-exact inverses of parse_pg_array), hstore
  literals, and json/jsonb objects.
- ``lsn`` is the change row's ``_sdc_lsn`` — downstream LWW therefore
  resolves replays and out-of-order file pickup exactly like the
  primary feed; ``txid`` is NULL (each exported row is standalone, so
  the export also composes with a downstream txn-boundary split).
- files land as BARE parquet files (the file stream source does not
  recurse) with deterministic range-stamped names; a crash before the
  pointer advance re-exports the same rows under the same names, and a
  downstream that already consumed them re-applies idempotently (LWW +
  epoch guard).
- the pointer (``_CHANGEFEED.json``, atomic replace) records the
  exported base version; re-export below it is a no-op.

Retention note: exports must keep up within the base's
``expire_versions`` window — a floor-crossing range raises (the
``read_changes`` guard) instead of silently skipping changes.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SDC_DELETED_AT, SDC_LSN
from .table import LakeTable

_POINTER = "_CHANGEFEED.json"

_PG_TYPE_FOR_SPARK = {
    "long": "bigint",
    "integer": "integer",
    "short": "smallint",
    "double": "double precision",
    "float": "real",
    "string": "text",
    "boolean": "boolean",
    "date": "date",
    "binary": "bytea",
}


def _default_pg_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return "numeric"
    if isinstance(dt, T.TimestampType):
        return "timestamp with time zone"
    return _PG_TYPE_FOR_SPARK.get(dt.typeName(), "text")


def exported_version(feed_dir: str) -> int:
    p = os.path.join(feed_dir, _POINTER)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["exported_version"])


def _esc(x):
    """Escape for a double-quoted PG token: backslash, then quote."""
    return F.regexp_replace(
        F.regexp_replace(x, r"\\", r"\\\\"), r'"', r'\\"'
    )


def _quoted(x):
    return F.concat(F.lit('"'), _esc(x), F.lit('"'))


def _pg_array_literal(col: "F.Column") -> "F.Column":
    """Render array<T> as the PG literal parse_pg_array reads back:
    ``{a,b,"c,d",NULL}`` — elements quoted when they contain special
    characters, are empty, or spell NULL."""

    def one(x):
        x = x.cast("string")
        needs = (
            x.rlike(r'[,{}"\\]')
            | x.rlike(r"\s")
            | (x == "")
            | (x == "NULL")
        )
        return (
            F.when(x.isNull(), F.lit("NULL"))
            .when(needs, _quoted(x))
            .otherwise(x)
        )

    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(F.lit("{"), F.array_join(F.transform(col, one), ","), F.lit("}"))
    )


def _hstore_literal(col: "F.Column") -> "F.Column":
    """Render map<string,string> as the hstore literal parse_hstore
    reads back: ``"k"=>"v", "n"=>NULL``."""

    def one(e):
        val = F.when(e.value.isNull(), F.lit("NULL")).otherwise(_quoted(e.value))
        return F.concat(_quoted(e.key), F.lit("=>"), val)

    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.array_join(F.transform(F.map_entries(col), one), ", ")
    )


def _render_value(field: T.StructField, pg_type: str):
    """The string form the downstream decode parses back to this exact
    value — each branch is the inverse of a decode.py coercion."""
    col = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, T.BinaryType):
        # bytea hex literal, the exact form decode.parse_bytea_hex reads
        return F.concat(F.lit("\\x"), F.lower(F.hex(col)))
    if isinstance(dt, T.ArrayType):
        return _pg_array_literal(col)
    if isinstance(dt, T.MapType):
        if pg_type in ("json", "jsonb"):
            return F.to_json(col)
        return _hstore_literal(col)
    if isinstance(dt, T.StructType):
        return F.to_json(col)
    return col.cast("string")


def export_changefeed(
    base: LakeTable,
    feed_dir: str,
    schema_name: str,
    table_name: str,
    pg_types: dict[str, str] | None = None,
    *,
    to_version: int | None = None,
) -> dict[str, Any]:
    """Export the changelog since the last export into ``feed_dir``.

    ``pg_types`` labels each column in the emitted ``columns`` array
    (defaults derived from the Spark type) — downstream casts use the
    consumer's own config, so the labels only feed its evolution
    discovery."""
    os.makedirs(feed_dir, exist_ok=True)
    from_v = exported_version(feed_dir)
    to_v = to_version if to_version is not None else base.current_version()
    if to_v <= from_v:
        return {"skipped": True, "exported_version": from_v}

    if from_v == 0:
        # initial export: if the history up to to_v contains an
        # overwrite (FULL_TABLE snapshot load) or has been expired, the
        # changelog is undefined — but there is no downstream state yet,
        # so a FULL-state export (live rows + tombstones, the same
        # folded shape) is exactly equivalent
        try:
            changes = base.read_changes(0, to_v)
        except ValueError:
            changes = base.read(version=to_v, include_tombstones=True)
    else:
        # mid-stream the fallback would be WRONG: a full-state export
        # cannot express rows an overwrite implicitly deleted — let the
        # changelog guard raise (downstream must re-bootstrap)
        changes = base.read_changes(from_v, to_v)
    key_cols = base.key_columns
    data_fields = [
        f
        for f in base.schema.fields
        if f.name not in (SDC_LSN, SDC_DELETED_AT)
    ]
    types = dict(pg_types or {})
    for f in data_fields:
        types.setdefault(f.name, _default_pg_type(f.dataType))

    def entries(fields):
        return F.array(
            *[
                F.struct(
                    F.lit(f.name).alias("name"),
                    F.lit(types[f.name]).alias("type"),
                    _render_value(f, types[f.name]).alias("value"),
                )
                for f in fields
            ]
        )

    is_del = F.col(SDC_DELETED_AT).isNotNull()
    upsert_payload = F.to_json(
        F.struct(
            F.lit("I").alias("action"),
            F.lit(schema_name).alias("schema"),
            F.lit(table_name).alias("table"),
            entries(data_fields).alias("columns"),
        )
    )
    delete_payload = F.to_json(
        F.struct(
            F.lit("D").alias("action"),
            F.lit(schema_name).alias("schema"),
            F.lit(table_name).alias("table"),
            entries([f for f in data_fields if f.name in key_cols]).alias(
                "identity"
            ),
        )
    )
    out = changes.select(
        F.col(SDC_LSN).alias("lsn"),
        F.lit(None).cast("long").alias("txid"),
        F.when(is_del, delete_payload).otherwise(upsert_payload).alias("payload"),
    )

    # stage, then move BARE part files in under deterministic
    # range-stamped names (the file stream source doesn't recurse, and
    # deterministic names make a crash-replayed export overwrite itself)
    stage = os.path.join(feed_dir, f".stage-{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").parquet(stage)
    import pyarrow.parquet as pq

    moved = 0
    parts = sorted(
        f for f in os.listdir(stage) if f.endswith(".parquet")
    )
    for name in parts:
        src_path = os.path.join(stage, name)
        # maintenance-only ranges (compaction commits are changelog
        # pass-through) produce 0-row parts — don't litter the feed
        if pq.ParquetFile(src_path).metadata.num_rows == 0:
            continue
        dst = os.path.join(
            feed_dir, f"chgfeed-{from_v + 1:08d}-{to_v:08d}-{moved:04d}.parquet"
        )
        os.replace(src_path, dst)
        moved += 1
    shutil.rmtree(stage, ignore_errors=True)

    tmp = os.path.join(feed_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"exported_version": to_v, "from_version": from_v}, f)
    os.replace(tmp, os.path.join(feed_dir, _POINTER))
    return {
        "skipped": False,
        "from_version": from_v,
        "exported_version": to_v,
        "files": moved,
    }
