"""Catalog discovery: inspect a data directory / lake and build StreamDefs.

Re-creates the reference's discovery flow (SURVEY.md §2.1 S1;
/root/reference/tap_postgres/tap.py:663-682 ``catalog_dict`` →
``discover_catalog_entries``; schema filtering client.py:180-193) against
the artifacts this engine reads: parquet datasets and LakeTables take the
place of Postgres schemas reflected over SQLAlchemy.

Like the reference, discovery output can be overridden by a user-supplied
catalog (tap.py:675-676): pass ``overrides`` keyed by FQN.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .lake import LakeTable
from .schema import StreamDef


def discover_parquet_dir(
    spark: SparkSession,
    base_dir: str,
    *,
    schema_name: str = "public",
    filter_tables: Sequence[str] | None = None,
    key_properties: dict[str, Sequence[str]] | None = None,
    replication: dict[str, dict[str, Any]] | None = None,
) -> list[StreamDef]:
    """One StreamDef per ``<table>.parquet`` dataset under ``base_dir``.

    ``filter_tables`` is the ``filter_schemas`` analog (client.py:180-193):
    only matching table names are discovered.  ``key_properties`` /
    ``replication`` supply per-table catalog metadata the files cannot
    carry (≙ Singer catalog ``key_properties`` / ``replication-method``).
    """
    key_properties = key_properties or {}
    replication = replication or {}
    streams: list[StreamDef] = []
    for entry in sorted(os.listdir(base_dir)):
        if not entry.endswith(".parquet"):
            continue
        table = entry[: -len(".parquet")]
        if filter_tables is not None and table not in filter_tables:
            continue
        # schema from the parquet footer — no data read
        schema = spark.read.parquet(os.path.join(base_dir, entry)).schema
        rep = replication.get(table, {})
        streams.append(
            StreamDef(
                schema_name=schema_name,
                table_name=table,
                spark_schema=schema,
                key_properties=tuple(key_properties.get(table, ())),
                replication_method=rep.get("method", "FULL_TABLE"),
                replication_key=rep.get("key"),
            )
        )
    return streams


def discover_lake_table(
    spark: SparkSession, path: str, *, schema_name: str = "public"
) -> StreamDef:
    """StreamDef from a LakeTable's own metadata (schema + key columns are
    authoritative there — the Iceberg-metadata analog)."""
    t = LakeTable(spark, path)
    meta = t.metadata()
    return StreamDef(
        schema_name=schema_name,
        table_name=os.path.basename(path.rstrip("/")),
        spark_schema=T.StructType.fromJson(meta["schema"]),
        key_properties=tuple(meta["key_columns"]),
        replication_method="LOG_BASED",
    )


def apply_overrides(
    streams: list[StreamDef], overrides: dict[str, dict[str, Any]]
) -> list[StreamDef]:
    """User-supplied catalog wins over discovery (tap.py:675-676):
    ``overrides[fqn]`` may set selected_columns, custom_where_clauses,
    max_record_count, replication method/key, key_properties."""
    out = []
    for s in streams:
        o = overrides.get(s.fqn)
        if not o:
            out.append(s)
            continue
        out.append(
            StreamDef(
                schema_name=s.schema_name,
                table_name=s.table_name,
                spark_schema=o.get("spark_schema", s.spark_schema),
                key_properties=tuple(o.get("key_properties", s.key_properties)),
                replication_method=o.get("replication_method", s.replication_method),
                replication_key=o.get("replication_key", s.replication_key),
                selected_columns=tuple(o.get("selected_columns", s.selected_columns)),
                custom_where_clauses=tuple(
                    o.get("custom_where_clauses", s.custom_where_clauses)
                ),
                max_record_count=o.get("max_record_count", s.max_record_count),
            )
        )
    return out
