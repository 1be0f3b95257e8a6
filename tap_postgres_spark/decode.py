"""Vectorized wal2json decode: raw WAL payloads → typed change DataFrames.

This module is the columnar re-creation of the reference's per-message
pipeline (all citations /root/reference/tap_postgres/):

- ``parse_wal_message`` — JSON parse with enum-quote repair retry
  (_wal_helpers.py:67-99)
- ``consume`` — action dispatch I/U/D/T/B/C, row construction with
  ``_sdc_lsn`` / ``_sdc_deleted_at`` (client.py:547-594)
- ``_parse_column_value`` — NULL passthrough, numeric ""→NULL, text[]
  literal parse (client.py:596-624)

The reference does all of this one dict at a time in a single Python
thread (wal_reader.py:194-257).  Here each micro-batch is ONE DataFrame
pass: repair → ``from_json`` → status classification → per-stream
projection, entirely in Column expressions (whole-stage codegen) except
the PG-array-literal pandas UDF.  At 10^10 events the classification pass
is embarrassingly parallel over feed partitions with zero shuffle.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import (
    coerce_numeric_empty,
    parse_pg_array,
    repair_enum_quotes,
    sdc_deleted_at_literal,
)
from .schema import SDC_DELETED_AT, SDC_LSN, StreamDef, is_numeric_pg_type

# wal2json format-version=2 message envelope (reference
# _wal_helpers.py:67-89; actions client.py:45-48).
_COL_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            # StringType absorbs any JSON primitive (Spark's JSON parser
            # renders non-string scalars to their literal text), matching
            # wal2json's mixed string/number/bool values.
            T.StructField("value", T.StringType()),
        ]
    )
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("columns", _COL_ENTRY),
        T.StructField("identity", _COL_ENTRY),
    ]
)

# Event-status taxonomy → metrics counters (reference wal_reader.py:116-122:
# records_emitted / records_filtered_by_lsn / records_unroutable /
# records_malformed; txn/truncate drops client.py:572-586).
STATUS_OK = "ok"
STATUS_MALFORMED = "malformed"
STATUS_TXN_MARKER = "txn_marker"  # B / C — dropped (client.py:578-586)
STATUS_TRUNCATE = "truncate"  # T — dropped  (client.py:572-576)
STATUS_UNKNOWN_ACTION = "unknown_action"  # logged + dropped (client.py:588-594)
STATUS_UNROUTABLE = "unroutable"  # no registered stream (wal_reader.py:276-288)
STATUS_BELOW_BOOKMARK = "below_bookmark"  # lsn < stream bookmark (wal_reader.py:290-297)

DATA_ACTIONS = ("I", "U", "D")


def parse_raw_payloads(raw: DataFrame) -> DataFrame:
    """(lsn, txid, payload:string) → structured envelope rows.

    Applies the enum-quote repair *before* the JSON parse — the repaired
    form either parses or the row is marked malformed; this collapses the
    reference's parse-retry loop (_wal_helpers.py:78-88) into one
    deterministic vectorized pass.
    """
    parsed = raw.withColumn(
        "_env", F.from_json(repair_enum_quotes(F.col("payload")), ENVELOPE_SCHEMA)
    )
    return parsed.select(
        "lsn",
        "txid",
        F.col("_env.action").alias("action"),
        F.col("_env.schema").alias("schema"),
        F.col("_env.table").alias("table"),
        F.col("_env.columns").alias("columns"),
        F.col("_env.identity").alias("identity"),
        # from_json yields a null struct (or null action) on unparseable
        # input → malformed (tests/test_wal_reader.py:565-580 analog).
        F.col("_env").isNull() | F.col("_env.action").isNull(),
    ).toDF("lsn", "txid", "action", "schema", "table", "columns", "identity", "_malformed")


def classify(envelope: DataFrame, registered_fqns: list[str]) -> DataFrame:
    """Append a ``_status`` column driving both routing and metrics.

    One expression, no shuffle.  FQN normalization is the raw
    ``schema.table`` concatenation (reference _wal_helpers.py:22-36).
    """
    fqn = F.concat_ws(".", F.col("schema"), F.col("table"))
    df = envelope if "_malformed" in envelope.columns else envelope.withColumn(
        "_malformed", F.lit(False)
    )
    status = (
        F.when(F.col("_malformed"), F.lit(STATUS_MALFORMED))
        .when(F.col("action").isin("B", "C"), F.lit(STATUS_TXN_MARKER))
        .when(F.col("action") == "T", F.lit(STATUS_TRUNCATE))
        .when(~F.col("action").isin(*DATA_ACTIONS), F.lit(STATUS_UNKNOWN_ACTION))
        .when(~fqn.isin(registered_fqns), F.lit(STATUS_UNROUTABLE))
        .otherwise(F.lit(STATUS_OK))
    )
    return df.withColumn("_fqn", fqn).withColumn("_status", status)


def batch_metrics(classified: DataFrame) -> DataFrame:
    """Per-(fqn,status) counts — the vectorized analog of the reference's
    counter dict (wal_reader.py:116-122,181-192).  One map-side-combined
    groupBy; rows are tiny (streams × statuses)."""
    return classified.groupBy("_fqn", "_status").agg(F.count("*").alias("n"))


def _value_map(entries: Column) -> Column:
    """array<struct<name,type,value>> → map<name, struct<type,value>>."""
    return F.map_from_entries(
        F.transform(entries, lambda e: F.struct(e["name"], F.struct(e["type"], e["value"])))
    )


def decode_stream(
    classified: DataFrame,
    stream: StreamDef,
    pg_types: dict[str, str],
    *,
    bookmark_lsn: int | None = None,
    batch_time: datetime | None = None,
) -> DataFrame:
    """Project this stream's routable events into its typed CDC schema.

    Semantics (reference ``consume``, client.py:547-594, pinned by
    tests/test_consume.py):

    - I/U → row from ``columns`` (full image), ``_sdc_deleted_at`` NULL
    - D   → row from ``identity`` (key-only image), ``_sdc_deleted_at`` =
      batch timestamp; non-key columns NULL
    - events with lsn < the stream's bookmark are dropped
      (wal_reader.py:290-297) — the replay filter for the shared
      min-LSN reader start
    - per-value coercions from ``_parse_column_value`` (client.py:596-624)

    Output columns: widened CDC schema + ``_action`` (I/U/D), ``txid``.
    Everything is Column expressions; the only Python is the pg-array
    pandas UDF, applied only to array-typed columns.
    """
    batch_time = batch_time or datetime.now(timezone.utc)
    df = classified.filter(
        (F.col("_status") == STATUS_OK) & (F.col("_fqn") == stream.fqn)
    )
    if bookmark_lsn is not None:
        df = df.filter(F.col("lsn") >= F.lit(bookmark_lsn))

    is_delete = F.col("action") == "D"
    vals = F.when(is_delete, _value_map(F.col("identity"))).otherwise(
        _value_map(F.col("columns"))
    )
    df = df.withColumn("_vals", vals)

    out_cols: list[Column] = []
    for field in stream.spark_schema.fields:
        if field.name in (SDC_LSN, SDC_DELETED_AT):
            continue
        pg_type = pg_types.get(field.name, "text")
        entry = F.col("_vals").getItem(field.name)
        raw_val = entry["value"]
        # numeric ""→NULL (client.py:621-623)
        if is_numeric_pg_type(pg_type):
            raw_val = coerce_numeric_empty(raw_val, F.lit(True))
        if isinstance(field.dataType, T.ArrayType):
            # PG array literal '{a,b,"c d"}' → array (client.py:608-619)
            col = parse_pg_array(raw_val)
            if not isinstance(field.dataType.elementType, T.StringType):
                col = col.cast(field.dataType)
        else:
            col = raw_val.cast(field.dataType)
        out_cols.append(col.alias(field.name))

    out_cols.append(F.col("lsn").alias(SDC_LSN))
    out_cols.append(
        F.when(is_delete, sdc_deleted_at_literal(batch_time))
        .otherwise(F.lit(None).cast("string"))
        .alias(SDC_DELETED_AT)
    )
    out_cols.append(F.col("action").alias("_action"))
    out_cols.append(F.col("txid"))
    return df.select(*out_cols)
