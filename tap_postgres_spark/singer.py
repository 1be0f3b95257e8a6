"""Singer message export — compatibility shim for downstream Singer targets.

The engine's primary sink is the lake table (SURVEY.md §2.1 S6 maps the
Singer RECORD stream onto MERGE commits), but a user of the reference may
still need literal SCHEMA/RECORD/STATE JSON lines (tap.py:784-805).  This
module renders them FROM a DataFrame, preserving the reference's
invariants:

- SCHEMA precedes RECORDs for its stream (tap.py:782-785, idempotent
  guard client.py:453-465)
- records carry the Singer temporal string forms (tests/test_core.py:
  196-206): date → 'yyyy-MM-dd', timestamp → ISO micros + '+00:00'
- STATE carries the bookmark document (tap.py:799-805)

Rendering is vectorized: rows become JSON strings via ``to_json`` on the
executors; only the ordered iteration over partitions streams through the
driver (unavoidable for an ordered stdout pipe — at scale you'd write
per-partition message files instead, see ``write_message_files``).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any, TextIO

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import singer_date_string, singer_timestamp_string
from .schema import StreamDef
from .state import StateStore

_SPARK_TO_JSONSCHEMA: dict[type, dict[str, Any]] = {
    T.StringType: {"type": ["string", "null"]},
    T.IntegerType: {"type": ["integer", "null"]},
    T.LongType: {"type": ["integer", "null"]},
    T.ShortType: {"type": ["integer", "null"]},
    T.DoubleType: {"type": ["number", "null"]},
    T.FloatType: {"type": ["number", "null"]},
    T.BooleanType: {"type": ["boolean", "null"]},
    T.DateType: {"type": ["string", "null"], "format": "date"},
    T.TimestampType: {"type": ["string", "null"], "format": "date-time"},
    T.TimestampNTZType: {"type": ["string", "null"], "format": "date-time"},
    T.BinaryType: {"type": ["string", "null"]},
}


def _field_jsonschema(dt: T.DataType) -> dict[str, Any]:
    if isinstance(dt, T.DecimalType):
        return {"type": ["number", "null"]}
    if isinstance(dt, T.ArrayType):
        return {"type": ["array", "null"], "items": _field_jsonschema(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"type": ["object", "null"], "additionalProperties": True}
    if isinstance(dt, T.StructType):
        return {
            "type": ["object", "null"],
            "properties": {f.name: _field_jsonschema(f.dataType) for f in dt.fields},
        }
    return _SPARK_TO_JSONSCHEMA.get(type(dt), {"type": ["string", "null"]})


def schema_message(stream: StreamDef) -> dict[str, Any]:
    """SCHEMA message (≙ SDK ``_write_schema_message``)."""
    return {
        "type": "SCHEMA",
        "stream": stream.fqn,
        "schema": {
            "type": "object",
            "properties": {
                f.name: _field_jsonschema(f.dataType)
                for f in stream.spark_schema.fields
            },
        },
        "key_properties": list(stream.key_properties),
    }


def _singerized(df: DataFrame) -> DataFrame:
    """Temporal columns → Singer string forms (F9, tests/test_core.py:196-206)."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DateType):
            df = df.withColumn(f.name, singer_date_string(F.col(f.name)))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            df = df.withColumn(
                f.name, singer_timestamp_string(F.col(f.name).cast("timestamp"))
            )
    return df


def record_messages(df: DataFrame, stream: StreamDef) -> DataFrame:
    """One Singer RECORD JSON line per row, rendered executor-side."""
    body = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return _singerized(df).select(
        F.concat(
            F.lit('{"type": "RECORD", "stream": "%s", "record": ' % stream.fqn),
            body,
            F.lit("}"),
        ).alias("message")
    )


def state_message(state: StateStore) -> dict[str, Any]:
    return {"type": "STATE", "value": {"bookmarks": {
        fqn: {"replication_key_value": v} for fqn, v in state.bookmarks().items()
    }}}


def emit_stream(
    df: DataFrame, stream: StreamDef, out: TextIO, state: StateStore | None = None
) -> int:
    """SCHEMA → RECORD* → STATE to a text stream (the reference's stdout
    pipe, tap.py:782-797).  Returns the record count.  Ordered driver-side
    iteration — use only for pipe-compatible export, not the scale path."""
    out.write(json.dumps(schema_message(stream)) + "\n")
    n = 0
    for row in record_messages(df, stream).toLocalIterator():
        out.write(row["message"] + "\n")
        n += 1
    if state is not None:
        out.write(json.dumps(state_message(state)) + "\n")
    return n


def write_message_files(df: DataFrame, stream: StreamDef, out_dir: str) -> None:
    """Scale path: RECORD lines as text files, one per partition."""
    record_messages(df, stream).write.mode("overwrite").text(out_dir)
