"""Stream maps + schema flattening (SURVEY.md "What's missing" #1).

The reference declares the Meltano SDK's ``stream-maps`` and
``schema-flattening`` capabilities (/root/reference/README.md:13-14) and
exposes them through config (``stream_maps``, ``stream_map_config``,
``flattening_enabled``, ``flattening_max_depth`` — README.md:51-57).  The
SDK applies per-stream property renames/exclusions/computed values, row
filters, stream aliasing/removal, and nested-property flattening to every
record before it is emitted.

Spark-native re-creation, not a port: map expressions are **Spark SQL
expressions** compiled into one Catalyst projection (vectorized,
whole-stage-codegen, pushdown-friendly) instead of the SDK's per-record
``simpleeval`` Python.  The operator surface is the SDK's:

- ``{"col": None}``  / ``{"col": "__NULL__"}`` — exclude a property
- ``{"new_col": "<sql expr>"}`` — computed/renamed property (expression
  may reference any source column; ``{placeholder}`` tokens are
  substituted from ``stream_map_config`` first, the SDK's
  ``config[...]`` analog)
- ``{"__filter__": "<sql predicate>"}`` — keep matching rows only
- ``{"__alias__": "name"}`` — rename the stream
- ``{"__key_properties__": [...]}`` — override the key columns
- top-level ``{"<stream>": None}`` or ``"__NULL__"`` — remove a stream;
  ``{"__else__": "__NULL__"}`` — remove all unnamed streams
- :func:`flatten` — expand nested struct fields to ``parent__child``
  columns down to ``max_depth``; structs still nested at the depth limit
  are JSON-serialized, mirroring the SDK's flattening of
  deeper-than-max-depth objects.  (Arrays/maps stay native Spark types —
  deliberately better-typed than the SDK's stringify-everything.)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESERVED_KEYS = ("__alias__", "__filter__", "__key_properties__", "__else__")
NULL_SENTINEL = "__NULL__"


def _substitute(expr: str, config: Mapping[str, Any] | None) -> str:
    """``stream_map_config`` interpolation: ``{key}`` tokens in the
    expression are replaced by the config value's SQL literal."""
    if not config:
        return expr
    for k, v in config.items():
        token = "{" + k + "}"
        if token in expr:
            if v is None:
                lit = "NULL"
            elif isinstance(v, bool):  # before int: bool is an int subclass
                lit = "TRUE" if v else "FALSE"
            elif isinstance(v, str):
                lit = "'" + v.replace("'", "''") + "'"
            elif isinstance(v, (int, float)):
                lit = repr(v)
            else:
                raise ValueError(
                    f"stream_map_config[{k!r}]: cannot render {type(v).__name__} "
                    "as a SQL literal (supported: str, bool, int, float, None)"
                )
            expr = expr.replace(token, lit)
    return expr


def apply_stream_map(
    df: DataFrame,
    mapping: Mapping[str, Any],
    *,
    config: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Apply one stream's map: row filter + one projection.

    Property semantics (SDK stream-map spec): a ``None``/``__NULL__``
    value drops the column; a string value is an expression defining (or
    redefining) the column; unnamed source columns pass through in schema
    order; brand-new computed columns append after them.
    """
    filt = mapping.get("__filter__")
    if filt:
        df = df.filter(F.expr(_substitute(str(filt), config)))

    excluded = {
        k
        for k, v in mapping.items()
        if k not in RESERVED_KEYS and (v is None or v == NULL_SENTINEL)
    }
    computed: dict[str, Column] = {
        k: F.expr(_substitute(str(v), config)).alias(k)
        for k, v in mapping.items()
        if k not in RESERVED_KEYS and v is not None and v != NULL_SENTINEL
    }
    out: list[Column] = []
    for c in df.columns:
        if c in excluded:
            continue
        out.append(computed.pop(c) if c in computed else F.col(c))
    out.extend(computed.values())  # new columns append in mapping order
    return df.select(*out)


def apply_stream_maps(
    dfs: Mapping[str, DataFrame],
    stream_maps: Mapping[str, Any],
    *,
    config: Mapping[str, Any] | None = None,
) -> dict[str, DataFrame]:
    """Collection-level semantics: per-stream maps, aliasing, removal,
    and ``__else__: __NULL__`` (drop every stream not explicitly kept)."""
    else_null = stream_maps.get("__else__") == NULL_SENTINEL
    out: dict[str, DataFrame] = {}
    for name, df in dfs.items():
        if name in stream_maps:
            m = stream_maps[name]
            if m is None or m == NULL_SENTINEL:
                continue  # stream removed
            alias = m.get("__alias__", name)
            out[alias] = apply_stream_map(df, m, config=config)
        elif not else_null:
            out[name] = df
    return out


def mapped_key_properties(
    mapping: Mapping[str, Any], default: Sequence[str]
) -> tuple[str, ...]:
    """Key override (SDK ``__key_properties__``)."""
    return tuple(mapping.get("__key_properties__", default))


# ---------------------------------------------------------------------------
# Schema flattening
# ---------------------------------------------------------------------------
def _flatten_cols(
    prefix: str, col: Column, dtype: T.DataType, depth: int, sep: str
) -> list[Column]:
    if isinstance(dtype, T.StructType):
        if depth <= 0:
            # depth limit: remaining nested object → JSON text (the SDK
            # stringifies anything deeper than flattening_max_depth)
            return [F.to_json(col).alias(prefix)]
        out: list[Column] = []
        for f in dtype.fields:
            out.extend(
                _flatten_cols(
                    f"{prefix}{sep}{f.name}", col[f.name], f.dataType, depth - 1, sep
                )
            )
        return out
    return [col.alias(prefix)]


def flatten(df: DataFrame, max_depth: int = 1, sep: str = "__") -> DataFrame:
    """Expand struct columns into ``parent__child`` top-level columns down
    to ``max_depth`` levels; structs still nested at the limit become JSON
    strings.  One projection — no data movement, prune-friendly."""
    out: list[Column] = []
    for f in df.schema.fields:
        out.extend(_flatten_cols(f.name, F.col(f.name), f.dataType, max_depth, sep))
    return df.select(*out)


def flatten_schema(schema: T.StructType, max_depth: int = 1, sep: str = "__") -> T.StructType:
    """The schema :func:`flatten` produces — for SCHEMA-message/catalog
    purposes without touching data."""

    def walk(prefix: str, dtype: T.DataType, depth: int) -> list[T.StructField]:
        if isinstance(dtype, T.StructType):
            if depth <= 0:
                return [T.StructField(prefix, T.StringType(), True)]
            out: list[T.StructField] = []
            for f in dtype.fields:
                out.extend(walk(f"{prefix}{sep}{f.name}", f.dataType, depth - 1))
            return out
        return [T.StructField(prefix, dtype, True)]

    fields: list[T.StructField] = []
    for f in schema.fields:
        fields.extend(walk(f.name, f.dataType, max_depth))
    return T.StructType(fields)
