"""Type system: Postgres → Spark mapping and CDC schema widening.

Re-creates the reference's schema machinery
(``PostgresSQLToJSONSchema``, /root/reference/tap_postgres/client.py:57-124)
with Spark ``StructType``s instead of JSON Schema, and the LOG_BASED
catalog rewrite (/root/reference/tap_postgres/tap.py:693-741,
client.py:267-285): every property becomes nullable and the
``_sdc_deleted_at`` / ``_sdc_lsn`` system columns are appended.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import types as T

# System columns appended to every LOG_BASED stream
# (reference client.py:282-283; README.md:259-262).
SDC_LSN = "_sdc_lsn"
SDC_DELETED_AT = "_sdc_deleted_at"
# Column-presence bitmask, emitted by decode_projection(with_mask=True) and
# consumed by operators/partial.py (TOAST-safe partial updates).  Bit i set ⟺
# data column i (schema order, _sdc_* excluded) was PRESENT in the event's
# payload — distinguishing "absent" (unchanged TOASTed column omitted by
# wal2json) from "explicitly NULL".  Never persisted to the lake.
SDC_MASK = "_sdc_mask"

# Postgres type name (as it appears in wal2json ``columns[].type`` and in
# catalog discovery) → Spark type.  Mirrors the single-dispatch converter
# reference client.py:75-124 plus the defaults the Singer SDK supplies.
_PG_TO_SPARK: dict[str, T.DataType] = {
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "serial": T.IntegerType(),
    "bigserial": T.LongType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "numeric": T.DecimalType(38, 18),
    "decimal": T.DecimalType(38, 18),
    "money": T.DecimalType(19, 2),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "character varying": T.StringType(),
    "char": T.StringType(),
    "character": T.StringType(),
    "bpchar": T.StringType(),
    "uuid": T.StringType(),
    "name": T.StringType(),
    "bytea": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    # Postgres TIME serializes as "06:04:19.222000" (reference
    # tests/test_core.py:196-206); Spark has no time-of-day type → string.
    "time": T.StringType(),
    "time without time zone": T.StringType(),
    "interval": T.StringType(),
    # json/jsonb default to JSON text (reference client.py:91-102: union
    # type).  ``json_as_object`` mode maps to MapType below.
    "json": T.StringType(),
    "jsonb": T.StringType(),
    # hstore → object (reference client.py:118-124)
    "hstore": T.MapType(T.StringType(), T.StringType()),
    "enum": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
    "xml": T.StringType(),
    "tsvector": T.StringType(),
}

# Type-name substrings treated as numeric for the wal2json
# empty-string→NULL coercion (reference client.py:49 ``_NUMERIC_TYPES``,
# applied client.py:621-623).
NUMERIC_TYPE_SUBSTRINGS: tuple[str, ...] = (
    "int",
    "numeric",
    "decimal",
    "real",
    "double",
    "float",
    "bigint",
    "smallint",
)


def pg_type_to_spark(
    pg_type: str,
    *,
    dates_as_string: bool = False,
    json_as_object: bool = False,
) -> T.DataType:
    """Map a Postgres type name to a Spark DataType.

    ``ARRAY(T)`` arrives either as ``T[]`` or ``_T`` and recurses
    (reference client.py:80-89 ``array_to_jsonschema``).

    ``dates_as_string`` keeps date/time/timestamp columns as strings so
    BC-era dates (``4713-04-03 BC``) and ``infinity`` — unrepresentable in
    both Python datetime and Spark — pass through verbatim (reference
    client.py:144-156, tests/test_core.py:576-653).

    ``json_as_object`` maps json/jsonb to ``map<string,string>`` instead of
    JSON text (reference client.py:91-102).
    """
    name = pg_type.strip().lower()
    if name.endswith("[]"):
        return T.ArrayType(
            pg_type_to_spark(
                name[:-2], dates_as_string=dates_as_string, json_as_object=json_as_object
            )
        )
    if name.startswith("_"):
        return T.ArrayType(
            pg_type_to_spark(
                name[1:], dates_as_string=dates_as_string, json_as_object=json_as_object
            )
        )
    # strip precision args: numeric(10,2), varchar(255), timestamp(3)
    base = name.split("(")[0].strip()
    if dates_as_string and base in (
        "date",
        "timestamp",
        "timestamp without time zone",
        "timestamp with time zone",
        "timestamptz",
    ):
        return T.StringType()
    if json_as_object and base in ("json", "jsonb"):
        return T.MapType(T.StringType(), T.StringType())
    if base.startswith("numeric") or base.startswith("decimal"):
        # numeric(p,s) — honor declared precision if present
        if "(" in name and "," in name:
            inner = name[name.index("(") + 1 : name.index(")")]
            p, s = (int(x) for x in inner.split(","))
            return T.DecimalType(min(p, 38), min(s, 37))
        return T.DecimalType(38, 18)
    if base in _PG_TO_SPARK:
        return _PG_TO_SPARK[base]
    # Unknown types (custom enums, domains) → string, matching the
    # reference's fallback behavior (enum handling _wal_helpers.py:17-19).
    return T.StringType()


def is_numeric_pg_type(pg_type: str) -> bool:
    """True if the wal2json type name gets the ``""`` → NULL coercion
    (reference client.py:621-623)."""
    t = pg_type.lower()
    return any(sub in t for sub in NUMERIC_TYPE_SUBSTRINGS)


def widen_for_cdc(schema: T.StructType) -> T.StructType:
    """LOG_BASED schema rewrite (reference tap.py:693-741).

    Every field becomes nullable (WAL delete events carry only the key
    columns) and the two ``_sdc_*`` system columns are appended:
    ``_sdc_lsn`` (long) and ``_sdc_deleted_at`` (string, ISO-8601).
    Idempotent.
    """
    fields = [
        T.StructField(f.name, f.dataType, nullable=True, metadata=f.metadata)
        for f in schema.fields
        if f.name not in (SDC_LSN, SDC_DELETED_AT)
    ]
    fields.append(T.StructField(SDC_LSN, T.LongType(), nullable=True))
    fields.append(T.StructField(SDC_DELETED_AT, T.StringType(), nullable=True))
    return T.StructType(fields)


# Lossless numeric widenings Spark 4's parquet readers promote at scan
# time (SPARK-40876): an old int32 data file reads cleanly under a
# LongType head schema, so widening the TABLE schema in place needs no
# file rewrite — exactly Iceberg's `ALTER COLUMN ... TYPE` contract.
# long → double is NOT here (loses precision past 2^53); nothing lossy is.
_INTEGRAL_RANK = {"byte": 1, "short": 2, "integer": 3, "long": 4}


def widened_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The wider of ``a``/``b`` when one safely (losslessly, and with
    parquet read-time promotion support) widens to the other; None when
    no such widening exists.  Symmetric."""
    if a == b:
        return a
    ra = _INTEGRAL_RANK.get(a.typeName())
    rb = _INTEGRAL_RANK.get(b.typeName())
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    floats = (T.FloatType(), T.DoubleType())
    if a in floats and b in floats:
        return T.DoubleType()
    # {byte,short,int} → double is exact (≤ 2^31 fits the 53-bit
    # mantissa); float → double handled above; long → double rejected
    for other, wide in ((a, b), (b, a)):
        if wide == T.DoubleType() and _INTEGRAL_RANK.get(other.typeName(), 9) <= 3:
            return T.DoubleType()
    return None


def merge_schemas(
    base: T.StructType,
    incoming: T.StructType,
    *,
    frozen: Sequence[str] = (),
) -> T.StructType:
    """Schema evolution: fields present in ``incoming`` but not in
    ``base`` are appended (nullable); a numeric type mismatch resolves to
    the wider type when the widening is lossless (``widened_type`` —
    covers Postgres ``ALTER COLUMN ... TYPE`` int→bigint / real→double
    after a catalog re-discover).  Any other type change is rejected —
    the reference likewise only ever widens nullability / appends columns
    (tap.py:698-731); destructive evolution is out of contract.

    ``frozen`` columns may never change type in EITHER direction: the
    lake's bucket placement hashes the raw key columns
    (``CdcTable._bucket_expr``) and Spark's murmur3/xxhash64 hash an int
    and a long to different values, so widening a key would strand
    existing rows in buckets the new batches never probe.  Key-type
    changes require a :meth:`rebucket`-style rewrite instead.
    """
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    pos = {f.name: i for i, f in enumerate(out)}
    for f in incoming.fields:
        if f.name not in by_name:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
            continue
        have = by_name[f.name].dataType
        if have == f.dataType:
            continue
        wide = widened_type(have, f.dataType)
        if wide is None:
            raise TypeError(
                f"incompatible evolution for column {f.name!r}: "
                f"{have} → {f.dataType}"
            )
        if f.name in frozen:
            raise TypeError(
                f"type change on key column {f.name!r} ({have} → "
                f"{f.dataType}): key types are frozen because bucket "
                "placement hashes the raw key; rewrite via rebucket()"
            )
        if wide != have:
            old = out[pos[f.name]]
            # preserve the base field's nullability (ADVICE r05): a
            # widening never makes a non-nullable column nullable by
            # itself — widen_for_cdc already nullable-izes CDC columns,
            # so this only matters for non-CDC callers
            out[pos[f.name]] = T.StructField(
                old.name, wide,
                nullable=old.nullable or f.nullable,
                metadata=old.metadata,
            )
    return T.StructType(out)


@dataclass(frozen=True)
class StreamDef:
    """One replicated stream ≈ one Singer catalog entry
    (reference tap.py:743-766, client.py:196-260).
    """

    schema_name: str
    table_name: str
    spark_schema: T.StructType
    key_properties: tuple[str, ...]
    replication_method: str = "LOG_BASED"  # FULL_TABLE | INCREMENTAL | LOG_BASED
    replication_key: str | None = None  # None ⇒ _sdc_lsn for LOG_BASED
    selected_columns: tuple[str, ...] = ()  # empty ⇒ all
    custom_where_clauses: tuple[str, ...] = field(default=())
    max_record_count: int | None = None

    @property
    def fqn(self) -> str:
        """``schema.table`` — raw concatenation, no case folding
        (reference _wal_helpers.py:22-36 ``normalize_fqn``)."""
        return f"{self.schema_name}.{self.table_name}"

    @property
    def effective_replication_key(self) -> str:
        if self.replication_method == "LOG_BASED":
            return SDC_LSN  # reference client.py:242
        if self.replication_key is None:
            raise ValueError(f"{self.fqn}: INCREMENTAL requires replication_key")
        return self.replication_key

    def cdc_schema(self) -> T.StructType:
        return widen_for_cdc(self.spark_schema)
