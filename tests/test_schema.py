"""Type-mapping + CDC widening tests.

Ports the reference's type assertions (tests/test_sql_types_to_jsonschema.py,
tests/test_core.py type round-trips) to the Spark type system.
"""

from pyspark.sql import types as T

from tap_postgres_spark.schema import (
    SDC_DELETED_AT,
    SDC_LSN,
    StreamDef,
    is_numeric_pg_type,
    merge_schemas,
    pg_type_to_spark,
    widen_for_cdc,
)


def test_basic_scalar_mappings():
    assert pg_type_to_spark("integer") == T.IntegerType()
    assert pg_type_to_spark("bigint") == T.LongType()
    assert pg_type_to_spark("text") == T.StringType()
    assert pg_type_to_spark("double precision") == T.DoubleType()
    assert pg_type_to_spark("boolean") == T.BooleanType()
    assert pg_type_to_spark("date") == T.DateType()
    # TIME has no Spark type → Singer-style string (test_core.py:196-206)
    assert pg_type_to_spark("time without time zone") == T.StringType()


def test_numeric_precision():
    assert pg_type_to_spark("numeric") == T.DecimalType(38, 18)
    assert pg_type_to_spark("numeric(10,2)") == T.DecimalType(10, 2)


def test_array_recursion():
    # client.py:80-89 array_to_jsonschema analog
    assert pg_type_to_spark("text[]") == T.ArrayType(T.StringType())
    assert pg_type_to_spark("_int4") == T.ArrayType(T.IntegerType())
    assert pg_type_to_spark("jsonb[]") == T.ArrayType(T.StringType())


def test_json_modes():
    # client.py:91-102: default union → JSON text; json_as_object → map
    assert pg_type_to_spark("jsonb") == T.StringType()
    assert pg_type_to_spark("jsonb", json_as_object=True) == T.MapType(
        T.StringType(), T.StringType()
    )


def test_hstore_and_enum_fallback():
    assert pg_type_to_spark("hstore") == T.MapType(T.StringType(), T.StringType())
    # unknown/custom types → string (enum repair path)
    assert pg_type_to_spark("my_custom_enum") == T.StringType()


def test_dates_as_string_mode():
    # BC dates / infinity pass through as strings (client.py:144-156)
    assert pg_type_to_spark("timestamp", dates_as_string=True) == T.StringType()
    assert pg_type_to_spark("date", dates_as_string=True) == T.StringType()


def test_is_numeric_pg_type():
    # client.py:49 _NUMERIC_TYPES substring match
    for t in ["integer", "bigint", "smallint", "numeric(10,2)", "double precision",
              "real", "float8", "decimal"]:
        assert is_numeric_pg_type(t), t
    for t in ["text", "varchar", "jsonb", "date"]:
        assert not is_numeric_pg_type(t), t


def test_widen_for_cdc():
    # tap.py:693-741: all-nullable + _sdc_lsn/_sdc_deleted_at appended
    base = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType(), nullable=True),
        ]
    )
    w = widen_for_cdc(base)
    assert all(f.nullable for f in w.fields)
    names = [f.name for f in w.fields]
    assert names == ["id", "name", SDC_LSN, SDC_DELETED_AT]
    # idempotent
    assert widen_for_cdc(w) == w


def test_merge_schemas_additive():
    a = T.StructType([T.StructField("x", T.LongType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())])
    m = merge_schemas(a, b)
    assert [f.name for f in m.fields] == ["x", "y"]
    try:
        merge_schemas(a, T.StructType([T.StructField("x", T.StringType())]))
        raise AssertionError("expected TypeError")
    except TypeError:
        pass


def test_streamdef_fqn_and_replication_key():
    s = StreamDef(
        schema_name="public",
        table_name="source_code_repos",
        spark_schema=T.StructType([T.StructField("repo", T.StringType())]),
        key_properties=("repo", "path"),
    )
    # _wal_helpers.py:22-36: raw concat, no case folding
    assert s.fqn == "public.source_code_repos"
    # client.py:242: LOG_BASED replication key is _sdc_lsn
    assert s.effective_replication_key == SDC_LSN
