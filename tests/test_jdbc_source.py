"""JDBC source option-building (no DB / no driver jar in the sandbox —
the pure config→options layer is what's testable, mirroring the
reference's connection_parameters tests)."""

from __future__ import annotations

import pytest

from tap_postgres_spark.sources import (
    incremental_dbtable,
    jdbc_properties,
    jdbc_url,
    partition_options,
)


def test_url_from_discrete_keys():
    cfg = {"host": "db.example.com", "port": 5433, "database": "repos"}
    assert jdbc_url(cfg) == "jdbc:postgresql://db.example.com:5433/repos"


def test_url_and_credentials_from_sqlalchemy_url():
    cfg = {"sqlalchemy_url": "postgresql://u:secret@h:5444/d?application_name=x"}
    assert jdbc_url(cfg) == "jdbc:postgresql://h:5444/d"
    props = jdbc_properties(cfg)
    assert props["user"] == "u" and props["password"] == "secret"
    assert props["driver"] == "org.postgresql.Driver"


def test_url_default_port_and_missing_host_rejected():
    assert jdbc_url({"sqlalchemy_url": "postgresql://u:p@h/d"}).endswith("h:5432/d")
    with pytest.raises(ValueError):
        jdbc_url({"sqlalchemy_url": "postgresql://u:p@/d"})


def test_ssl_options_map_to_pg_driver_names():
    props = jdbc_properties(
        {
            "host": "h", "database": "d", "user": "u", "password": "p",
            "ssl_mode": "verify-full",
            "ssl_certificate_authority": "/certs/root.crt",
            "ssl_client_certificate": "/certs/client.crt",
            "ssl_client_private_key": "/certs/client.key",
        }
    )
    assert props["sslmode"] == "verify-full"
    assert props["sslrootcert"] == "/certs/root.crt"
    assert props["sslcert"] == "/certs/client.crt"
    assert props["sslkey"] == "/certs/client.key"
    assert props["fetchsize"] == "10000"


def test_incremental_dbtable_matches_reference_scan_shape():
    # the reference's golden compiled query shape (tests/test_stream_class.py)
    q = incremental_dbtable(
        "public.test_table",
        "id",
        10,
        selected_columns=("id",),
        custom_where_clauses=("id % 2 = 0", "id % 3 = 0"),
    )
    assert q == "(SELECT id FROM public.test_table WHERE (id % 2 = 0) AND (id % 3 = 0) AND (id >= 10)) AS t"
    # no bookmark → no replication-key predicate (NULL rows included,
    # reference test_replication_key.py:102-155 semantics)
    q2 = incremental_dbtable("public.t", "updated_at", None)
    assert q2 == "(SELECT * FROM public.t) AS t"
    # string bookmarks quoted
    q3 = incremental_dbtable("public.t", "updated_at", "2024-01-01")
    assert "updated_at >= '2024-01-01'" in q3


def test_partition_options():
    assert partition_options("id", 0, 1_000_000, 64) == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "64",
    }


def test_password_containing_at_sign():
    cfg = {"sqlalchemy_url": "postgresql://u:p@ss@h:5444/d"}
    assert jdbc_url(cfg) == "jdbc:postgresql://h:5444/d"
    props = jdbc_properties(cfg)
    assert props["user"] == "u" and props["password"] == "p@ss"
