"""Bulk (vectorized) feed generator → pipeline replay → DuckDB-fold
equality — the bench.py correctness path, pinned at pytest scale."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.feedgen import generate_bulk_feed
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.modes.log_based import CdcPipeline
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)
FQN = "public.source_code_repos"


def test_bulk_feed_replay_matches_duckdb_fold(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    manifest = generate_bulk_feed(feed_dir, n_events=20_000, n_keys=3_000, n_files=8)
    assert manifest["n_events"] == 20_000

    table = LakeTable.create(
        spark, str(tmp_path / "lake"), widen_for_cdc(SCHEMA), ["repo", "path"],
        num_buckets=8,
    )
    pipeline = CdcPipeline(
        spark,
        [StreamDef("public", "source_code_repos", SCHEMA, ("repo", "path"))],
        {FQN: {f.name: "text" for f in SCHEMA.fields}},
        {FQN: table},
        StateStore(str(tmp_path / "state.json")),
    )
    files = sorted(f for f in os.listdir(feed_dir) if f.endswith(".parquet"))
    for i in range(2):
        chunk = [os.path.join(feed_dir, f) for f in files[i * 4 : (i + 1) * 4]]
        pipeline.apply_batch(spark.read.parquet(*chunk), epoch_id=f"b{i}")
    table.compact(max_delta_depth=1)

    got = table.read().select(
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", "repo", "path", "commit", "content")), 1, 15
                ), 16, 10,
            ).cast("long") % 1_000_003
        ).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]

    exp = duckdb.sql(
        f"""
        WITH ev AS (
          SELECT lsn, json_extract_string(payload, '$.action') AS action,
                 coalesce(json_extract_string(payload, '$.columns[0].value'),
                          json_extract_string(payload, '$.identity[0].value')) AS repo,
                 coalesce(json_extract_string(payload, '$.columns[1].value'),
                          json_extract_string(payload, '$.identity[1].value')) AS path,
                 json_extract_string(payload, '$.columns[2].value') AS commit,
                 json_extract_string(payload, '$.columns[4].value') AS content
          FROM read_parquet('{feed_dir}/feed-*.parquet')
        ),
        latest AS (SELECT *, row_number() OVER (
            PARTITION BY repo, path ORDER BY lsn DESC) AS rn FROM ev)
        SELECT sum((('0x' || substr(md5(repo || '|' || path || '|' || commit || '|' ||
                     content), 1, 15))::bigint) % 1000003)::bigint AS s,
               count(*) AS n
        FROM latest WHERE rn = 1 AND action <> 'D'
        """
    ).fetchone()
    assert (got["s"], got["n"]) == exp


def test_bulk_feed_multi_table_routes_and_folds(spark, tmp_path):
    """tables=N interleaves N tables into one feed (single-connection
    multi-table shape); each key belongs to exactly one table, so the
    per-table folds partition the key universe."""
    import duckdb

    from tap_postgres_spark.feedgen import generate_bulk_feed

    out = str(tmp_path / "mt")
    man = generate_bulk_feed(
        out, n_events=5_000, n_keys=500, n_files=4,
        tables=("t_a", "t_b"),
    )
    assert man["tables"] == ["t_a", "t_b"]
    con = duckdb.connect()
    tbls = con.sql(
        f"""SELECT json_extract_string(payload, '$.table') AS t,
                   count(*) FROM read_parquet('{out}/feed-*.parquet') GROUP BY t"""
    ).fetchall()
    assert {t for t, _ in tbls} == {"t_a", "t_b"}
    assert all(n > 1000 for _, n in tbls)
    # key → table is a function: no (repo,path) appears under both tables
    overlap = con.sql(
        f"""
        WITH k AS (SELECT DISTINCT json_extract_string(payload, '$.table') AS t,
                   coalesce(json_extract_string(payload, '$.columns[1].value'),
                            json_extract_string(payload, '$.identity[1].value')) AS path
                   FROM read_parquet('{out}/feed-*.parquet'))
        SELECT count(*) FROM (SELECT path FROM k GROUP BY path HAVING count(DISTINCT t) > 1)
        """
    ).fetchone()[0]
    assert overlap == 0


def test_bulk_feed_single_table_unchanged_by_tables_param(spark, tmp_path):
    """Default tables=() keeps byte-identical output (cached feed dirs and
    recorded bench numbers stay comparable)."""
    import hashlib
    import os

    from tap_postgres_spark.feedgen import generate_bulk_feed

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_bulk_feed(a, n_events=2_000, n_keys=100, n_files=2)
    generate_bulk_feed(b, n_events=2_000, n_keys=100, n_files=2,
                       tables=("source_code_repos",))
    for f in sorted(os.listdir(a)):
        ha = hashlib.md5(open(os.path.join(a, f), "rb").read()).hexdigest()
        hb = hashlib.md5(open(os.path.join(b, f), "rb").read()).hexdigest()
        assert ha == hb, f


def _mk_pipeline(spark, tmp_path, tag, **kw):
    table = LakeTable.create(
        spark, str(tmp_path / f"lake_{tag}"), widen_for_cdc(SCHEMA),
        ["repo", "path"], num_buckets=8,
    )
    pipe = CdcPipeline(
        spark,
        [StreamDef("public", "source_code_repos", SCHEMA, ("repo", "path"))],
        {FQN: {f.name: "text" for f in SCHEMA.fields}},
        {FQN: table},
        StateStore(str(tmp_path / f"state_{tag}.json")),
        **kw,
    )
    return pipe, table


def _content_hash(table):
    return tuple(
        table.read().select(
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", "repo", "path", "commit", "content")),
                        1, 15,
                    ), 16, 10,
                ).cast("long") % 1_000_003
            ).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
    )


def test_bulk_feed_txn_markers_roundtrip(spark, tmp_path):
    """Marker-coherent bulk feed: txn-boundary replay over batch cuts
    that land mid-transaction equals the plain replay of the same feed
    (markers dropped) — the bench txn-overhead path, pinned small."""
    feed_dir = str(tmp_path / "feed")
    generate_bulk_feed(
        feed_dir, n_events=20_000, n_keys=3_000, n_files=8, txn_markers=True
    )
    files = sorted(
        os.path.join(feed_dir, f)
        for f in os.listdir(feed_dir) if f.endswith(".parquet")
    )

    plain, t_plain = _mk_pipeline(spark, tmp_path, "plain")
    atomic, t_atomic = _mk_pipeline(
        spark, tmp_path, "atomic", txn_boundary_dir=str(tmp_path / "txn")
    )
    deferred_seen = 0
    for i, f in enumerate(files):  # one file per batch: cuts hit open txns
        raw = spark.read.parquet(f)
        plain.apply_batch(raw, epoch_id=f"p{i}")
        res = atomic.apply_batch(raw, epoch_id=f"a{i}")
        deferred_seen += res["txn"]["deferred"]
    assert deferred_seen > 0  # chunk boundaries really cut transactions
    assert res["txn"]["deferred"] == 0  # drained clean at the end
    assert _content_hash(t_atomic) == _content_hash(t_plain)
