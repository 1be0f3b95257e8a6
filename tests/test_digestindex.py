"""Digest membership index (digestindex.py over lake/inverted.py):
bootstrap, O(|changes|) refresh with bucket-move tombstones, pruned
probe correctness vs a direct dedup_against_corpus recompute, ghost-free
stale buckets after content updates, compaction invariance."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.digestindex import (
    bootstrap_digest_index,
    compact_digest_index,
    probe_digest_index,
    refresh_digest_index,
)
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)


def _batch(spark, rows):
    """rows: (repo, path, content, lsn, deleted_at)"""
    return spark.createDataFrame(
        [(r, p, c, l, d, 1, "U" if d is None else "D") for r, p, c, l, d in rows],
        "repo string, path string, content string, _sdc_lsn long, "
        "_sdc_deleted_at string, txid long, _action string",
    )


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "base"), SCHEMA, ["repo", "path"], num_buckets=4
    )
    t.merge_into(
        _batch(
            spark,
            [
                ("r1", "a", "alpha body", 10, None),
                ("r1", "b", "beta body", 11, None),
                ("r2", "c", "gamma body", 12, None),
            ],
        ),
        epoch_id="seed",
    )
    return t


def _probe(spark, root, texts, keep):
    fresh = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sorted(
        r["text"]
        for r in probe_digest_index(spark, root, fresh, keep=keep).collect()
    )


def _oracle(spark, base, texts, keep):
    """Direct recompute: membership against the CURRENT base head."""
    corpus = {
        r[0]
        for r in base.read()
        .select(F.md5(F.col("content").cast("string")))
        .collect()
    }
    fresh = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = fresh.withColumn("h", F.md5(F.col("text").cast("string"))).collect()
    if keep == "new":
        return sorted(r["text"] for r in rows if r["h"] not in corpus)
    return sorted(r["text"] for r in rows if r["h"] in corpus)


PROBES = ["alpha body", "beta body", "delta body", "gamma body", "zzz"]


def test_bootstrap_probe_both_directions(spark, tmp_path, base):
    root = str(tmp_path / "didx")
    res = bootstrap_digest_index(spark, base, root, n_cells=8)
    assert res["cells"] == 8
    for keep in ("new", "dup"):
        assert _probe(spark, root, PROBES, keep) == _oracle(
            spark, base, PROBES, keep
        )
    with pytest.raises(ValueError, match="keep"):
        probe_digest_index(
            spark, root,
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            keep="bogus",
        )


def test_refresh_update_moves_bucket_delete_insert(spark, tmp_path, base):
    root = str(tmp_path / "didx")
    bootstrap_digest_index(spark, base, root, n_cells=8)
    base.merge_into(
        _batch(
            spark,
            [
                ("r1", "a", "alpha body EDITED", 20, None),  # digest moves
                ("r1", "b", None, 21, "2026-01-01"),          # delete
                ("r3", "d", "delta body", 22, None),          # insert
            ],
        ),
        epoch_id="churn",
    )
    res = refresh_digest_index(base, root)
    assert not res["skipped"]
    for keep in ("new", "dup"):
        assert _probe(spark, root, PROBES, keep) == _oracle(
            spark, base, PROBES, keep
        )
    # the OLD digest of the edited doc must be gone (no ghost in its
    # old bucket), the new digest present
    assert "alpha body" in _probe(spark, root, ["alpha body"], "new")
    assert "alpha body EDITED" in _probe(
        spark, root, ["alpha body EDITED"], "dup"
    )
    # deleted doc's digest gone
    assert "beta body" in _probe(spark, root, ["beta body"], "new")
    # idempotent
    assert refresh_digest_index(base, root)["skipped"]


def test_compaction_keeps_answers_shrinks_files(spark, tmp_path, base):
    root = str(tmp_path / "didx")
    bootstrap_digest_index(spark, base, root, n_cells=4)
    for i in range(3):
        base.merge_into(
            _batch(spark, [("r1", "a", f"alpha v{i}", 20 + i, None)]),
            epoch_id=f"c{i}",
        )
        refresh_digest_index(base, root)
    before = {
        keep: _probe(spark, root, PROBES + ["alpha v2", "alpha v0"], keep)
        for keep in ("new", "dup")
    }
    n_before = len(glob.glob(os.path.join(root, "cells", "*", "*.parquet")))
    compact_digest_index(spark, root)
    after = {
        keep: _probe(spark, root, PROBES + ["alpha v2", "alpha v0"], keep)
        for keep in ("new", "dup")
    }
    assert before == after
    assert before["dup"].count("alpha v2") == 1  # only the live version
    assert "alpha v0" in before["new"]  # superseded digest not a member
    n_after = len(glob.glob(os.path.join(root, "cells", "*", "*.parquet")))
    assert n_after < n_before


def test_empty_corpus_bootstrap_then_grow(spark, tmp_path):
    """Bootstrapping over an empty base is legal: probes answer 'all
    new', compaction no-ops, and the first refresh populates cells."""
    t = LakeTable.create(
        spark, str(tmp_path / "base"), SCHEMA, ["repo", "path"], num_buckets=2
    )
    root = str(tmp_path / "didx")
    bootstrap_digest_index(spark, t, root, n_cells=4)
    assert _probe(spark, root, ["anything"], "new") == ["anything"]
    assert _probe(spark, root, ["anything"], "dup") == []
    assert compact_digest_index(spark, root) == 0
    t.merge_into(
        _batch(spark, [("r1", "a", "first body", 10, None)]), epoch_id="e1"
    )
    refresh_digest_index(t, root)
    assert _probe(spark, root, ["first body"], "dup") == ["first body"]


def test_probe_tolerates_fresh_fp_column(spark, tmp_path, base):
    """A fresh batch that already carries an 'fp' column must not make
    the membership join ambiguous."""
    root = str(tmp_path / "didx")
    bootstrap_digest_index(spark, base, root, n_cells=4)
    fresh = spark.createDataFrame(
        [(1, "alpha body", "user-fp"), (2, "novel", "x")],
        "doc_id long, text string, fp string",
    )
    dup = probe_digest_index(spark, root, fresh, keep="dup").collect()
    assert [r["text"] for r in dup] == ["alpha body"]
    assert dup[0]["fp"] == "user-fp"  # caller's column untouched
    new = {r["text"] for r in probe_digest_index(spark, root, fresh).collect()}
    assert new == {"novel"}
