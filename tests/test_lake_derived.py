"""Incrementally-maintained derived tables (lake/derived.py): bootstrap,
O(|changes|) refresh, delete propagation, exactly-once replay, and
equality with a full recompute after every refresh."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.functions import md5_60bit
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.derived import (
    bootstrap_derived,
    refresh_derived,
    refreshed_base_version,
)
from tap_postgres_spark.schema import SDC_LSN, widen_for_cdc

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)

_BATCH_SCHEMA = (
    "repo string, path string, content string, _sdc_lsn long, "
    "_sdc_deleted_at string, txid long, _action string"
)


def _batch(spark, rows):
    """rows: (repo, path, content, lsn, deleted_at)"""
    return spark.createDataFrame(
        [(r, p, c, l, d, 1, "U" if d is None else "D") for r, p, c, l, d in rows],
        _BATCH_SCHEMA,
    )


def _fingerprint(df):
    """The derived transform under test: content fingerprint per key."""
    return df.select(
        "repo", "path", SDC_LSN, md5_60bit(F.col("content")).alias("fp")
    )


def _derived_state(t):
    return {(r["repo"], r["path"]): r["fp"] for r in t.read().collect()}


def _full_recompute(base):
    return {
        (r["repo"], r["path"]): r["fp"]
        for r in _fingerprint(base.read()).collect()
    }


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "base"), SCHEMA, ["repo", "path"], num_buckets=4)
    t.merge_into(
        _batch(spark, [("r1", "a", "v1", 10, None), ("r1", "b", "v1", 11, None)]),
        epoch_id="e1",
    )
    return t


def test_bootstrap_then_incremental_matches_full_recompute(spark, tmp_path, base):
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    assert _derived_state(d) == _full_recompute(base)
    assert refreshed_base_version(d) == base.current_version()

    # update a, delete b, insert c — refresh must touch only those keys
    base.merge_into(
        _batch(
            spark,
            [("r1", "a", "v2", 20, None), ("r1", "b", None, 21, "2024-01-01"),
             ("r2", "c", "v1", 22, None)],
        ),
        epoch_id="e2",
    )
    res = refresh_derived(base, d, _fingerprint)
    assert not res.get("skipped")
    assert _derived_state(d) == _full_recompute(base)
    assert ("r1", "b") not in _derived_state(d)  # delete propagated
    assert refreshed_base_version(d) == base.current_version()


def test_refresh_is_noop_when_current_and_replay_safe(spark, tmp_path, base):
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    v = d.current_version()
    res = refresh_derived(base, d, _fingerprint)
    assert res["skipped"] and d.current_version() == v

    # crash-replay of an already-applied refresh: epoch guard skips it
    base.merge_into(_batch(spark, [("r1", "a", "v2", 30, None)]), epoch_id="e2")
    refresh_derived(base, d, _fingerprint)
    v2 = d.current_version()
    res2 = refresh_derived(base, d, _fingerprint, to_version=base.current_version())
    assert res2["skipped"] and d.current_version() == v2


def test_multi_epoch_refresh_folds_range(spark, tmp_path, base):
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    # two base epochs before one refresh: same key updated twice — LWW
    base.merge_into(_batch(spark, [("r1", "a", "mid", 40, None)]), epoch_id="e2")
    base.merge_into(_batch(spark, [("r1", "a", "new", 50, None)]), epoch_id="e3")
    refresh_derived(base, d, _fingerprint)
    assert _derived_state(d) == _full_recompute(base)
    got = d.read().filter(F.col("path") == "a").collect()[0]
    assert got[SDC_LSN] == 50


def test_transform_contract_enforced(spark, tmp_path, base):
    with pytest.raises(ValueError, match="_sdc_lsn"):
        bootstrap_derived(
            spark, base, str(tmp_path / "bad"),
            lambda df: df.select("repo", "path"),
        )
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    base.merge_into(_batch(spark, [("r1", "a", "v2", 60, None)]), epoch_id="e2")
    with pytest.raises(ValueError, match="_sdc_deleted_at"):
        refresh_derived(
            base, d,
            lambda df: df.select("repo", "path", SDC_LSN, "_sdc_deleted_at",
                                 md5_60bit(F.col("content")).alias("fp")),
        )


def test_quality_and_chargram_transforms_refresh_incrementally(spark, tmp_path, base):
    """The submit_derived built-in index transforms (quality features,
    chargram sketch) refresh at O(changes) and equal a full recompute."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from submit_derived import chargram_transform, quality_transform

    for name, factory in (("q", quality_transform), ("cg", chargram_transform)):
        transform = factory(base.key_columns)
        d = bootstrap_derived(spark, base, str(tmp_path / name), transform)
        base.merge_into(
            _batch(
                spark,
                [("r1", "a", "the quick brown fox and the dog", 30, None),
                 ("r9", "z", "le chat et le chien", 31, None)],
            ),
            epoch_id=f"{name}-u1",
        )
        refresh_derived(base, d, transform)
        got = {
            tuple(r[k] for k in base.key_columns): tuple(
                v for c, v in sorted(r.asDict().items()) if c not in ("repo", "path")
            )
            for r in d.read().collect()
        }
        full = {
            tuple(r[k] for k in base.key_columns): tuple(
                v for c, v in sorted(r.asDict().items()) if c not in ("repo", "path")
            )
            for r in transform(base.read()).withColumn(
                "_sdc_deleted_at", F.lit(None).cast("string")
            ).collect()
        }
        assert got == full


class TestMinhashIndexDerived:
    """Multi-row derivation (extra_keys): the banded MinHash corpus
    index maintained incrementally off the CDC changelog, probed at
    O(|new|) with textops.probe_minhash_index."""

    BODY_A = "the quick brown fox jumps over the lazy dog again and again"
    BODY_B = "completely different content about spark structured streaming"

    def _mk(self, spark, tmp_path, base):
        from tools.submit_derived import minhash_transform

        transform, extra, expand = minhash_transform(base.key_columns)
        derived = bootstrap_derived(
            spark, base, str(tmp_path / "mhidx"), transform, extra_keys=extra
        )
        return derived, transform, expand

    def _expected(self, base):
        from tap_postgres_spark import textops

        rows = textops.minhash_banded(
            base.read(), "content", ["repo", "path"], bands=4
        ).collect()
        return {(r["repo"], r["path"], r["band"]): r["key"] for r in rows}

    def _state(self, derived):
        return {
            (r["repo"], r["path"], r["band"]): r["key"]
            for r in derived.read().collect()
        }

    def test_incremental_index_matches_full_recompute(
        self, spark, tmp_path, base
    ):
        base.merge_into(
            _batch(spark, [("r1", "a", self.BODY_A, 20, None),
                           ("r2", "x", self.BODY_B, 21, None)]),
            epoch_id="seed",
        )
        derived, transform, expand = self._mk(spark, tmp_path, base)
        assert self._state(derived) == self._expected(base)
        # update one doc, insert one, delete one — refresh is O(changes)
        base.merge_into(
            _batch(spark, [("r1", "a", self.BODY_A + " edited", 30, None),
                           ("r3", "new", self.BODY_A, 31, None),
                           ("r1", "b", None, 32, "2026-01-01T00:00:00")]),
            epoch_id="churn",
        )
        res = refresh_derived(
            base, derived, transform, expand_tombstones=expand
        )
        assert not res.get("skipped")
        assert self._state(derived) == self._expected(base)
        # deleted key left no stale band rows
        assert all(k[:2] != ("r1", "b") for k in self._state(derived))

    def test_refresh_without_expander_raises(self, spark, tmp_path, base):
        derived, transform, _expand = self._mk(spark, tmp_path, base)
        base.merge_into(
            _batch(spark, [("r9", "p", "zzz", 40, None)]), epoch_id="e9"
        )
        with pytest.raises(ValueError, match="expand_tombstones"):
            refresh_derived(base, derived, transform)

    def test_probe_finds_near_dup_via_index(self, spark, tmp_path, base):
        from tap_postgres_spark import textops

        base.merge_into(
            _batch(spark, [("r1", "a", self.BODY_A, 20, None),
                           ("r2", "x", self.BODY_B, 21, None)]),
            epoch_id="seed",
        )
        derived, _t, _e = self._mk(spark, tmp_path, base)
        new_docs = spark.createDataFrame(
            [("n1", self.BODY_A), ("n2", "unrelated text entirely here")],
            "doc_id string, text string",
        )
        pairs = textops.probe_minhash_index(
            derived.read(), new_docs, "text", "doc_id", bands=4
        ).collect()
        hits = {(r["probe_doc_id"], r["repo"], r["path"]) for r in pairs}
        assert ("n1", "r1", "a") in hits  # exact body → all bands match
        assert all(p != "n2" for p, _r, _pth in hits)
