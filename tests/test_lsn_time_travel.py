"""Time travel by WAL position: ``version_for_lsn`` / ``read(as_of_lsn=)``.

The CDC-native time-travel axis — "the table after every event with
lsn <= L" — resolved from the per-commit bucket watermarks the merge
already records from parquet footer stats (zero extra jobs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _batch(spark, rows):
    # rows: (k, v, lsn, deleted_at)
    return spark.createDataFrame(
        rows, "k string, v long, _sdc_lsn long, _sdc_deleted_at string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), widen_for_cdc(SCHEMA), ["k"], num_buckets=4
    )
    # three batches in LSN order: [10..19], [20..29], [30..39]
    t.merge_into(_batch(spark, [("a", 1, 10, None), ("b", 1, 12, None)]), epoch_id="e0")
    t.merge_into(_batch(spark, [("a", 2, 25, None), ("c", 1, 22, None)]), epoch_id="e1")
    t.merge_into(_batch(spark, [("b", None, 33, "2024-01-01T00:00:00"),
                                ("d", 1, 35, None)]), epoch_id="e2")
    return t


def _state(t, **kw):
    return {(r["k"], r["v"]) for r in t.read(**kw).select("k", "v").collect()}


def test_version_for_lsn_picks_cumulative_watermark(table):
    # create=v1, merges=v2,v3,v4
    assert table.version_for_lsn(12) == 2
    assert table.version_for_lsn(19) == 2   # between batches → earlier state
    assert table.version_for_lsn(25) == 3
    assert table.version_for_lsn(10**9) == table.current_version()


def test_read_as_of_lsn_matches_versions(table):
    assert _state(table, as_of_lsn=15) == {("a", 1), ("b", 1)}
    assert _state(table, as_of_lsn=29) == {("a", 2), ("b", 1), ("c", 1)}
    # delete of b visible only after lsn 33's batch
    assert _state(table, as_of_lsn=40) == {("a", 2), ("c", 1), ("d", 1)}
    assert _state(table, as_of_lsn=40) == _state(table)


def test_create_version_eligible_below_first_batch(table):
    # lsn below every event → the empty create version
    assert table.version_for_lsn(5) == 1
    assert _state(table, as_of_lsn=5) == set()


def test_compaction_does_not_regress_watermark(table):
    """A full compaction that drops a low tombstone must not lower the
    cumulative watermark (its own footers read LOW)."""
    want_now = _state(table)
    table.compact(drop_tombstones_below=34)  # reclaims b's tombstone
    v = table.current_version()
    assert table.version_for_lsn(10**9) == v
    assert _state(table, as_of_lsn=10**9) == want_now
    # pre-compaction positions still resolve to pre-compaction versions
    assert _state(table, as_of_lsn=29) == {("a", 2), ("b", 1), ("c", 1)}


def test_expired_window_raises(table):
    table.compact()
    table.expire_versions(keep_last=2)
    with pytest.raises(ValueError, match="precedes"):
        table.version_for_lsn(5)
    # positions inside the kept window still resolve
    assert _state(table, as_of_lsn=10**9) == _state(table)


def test_mutually_exclusive_axes(table):
    with pytest.raises(ValueError, match="at most one"):
        table.read(version=2, as_of_lsn=15)
