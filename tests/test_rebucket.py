"""Bucket-count evolution (LakeTable.rebucket): content-preserving full
rewrite into a new hash layout — reads, point reads, later merges,
changelog consumers and out-of-order-replay safety all survive it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("x", T.LongType(), True),
        ]
    )
)


def _batch(spark, rows, lsn0, dead=()):
    return spark.createDataFrame(
        [
            (k, x, lsn0 + i, "1970-01-01T00:00:00Z" if k in dead else None)
            for i, (k, x) in enumerate(rows)
        ],
        "k long, x long, _sdc_lsn long, _sdc_deleted_at string",
    )


def _rows(df):
    return {(r["k"], r["x"]) for r in df.select("k", "x").collect()}


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=4)
    t.merge_into(_batch(spark, [(k, 10 * k) for k in range(40)], 100), epoch_id="e1")
    t.merge_into(
        _batch(spark, [(3, 333), (4, 444), (99, 99)], 200, dead=(4,)), epoch_id="e2"
    )
    return t


def test_rebucket_preserves_content_and_widens(spark, table):
    before = _rows(table.read())
    pre_version = table.current_version()
    res = table.rebucket(16)
    assert not res["skipped"] and res["num_buckets"] == 16
    assert table.num_buckets == 16
    assert _rows(table.read()) == before
    # the new layout really has up to 16 bucket dirs, all single-file
    bmap = table.buckets_map()
    assert all(len(dl) == 1 for dl in bmap.values())
    assert max(int(b) for b in bmap) >= 4
    # time travel to the pre-rebucket version keeps the old layout
    assert _rows(table.read(version=pre_version)) == before
    # and version-aware bucket ids prune the OLD layout correctly
    keys = spark.createDataFrame([(3,)], "k long")
    old_b = table.buckets_for_keys(keys, version=pre_version)
    got = (
        table.read(version=pre_version, buckets=old_b)
        .filter(F.col("k") == 3)
        .collect()
    )
    assert [(r["k"], r["x"]) for r in got] == [(3, 333)]


def test_rebucket_narrow_and_noop(spark, table):
    before = _rows(table.read())
    assert table.rebucket(2)["num_buckets"] == 2
    assert _rows(table.read()) == before
    assert table.rebucket(2)["skipped"]
    with pytest.raises(ValueError):
        table.rebucket(0)


def test_merges_and_point_reads_after_rebucket(spark, table):
    table.rebucket(16)
    table.merge_into(_batch(spark, [(7, 777), (50, 50)], 300), epoch_id="e3")
    assert (7, 777) in _rows(table.read()) and (50, 50) in _rows(table.read())
    keys = spark.createDataFrame([(7,), (50,)], "k long")
    got = _rows(table.read_keys(keys))
    assert got == {(7, 777), (50, 50)}


def test_changelog_passes_through_rebucket(spark, table):
    v1 = table.current_version()
    table.rebucket(8)
    table.merge_into(_batch(spark, [(5, 555)], 300), epoch_id="e3")
    ch = table.read_changes(v1)
    assert {(r["k"], r["x"]) for r in ch.select("k", "x").collect()} == {(5, 555)}


def test_tombstone_evidence_survives_rebucket(spark, table):
    """Key 4 was deleted at LSN 201; after a rebucket, a replayed
    lower-LSN insert for key 4 must still lose to the tombstone."""
    table.rebucket(16)
    table.merge_into(_batch(spark, [(4, 4)], 150), epoch_id="replay-low")
    assert not table.read().filter(F.col("k") == 4).collect()
