"""Aligned merge writes: with a murmur3 bucket fn and the fold exchange
width equal to the bucket count, the write reuses the fold's own shuffle
layout — one file per bucket per commit WITHOUT a second repartition of
the folded batch.  One-file-per-bucket is the runtime PROOF of the
alignment claim (pmod(murmur3(keys), n) == HashPartitioning id): were the
layouts different, every shuffle partition would spill rows into several
bucket dirs and file counts would multiply."""

from __future__ import annotations

import os

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


def _batch(spark, n, lsn0):
    # duplicate keys (k = id % (n/2)) so the fold genuinely needs its
    # exchange — Spark's distinct-keys propagation elides the shuffle
    # for provably-unique keys (range ids), and an elided exchange means
    # there is nothing to align with (the runtime gate must catch that)
    return spark.range(n).select(
        (F.col("id") % (n // 2)).alias("k"),
        F.col("id").alias("x"),
        (F.col("id") + lsn0).alias("_sdc_lsn"),
        F.lit(None).cast("string").alias("_sdc_deleted_at"),
    )


def _files_per_bucket(table):
    out = {}
    for b, dirs in table.buckets_map().items():
        n = 0
        for d in dirs:
            full = os.path.join(table.path, d)
            n += sum(
                1
                for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        out[b] = n
    return out


def test_aligned_merge_one_file_per_bucket(spark, tmp_path):
    # conftest session: shuffle.partitions = 4 → num_buckets=4 aligns
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=width)
    assert t.metadata()["bucket_fn"] == "murmur3"
    assert t._write_aligned(t.metadata(), width)
    t.merge_into(_batch(spark, 500, 10), epoch_id="e1")
    fpb = _files_per_bucket(t)
    assert len(fpb) == width and all(n == 1 for n in fpb.values()), fpb
    # content correct (bucket routing by value, read path resolves)
    assert t.read().count() == 250
    keys = spark.createDataFrame([(7,), (123,)], "k long")
    assert {r["k"] for r in t.read_keys(keys).collect()} == {7, 123}


def test_misaligned_width_still_one_file_per_bucket(spark, tmp_path):
    """Width != bucket count → alignment off, the explicit repartition
    keeps the one-file-per-bucket shape; content identical."""
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=width * 2
    )
    assert not t._write_aligned(t.metadata(), width * 2)
    t.merge_into(_batch(spark, 500, 10), epoch_id="e1")
    fpb = _files_per_bucket(t)
    assert all(n == 1 for n in fpb.values()), fpb
    assert t.read().count() == 250


def test_legacy_xxhash_metadata_reads_back(spark, tmp_path):
    """A table whose metadata predates bucket_fn (defaults to xxhash64)
    keeps its layout: merges and point reads agree on bucket ids."""
    import json

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=4)
    # strip the key, as an old-format table would lack it
    mdir = os.path.join(str(tmp_path / "t"), "metadata")
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            fp = os.path.join(mdir, name)
            with open(fp) as f:
                doc = json.load(f)
            doc.pop("bucket_fn", None)
            with open(fp, "w") as f:
                json.dump(doc, f)
    t2 = LakeTable(spark, str(tmp_path / "t"))
    assert t2._bucket_fn(t2.metadata()) == "xxhash64"
    t2.merge_into(_batch(spark, 200, 10), epoch_id="e1")
    keys = spark.createDataFrame([(7,), (23,)], "k long")
    assert {r["k"] for r in t2.read_keys(keys).collect()} == {7, 23}
    # rebucket migrates the fn
    t2.rebucket(8)
    assert t2.metadata()["bucket_fn"] == "murmur3"
    assert t2.read().count() == 100


def test_unique_key_batch_falls_back_to_repartition(spark, tmp_path):
    """A batch whose keys Spark can PROVE unique plans no fold exchange;
    the runtime gate must detect the missing hashpartitioning and fall
    back to the explicit repartition (one file per bucket either way)."""
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=width)
    unique = spark.range(300).select(
        F.col("id").alias("k"),
        F.col("id").alias("x"),
        (F.col("id") + 10).alias("_sdc_lsn"),
        F.lit(None).cast("string").alias("_sdc_deleted_at"),
    )
    t.merge_into(unique, epoch_id="e1")
    fpb = _files_per_bucket(t)
    assert all(n == 1 for n in fpb.values()), fpb
    assert t.read().count() == 300
