"""Streaming point-in-time enrichment (streaming/enrich.py): stream ≡
batch operator, mid-query dimension refresh visibility, exactly-once
replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.operators.temporal import point_in_time_join
from tap_postgres_spark.schema import widen_for_cdc
from tap_postgres_spark.streaming.enrich import StreamingPointInTimeEnricher

_FACT_SCHEMA = T.StructType([
    T.StructField("fact_id", T.LongType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("lsn", T.LongType(), False),
])

_BATCH_SCHEMA = (
    "repo string, path string, content string, _sdc_lsn long, "
    "_sdc_deleted_at string"
)


@pytest.fixture()
def dim(spark, tmp_path):
    schema = widen_for_cdc(T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]))
    t = LakeTable.create(
        spark, str(tmp_path / "dim"), schema, ["repo", "path"], num_buckets=4
    )
    t.merge_into(
        spark.createDataFrame(
            [("r", "a", "v1", 10, None), ("r", "b", "v1", 11, None)],
            _BATCH_SCHEMA,
        ),
        epoch_id="e1",
    )
    t.merge_into(
        spark.createDataFrame(
            [("r", "a", "v2", 20, None), ("r", "b", None, 21, "2024-01-01")],
            _BATCH_SCHEMA,
        ),
        epoch_id="e2",
    )
    return t


def _write_facts(spark, feed_dir, name, rows):
    # the file stream source lists FILES in the feed dir — stage the
    # parquet and move the single part file in (same as the gate tests)
    import glob
    import shutil

    stage = os.path.join(feed_dir, "..", f"_stage_{name}")
    spark.createDataFrame(rows, _FACT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    os.makedirs(feed_dir, exist_ok=True)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(feed_dir, f"{name}.parquet"))


def _enricher(spark, tmp_path, dim):
    return StreamingPointInTimeEnricher(
        spark,
        str(tmp_path / "feed"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        schema=_FACT_SCHEMA,
        history_loader=lambda: dim.read_changes(0, fold=False),
        on=["repo", "path"],
        fact_lsn_col="lsn",
        value_cols={"content": "content_then"},
    )


def _state(df):
    return {(r.fact_id): r.content_then for r in df.collect()}


def test_stream_equals_batch_and_replay_is_idempotent(spark, tmp_path, dim):
    feed = str(tmp_path / "feed")
    facts = [(1, "r", "a", 15), (2, "r", "a", 25),
             (3, "r", "b", 15), (4, "r", "b", 25)]
    _write_facts(spark, feed, "f1", facts)

    e = _enricher(spark, tmp_path, dim)
    e.run_available_now()
    got = _state(e.enriched())
    want = _state(point_in_time_join(
        spark.createDataFrame(facts, _FACT_SCHEMA),
        dim.read_changes(0, fold=False),
        ["repo", "path"], "lsn", {"content": "content_then"},
    ))
    assert got == want == {1: "v1", 2: "v2", 3: "v1", 4: None}

    # replay with the same checkpoint: nothing new processed
    e2 = _enricher(spark, tmp_path, dim)
    e2.run_available_now()
    assert e2.batch_results == []
    assert _state(e2.enriched()) == want


def test_dimension_refresh_is_visible_to_later_batches(spark, tmp_path, dim):
    feed = str(tmp_path / "feed")
    _write_facts(spark, feed, "f1", [(1, "r", "a", 25)])
    e = _enricher(spark, tmp_path, dim)
    e.run_available_now()
    assert _state(e.enriched()) == {1: "v2"}

    # a third dimension commit lands (b re-inserted), then more facts
    dim.merge_into(
        spark.createDataFrame([("r", "b", "v3", 30, None)], _BATCH_SCHEMA),
        epoch_id="e3",
    )
    _write_facts(spark, feed, "f2", [(2, "r", "b", 35), (3, "r", "b", 25)])
    e2 = _enricher(spark, tmp_path, dim)
    e2.run_available_now()
    assert _state(e2.enriched()) == {1: "v2", 2: "v3", 3: None}
