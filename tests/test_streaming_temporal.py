"""Watermarked stream-stream interval join (streaming/temporal.py):
stream result ≡ batch range filter; leftOuter emits unmatched rows;
the plan carries the state-bounding join condition."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.streaming.temporal import stream_stream_interval_join

_L_SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("l_id", T.LongType(), False),
    T.StructField("lts", T.TimestampType(), False),
])
_R_SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("r_id", T.LongType(), False),
    T.StructField("rts", T.TimestampType(), False),
])


def _ts(s):
    return F.timestamp_seconds(F.lit(s)).cast("timestamp")


def _feed(spark, d, schema, rows, cols, name="f"):
    stage = str(d) + f"_stage_{name}"
    df = spark.createDataFrame(rows, f"{cols[0]} long, {cols[1]} long, s long")
    df.select(
        cols[0], cols[1], F.timestamp_seconds("s").alias(cols[2])
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(d, exist_ok=True)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(str(d), f"{name}.parquet"))


@pytest.mark.parametrize("how", ["inner", "leftOuter"])
def test_stream_stream_interval_join_matches_batch(spark, tmp_path, how):
    base = 1_700_000_000
    lrows = [(1, 10, base + 0), (1, 11, base + 100), (2, 20, base + 50)]
    rrows = [(1, 90, base + 20), (1, 91, base + 95), (1, 92, base + 160),
             (2, 95, base + 300)]
    _feed(spark, tmp_path / "l", _L_SCHEMA, lrows, ("k", "l_id", "lts"))
    _feed(spark, tmp_path / "r", _R_SCHEMA, rrows, ("k", "r_id", "rts"))
    # outer results only emit once the GLOBAL watermark (min over both
    # sides) proves no match can still arrive — a second file per side
    # with a far-future sentinel advances it past every real event
    _feed(spark, tmp_path / "l", _L_SCHEMA, [(9, 999, base + 10_000)],
          ("k", "l_id", "lts"), name="g")
    _feed(spark, tmp_path / "r", _R_SCHEMA, [(9, 998, base + 10_000)],
          ("k", "r_id", "rts"), name="g")

    ls = (
        spark.readStream.schema(_L_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "l"))
    )
    rs = (
        spark.readStream.schema(_R_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "r"))
    )
    out = stream_stream_interval_join(
        ls, rs, ["k"], "lts", "rts",
        lower_s=0, upper_s=60, watermark_s=30, how=how,
    )
    q = (
        out.writeStream.format("memory").queryName(f"ssj_{how}")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.l_id, r.r_id)
        for r in spark.table(f"ssj_{how}").collect()
        if r.l_id != 999  # the watermark sentinel pair matches itself
    )

    # batch oracle: plain range-filtered join on static frames
    want = sorted(
        (lid, rid)
        for (lk, lid, lt) in lrows
        for (rk, rid, rt) in rrows
        if lk == rk and lt <= rt <= lt + 60
    )
    if how == "leftOuter":
        matched = {lid for lid, _ in want}
        want += [(lid, None) for (_, lid, _) in lrows if lid not in matched]
        want = sorted(want, key=lambda p: (p[0], p[1] is None, p[1] or 0))
        got = sorted(got, key=lambda p: (p[0], p[1] is None, p[1] or 0))
    assert got == want
    # spelled out for the inner case: 10↔90 and 11↔92 are in range;
    # 91 lands 95s after l_id 10 (out) and 5s BEFORE l_id 11 (out,
    # lower bound 0); k=2's only right event is 250s late (out)
    if how == "inner":
        assert got == [(10, 90), (11, 92)]


def test_rejects_colliding_ts_names(spark, tmp_path):
    df = spark.readStream.schema(_L_SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="distinct"):
        stream_stream_interval_join(
            df, df, ["k"], "lts", "lts",
            lower_s=0, upper_s=1, watermark_s=1,
        )
