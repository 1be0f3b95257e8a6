"""Phase-level profiler for the heavy queries() pipeline drills.

Replicates the phase structure of the lake-pipeline queries (feed build,
apply_batch x2, final read) with a timer around each phase, so the
optimization target inside a 5-9 s query is visible.  Not part of the
frozen bench contract.

Usage: python tools/profile_phases.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Timer:
    def __init__(self):
        self.t = time.time()
        self.phases = []

    def lap(self, name):
        now = time.time()
        self.phases.append((name, round(now - self.t, 2)))
        self.t = now

    def dump(self, tag):
        total = sum(s for _, s in self.phases)
        print(f"-- {tag} (total {total:.2f}s) --")
        for name, s in self.phases:
            print(f"   {s:6.2f}  {name}")
        self.phases = []


def profile_merge_partial_toast(spark):
    import __spark_entry__ as e

    tm = Timer()
    # phase boundaries mirror q_merge_partial_toast internals via
    # monkeypatched timing on CdcPipeline.apply_batch and LakeTable.read
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.lake.table import LakeTable

    orig_apply = CdcPipeline.apply_batch
    orig_read = LakeTable.read
    laps = []

    def timed_apply(self, raw, epoch_id, batch_time=None):
        t0 = time.time()
        r = orig_apply(self, raw, epoch_id, batch_time)
        laps.append((f"apply_batch[{epoch_id}]", round(time.time() - t0, 2)))
        return r

    def timed_read(self, *a, **k):
        t0 = time.time()
        r = orig_read(self, *a, **k)
        laps.append(("read-plan", round(time.time() - t0, 2)))
        return r

    CdcPipeline.apply_batch = timed_apply
    LakeTable.read = timed_read
    try:
        for name in sys.argv[1:] or ["merge_partial_toast"]:
            fn = e.queries()[name]
            laps.clear()
            tm.t = time.time()
            df = fn(spark, SF_DIR)
            tm.lap("build (feed + merges)")
            df.write.mode("overwrite").format("noop").save()
            tm.lap("final noop exec")
            tm.phases[0:0] = laps
            tm.dump(name)
    finally:
        CdcPipeline.apply_batch = orig_apply
        LakeTable.read = orig_read


if __name__ == "__main__":
    from tap_postgres_spark.session import get_spark

    spark = get_spark("profile-phases", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # warm python workers + codegen
    import pandas as pd  # noqa: F401

    def _p(it):
        for pdf in it:
            yield pdf

    spark.range(0, 32, 1, 32).toDF("x").mapInPandas(_p, "x long").write.mode(
        "overwrite"
    ).format("noop").save()
    profile_merge_partial_toast(spark)
