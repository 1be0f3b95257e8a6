"""Per-query isolation harness (guide §1.4): times individual queries()
entries with the noop sink in the SAME session shape bench.py uses, and
optionally dumps .explain("formatted") to plans/.

This file is NOT part of the frozen measurement contract — bench.py is.

Usage:
  python bench_extra.py q1 q2 ...            # time each query N times
  python bench_extra.py --explain DIR q ...  # also write DIR/<q>.txt plans
  python bench_extra.py --all                # sweep every query once

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, TPS_BENCH_REPS (default 3).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
        os.makedirs(explain_dir, exist_ok=True)
    sweep_all = "--all" in args
    if sweep_all:
        args.remove("--all")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("TPS_BENCH_REPS", "3"))

    from tap_postgres_spark.session import get_spark

    spark = get_spark("tps-bench-extra", cores=cpus)

    import __spark_entry__ as entry_mod

    fns = entry_mod.queries()
    names = list(fns) if sweep_all else args
    unknown = [n for n in names if n not in fns]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = fns[name]
        if explain_dir is not None:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for r in range(reps if not sweep_all else 1):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times} min={min(times)}", flush=True)

    print(json.dumps({k: min(v) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
