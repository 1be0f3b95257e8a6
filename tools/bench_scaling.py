"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule's two-cluster-size criterion (throughput scaling efficiency
≥ 0.8 from N to 4N executors) cannot use a real cluster in this sandbox;
per the driver's instruction it is evidenced by running the IDENTICAL
CDC-replay job at two local parallelism levels (local[8] vs local[32])
on the same input and reporting throughput at both plus

    efficiency = (events_per_sec@32 / events_per_sec@8) / 4

Each level runs in its own subprocess (fresh JVM) so the measurements
don't share executor state.  Results land in BENCH_SCALING.json and are
summarized into BASELINE.md by hand.

Usage: python tools/bench_scaling.py [n_events] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_quiet_host(max_load: float = 4.0, timeout_s: int = 600) -> None:
    """The sandbox host is shared; don't start a measurement while
    co-tenant load is high (set SPARK_GRAFT_LOAD_GATE=0 to disable)."""
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", max_load))
    if gate <= 0:
        return
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load1 = os.getloadavg()[0]
        if load1 < gate:
            return
        time.sleep(15)


def run_level(cpus: int, n_events: int, work_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_EVENTS=str(n_events),
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_SKIP_TXN="1",  # scaling measures the CDC path only
        SPARK_GRAFT_BENCH_SAMPLES="1",  # this tool already does best-of-N
        SPARK_GRAFT_WORK_DIR=work_dir,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    # Pin the process to exactly `cpus` host CPUs (SPARK_GRAFT_PIN_CPUS=0
    # opts out).  Without pinning, a local[N] JVM's GC / Netty / Parquet
    # helper threads spill onto the host's other idle cores, so the LOW
    # level borrows proportionally more CPU than its N executor threads
    # — measured 134 s unpinned vs 142 s pinned at local[2] on the 16M
    # replay, inflating the base and understating N→4N efficiency.  On a
    # real cluster an executor's helper threads compete for that
    # executor's cores; pinning reproduces exactly that.
    if os.environ.get("SPARK_GRAFT_PIN_CPUS", "1") != "0":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    work = "/tmp/tps_bench_scaling"
    os.makedirs(work, exist_ok=True)

    results = {}
    for cpus in (n_low, n_high):
        best = None
        for rep in range(repeats):
            # fresh lake/state per run; the generated feed is reused (cached)
            for sub in ("lake", "metrics", "bench-state.json"):
                subprocess.run(["rm", "-rf", os.path.join(work, sub)])
            wait_for_quiet_host()
            r = run_level(cpus, n_events, work)
            assert r["cdc"]["verify"] == "ok", r["cdc"]
            print(f"local[{cpus}] run {rep}: {r['cdc']['events_per_sec']} ev/s "
                  f"({r['cdc']['seconds']}s)", flush=True)
            if best is None or r["cdc"]["events_per_sec"] > best["events_per_sec"]:
                best = r["cdc"]
        # best-of-N: the sandbox host is shared (co-tenant load spikes);
        # best-of mitigates contention noise in wall-clock numbers
        results[str(cpus)] = best

    eps_low = results[str(n_low)]["events_per_sec"]
    eps_high = results[str(n_high)]["events_per_sec"]
    ratio = n_high / n_low
    eff = (eps_high / eps_low) / ratio
    doc = {
        "n_events": n_events,
        "levels": {f"local[{n_low}]": results[str(n_low)],
                   f"local[{n_high}]": results[str(n_high)]},
        "speedup": round(eps_high / eps_low, 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "criterion": "≥ 0.8 from N to 4N (BASELINE.json)",
        "pass": eff >= 0.8,
        "cpu_pinning": os.environ.get("SPARK_GRAFT_PIN_CPUS", "1") != "0",
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
