"""STREAM-style aggregate memory-bandwidth probe (VERDICT r05 item #5).

The 4->16 scaling pair reads ~0.79 efficiency and the r05 diagnosis was
a shared-memory-bandwidth wall (identical replay work costs 134->201
CPU-s at 4->16 threads).  This measures the wall DIRECTLY: N processes
each copy a 64 MB buffer (read+write) for a few seconds; aggregate
bytes/s per thread level shows how per-thread bandwidth collapses as
threads contend for the same memory controllers.

numactl/membind is not applicable on this host: a single NUMA node
(/sys/devices/system/node has only node0), so there is no second memory
domain to bind to — the bandwidth ceiling is the box, not placement.

Usage: python tools/bench_membw.py [seconds_per_level]
Writes BENCH_MEMBW.json at the repo root.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(q, seconds: float) -> None:
    a = np.zeros(64 * 1024 * 1024 // 8)
    b = np.zeros_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0))  # read+write bytes/s


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    levels = [1, 2, 4, 8, 16, 32]
    out = {"levels": {}, "seconds_per_level": seconds}
    for nt in levels:
        q: mp.Queue = mp.Queue()
        ps = [mp.Process(target=_worker, args=(q, seconds)) for _ in range(nt)]
        for p in ps:
            p.start()
        tot = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        out["levels"][str(nt)] = {
            "aggregate_gb_s": round(tot / 1e9, 1),
            "per_thread_gb_s": round(tot / nt / 1e9, 2),
        }
        print(
            f"threads={nt:3d} aggregate={tot / 1e9:7.1f} GB/s "
            f"per-thread={tot / nt / 1e9:6.2f} GB/s",
            flush=True,
        )
    lv = out["levels"]
    if "4" in lv and "16" in lv:
        out["agg_scaling_4_to_16"] = round(
            lv["16"]["aggregate_gb_s"] / lv["4"]["aggregate_gb_s"], 2
        )
    out["numa_nodes"] = sorted(
        d for d in os.listdir("/sys/devices/system/node") if d.startswith("node")
    )
    with open(os.path.join(REPO, "BENCH_MEMBW.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "levels"}))


if __name__ == "__main__":
    main()
