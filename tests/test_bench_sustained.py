"""Smoke-pin for tools/bench_sustained.py (the flatness drill).

Runs the drill in-process at toy scale (4 batches x 25k events) against
the pytest SparkSession and asserts the artifact's invariants: every
batch applied, DuckDB fold certificate green, maintenance cycled (the
tightened policy must fire at least one full pass inside the run so the
saw-tooth is exercised), and the summary fields the BASELINE.md section
quotes are present.  Keeps the tool from drifting against pipeline /
lake API changes between rounds.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sustained_drill_smoke(spark, tmp_path, monkeypatch):
    out = tmp_path / "sustained.json"
    monkeypatch.setenv("SPARK_GRAFT_WORK_DIR", str(tmp_path / "work"))
    monkeypatch.setenv("SPARK_GRAFT_SUSTAINED_OUT", str(out))
    monkeypatch.setattr(sys, "argv", ["bench_sustained.py", "4", "25000"])

    spec = importlib.util.spec_from_file_location(
        "bench_sustained", os.path.join(REPO, "tools", "bench_sustained.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # type: ignore[union-attr]
    mod.main()

    doc = json.loads(out.read_text())
    assert doc["n_batches"] == 4 and len(doc["batches"]) == 4
    assert doc["verify"] == "ok"
    assert doc["n_events"] == 100_000
    # the tightened policy (depth>3 trigger, every 3rd firing full) keeps
    # versions bounded: final <= max, and the drill recorded depth resets
    assert doc["max_delta_depth"] <= 4
    for key in (
        "slope_pct_of_mean_per_batch",
        "slope_pct_excl_first_batch",
        "late_half_over_early_half",
        "jvm_rss_mb_last",
        "final_data_files",
    ):
        assert key in doc
    # per-batch certificates present
    assert all("load1_start" in b and "seconds" in b for b in doc["batches"])
