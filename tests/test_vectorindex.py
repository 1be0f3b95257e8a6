"""Incrementally-maintained IVF index (vectorindex.py): bootstrap,
O(|changes|) refresh with cell-move tombstones, partition-pruned search
equality vs a full rebuild, dup-delta idempotence, cell compaction."""

import glob
import os
import shutil

import pytest
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc
from tap_postgres_spark.vectorindex import (
    bootstrap_ivf_index,
    compact_cells,
    refresh_ivf_index,
    search_ivf_index,
)

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )
)

# 3 well-separated cells in 4-d
CENTROIDS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.0]),
]


def _near(cell, eps):
    v = list(CENTROIDS[cell][1])
    return [x + (eps if x == 0.0 else 0.0) for x in v]


def _batch(spark, rows):
    """rows: (repo, path, embedding-or-None, lsn, deleted_at)"""
    return spark.createDataFrame(
        [(r, p, e, l, d, 1, "U" if d is None else "D") for r, p, e, l, d in rows],
        "repo string, path string, embedding array<double>, _sdc_lsn long, "
        "_sdc_deleted_at string, txid long, _action string",
    )


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "base"), SCHEMA, ["repo", "path"], num_buckets=4
    )
    t.merge_into(
        _batch(
            spark,
            [
                ("r1", "a", _near(0, 0.01), 10, None),
                ("r1", "b", _near(0, 0.02), 11, None),
                ("r2", "c", _near(1, 0.01), 12, None),
                ("r2", "d", _near(2, 0.01), 13, None),
            ],
        ),
        epoch_id="seed",
    )
    return t


def _search_rows(spark, root, q, n_probe):
    return [
        (r["repo"], r["path"], r["cos_sim"])
        for r in search_ivf_index(
            spark, root, q, k=10, n_probe=n_probe
        ).collect()
    ]


def _assert_equals_rebuild(spark, base, root, tmp_path, tag):
    """The correctness bar: for every probe width and several queries,
    the incrementally-maintained index answers exactly like an index
    rebuilt from scratch at the current base head."""
    rebuilt = str(tmp_path / f"rebuild-{tag}")
    bootstrap_ivf_index(spark, base, rebuilt, CENTROIDS)
    for q in ([1.0, 0.05, 0.0, 0.0], [0.0, 1.0, 0.05, 0.0], [0.1, 0.1, 1.0, 0.0]):
        for n_probe in (1, 2, 3):
            assert _search_rows(spark, root, q, n_probe) == _search_rows(
                spark, rebuilt, q, n_probe
            ), f"{tag}: q={q} n_probe={n_probe}"


def test_bootstrap_and_search_prunes_to_probed_cells(spark, tmp_path, base):
    root = str(tmp_path / "idx")
    res = bootstrap_ivf_index(spark, base, root, CENTROIDS)
    assert res["cells"] == 3
    rows = _search_rows(spark, root, [1.0, 0.0, 0.0, 0.0], 1)
    assert [r[:2] for r in rows] == [("r1", "a"), ("r1", "b")]
    # partition pruning: the probe predicate reaches the scan
    plan = search_ivf_index(
        spark, root, [1.0, 0.0, 0.0, 0.0], n_probe=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan


def test_refresh_handles_update_move_delete_insert(spark, tmp_path, base):
    root = str(tmp_path / "idx")
    bootstrap_ivf_index(spark, base, root, CENTROIDS)
    base.merge_into(
        _batch(
            spark,
            [
                ("r1", "a", _near(0, 0.05), 20, None),   # update, same cell
                ("r1", "b", _near(2, 0.01), 21, None),   # MOVES cell 0 → 2
                ("r2", "c", None, 22, "2026-01-01"),      # delete
                ("r3", "e", _near(1, 0.02), 23, None),   # insert
            ],
        ),
        epoch_id="churn",
    )
    res = refresh_ivf_index(base, root)
    assert not res["skipped"]
    _assert_equals_rebuild(spark, base, root, tmp_path, "churn")
    # idempotent: second refresh at same head is a no-op
    assert refresh_ivf_index(base, root)["skipped"]


def test_move_leaves_no_ghost_in_old_cell(spark, tmp_path, base):
    root = str(tmp_path / "idx")
    bootstrap_ivf_index(spark, base, root, CENTROIDS)
    base.merge_into(
        _batch(spark, [("r1", "b", _near(2, 0.01), 21, None)]),
        epoch_id="mv",
    )
    refresh_ivf_index(base, root)
    # probing ONLY the old cell must not resurrect the moved vector
    old_cell_hits = _search_rows(spark, root, [1.0, 0.0, 0.0, 0.0], 1)
    assert ("r1", "b") not in [r[:2] for r in old_cell_hits]
    # and the new cell serves it
    new_cell_hits = _search_rows(spark, root, [0.0, 0.0, 1.0, 0.0], 1)
    assert ("r1", "b") in [r[:2] for r in new_cell_hits]


def test_duplicate_delta_rows_collapse(spark, tmp_path, base):
    """A crash between the cell append and the map commit replays the
    delta — duplicated rows must fold away (LWW idempotence)."""
    root = str(tmp_path / "idx")
    bootstrap_ivf_index(spark, base, root, CENTROIDS)
    base.merge_into(
        _batch(spark, [("r1", "b", _near(2, 0.01), 21, None)]), epoch_id="mv"
    )
    refresh_ivf_index(base, root)
    before = {
        n: _search_rows(spark, root, [0.0, 0.0, 1.0, 0.0], n) for n in (1, 3)
    }
    for cell_dir in glob.glob(os.path.join(root, "cells", "centroid_id=*")):
        for f in glob.glob(os.path.join(cell_dir, "*.parquet")):
            shutil.copy(f, f.replace(".parquet", "-dup.parquet"))
    after = {
        n: _search_rows(spark, root, [0.0, 0.0, 1.0, 0.0], n) for n in (1, 3)
    }
    assert before == after


def test_compact_cells_folds_files_keeps_results(spark, tmp_path, base):
    root = str(tmp_path / "idx")
    bootstrap_ivf_index(spark, base, root, CENTROIDS)
    for i, lsn in enumerate(range(20, 26)):
        base.merge_into(
            _batch(
                spark,
                [("r1", "a", _near(i % 3, 0.01 + i / 100.0), lsn, None)],
            ),
            epoch_id=f"c{i}",
        )
        refresh_ivf_index(base, root)
    q = [1.0, 0.05, 0.05, 0.0]
    before = {n: _search_rows(spark, root, q, n) for n in (1, 3)}
    n_files_before = len(
        glob.glob(os.path.join(root, "cells", "*", "*.parquet"))
    )
    compact_cells(spark, root)
    after = {n: _search_rows(spark, root, q, n) for n in (1, 3)}
    assert before == after
    n_files_after = len(
        glob.glob(os.path.join(root, "cells", "*", "*.parquet"))
    )
    assert n_files_after < n_files_before
    _assert_equals_rebuild(spark, base, root, tmp_path, "compacted")
