"""Cross-table transaction-consistent snapshots (lake/snapshots.py):
readers resolving tables through the pipeline manifest never observe a
transaction applied to one table and not the other — including in the
crash window between two tables' merges."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.snapshots import PipelineSnapshots
from tap_postgres_spark.schema import StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("x", T.LongType(), True),
        ]
    )
)


def _batch(spark, rows, lsn0):
    return spark.createDataFrame(
        [(k, x, lsn0 + i, None) for i, (k, x) in enumerate(rows)],
        "k long, x long, _sdc_lsn long, _sdc_deleted_at string",
    )


def _sum(df):
    return df.agg(F.coalesce(F.sum("x"), F.lit(0))).first()[0]


def test_crash_window_stays_consistent(spark, tmp_path):
    """Invariant: each 'transaction' adds the same amount to both
    tables, so sum(a.x) == sum(b.x) at every txn boundary.  A direct
    merge to table A alone (≙ crash between the two merges) must NOT be
    visible through the snapshot — only through the raw head read."""
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, ["k"], num_buckets=4)
    b = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["k"], num_buckets=4)
    snaps = PipelineSnapshots(spark, str(tmp_path / "snaps"))

    a.merge_into(_batch(spark, [(1, 10), (2, 20)], 100), epoch_id="e1")
    b.merge_into(_batch(spark, [(7, 30)], 100), epoch_id="e1")
    snaps.publish("e1", {"pub.a": a, "pub.b": b})
    assert _sum(snaps.read("pub.a")) == _sum(snaps.read("pub.b")) == 30

    # crash window: epoch e2's txn (+15 to each) lands in A only
    a.merge_into(_batch(spark, [(3, 15)], 200), epoch_id="e2")
    assert _sum(a.read()) == 45  # raw head read exposes the half-txn
    assert _sum(snaps.read("pub.a")) == 30  # snapshot does not
    assert _sum(snaps.read("pub.b")) == 30

    # replay completes B and publishes: both move together
    b.merge_into(_batch(spark, [(8, 15)], 200), epoch_id="e2")
    snaps.publish("e2", {"pub.a": a, "pub.b": b})
    assert _sum(snaps.read("pub.a")) == _sum(snaps.read("pub.b")) == 45


def test_publish_idempotent_and_history(spark, tmp_path):
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, ["k"], num_buckets=4)
    snaps = PipelineSnapshots(spark, str(tmp_path / "snaps"))
    assert snaps.latest() is None
    a.merge_into(_batch(spark, [(1, 1)], 100), epoch_id="e1")
    m1 = snaps.publish("e1", {"t": a})
    again = snaps.publish("e1", {"t": a})
    assert again["skipped"] and again["seq"] == m1["seq"] == 1
    a.merge_into(_batch(spark, [(2, 2)], 200), epoch_id="e2")
    m2 = snaps.publish("e2", {"t": a})
    assert m2["seq"] == 2
    hist = snaps.history()
    assert [m["epoch_id"] for m in hist] == ["e1", "e2"]
    # read an older snapshot explicitly
    assert _sum(snaps.read("t", seq=1)) == 1
    assert _sum(snaps.read("t")) == 3
    with pytest.raises(KeyError):
        snaps.read("missing")
    with pytest.raises(ValueError, match="pinned"):
        snaps.read("t", version=1)


def test_pipeline_publishes_per_epoch(spark, tmp_path):
    """CdcPipeline(snapshots_dir=...) publishes one manifest per applied
    epoch, after all streams' merges; snapshot reads equal head reads at
    the epoch boundary, and a replayed epoch does not double-publish."""
    from tap_postgres_spark.modes.log_based import CdcPipeline

    base = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("x", T.LongType(), True),
        ]
    )
    streams = [
        StreamDef("pub", "ta", base, ("k",)),
        StreamDef("pub", "tb", base, ("k",)),
    ]
    tables = {
        s.fqn: LakeTable.create(
            spark,
            str(tmp_path / s.table_name),
            widen_for_cdc(base),
            ["k"],
            num_buckets=4,
        )
        for s in streams
    }
    pipe = CdcPipeline(
        spark,
        streams,
        {s.fqn: {"k": "bigint", "x": "bigint"} for s in streams},
        tables,
        StateStore(str(tmp_path / "state.json")),
        detect_evolution=False,
        snapshots_dir=str(tmp_path / "snaps"),
    )

    def raw(rows):
        return spark.createDataFrame(
            [
                (
                    lsn,
                    lsn,
                    json.dumps(
                        {
                            "action": "I",
                            "schema": "pub",
                            "table": tbl,
                            "columns": [
                                {"name": "k", "type": "bigint", "value": k},
                                {"name": "x", "type": "bigint", "value": x},
                            ],
                        }
                    ),
                )
                for lsn, tbl, k, x in rows
            ],
            "lsn long, txid long, payload string",
        )

    r1 = pipe.apply_batch(raw([(1, "ta", 1, 5), (2, "tb", 1, 5)]), epoch_id="b1")
    assert r1["snapshot"]["seq"] == 1
    r2 = pipe.apply_batch(raw([(3, "ta", 2, 7), (4, "tb", 2, 7)]), epoch_id="b2")
    assert r2["snapshot"]["seq"] == 2
    snaps = PipelineSnapshots(spark, str(tmp_path / "snaps"))
    for fqn, t in tables.items():
        assert _sum(snaps.read(fqn)) == _sum(t.read()) == 12
    # replaying an applied epoch must not mint a new snapshot
    r2b = pipe.apply_batch(raw([(3, "ta", 2, 7), (4, "tb", 2, 7)]), epoch_id="b2")
    assert r2b["snapshot"]["skipped"] and r2b["snapshot"]["seq"] == 2


def test_expire_keeps_latest(spark, tmp_path):
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, ["k"], num_buckets=4)
    snaps = PipelineSnapshots(spark, str(tmp_path / "snaps"))
    for i in range(5):
        a.merge_into(_batch(spark, [(i, i)], 100 + i), epoch_id=f"e{i}")
        snaps.publish(f"e{i}", {"t": a})
    res = snaps.expire(keep_last=2)
    assert res == {"dropped": 3, "kept": 2}
    assert [m["seq"] for m in snaps.history()] == [4, 5]
    assert snaps.latest()["epoch_id"] == "e4"
    with pytest.raises(FileNotFoundError):
        snaps.manifest(1)
