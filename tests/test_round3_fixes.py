"""Round-3 ADVICE regression tests: SQL-literal escaping in the JDBC
incremental predicate, percent-decoded sqlalchemy_url credentials,
stream-map config rendering of None/containers, and truncated-WAV
containment."""

from __future__ import annotations

import datetime

import pytest

from tap_postgres_spark import multimodal
from tap_postgres_spark.sources import incremental_dbtable, jdbc_properties, jdbc_url
from tap_postgres_spark.stream_maps import _substitute


# --- ADVICE medium: bookmark SQL-literal escaping (jdbc.py) ----------------
def test_incremental_bookmark_quote_escaped():
    q = incremental_dbtable("public.t", "name", "O'Brien")
    assert "name >= 'O''Brien'" in q
    # a would-be injection stays inside the literal
    q2 = incremental_dbtable("public.t", "name", "x'; DROP TABLE t; --")
    assert "name >= 'x''; DROP TABLE t; --'" in q2


def test_incremental_bookmark_datetime_and_bad_types():
    q = incremental_dbtable(
        "public.t", "updated_at", datetime.datetime(2024, 1, 2, 3, 4, 5)
    )
    assert "updated_at >= '2024-01-02T03:04:05'" in q
    q2 = incremental_dbtable("public.t", "d", datetime.date(2024, 1, 2))
    assert "d >= '2024-01-02'" in q2
    with pytest.raises(TypeError):
        incremental_dbtable("public.t", "id", [1, 2])
    with pytest.raises(TypeError):
        incremental_dbtable("public.t", "flag", True)


# --- ADVICE low: percent-decoded sqlalchemy_url credentials ----------------
def test_percent_encoded_credentials_decoded():
    cfg = {"sqlalchemy_url": "postgresql://u%24er:p%40ss@h:5444/d"}
    props = jdbc_properties(cfg)
    assert props["user"] == "u$er"
    assert props["password"] == "p@ss"
    assert jdbc_url(cfg) == "jdbc:postgresql://h:5444/d"


# --- ADVICE low: stream-map config literal rendering ------------------------
def test_substitute_none_renders_null():
    assert _substitute("coalesce(x, {fallback})", {"fallback": None}) == (
        "coalesce(x, NULL)"
    )


def test_substitute_rejects_containers():
    with pytest.raises(ValueError, match="list"):
        _substitute("x in {vals}", {"vals": [1, 2]})
    with pytest.raises(ValueError, match="dict"):
        _substitute("x = {m}", {"m": {"a": 1}})


def test_substitute_scalars_unchanged():
    assert _substitute("a={i} AND b={f} AND c={s} AND d={t}", {
        "i": 3, "f": 2.5, "s": "it's", "t": True,
    }) == "a=3 AND b=2.5 AND c='it''s' AND d=TRUE"


# --- ADVICE low: truncated WAV is a decode failure --------------------------
def test_decode_wav_truncated_data_chunk_raises():
    wav = multimodal.encode_wav(multimodal.synth_samples(3, n=64))
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(wav[:-10])


def test_decode_wav_intact_still_ok():
    wav = multimodal.encode_wav(multimodal.synth_samples(3, n=64))
    out = multimodal.decode_wav(wav)
    assert out["n_samples"] == 64 and out["sample_rate"] == 8000


def test_pipeline_retention_expires_after_full_compact(spark, tmp_path):
    """retention_keep_last rides the full-compact cadence: history is
    bounded, current state stays oracle-correct, ingest continues."""
    import os

    from pyspark.sql import types as T

    from tap_postgres_spark.lake import LakeTable
    from tap_postgres_spark.modes.log_based import CdcPipeline
    from tap_postgres_spark.schema import StreamDef, widen_for_cdc
    from tap_postgres_spark.state import StateStore
    from tests.test_round2_fixes import _payload

    base = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("v", T.StringType())]
    )
    stream = StreamDef("public", "t_a", base, ("id",))
    table = LakeTable.create(
        spark, str(tmp_path / "t_a"), widen_for_cdc(base), ["id"], num_buckets=2
    )
    pipe = CdcPipeline(
        spark, [stream], {"public.t_a": {"id": "text", "v": "text"}},
        {"public.t_a": table}, StateStore(str(tmp_path / "s.json")),
        auto_compact_depth=2, full_compact_every=2, retention_keep_last=4,
    )
    lsn = 0
    retention_fired = False
    for i in range(12):
        lsn += 1
        raw = spark.createDataFrame(
            [(lsn, 1, _payload("I", "t_a", id=f"k{i % 3}", v=f"v{i}"))],
            "lsn long, txid long, payload string",
        )
        res = pipe.apply_batch(raw, epoch_id=f"e{i}")
        if res["streams"]["public.t_a"].get("retention", {}).get("skipped") is False:
            retention_fired = True
            # orphan GC rides the same cadence (round 4); steady-state
            # ingest has no orphans, so it reports zero removals
            vac = res["streams"]["public.t_a"]["vacuum"]
            assert vac["orphan_dirs_removed"] == 0
    assert retention_fired
    # history bounded: without retention ~30 versions accumulate over the
    # run; with it, only the tail since the last firing plus the window
    # survives (a batch creates up to 3 versions, full compact fires
    # every 2nd depth trigger)
    total_versions = table.current_version()
    assert total_versions > 14
    assert len(table.history()) < total_versions / 2
    # state still correct and the table still ingests
    state = {r["id"]: r["v"] for r in table.read().collect()}
    assert state == {"k0": "v9", "k1": "v10", "k2": "v11"}
    # a final manual expiration bounds the window exactly
    table.expire_versions(keep_last=2)
    assert len(table.history()) <= 2
    mfiles = os.listdir(os.path.join(table.path, "metadata"))
    assert len([f for f in mfiles if f.endswith(".json")]) <= 2
    assert {r["id"] for r in table.read().collect()} == {"k0", "k1", "k2"}
