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
