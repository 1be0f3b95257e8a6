"""Round-4 ADVICE fixes (lake retention/changelog/derived/bootstrap).

1. read_changes raises (never silently truncates) when the requested
   range crosses the retention floor left by expire_versions.
2. version_as_of / read(as_of=...) keep working inside the retained
   window after versions have been expired.
3. refresh_derived survives compact commits landing between refreshes
   (compact is changelog pass-through).
4. refresh_derived raises instead of committing a stale derived table
   when its refresh lag crosses the retention floor.
5. bootstrap_snapshot works for streams with selected_columns set
   together with a chunked capture_lsn_col.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_postgres_spark.functions import md5_60bit
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.derived import bootstrap_derived, refresh_derived
from tap_postgres_spark.modes.bootstrap import bootstrap_snapshot
from tap_postgres_spark.schema import SDC_LSN, StreamDef, widen_for_cdc
from tap_postgres_spark.state import StateStore

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)

_BATCH_SCHEMA = (
    "repo string, path string, content string, _sdc_lsn long, "
    "_sdc_deleted_at string, txid long, _action string"
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(r, p, c, l, None, 1, "U") for r, p, c, l in rows], _BATCH_SCHEMA
    )


def _table(spark, tmp_path, n=6):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=2
    )
    for i in range(n):
        t.merge_into(
            _batch(spark, [("r", f"p{i}", f"v{i}", 10 + i)]), epoch_id=f"e{i}"
        )
    return t


def test_read_changes_raises_crossing_retention_floor(spark, tmp_path):
    t = _table(spark, tmp_path)
    cur = t.current_version()
    t.expire_versions(keep_last=2)
    floor = cur - 1
    # range entirely inside the kept window: fine
    assert t.read_changes(floor).count() == 1
    # range starting below the floor: the chain ends at the rewritten
    # floor manifest before covering the range → raise, never truncate
    with pytest.raises(ValueError, match="retention floor"):
        t.read_changes(floor - 2)
    with pytest.raises(ValueError, match="retention floor"):
        t.read_changes(1)


def test_version_as_of_works_after_expire(spark, tmp_path):
    t = _table(spark, tmp_path, n=3)
    between = datetime.now(timezone.utc)
    t.merge_into(_batch(spark, [("r", "late", "z", 99)]), epoch_id="late")
    cur = t.current_version()
    t.expire_versions(keep_last=2)
    # timestamps inside the kept window resolve (no FileNotFoundError
    # from walking deleted manifests)
    assert t.version_as_of(datetime.now(timezone.utc)) == cur
    assert t.version_as_of(between) == cur - 1
    assert t.read(as_of=between).count() >= 0
    # a timestamp before the oldest retained commit raises cleanly
    with pytest.raises(ValueError, match="no version committed"):
        t.version_as_of(datetime(2000, 1, 1, tzinfo=timezone.utc))


def _fingerprint(df):
    return df.select("repo", "path", SDC_LSN, md5_60bit(F.col("content")).alias("fp"))


def _derived_state(t):
    return {(r["repo"], r["path"]): r["fp"] for r in t.read().collect()}


def _full_recompute(base):
    return {
        (r["repo"], r["path"]): r["fp"] for r in _fingerprint(base.read()).collect()
    }


def test_refresh_derived_across_compaction(spark, tmp_path):
    """CdcPipeline auto-compacts; a scheduled derived refresh must not
    fail (or skew) when compact commits land inside the refresh range."""
    base = _table(spark, tmp_path, n=3)
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    # changes + a full compact + more changes, all inside one refresh range
    base.merge_into(_batch(spark, [("r", "p0", "new0", 50)]), epoch_id="u0")
    base.compact(max_delta_depth=0)
    base.merge_into(_batch(spark, [("r", "p9", "v9", 60)]), epoch_id="u9")
    res = refresh_derived(base, d, _fingerprint)
    assert not res["skipped"]
    assert _derived_state(d) == _full_recompute(base)
    # tiered compact in-range too
    base.merge_into(_batch(spark, [("r", "p0", "new1", 70)]), epoch_id="u1")
    base.compact(max_delta_depth=1, include_base=False)
    base.merge_into(_batch(spark, [("r", "p1", "new2", 80)]), epoch_id="u2")
    refresh_derived(base, d, _fingerprint)
    assert _derived_state(d) == _full_recompute(base)


def test_refresh_derived_raises_past_retention_floor(spark, tmp_path):
    """A derived table whose refresh lag crosses the retention floor must
    get a clean error, not a silently-partial changelog commit."""
    base = _table(spark, tmp_path, n=2)
    d = bootstrap_derived(spark, base, str(tmp_path / "d"), _fingerprint)
    before = _derived_state(d)
    for i in range(6):
        base.merge_into(
            _batch(spark, [("r", f"q{i}", "x", 100 + i)]), epoch_id=f"q{i}"
        )
    base.expire_versions(keep_last=2)
    with pytest.raises(ValueError, match="retention floor"):
        refresh_derived(base, d, _fingerprint)
    # and nothing was committed to the derived table
    assert _derived_state(d) == before


def test_bootstrap_snapshot_selected_columns_with_capture_lsn(spark, tmp_path):
    """selected_columns projection must not drop the chunk-capture LSN
    before the _sdc_lsn stamp (round-4 ADVICE low #4)."""
    base_schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
        ]
    )
    stream = StreamDef(
        schema_name="public",
        table_name="repos",
        spark_schema=base_schema,
        key_properties=("repo", "path"),
        selected_columns=("repo", "path", "content"),
    )
    table = LakeTable.create(
        spark,
        str(tmp_path / "lake"),
        widen_for_cdc(
            T.StructType([f for f in base_schema.fields if f.name != "commit"])
        ),
        ["repo", "path"],
        num_buckets=2,
    )
    state = StateStore(str(tmp_path / "state.json"))
    snap = spark.createDataFrame(
        [
            ("r1", "a", "c1", "x", 100),
            ("r1", "b", "c2", "y", 200),
            ("r2", "a", "c3", "z", 150),
        ],
        "repo string, path string, commit string, content string, cap_lsn long",
    )
    res = bootstrap_snapshot(
        snap, stream, table, state, capture_lsn_col="cap_lsn"
    )
    assert res["bookmark"] == 100  # min chunk-capture LSN is the floor
    got = {
        (r["repo"], r["path"]): (r["content"], r[SDC_LSN])
        for r in table.read().collect()
    }
    # projected shape + per-chunk capture stamps
    assert got == {
        ("r1", "a"): ("x", 100),
        ("r1", "b"): ("y", 200),
        ("r2", "a"): ("z", 150),
    }
    assert "commit" not in table.read().columns
    assert "cap_lsn" not in table.read().columns
