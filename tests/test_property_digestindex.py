"""Property test: random upsert/delete interleavings applied to a base
table and incrementally refreshed into the digest index always answer
membership exactly like a from-scratch recompute of the final state —
across every bucket-move, delete, re-insert and batch split the
strategy generates."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tap_postgres_spark.digestindex import (
    bootstrap_digest_index,
    probe_digest_index,
    refresh_digest_index,
)
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc

KEYS = ["a", "b", "c"]
# tiny content alphabet → heavy digest collisions between keys and
# frequent bucket moves (n_cells=2 below makes moves near-certain)
BODIES = ["t0", "t1", "t2", "t3"]

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["U", "D"]),
        st.sampled_from(BODIES),
    ),
    min_size=1,
    max_size=12,
)
splits_strategy = st.integers(min_value=1, max_value=3)


def _oracle_members(events):
    state = {}
    for k, action, body in events:
        if action == "D":
            state.pop(k, None)
        else:
            state[k] = body
    return set(state.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, n_batches=splits_strategy)
def test_incremental_digest_index_equals_recompute(
    spark, tmp_path_factory, events, n_batches
):
    tmp = tmp_path_factory.mktemp("pdix")
    base = LakeTable.create(
        spark, str(tmp / "base"), SCHEMA, ["repo", "path"], num_buckets=2
    )
    # seed row so bootstrap has content, then index it
    base.merge_into(
        spark.createDataFrame(
            [("seed", "s", "seed body", 1, None, 1, "U")],
            "repo string, path string, content string, _sdc_lsn long, "
            "_sdc_deleted_at string, txid long, _action string",
        ),
        epoch_id="seed",
    )
    root = str(tmp / "idx")
    bootstrap_digest_index(spark, base, root, n_cells=2)

    per = (len(events) + n_batches - 1) // n_batches
    lsn = 10
    for bi in range(n_batches):
        chunk = events[bi * per : (bi + 1) * per]
        if not chunk:
            continue
        rows = []
        for k, action, body in chunk:
            rows.append(
                (
                    "r", k,
                    None if action == "D" else body,
                    lsn,
                    None if action == "U" else "2026-01-01",
                    1, action,
                )
            )
            lsn += 1
        base.merge_into(
            spark.createDataFrame(
                rows,
                "repo string, path string, content string, _sdc_lsn long, "
                "_sdc_deleted_at string, txid long, _action string",
            ),
            epoch_id=f"b{bi}",
        )
        refresh_digest_index(base, root)

    members = _oracle_members(events) | {"seed body"}
    probes = BODIES + ["seed body", "never present"]
    fresh = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probes)], "doc_id long, text string"
    )
    dup = {
        r["text"]
        for r in probe_digest_index(spark, root, fresh, keep="dup").collect()
    }
    assert dup == {t for t in probes if t in members}