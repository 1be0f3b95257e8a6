"""Property test: asof_join (plain AND segmented/chunked forms, with
and without tolerance) equals a sequential brute-force oracle for
arbitrary key skew, timestamp collisions between sides, and empty
sides."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tap_postgres_spark.operators.temporal import asof_join

# few keys → collisions and skew are common; small time domain → left/right
# ts ties are common (the inclusive-match edge)
_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=0, max_size=25,
)
_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=0, max_size=20, unique=True,  # operator contract: unique (k, ts)
)


def _oracle(left, right, tolerance):
    out = []
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt), v in right.items() if rk == k and rt <= t]
        val = None
        if cands:
            rt, v = max(cands)
            if tolerance is None or t - rt <= tolerance:
                val = v
        out.append((i, k, t, val))
    return sorted(out)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=_left,
    right=_right,
    chunk=st.sampled_from([None, 3.0, 1000.0]),
    tolerance=st.sampled_from([None, 4.0]),
)
def test_asof_equals_brute_force(_spark, left, right, chunk, tolerance):
    rvals = {(k, t): float(k * 100 + t) for (k, t) in right}
    ldf = _spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(left)],
        "i long, k long, t double",
    )
    rdf = _spark.createDataFrame(
        [(k, float(t), v) for (k, t), v in rvals.items()],
        "k long, t double, v double",
    )
    got = sorted(
        (r.i, r.k, int(r.t), r.last_v)
        for r in asof_join(
            ldf, rdf, ["k"], "t", "t", {"v": "last_v"},
            chunk_seconds=chunk, tolerance_s=tolerance,
        ).collect()
    )
    assert got == _oracle(left, rvals, tolerance)
