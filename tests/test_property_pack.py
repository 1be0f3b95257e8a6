"""Property test: pack_sequences' two-level parallel prefix sum is
bit-identical to a driver-side sequential oracle (and hence to the
single-window form) for arbitrary group skew, doc lengths, duplicate
lengths, and NULL groups."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tap_postgres_spark import pipelineops

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr", None]),  # skewed + NULL group
        st.integers(min_value=0, max_value=30),  # token count
    ),
    min_size=1,
    max_size=60,
)


def oracle(rows, budget):
    """Sequential per-group cumsum in id order."""
    out = {}
    cum = {}
    for doc_id, (grp, n) in enumerate(rows):
        c = cum.get(grp, 0)
        out[doc_id] = c // budget
        cum[grp] = c + n
    return out


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=docs_strategy, budget=st.sampled_from([5, 17, 64]))
def test_two_level_packing_equals_sequential_oracle(_spark, rows, budget):
    docs = _spark.createDataFrame(
        [(i, g, "w " * n) for i, (g, n) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]: r["shard_seq"]
        for r in pipelineops.pack_sequences(
            docs, budget_tokens=budget, n_subgroups=4
        ).collect()
    }
    assert got == oracle(rows, budget)
