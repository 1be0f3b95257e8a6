"""Property test: random churn interleavings (inserts, updates, group
migrations, deletes, NULL groups/values, refreshes at random cadences,
view compaction) always leave the aggregate view equal to a dict-based
GROUP BY oracle over the surviving rows — the end-to-end IVM invariant
lake/aggview.py composes into."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.aggview import (
    Agg,
    bootstrap_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from tap_postgres_spark.schema import widen_for_cdc

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("g", T.StringType(), True),
            T.StructField("x", T.LongType(), True),  # integer: exact sums
        ]
    )
)

AGGS = [
    Agg("count", None, "n"),
    Agg("sum", "x", "sx"),
    Agg("count_col", "x", "nx"),
    # extrema under churn: random deletes/updates exercise the round-5
    # churned-group recompute path on every refresh
    Agg("min", "x", "mn"),
    Agg("max", "x", "mx"),
]

GROUPS = ["a", "b", None]

# an op is one churn event: (key, group idx, value-or-None, is_delete)
event = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=2),
    st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    st.booleans(),
)
# batches of events, with a refresh after a random subset of batches
batches = st.lists(
    st.tuples(st.lists(event, min_size=1, max_size=6), st.booleans()),
    min_size=1,
    max_size=5,
)


def _oracle(live: dict[int, tuple]) -> set[tuple]:
    per_group: dict = {}
    for g, x in live.values():
        n, sx, nx, mn, mx = per_group.get(g, (0, 0, 0, None, None))
        per_group[g] = (
            n + 1,
            sx + (x or 0),
            nx + (0 if x is None else 1),
            mn if x is None else (x if mn is None else min(mn, x)),
            mx if x is None else (x if mx is None else max(mx, x)),
        )
    return {
        (g, n, (sx if nx > 0 else None), nx, mn, mx)
        for g, (n, sx, nx, mn, mx) in per_group.items()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches)
def test_view_always_equals_groupby_oracle(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("aggprop")
    base = LakeTable.create(spark, str(tmp / "b"), SCHEMA, ["k"], num_buckets=4)
    live: dict[int, tuple] = {}
    lsn = 0

    def apply(events, epoch):
        nonlocal lsn
        rows = []
        for k, gi, x, dead in events:
            lsn += 1
            rows.append(
                (k, GROUPS[gi], x, lsn, "1970-01-01T00:00:00Z" if dead else None)
            )
            if dead:
                live.pop(k, None)
            else:
                live[k] = (GROUPS[gi], x)
        base.merge_into(
            spark.createDataFrame(
                rows,
                "k long, g string, x long, _sdc_lsn long, _sdc_deleted_at string",
            ),
            epoch_id=epoch,
        )

    apply([(k, k % 3, k, False) for k in range(6)], "seed")
    view = bootstrap_aggregate_view(spark, base, str(tmp / "v"), ["g"], AGGS)
    for i, (events, do_refresh) in enumerate(batches):
        apply(events, f"e{i}")
        if do_refresh:
            refresh_aggregate_view(base, view, AGGS)
            if i % 2:
                view.compact()
            got = {tuple(r) for r in read_aggregate_view(view, AGGS).collect()}
            assert got == _oracle(live)
    refresh_aggregate_view(base, view, AGGS)
    got = {tuple(r) for r in read_aggregate_view(view, AGGS).collect()}
    assert got == _oracle(live)
