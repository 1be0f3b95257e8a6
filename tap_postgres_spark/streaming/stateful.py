"""Custom stateful streaming operator: per-key ordering monitor.

CDC observability for late/out-of-order delivery (SURVEY.md §2.10 T3):
for every key, track the maximum ordinal (LSN / event id) seen so far —
ACROSS micro-batches — and emit one row per arriving event whose ordinal
is lower than the running maximum ("regression"), i.e. an event that
would have been applied out of order by a naive consumer.  The LWW merge
makes such events harmless for final state; this operator makes them
*visible* (alerting, upstream-lag diagnosis), which is exactly the
observability the reference gets for free from its strictly-ordered
single cursor and a Spark consumer has to reconstruct.

Two forms, same semantics:

- :func:`monotonicity_violations` — batch form over a static DataFrame
  (ordering = a total-order column within the batch).  Plain window
  functions, exact SQL oracle.
- :func:`streaming_order_monitor` — the cross-batch form via
  ``applyInPandasWithState`` (GroupState): per-key running max persists
  in the state store between micro-batches, so a regression relative to
  an event applied N batches ago is still caught.  State is one long per
  key (bounded by |keys|); no timeout — keys live as long as the query.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ordinal", T.LongType()),
        T.StructField("max_seen", T.LongType()),
        T.StructField("lag", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("max_seen", T.LongType())])


def monotonicity_violations(
    df: DataFrame,
    key_col: str,
    ordinal_col: str,
    order_col: str,
) -> DataFrame:
    """Batch form: events whose ``ordinal_col`` is below the running max
    of all PRECEDING events for the key (preceding = ``order_col`` order,
    the arrival order).  One window pass, no shuffle beyond the key
    partitioning."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.col(ordinal_col)).over(w)
    return (
        df.withColumn("_prev_max", prev_max)
        .filter(F.col(ordinal_col) < F.col("_prev_max"))
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ordinal_col).cast("long").alias("ordinal"),
            F.col("_prev_max").cast("long").alias("max_seen"),
            (F.col("_prev_max") - F.col(ordinal_col)).cast("long").alias("lag"),
        )
    )


_SENTINEL = -(1 << 62)  # below any real ordinal: "no max seen yet"


def _monitor_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (max_seen,) = state.get if state.exists else (_SENTINEL,)
    for pdf in pdfs:
        # within-batch arrival order = the frame's row order (the source's
        # file/offset order), matching the batch form's order_col scan.
        # Vectorized: running-max-before-each-row via cummax shifted one,
        # seeded with the cross-batch state — no per-row Python.
        o = pdf["ordinal"].to_numpy(dtype=np.int64)
        if o.size == 0:
            continue
        cummax = np.maximum.accumulate(o)
        prev = np.concatenate(([max_seen], np.maximum(cummax[:-1], max_seen)))
        mask = o < prev
        max_seen = int(max(max_seen, int(cummax[-1])))
        if mask.any():
            yield pd.DataFrame(
                {
                    "key": str(key[0]),
                    "ordinal": o[mask],
                    "max_seen": prev[mask],
                    "lag": prev[mask] - o[mask],
                }
            )
    state.update((max_seen,))


def streaming_order_monitor(
    events: DataFrame,
    key_col: str,
    ordinal_col: str,
) -> DataFrame:
    """Cross-batch form for a streaming DataFrame: per-key running max in
    the state store; emits one row per regression event.  Use inside a
    ``writeStream`` (see tests for the availableNow drive)."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ordinal_col).cast("long").alias("ordinal"),
    ).groupBy("key")
    return keyed.applyInPandasWithState(
        _monitor_fn,
        outputStructType=VIOLATION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
