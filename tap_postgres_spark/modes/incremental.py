"""INCREMENTAL replication: bookmark-predicate scans.

Semantics pinned by the reference's replication-key tests
(/root/reference/tests/test_replication_key.py:49-155):

- with a bookmark (or configured ``start_date``): only rows with
  ``replication_key >= bookmark``; NULL-keyed rows are EXCLUDED
- without any bookmark: ALL rows sync, including NULL replication keys
  (``supports_nulls_first``, client.py:200)
- after the run the bookmark advances to ``max(replication_key)``,
  forward-only (client.py:287-315)

The scan is a plain Catalyst-pushable filter; the bookmark commit is an
``agg(max)`` — no ORDER BY needed (the reference only sorts to make
row-at-a-time resumption safe; a Spark batch commits atomically).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import StreamDef
from ..state import StateStore
from .full_table import full_table_scan


def incremental_scan(
    source: DataFrame,
    stream: StreamDef,
    state: StateStore | None = None,
    *,
    start_value: Any | None = None,
) -> DataFrame:
    """Rows new since the bookmark.  ``start_value`` is the ``start_date``
    analog used when no stored bookmark exists."""
    rep_key = stream.effective_replication_key
    bookmark = state.bookmark(stream.fqn) if state is not None else None
    if bookmark is None:
        bookmark = start_value
    df = full_table_scan(source, stream)
    if bookmark is not None:
        df = df.filter(F.col(rep_key) >= F.lit(bookmark))
    # else: no bookmark → all rows, NULL keys included
    return df


def commit_bookmark(
    synced: DataFrame, stream: StreamDef, state: StateStore
) -> Any | None:
    """Advance the stream bookmark to max(replication_key) of the synced
    batch (forward-only) and flush STATE."""
    rep_key = stream.effective_replication_key
    row = synced.agg(F.max(F.col(rep_key)).alias("m")).collect()[0]
    value = row["m"]
    if value is not None:
        v = value.isoformat() if hasattr(value, "isoformat") else value
        if state.advance(stream.fqn, rep_key, v):
            state.flush()
    return value
