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


def incremental_merge(
    source: DataFrame,
    stream: StreamDef,
    table,
    state: StateStore,
    *,
    epoch_id: str,
    start_value: Any | None = None,
) -> dict[str, Any]:
    """INCREMENTAL sync into a LakeTable: bookmark scan → keyed upsert →
    bookmark commit.  The replication-key value doubles as the LWW
    ordinal (``_sdc_lsn``) so repeated syncs resolve exactly like WAL
    events: highest replication key wins per key.

    Timestamp/date keys become epoch micros/days; integer keys pass
    through.  Rows with NULL replication keys (full initial sync) get
    ordinal 0 — any later keyed row supersedes them.
    """
    from ..schema import SDC_DELETED_AT, SDC_LSN

    synced = incremental_scan(source, stream, state, start_value=start_value)
    rep_key = stream.effective_replication_key
    kind = dict(zip(source.schema.fieldNames(), [f.dataType for f in source.schema.fields]))
    key_col = F.col(rep_key)
    dt = kind.get(rep_key)
    import pyspark.sql.types as T

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        ordinal = F.unix_micros(key_col.cast("timestamp"))
    elif isinstance(dt, T.DateType):
        ordinal = F.datediff(key_col, F.lit("1970-01-01")).cast("long")
    else:
        ordinal = key_col.cast("long")
    batch = synced.withColumn(SDC_LSN, F.coalesce(ordinal, F.lit(0))).withColumn(
        SDC_DELETED_AT, F.lit(None).cast("string")
    )
    result = table.merge_into(batch, epoch_id=epoch_id)
    commit_bookmark(synced, stream, state)
    return result


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
