"""FULL_TABLE replication: snapshot scan with projection / filter / limit.

Re-creates the reference's SQLStream scan shaping (SURVEY.md §2.1 S2,
§2.2 P1-P3; /root/reference/tap_postgres/client.py:196-231):

- selected-columns projection (tests/test_selected_columns_only.py:15-35)
- ``custom_where_clauses`` AND-combined raw predicates (client.py:218-231;
  golden SQL tests/test_stream_class.py:29-76)
- ``max_record_count`` limit (client.py:205-216)

Expressed declaratively so Catalyst pushes the filters and the projection
into the parquet scan (PushedFilters / ReadSchema) — the Spark analog of
the reference pushing its WHERE into PostgreSQL's executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import StreamDef


def full_table_scan(source: DataFrame, stream: StreamDef) -> DataFrame:
    df = source
    for clause in stream.custom_where_clauses:
        df = df.filter(F.expr(clause))
    if stream.selected_columns:
        df = df.select(*stream.selected_columns)
    if stream.max_record_count is not None:
        df = df.limit(stream.max_record_count)
    return df
