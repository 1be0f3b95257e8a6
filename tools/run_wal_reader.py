"""Live WAL reader CLI: walsender slot → LSN-ordered feed parquet.

No Spark involved — this is the one physically single-connection stage
(PostgreSQL serves one walsender per slot), so it runs as a plain Python
process next to the database::

    python tools/run_wal_reader.py \
        "host=db port=5432 dbname=app user=rep" \
        tps_slot /data/feed public.source_code_repos [public.other ...]

Prints one JSON stats line.  The produced feed dir is what
tools/submit_replay.py (and every streaming test/bench in this repo)
consumes — the live path and the recorded path share the engine from the
first byte.  Requires psycopg2 + a wal2json slot; see
tap_postgres_spark/sources/replication.py for the recipe.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tap_postgres_spark.sources.replication import (
    ReaderConfig,
    run_replication_feed,
)


def main() -> None:
    dsn, slot, feed_dir = sys.argv[1:4]
    tables = [tuple(fqn.split(".", 1)) for fqn in sys.argv[4:]]
    cfg = ReaderConfig(slot_name=slot, tables=tables)
    print(json.dumps(run_replication_feed(dsn, feed_dir, cfg)))


if __name__ == "__main__":
    main()
