"""Cross-table transaction-consistent snapshots for a CDC pipeline.

Each lake table's commit is atomic, but a pipeline replicating N
streams commits N tables one after another — a reader that joins
``orders`` against ``order_lines`` between those commits can observe a
transaction applied to one table and not the other, even with the
transaction-boundary split (modes/txn.py) keeping each batch
txn-coherent *per table*.  The reference has the same gap one level
down: its Singer stream interleaves RECORDs per message with no
cross-stream read point at all (client.py:578-586).

This module closes it with a **pipeline-level snapshot manifest**: after
every epoch's merges (and maintenance) land in all tables, the pipeline
publishes ``{seq, epoch_id, tables: {fqn: {path, version}}}`` with an
atomic pointer swap.  Readers resolve tables THROUGH the latest
manifest — each table pinned at its published version — so they always
see the state as of one whole epoch boundary: either every table
includes a transaction or none does.

Crash window: if the pipeline dies after table A's merge but before
table B's, no manifest is published — readers stay on the previous
epoch's consistent set; the replayed epoch no-ops A (commit-epoch
dedup), completes B, and publishes.  Publication itself is idempotent
per epoch id.

Cost shape at 10^10 events: one tiny JSON write per epoch on the
driver; readers pay nothing (a pinned ``read(version=...)`` is the same
manifest-resolved scan as a head read).  Snapshot history is readable
as far back as the tables' retention window (``expire_versions``)
keeps the pinned versions.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

_LATEST = "_latest"


class PipelineSnapshots:
    """Publish/read coordinated multi-table snapshot manifests.

    Layout: ``<path>/s{seq:08d}.json`` (immutable manifests) plus
    ``<path>/_latest`` (the current seq, swapped via tmp +
    ``os.replace`` — the same atomic-pointer pattern as the lake
    table's ``metadata/_current``).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- write ----------------------------------------------------------
    def publish(
        self,
        epoch_id: str,
        tables: dict[str, LakeTable],
        *,
        extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Publish the current version of every table as one consistent
        read point.  Idempotent per ``epoch_id``: a crash-replayed epoch
        that already published returns the existing manifest."""
        latest = self.latest()
        if latest is not None and latest["epoch_id"] == epoch_id:
            return {**latest, "skipped": True}
        seq = (latest["seq"] + 1) if latest is not None else 1
        doc = {
            "seq": seq,
            "epoch_id": epoch_id,
            "tables": {
                fqn: {"path": t.path, "version": t.current_version()}
                for fqn, t in tables.items()
            },
        }
        if extra:
            doc["extra"] = extra
        name = f"s{seq:08d}.json"
        tmp = os.path.join(self.path, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, os.path.join(self.path, name))
        ptr_tmp = os.path.join(self.path, _LATEST + ".tmp")
        with open(ptr_tmp, "w") as f:
            f.write(str(seq))
        os.replace(ptr_tmp, os.path.join(self.path, _LATEST))
        return doc

    # -- read -----------------------------------------------------------
    def manifest(self, seq: int) -> dict[str, Any]:
        with open(os.path.join(self.path, f"s{seq:08d}.json")) as f:
            return json.load(f)

    def latest(self) -> dict[str, Any] | None:
        p = os.path.join(self.path, _LATEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return self.manifest(int(f.read().strip()))

    def history(self) -> list[dict[str, Any]]:
        seqs = sorted(
            int(n[1:9])
            for n in os.listdir(self.path)
            if n.startswith("s") and n.endswith(".json")
        )
        return [self.manifest(s) for s in seqs]

    def expire(self, keep_last: int = 100) -> dict[str, Any]:
        """Drop manifests older than the newest ``keep_last`` (the
        latest pointer is never dropped).  Pair with the tables' own
        ``expire_versions`` — a manifest is only useful while every
        version it pins is still readable, so keep the two horizons
        aligned (snapshot ``keep_last`` ≤ table retention)."""
        seqs = sorted(
            int(n[1:9])
            for n in os.listdir(self.path)
            if n.startswith("s") and n.endswith(".json")
        )
        drop = seqs[:-keep_last] if keep_last > 0 else seqs[:-1]
        for s in drop:
            os.remove(os.path.join(self.path, f"s{s:08d}.json"))
        return {"dropped": len(drop), "kept": len(seqs) - len(drop)}

    def read(
        self, fqn: str, *, seq: int | None = None, **read_kwargs: Any
    ) -> DataFrame:
        """The named table at its pinned version in the latest (or a
        specific) snapshot.  ``read_kwargs`` pass through to
        :meth:`LakeTable.read` (e.g. ``buckets=`` for point reads) —
        except ``version``/``as_of``, which the manifest owns."""
        m = self.latest() if seq is None else self.manifest(seq)
        if m is None:
            raise ValueError("no snapshot published yet")
        if fqn not in m["tables"]:
            raise KeyError(
                f"{fqn!r} not in snapshot {m['seq']} "
                f"(tables: {sorted(m['tables'])})"
            )
        for k in ("version", "as_of", "as_of_lsn"):
            if k in read_kwargs:
                raise ValueError(f"{k} is pinned by the snapshot manifest")
        entry = m["tables"][fqn]
        return LakeTable(self.spark, entry["path"]).read(
            version=entry["version"], **read_kwargs
        )
