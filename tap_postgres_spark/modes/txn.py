"""Transaction-boundary atomic apply: micro-batches never expose a
partially-applied transaction.

wal2json emits each transaction as ``B`` … data rows … ``C`` (the plugin
only streams *committed* transactions, in commit order).  The reference
processes messages one at a time and drops the B/C markers
(/root/reference/tap_postgres/client.py:578-586), so its unit of
atomicity is a single message — a reader of the target can observe half
a transaction between two RECORDs.  A micro-batch engine can do better:
a batch cut that lands *inside* a transaction (a feed file ends between
``B`` and ``C``) simply defers that transaction's rows to the next
batch, so every committed batch moves the lake table from one
transaction-consistent snapshot to another.

Mechanism (all DataFrame-side; driver state is a tiny JSON pointer):

1. union the incoming raw batch with the carried-over pending rows;
2. the txids with a ``C`` marker in the unioned batch are *committed* —
   one ``distinct`` on the marker rows, joined back on ``txid`` (AQE
   broadcasts it when small; at worst the shuffle is bounded by
   |batch|, and per-txid skew is bounded by the transaction size);
3. data rows of uncommitted txids spill to ``epoch=<id>`` parquet and
   re-enter at the next batch; everything else applies normally.

Crash safety mirrors the lake's commit-epoch dedup: the pointer records
``(epoch, in, out)``; a replay of the same epoch re-reads the SAME
``in`` directory, recomputes the identical split (overwrite-idempotent
spill), and the inner ``apply_batch`` no-ops on the already-committed
merge.  ``advance_to_tip`` is capped below the oldest pending LSN so an
idle-exit can never release WAL the buffer still needs.

Assumption (guaranteed by logical decoding): within the feed order, a
transaction's data rows precede its ``C`` marker.  Markers are never
buffered — only data rows wait for their commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..decode import DATA_ACTIONS

_POINTER = "POINTER.json"


def _safe(epoch_id: str) -> str:
    tag = hashlib.md5(epoch_id.encode()).hexdigest()[:8]
    return re.sub(r"[^A-Za-z0-9_.-]", "_", epoch_id) + "-" + tag


class TxnBoundaryBuffer:
    """Carries uncommitted-transaction rows between micro-batches.

    State on disk: ``<dir>/POINTER.json`` (atomic os.replace) plus one
    ``epoch=<safe>`` parquet dir per live epoch (the pointer's ``in``
    and ``out``; older dirs are GC'd on commit).  The pointer is
    O(1) driver metadata, the spill is O(open-transaction rows) — at a
    sane batch cadence that is a handful of transactions, not a table.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- pointer ------------------------------------------------------
    def pointer(self) -> dict[str, Any] | None:
        p = os.path.join(self.path, _POINTER)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def input_dir(self, epoch_id: str) -> str | None:
        """Pending dir to union into this epoch's batch.  A replay of
        the pointer's own epoch re-reads that epoch's recorded INPUT so
        the split recomputes byte-identically."""
        ptr = self.pointer()
        if ptr is None:
            return None
        if ptr["epoch"] == epoch_id:
            return ptr["in"]
        return ptr["out"]

    def stage_dir(self, epoch_id: str) -> str:
        return os.path.join(self.path, f"epoch={_safe(epoch_id)}")

    def pending_floor(self) -> int | None:
        """Highest LSN that is safe to release: one below the oldest
        pending row, or None when nothing is pending."""
        ptr = self.pointer()
        if not ptr or not ptr.get("rows") or ptr.get("min_lsn") is None:
            return None
        return int(ptr["min_lsn"]) - 1

    def commit(
        self,
        epoch_id: str,
        in_dir: str | None,
        out_dir: str | None,
        rows: int,
        min_lsn: int | None,
    ) -> None:
        doc = {
            "epoch": epoch_id,
            "in": in_dir,
            "out": out_dir,
            "rows": int(rows),
            "min_lsn": None if min_lsn is None else int(min_lsn),
        }
        tmp = os.path.join(self.path, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, os.path.join(self.path, _POINTER))
        # GC: every epoch dir not referenced by the live pointer
        keep = {d for d in (in_dir, out_dir) if d}
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("epoch=") and full not in keep:
                shutil.rmtree(full, ignore_errors=True)

    # -- the split ----------------------------------------------------
    def split(
        self, raw: DataFrame
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(raw batch) → (ready raw, deferred raw, cached handle).

        Deferred = data rows (I/U/D) whose txid has no ``C`` marker in
        the batch.  NULL-txid rows are standalone (auto-committed);
        markers and protocol rows always pass through (they are counted,
        never applied).  Both outputs are raw (lsn, txid, payload) —
        the normal pipeline parses ready rows, the spill re-enters as
        raw next batch.  The third element is the persisted
        committed-txid set both outputs' broadcast joins build from;
        the caller unpersists it once the batch is applied.

        Cost shape (measured at 500k-event batches, BASELINE.md):
        - only the TINY committed-txid set persists (|txns in batch|
          bare longs); the payload batch is never written to the block
          store — both consumers re-scan the raw parquet, which is far
          cheaper than materializing ~batch-size strings into memory
          (the full-batch raw+flag cache was measured at 1.72× plain
          replay; this shape measured 1.50×, then 1.31× once aligned
          merge writes landed — the residual is the irreducible second
          job per batch: the spill write's scan + its fixed scheduling
          cost);
        - the committed set broadcasts, so nothing shuffles the batch;
        - the per-row action parse is LAZY: a row whose txid has a
          ``C`` marker in the batch is ready regardless of its action,
          so the narrow action-only ``from_json`` sits in the
          ``otherwise`` branch of a ``when`` on the join flag and
          codegen evaluates it only for rows of OPEN transactions (a
          batch-cut's worth, not the batch).  The full LEAN_SCHEMA
          parse stays single, downstream in the core.
        The enum-quote repair runs before the narrow parse so a
        repairable data row can't dodge its transaction and leak early.
        """
        from ..functions import repair_enum_quotes

        # wal2json v2 writes "action" as the object's FIRST key
        # (reference client.py:578 switches on msg["payload"]["action"];
        # the plugin emits {"action":"X",...} literally), so a bounded
        # prefix regex recovers it in O(64 chars) per row instead of
        # tokenizing the whole payload — the from_json narrow parse over
        # a source-code batch was the split's dominant cost (full-batch
        # repair regex + JSON scan just to find ~10 marker rows).  Rows
        # whose prefix doesn't match (foreign format, malformed head)
        # fall back to the repaired narrow parse; a repairable data row
        # therefore still can't dodge its transaction and leak early.
        act_fast = F.regexp_extract(
            F.substring("payload", 1, 64),
            r'^\s*\{\s*"action"\s*:\s*"([A-Za-z]+)"',
            1,
        )
        act_slow = F.from_json(
            repair_enum_quotes(F.col("payload")), "action STRING"
        )["action"]
        act = F.when(act_fast != F.lit(""), act_fast).otherwise(act_slow)
        committed = (
            raw.filter((act == "C") & F.col("txid").isNotNull())
            .select("txid")
            .distinct()
            .withColumn("__committed", F.lit(True))
            .persist()
        )
        # coalesce: a malformed row's action is NULL, making the raw
        # predicate NULL — which three-valued filters would drop from
        # BOTH branches; malformed rows must pass through (the core
        # pipeline counts + quarantines them)
        defer = F.when(
            F.col("txid").isNull() | F.col("__committed").isNotNull(),
            F.lit(False),
        ).otherwise(F.coalesce(act.isin(*DATA_ACTIONS), F.lit(False)))
        flagged = raw.join(F.broadcast(committed), on="txid", how="left")
        raw_cols = ["lsn", "txid", "payload"]
        return (
            flagged.filter(~defer).select(*raw_cols),
            flagged.filter(defer).select(*raw_cols),
            committed,
        )
