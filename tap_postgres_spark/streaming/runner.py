"""Structured-Streaming wrapper: tail the WAL feed, apply per micro-batch.

The reference's replication loop (/root/reference/tap_postgres/
wal_reader.py:194-257) polls a walsender socket with time bounds
(``replication_max_run_seconds`` / ``idle_exit_seconds``).  Spark's file
streaming source over the LSN-ordered feed directory gives the same
contract natively (SURVEY.md §2.10):

- ``maxFilesPerTrigger`` ≙ the run-seconds bound (bounded work per batch)
- ``trigger(availableNow=True)`` ≙ idle-exit drain-and-stop
- the checkpoint's offset log ≙ the replication slot: restart resumes at
  the first unprocessed feed file, and "the slot never advances past
  unread WAL" holds by construction (Spark commits offsets only after
  ``foreachBatch`` returns)
- exactly-once = checkpointed offsets (deterministic batch contents)
  + idempotent MERGE + commit-epoch dedup keyed on the batch id

``foreachBatch`` runs :class:`~tap_postgres_spark.modes.log_based.
CdcPipeline.apply_batch` with ``epoch_id = "<name>/<batch_id>"`` — stable
across a restart that replays the same batch, which is what makes the
replay a no-op in the sink.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..modes.log_based import CdcPipeline

FEED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("txid", T.LongType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)


class StreamingCdcRunner:
    def __init__(
        self,
        pipeline: CdcPipeline,
        feed_dir: str,
        checkpoint_dir: str,
        *,
        name: str = "cdc",
        max_files_per_trigger: int | None = None,
    ):
        self.pipeline = pipeline
        self.feed_dir = feed_dir
        self.checkpoint_dir = checkpoint_dir
        self.name = name
        self.max_files_per_trigger = max_files_per_trigger
        self.batch_results: list[dict[str, Any]] = []

    def _foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        result = self.pipeline.apply_batch(batch_df, epoch_id=f"{self.name}/{batch_id}")
        self.batch_results.append(result)

    def run_available_now(self, *, fail_after_batches: int | None = None) -> list[dict[str, Any]]:
        """Drain the feed and stop (idle-exit analog).

        ``fail_after_batches`` injects a mid-run stop for the
        crash-resume test: the query is killed after N batches, leaving
        the checkpoint mid-stream; a subsequent call resumes and must
        produce the identical final state.
        """
        spark = self.pipeline.spark
        reader = (
            spark.readStream.schema(FEED_SCHEMA)
            .option("latestFirst", "false")
            .option("maxFilesPerTrigger", self.max_files_per_trigger or 1)
        )
        stream = reader.parquet(self.feed_dir)

        n_before = len(self.batch_results)

        def _fb(df: DataFrame, bid: int) -> None:
            if (
                fail_after_batches is not None
                and len(self.batch_results) - n_before >= fail_after_batches
            ):
                raise RuntimeError("injected failure for resume test")
            self._foreach_batch(df, bid)

        query = (
            stream.writeStream.foreachBatch(_fb)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .queryName(self.name)
            .start()
        )
        completed = False
        try:
            query.awaitTermination()
            completed = True
        except Exception:
            if fail_after_batches is None:
                raise
            # injected failure: swallow, caller restarts from checkpoint
        finally:
            if query.isActive:
                query.stop()

        if completed:
            # drain finished = the idle-exit of the reference
            # (wal_reader.py:167-176): every event in the feed is applied
            # and offsets are committed, so the filter floor may advance
            # to the observed tip, releasing "retained WAL".
            tips = [
                r["max_lsn_seen"]
                for r in self.batch_results
                if r.get("max_lsn_seen") is not None
            ]
            if tips:
                self.pipeline.advance_to_tip(max(tips))
        return self.batch_results

    def run_tailing(
        self,
        *,
        processing_time: str = "5 seconds",
        max_run_seconds: float | None = None,
    ):
        """Continuous tailing (the reference's long-running replication
        loop, client.py:341-451): a ``processingTime`` trigger polls the
        feed directory for new files; ``max_run_seconds`` is the
        ``replication_max_run_seconds`` analog (tap.py:284-292) — the
        query stops after the budget, leaving the checkpoint mid-stream
        (Spark never commits unread offsets, so this is the reference's
        timeout-exit for free).  Returns the per-batch results so far."""
        spark = self.pipeline.spark
        stream = (
            spark.readStream.schema(FEED_SCHEMA)
            .option("latestFirst", "false")
            .option("maxFilesPerTrigger", self.max_files_per_trigger or 1)
            .parquet(self.feed_dir)
        )
        query = (
            stream.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .queryName(self.name)
            .start()
        )
        try:
            if max_run_seconds is None:
                query.processAllAvailable()
            else:
                query.awaitTermination(timeout=max_run_seconds)
        finally:
            query.stop()
        return self.batch_results
