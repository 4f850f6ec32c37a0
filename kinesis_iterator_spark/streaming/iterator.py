"""The user-facing ``Iterator`` — API parity with the reference
(kinesis.go), executed Spark-first.

Mapping (SURVEY.md §2.A):
- ``handle(fn)``          ↔ ``Handle`` (kinesis.go:143-145, A5)
- ``foreach_batch(fn)``   ↔ idiomatic batch-granular handler
- ``set_saver``           ↔ ``SetSaver`` (kinesis.go:242-245)
- ``set_sleep_limit``     ↔ ``SetSleepLimit`` (kinesis.go:247-250, A10)
- ``run(...)``            ↔ ``Run`` (kinesis.go:147-154, A16)
- ``shutdown(timeout)``   ↔ ``Shutdown`` (kinesis.go:221-236, A15)
- ``reconcile()``         ↔ the 20 s monitor pass (kinesis.go:58-98, A13)

Delivery semantics preserved exactly (SURVEY.md §2.A summary):
- per-shard order: records are delivered in sequence order within a shard,
  never ordered across shards;
- at-least-once: the checkpoint is the LAST sequence of a batch, written
  only AFTER the whole batch's handler calls complete (kinesis.go:198-202)
  — a crash mid-batch replays the batch;
- handler errors: log-and-continue, the record is skipped permanently
  (kinesis.go:193-197) — plus an optional DLQ the reference lacks
  (SURVEY.md §7 improvement).

Execution is Spark-shaped: each trigger is one Spark job per shard-group;
handler application happens on executors via ``foreachPartition`` after
``repartition(shardId).sortWithinPartitions(sequenceNumber)`` — the
per-shard goroutine loop (A12, kinesis.go:131-139) becomes
task-per-partition, which is the Spark-native fan-out.
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from .sequence import Sequence, SequenceSaver, TRIM_HORIZON
from .source import GET_RECORDS_LIMIT, SimulatedShardedSource

logger = logging.getLogger("kinesis_iterator_spark")

DEFAULT_SLEEP_LIMIT = 10.0  # seconds — kinesis.go:257
MONITOR_PERIOD = 20.0  # seconds — kinesis.go:59

Handler = Callable[[Any], None]  # per-record, raise ⇒ skip (A5)
BatchHandler = Callable[[DataFrame, int], None]


def _apply_handler_partition(handler: Handler, dlq: list | None):
    """Build the executor-side per-partition applier with the reference's
    error policy (kinesis.go:193-197): log, skip, continue."""

    def apply(rows) -> None:
        for row in rows:
            try:
                handler(row)
            except Exception as e:  # noqa: BLE001 — handler is user code
                logging.getLogger("kinesis_iterator_spark").error(
                    "handler error on sequence %s: %s",
                    row["sequenceNumber"],
                    e,
                )
                if dlq is not None:
                    dlq.append((row["sequenceNumber"], str(e)))

    return apply


class Iterator:
    """Checkpointed, reshard-aware consumer over a simulated sharded stream."""

    def __init__(
        self,
        source: SimulatedShardedSource,
        default_iterator_type: str = TRIM_HORIZON,
    ) -> None:
        self.source = source
        self.default_iterator_type = default_iterator_type
        self._handler: Handler | None = None
        self._batch_handler: BatchHandler | None = None
        self._saver: SequenceSaver | None = None
        self._sleep_limit = DEFAULT_SLEEP_LIMIT
        self._fetch_limit = GET_RECORDS_LIMIT
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._epoch = 0
        self._shards: dict[str, dict] = {}  # shard_id → cursor
        self._sequences: dict[str, Sequence] = {}
        self.dlq: list[tuple[str, str]] = []
        self.records_delivered = 0

    # -- configuration (fluent, as in the reference) ------------------------

    def handle(self, handler: Handler) -> "Iterator":
        """Per-record handler (A5). Runs on executors; must be picklable."""
        self._handler = handler
        return self

    def foreach_batch(self, fn: BatchHandler) -> "Iterator":
        """Batch-granular handler — the idiomatic Spark form of A5."""
        self._batch_handler = fn
        return self

    def set_saver(self, saver: SequenceSaver) -> "Iterator":
        self._saver = saver
        return self

    def set_sleep_limit(self, seconds: float) -> "Iterator":
        """Poll interval (A10; default 10 s as kinesis.go:257)."""
        self._sleep_limit = seconds
        return self

    def set_fetch_limit(self, n: int) -> "Iterator":
        """Per-poll record cap (A3; 1000 as kinesis.go:182)."""
        self._fetch_limit = n
        return self

    # -- shard lifecycle -----------------------------------------------------

    def _start_shards(self) -> None:
        """doHandle (kinesis.go:114-141): list shards, init a cursor +
        checkpoint-backed sequence per shard (A1/A2/A8)."""
        for shard_id in self.source.list_shards():
            if shard_id in self._shards:
                continue
            seq = Sequence(
                self.source.stream_name, shard_id, self._saver
            ).init()
            cursor = self.source.shard_cursor(shard_id)
            if seq.init_query(self.default_iterator_type)["iterator_type"] == (
                "AFTER_SEQUENCE_NUMBER"
            ):
                cursor = self.source.advance(cursor, seq.sequence)
            self._shards[shard_id] = cursor
            self._sequences[shard_id] = seq

    def reconcile(self) -> None:
        """One monitor pass (A13, kinesis.go:58-98): if the stream is ACTIVE
        and no shard readers are live, (re-)list shards — this is how
        post-reshard children get picked up; if not ACTIVE, stop readers."""
        summary = self.source.describe_stream_summary()
        if summary["StreamStatus"] == "ACTIVE" and not self._shards:
            self._start_shards()
        elif summary["StreamStatus"] != "ACTIVE" and self._shards:
            self._stop_all_shards()

    def _stop_all_shards(self) -> None:
        """A14 (kinesis.go:216-219)."""
        self._shards.clear()

    def _close_shard(self, shard_id: str) -> None:
        """A9 (kinesis.go:204-210): drop the reader and delete its
        checkpoint so the child shards start from TRIM_HORIZON."""
        self._shards.pop(shard_id, None)
        seq = self._sequences.pop(shard_id, None)
        if seq is not None:
            seq.stop()

    # -- consumption ---------------------------------------------------------

    def poll_once(self) -> int:
        """One trigger: fetch ≤ limit per shard, deliver, checkpoint.
        Returns the number of records delivered. This is the loop body of
        goShard (kinesis.go:156-214) for every shard."""
        delivered = 0
        for shard_id in list(self._shards):
            cursor = self._shards[shard_id]
            fetch = self.source.get_records(cursor, self._fetch_limit)
            if fetch.closed:
                self._close_shard(shard_id)
                continue
            if fetch.last_sequence is None:
                continue  # empty poll
            batch = (
                fetch.records.repartition(1, "shardId")
                .sortWithinPartitions("sequenceNumber")
            )
            n = batch.count()
            if self._batch_handler is not None:
                self._batch_handler(batch, self._epoch)
            if self._handler is not None:
                # executor-side record-at-a-time delivery in shard order
                batch.foreachPartition(
                    _apply_handler_partition(self._handler, None)
                )
            # Checkpoint AFTER handler completion — at-least-once
            # (kinesis.go:198-202). Raises loudly on persistent failure.
            self._sequences[shard_id].store(fetch.last_sequence)
            self._shards[shard_id] = self.source.advance(
                cursor, fetch.last_sequence
            )
            delivered += n
        self._epoch += 1
        self.records_delivered += delivered
        return delivered

    def run_until_drained(self, max_polls: int = 1000) -> int:
        """Synchronous consumption to exhaustion (test/bench entry): poll
        until every shard returns empty twice. Returns records delivered."""
        self._start_shards()
        total = 0
        idle = 0
        for _ in range(max_polls):
            if self._stop.is_set():
                break
            n = self.poll_once()
            total += n
            idle = idle + 1 if n == 0 else 0
            if not self._shards:
                self.reconcile()
                if not self._shards:
                    break
            if idle >= 2:
                break
        return total

    def run(self) -> "Iterator":
        """Non-blocking start (A16): consumption loop + monitor cadence in a
        daemon thread, polling every ``sleep_limit`` seconds."""
        self._stop.clear()
        self._start_shards()

        def loop() -> None:
            last_monitor = time.monotonic()
            while not self._stop.is_set():
                self.poll_once()
                if time.monotonic() - last_monitor >= MONITOR_PERIOD:
                    self.reconcile()
                    last_monitor = time.monotonic()
                self._stop.wait(self._sleep_limit)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def shutdown(self, timeout: float = 30.0) -> None:
        """Graceful stop with timeout (A15, kinesis.go:221-236): signal,
        drain, raise on timeout (the reference returns an error)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                raise TimeoutError(f"shutdown timed out after {timeout}s")
            self._thread = None
