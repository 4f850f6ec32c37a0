"""Simulated sharded stream source over the ``events`` fixture.

Plays the role of the Kinesis service in the reference's loop:
- ``list_shards``    → A1 (kinesis.go:121-128) shard discovery; re-listing
  after a reshard returns the new topology (A13, kinesis.go:58-98).
- ``get_records``    → A3 (kinesis.go:180-183) bounded fetch from a cursor,
  in per-shard sequence order; returns the next cursor (A4) and
  ``closed`` when the shard is exhausted post-reshard (A9).

The fetch is a declarative DataFrame slice — filter on (shard, sequence >
cursor) + per-shard rank ≤ limit — so Catalyst pushes the shard/sequence
predicates into the parquet scan. One Spark job per micro-batch, exactly
like a Structured Streaming trigger.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .records import to_records

GET_RECORDS_LIMIT = 1000  # kinesis.go:182


@dataclass
class FetchResult:
    records: DataFrame  # record-schema rows, ≤ limit, per-shard seq order
    last_sequence: str | None  # highest sequence in this batch
    closed: bool  # NextShardIterator == nil analogue (A9)


@dataclass
class MultiFetchResult:
    """One trigger's fetch across every open shard (A3×A12 in one plan)."""

    records: DataFrame  # all shards' batches, record schema
    tails: dict[str, str]  # shard_id → highest sequence fetched (∅ if empty)
    counts: dict[str, int]  # shard_id → rows fetched
    closed: list[str]  # shards whose cursors predate the topology (A9)


class SimulatedShardedSource:
    """A 'stream' = the events table sharded by ``user_id % n_shards``.

    Resharding (A13): ``reshard(n)`` re-partitions the key space; shards of
    the old topology immediately read as closed, and ``list_shards``
    returns the children — mirroring a Kinesis split/merge where parent
    shards drain and children appear.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        stream_name: str = "events",
        n_shards: int = 8,
        status: str = "ACTIVE",
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.stream_name = stream_name
        self.n_shards = n_shards
        self.status = status
        self._generation = 0

    # -- control-plane ------------------------------------------------------

    def describe_stream_summary(self) -> dict:
        """DescribeStreamSummary analogue (kinesis.go:60-66)."""
        return {
            "StreamName": self.stream_name,
            "StreamStatus": self.status,
            "OpenShardCount": self.n_shards,
        }

    def list_shards(self) -> list[str]:
        """A1: current shard ids."""
        return [f"shardId-{i:012d}" for i in range(self.n_shards)]

    def reshard(self, n_shards: int) -> None:
        """Split/merge: new topology; old-generation cursors read closed."""
        self.n_shards = n_shards
        self._generation += 1

    def shard_cursor(self, shard_id: str) -> dict:
        """An opaque cursor = (generation, shard, last_sequence)."""
        return {"generation": self._generation, "shard_id": shard_id, "after": None}

    # -- data-plane ---------------------------------------------------------

    def _records(self) -> DataFrame:
        from ..tables import load_table  # handles the NANOS-timestamp fixup

        ev = load_table(self.spark, self.sf_dir, "events")
        return to_records(ev, self.stream_name, self.n_shards)

    def get_records(
        self, cursor: dict, limit: int = GET_RECORDS_LIMIT
    ) -> FetchResult:
        """A3/A4/A9: ≤ limit records after the cursor, per-shard order.

        Returns ``closed=True`` (nil NextShardIterator) when the cursor's
        generation predates a reshard, or the shard is fully drained."""
        if cursor["generation"] != self._generation:
            empty = self.spark.createDataFrame([], self._records().schema)
            return FetchResult(records=empty, last_sequence=None, closed=True)

        rec = self._records().filter(F.col("shardId") == cursor["shard_id"])
        if cursor["after"] is not None:
            rec = rec.filter(F.col("sequenceNumber") > cursor["after"])
        w = W.partitionBy("shardId").orderBy("sequenceNumber")
        batch = (
            rec.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )
        tail = batch.agg(F.max("sequenceNumber").alias("m")).collect()[0]["m"]
        if tail is None:
            # Drained. A live Kinesis shard stays open (more data may come);
            # the simulated fixture is finite, so a drained shard reads as
            # closed only after a reshard — otherwise it's just an empty poll.
            return FetchResult(records=batch, last_sequence=None, closed=False)
        return FetchResult(records=batch, last_sequence=tail, closed=False)

    def get_records_all(
        self, cursors: dict[str, dict], limit: int = GET_RECORDS_LIMIT
    ) -> MultiFetchResult:
        """One bounded fetch covering EVERY open shard (the scale form of
        A3): the cursor set joins in as a broadcast dim, the per-shard
        row_number caps each shard at ``limit``, and the per-shard tail
        sequence + row count come back from a single aggregate — one Spark
        action total, versus one-fetch-plus-two-actions per shard in the
        naive loop. At hundreds of shards this is the difference between a
        trigger and a driver-side crawl.

        Shards whose cursor generation predates a reshard are reported in
        ``closed`` without touching Spark (driver-side metadata, as
        ListShards would be)."""
        closed = [
            sid
            for sid, c in cursors.items()
            if c["generation"] != self._generation
        ]
        live = {sid: c for sid, c in cursors.items() if sid not in set(closed)}
        if not live:
            empty = self.spark.createDataFrame([], self._records().schema)
            return MultiFetchResult(empty, {}, {}, closed)

        # sequenceNumber is zero-padded, so "" orders before every real
        # sequence — a None cursor ("start of shard") becomes the empty
        # string and the predicate stays a single comparison.
        cur_df = self.spark.createDataFrame(
            [(sid, c["after"] or "") for sid, c in live.items()],
            "shardId string, after string",
        )
        rec = (
            self._records()
            .join(F.broadcast(cur_df), "shardId")
            .filter(F.col("sequenceNumber") > F.col("after"))
            .drop("after")
        )
        w = W.partitionBy("shardId").orderBy("sequenceNumber")
        # Persist the batch for the trigger's lifetime: it is consumed
        # TWICE (the stats aggregate below, then the caller's delivery
        # action), and without the mark each consumer re-runs the whole
        # scan→join→window lineage. The stats collect populates the
        # cache; Iterator.poll_once unpersists as soon as the trigger's
        # DELIVERY work finishes (before the checkpoint loop, which only
        # touches driver-side tails — nothing may consume the cached
        # batch after delivery).
        batch = (
            rec.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
            .persist()
        )
        try:
            stats = (
                batch.groupBy("shardId")
                .agg(
                    F.max("sequenceNumber").alias("tail"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
        except Exception:
            # A failed fetch takes the caller's A11 retry path; don't
            # leave the trigger's batch pinned in the cache.
            batch.unpersist(blocking=False)
            raise
        tails = {r["shardId"]: r["tail"] for r in stats}
        counts = {r["shardId"]: r["n"] for r in stats}
        return MultiFetchResult(batch, tails, counts, closed)

    def advance(self, cursor: dict, last_sequence: str) -> dict:
        """NextShardIterator (A4, kinesis.go:203)."""
        return {**cursor, "after": last_sequence}
