"""Sinks for the Iterator's batch handler.

The reference has no sink — its "sink" is the user callback
(kinesis.go:193-197). This module supplies the one a real pipeline needs:
a parquet sink whose batch-keyed overwrite makes redelivery idempotent,
upgrading the core's at-least-once delivery to effective exactly-once —
the same trick Structured Streaming's file sink plays with its
transaction log, expressed on the Iterator API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetEpochSink:
    """``foreach_batch`` target with idempotent, restart-stable output.

    Each trigger writes ``{root}/batch=<min sequence in batch>`` with
    overwrite. The key is derived from the DATA, not a session-local
    counter: a replayed trigger — same cursors, whether after an in-process
    crash or a full restart from the checkpoint — fetches the same records
    and therefore rewrites the SAME directory instead of appending
    duplicates. (The key is unique per trigger because every shard's
    sequences advance strictly, so the global minimum advances strictly.)
    At-least-once delivery + idempotent keyed overwrite ⇒ exactly-once
    output.

    Usage::

        sink = ParquetEpochSink("/data/out")
        Iterator(src).set_saver(saver).foreach_batch(sink).run_until_drained()
        df = sink.read(spark)
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self.batches_written: list[str] = []

    def __call__(self, batch: DataFrame, epoch: int) -> None:
        key = batch.agg(F.min("sequenceNumber").alias("k")).collect()[0]["k"]
        if key is None:
            return
        batch.write.mode("overwrite").parquet(f"{self.root}/batch={key}")
        self.batches_written.append(key)

    def read(self, spark: SparkSession) -> DataFrame:
        """All written records across batches (basePath keeps the batch
        partition column out of the schema)."""
        return spark.read.option("basePath", self.root).parquet(
            f"{self.root}/batch=*"
        ).drop("batch")
