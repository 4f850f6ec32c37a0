"""Oracle-checkable slice of the reference-parity stream path.

The stream consumption loop itself (checkpoint/replay/reshard) is unit-
tested in tests/test_stream_iterator.py — this module registers the
SQL-expressible projection of it so the driver's DuckDB gate also covers
the record model (A1-A4 data plane): shard assignment, sequence ordering,
bounded first fetch, and the full 6-column Kinesis record shape
(SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..streaming.records import to_records
from ..tables import load_table
from . import query

N_SHARDS = 8


@query(
    "stream_record_model",
    oracle=f"""
    WITH rec AS (
      SELECT CAST(props AS VARCHAR) AS payload,
             CAST(user_id AS VARCHAR) AS "partitionKey",
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS "sequenceNumber",
             ts AS "approximateArrivalTimestamp",
             'events' AS "streamName",
             'shardId-' || lpad(CAST(user_id % {N_SHARDS} AS VARCHAR), 12, '0') AS "shardId"
      FROM events
    )
    SELECT "shardId", "sequenceNumber", payload, "partitionKey",
           "approximateArrivalTimestamp", "streamName", rn
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY "shardId"
                                        ORDER BY "sequenceNumber") AS BIGINT) AS rn
      FROM rec
    ) WHERE rn <= 100
    """,
)
def stream_record_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The record-model + first-fetch slice in one query: every event mapped
    to the Kinesis record shape (SURVEY.md §1.1 — data/partitionKey/
    sequenceNumber/approximateArrivalTimestamp/streamName/shardId), then the
    first GetRecords batch from TRIM_HORIZON with limit=100 per shard
    (A2+A3): bounded, per-shard, sequence-ordered — exactly what the
    simulated source's first fetch returns. Shard assignment (A1/A12) and
    per-shard sequence ordering are both pinned by the rn column.
    ``data`` is decoded back to string for the cross-engine hash."""
    ev = load_table(spark, sf_dir, "events")
    rec = to_records(ev, "events", N_SHARDS)
    w = W.partitionBy("shardId").orderBy("sequenceNumber")
    return (
        rec.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 100)
        .select(
            "shardId",
            "sequenceNumber",
            F.decode("data", "UTF-8").alias("payload"),
            "partitionKey",
            "approximateArrivalTimestamp",
            "streamName",
            "rn",
        )
    )
