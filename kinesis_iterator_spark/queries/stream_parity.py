"""Oracle-checkable slices of the reference-parity stream path.

The stream consumption loop itself (checkpoint/replay/reshard) is unit-
tested in tests/test_stream_iterator.py — this module registers the
SQL-expressible projections of it so the driver's DuckDB gate also covers
the record model (A1-A4 data plane).
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
    SELECT CAST(props AS VARCHAR) AS payload,
           CAST(user_id AS VARCHAR) AS "partitionKey",
           lpad(CAST(event_id AS VARCHAR), 12, '0') AS "sequenceNumber",
           ts AS "approximateArrivalTimestamp",
           'events' AS "streamName",
           'shardId-' || lpad(CAST(user_id % {N_SHARDS} AS VARCHAR), 12, '0') AS "shardId"
    FROM events
    """,
)
def stream_record_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full record-model mapping (SURVEY.md §1.1): every event as a
    Kinesis-shaped record. ``data`` is decoded back to string for the
    cross-engine hash."""
    ev = load_table(spark, sf_dir, "events")
    rec = to_records(ev, "events", N_SHARDS)
    return rec.select(
        F.decode("data", "UTF-8").alias("payload"),
        "partitionKey",
        "sequenceNumber",
        "approximateArrivalTimestamp",
        "streamName",
        "shardId",
    )


@query(
    "stream_shard_distribution",
    oracle=f"""
    SELECT 'shardId-' || lpad(CAST(user_id % {N_SHARDS} AS VARCHAR), 12, '0') AS "shardId",
           COUNT(*) AS n_records,
           COUNT(DISTINCT user_id) AS n_partition_keys,
           MIN(lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_sequence,
           MAX(lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_sequence
    FROM events
    GROUP BY 1
    """,
)
def stream_shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard discovery + assignment view (A1/A12): per-shard record counts
    and sequence bounds — what ``ListShards`` + the per-shard readers see.
    Also the skew audit: balanced partition keys ⇒ balanced shards."""
    ev = load_table(spark, sf_dir, "events")
    rec = to_records(ev, "events", N_SHARDS)
    return rec.groupBy("shardId").agg(
        F.count("*").alias("n_records"),
        F.countDistinct("partitionKey").alias("n_partition_keys"),
        F.min("sequenceNumber").alias("first_sequence"),
        F.max("sequenceNumber").alias("last_sequence"),
    )


@query(
    "stream_first_batch_per_shard",
    oracle=f"""
    WITH rec AS (
      SELECT 'shardId-' || lpad(CAST(user_id % {N_SHARDS} AS VARCHAR), 12, '0') AS "shardId",
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS "sequenceNumber",
             CAST(props AS VARCHAR) AS payload
      FROM events
    )
    SELECT "shardId", "sequenceNumber", payload FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY "shardId"
                                   ORDER BY "sequenceNumber") AS rn
      FROM rec
    ) WHERE rn <= 100
    """,
)
def stream_first_batch_per_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first GetRecords batch from TRIM_HORIZON with limit=100 per shard
    (A2+A3): exactly what the simulated source's first fetch returns —
    bounded, per-shard, sequence-ordered."""
    ev = load_table(spark, sf_dir, "events")
    rec = to_records(ev, "events", N_SHARDS)
    w = W.partitionBy("shardId").orderBy("sequenceNumber")
    return (
        rec.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select(
            "shardId",
            "sequenceNumber",
            F.decode("data", "UTF-8").alias("payload"),
        )
    )
