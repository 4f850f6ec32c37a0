"""Batch-equivalent streaming queries over ``events`` (oracle-checkable).

These are the batch forms of the streaming window/session/dedup operators in
``kinesis_iterator_spark.streaming`` — the same DataFrame expressions run
under ``readStream`` (exercised in tests/test_streaming_windows.py);
registering the batch form
gives the DuckDB oracle something to diff (SURVEY.md §2.C, §7 phase 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import query

# ---------------------------------------------------------------------------
# Flagship: per-event-type tumbling 1-hour + sliding 30m/15m window
# aggregates in one entry (merged per SURVEY §8 registry-headroom plan #2 —
# tumbling is the degenerate slide==length case; a `kind` column tags the
# window shape). Streaming form: withWatermark("ts", ...) +
# groupBy(window(...)) — identical expression; Spark's window("1 hour") is
# epoch-aligned = date_trunc('hour'), and every event lands in exactly two
# 30m/15m sliding windows.
# ---------------------------------------------------------------------------


@query(
    "events_windows",
    oracle="""
    WITH tumbling AS (
      SELECT 'tumbling_1h' AS kind,
             date_trunc('hour', ts) AS window_start,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM events
      GROUP BY 2, 3
    ),
    base AS (
      SELECT event_type, value,
             CAST(to_timestamp(FLOOR(epoch(ts) / 900) * 900) AS TIMESTAMP) AS w0
      FROM events
    ),
    slid AS (
      SELECT event_type, value, w0 AS window_start FROM base
      UNION ALL
      SELECT event_type, value, w0 - INTERVAL 15 MINUTE FROM base
    ),
    sliding AS (
      SELECT 'sliding_30m_15m' AS kind,
             window_start, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM slid GROUP BY 2, 3
    )
    SELECT * FROM tumbling UNION ALL SELECT * FROM sliding
    """,
)
def events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour AND sliding 30m/15m window aggregates, tagged by
    ``kind``. Each leg is the exact expression the streaming form runs
    (`groupBy(window(ts, ...))`); the union keeps both window shapes under
    one oracle-checked entry."""
    ev = load_table(spark, sf_dir, "events")

    def windowed(kind: str, w) -> DataFrame:
        return (
            ev.groupBy(w.alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select(
                F.lit(kind).alias("kind"),
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
                "min_value",
                "max_value",
            )
        )

    return windowed("tumbling_1h", F.window("ts", "1 hour")).unionByName(
        windowed("sliding_30m_15m", F.window("ts", "30 minutes", "15 minutes"))
    )


@query(
    "events_sessionize_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the batch equivalent
    of streaming ``session_window(ts, '30 minutes')``, expressed as
    lag + cumulative-sum so the oracle can replicate it exactly.

    Scale note: the only shuffle is the hash partition on user_id; the
    per-user sort is within-partition. No driver-side loops."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@query(
    "events_dedup_late_policy",
    oracle="""
    WITH maxts AS (SELECT MAX(ts) AS m FROM events),
    live AS (
      SELECT e.* FROM events e, maxts
      WHERE e.ts >= maxts.m - INTERVAL 6 HOUR
    ),
    raw AS (
      SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
      FROM live GROUP BY 1
    ),
    firsts AS (
      SELECT user_id, event_type, MIN(ts) AS first_ts
      FROM live GROUP BY 1, 2
    ),
    fw AS (
      SELECT date_trunc('hour', first_ts) AS window_start,
             COUNT(*) AS n_first_arrivals
      FROM firsts GROUP BY 1
    )
    SELECT r.window_start, r.n_events,
           CAST(COALESCE(f.n_first_arrivals, 0) AS BIGINT) AS n_first_arrivals
    FROM raw r LEFT JOIN fw f ON r.window_start = f.window_start
    """,
)
def events_dedup_late_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data policy + streaming dedup in one pipeline, the
    batch-expressible slice of `dropDuplicates` behind `withWatermark`:

    - watermark = max event time - 6h; only rows inside the live horizon
      are admitted (a streaming sink would DROP anything older);
    - within the horizon, dedup keeps the FIRST arrival per
      (user_id, event_type) — a stream's dropDuplicates keeps the first
      arrival, so the oracle-checkable batch form pins "first" with
      MIN(ts);
    - per hourly window: raw admitted count vs first-arrival count.

    The true streaming forms (watermark drop, state-backed dedup) are
    unit-tested in tests/test_streaming_windows.py. The horizon filter is
    one broadcast of a 1-row aggregate; `live` feeds two aggregations —
    at 100 TB you'd persist it (or fuse both counts into one grouping-sets
    pass); at fixture scale the double scan is cheaper than a persist
    barrier."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m"))
    live = ev.crossJoin(F.broadcast(max_ts)).filter(
        F.col("ts") >= F.col("m") - F.expr("INTERVAL 6 HOURS")
    )
    raw = (
        live.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    firsts = live.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts")
    )
    fw = (
        firsts.groupBy(F.window("first_ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_first_arrivals"))
        .select(F.col("w.start").alias("window_start"), "n_first_arrivals")
    )
    return raw.join(fw, "window_start", "left").select(
        "window_start",
        "n_events",
        F.coalesce(F.col("n_first_arrivals"), F.lit(0).cast("long")).alias(
            "n_first_arrivals"
        ),
    )
