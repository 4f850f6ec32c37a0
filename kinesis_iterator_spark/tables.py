"""Fixture-table access (see FIXTURES.md / TESTDATA.md).

All queries go through :func:`load_table` so that scans stay plain
``spark.read.parquet`` — Catalyst then owns predicate pushdown, column
pruning and partition planning. Never materialize here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are fixed-size; supplier/part/customer grow with SF, so only the
# truly fixed ones are always-broadcast).
ALWAYS_BROADCAST = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces it
        # depends on version: older readers reject it unless
        # nanosAsLong gives us int64 nanos (floor-divide to µs below);
        # pyspark 4.1+ reads it natively as TIMESTAMP_NTZ truncated to µs
        # and ignores the legacy conf. Normalize BOTH shapes to a plain
        # session-tz TIMESTAMP so every downstream query (unix_micros,
        # window, interval arithmetic) sees one type. The fixture carries
        # sub-µs residue — both truncation paths floor to µs exactly as
        # DuckDB does reading TIMESTAMP(NANOS) (oracle-verified), and the
        # NTZ→TIMESTAMP cast is wall-clock-preserving (UTC session tz).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            # Spark raises on SETTING a removed SQL conf. 4.1 already
            # ignores this one (native NANOS→NTZ read); the dtype
            # normalization below handles every read shape, so a future
            # removal must not break the loader (the round-5 lesson:
            # version drift lands here first).
            pass
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
