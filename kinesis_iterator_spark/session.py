"""SparkSession construction tuned for this engine.

Local mode is a single JVM with N executor threads; on a real cluster the
same configs hold (AQE handles skew/coalesce at 100 TB, shuffle partitions
are sized by AQE's advisory target rather than a fixed 200).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kinesis_iterator_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale posture: AQE on (runtime coalesce + skew-join split), broadcast
    threshold left at default so small dims (region/nation/supplier at any
    SF) broadcast, UTC session timezone so results are comparable with the
    DuckDB oracle, Arrow enabled for the pandas-UDF slow path.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Explicit many-path reads (snapshot_read's manifests ARE the
        # file list) launch a parallel-partition-discovery Spark JOB
        # above this many paths. On driver-local storage the job's
        # scheduling overhead dominates the ~µs stat calls (r16
        # measured 2.6-3.6 s driver-side vs 8.5-10.3 s with the job at
        # 5,000 paths; r17: one classifier-leg construction at 64
        # manifest paths was 3.26 s + 1 job at the default 32 vs
        # 1.46 s + 0 jobs at 512). 512 keeps every per-admit manifest
        # read driver-side locally while still handing genuinely huge
        # listings to the cluster; an object-store deployment at scale
        # overrides this via extra_conf/spark-submit — it is an engine
        # conf, not a hard-coded behavior.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
