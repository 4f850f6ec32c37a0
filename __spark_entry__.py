"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kinesis_iterator_spark``; this module only
exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-event-type tumbling +
    sliding window aggregates over the events stream table (the batch form
    of the engine's core streaming aggregation)."""
    from kinesis_iterator_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["events_windows"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kinesis_iterator_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    from kinesis_iterator_spark.queries import ORACLE, load_all

    load_all()
    return dict(ORACLE)
