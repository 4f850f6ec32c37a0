"""Registry contract smoke: every queries() entry runs at sf0.001, returns
a stable schema and ≥0 rows; every oracle key has a query. The full
Spark-vs-DuckDB value check is tools/check_correctness.py (and the
driver's own gate)."""

from __future__ import annotations

import pytest

from kinesis_iterator_spark.queries import ORACLE, QUERIES, load_all

load_all()


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_registry_fits_driver_window():
    # The driver's correctness gate checks the FIRST 50 registry entries —
    # every entry must land inside that window, and every entry must carry
    # a real value oracle (no rows-only escapes left).
    assert 40 <= len(QUERIES) <= 50
    assert set(ORACLE) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, sf_dir)
    schema1 = df.schema
    # The driver's pandas-based canonicalizer crashes on non-atomic cells
    # (round 1: array<double> → "unhashable type: 'list'"): every output
    # column must be a scalar type.
    for f in schema1.fields:
        assert not isinstance(
            f.dataType, (ArrayType, MapType, StructType)
        ), f"{name}.{f.name} outputs non-atomic type {f.dataType}"
    n = df.count()
    assert n >= 0
    df2 = QUERIES[name](spark, sf_dir)
    assert df2.schema == schema1
    assert n > 0, f"{name} returned no rows at sf0.001"


def test_spark_sql_surface_matches_dataframe_form(spark, sf_dir):
    """The engine's SQL front door: the same query through
    `register_views` + `spark.sql` equals the registry's DataFrame form
    (Catalyst compiles both to the same plan family)."""
    from kinesis_iterator_spark.tables import register_views

    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-06-30'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.tables import load_table

    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2024-06-30")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    got = {key(r): (r["n"], r["sum_qty"]) for r in sql.collect()}
    want = {key(r): (r["n"], r["sum_qty"]) for r in df.collect()}
    assert got == want and len(got) > 0


def test_events_ts_normalizes_to_session_tz_timestamp(spark, sf_dir):
    """Round-5 regression class: events.parquet is TIMESTAMP(NANOS), and
    how Spark surfaces it is VERSION-dependent (bigint under the legacy
    nanosAsLong conf, TIMESTAMP_NTZ natively under pyspark 4.1+ which
    ignores that conf). load_table must normalize every read shape to a
    plain session-tz TIMESTAMP — `unix_micros`, window(), and interval
    arithmetic all reject NTZ at plan time, which is exactly how round 5
    broke (sessionize red row + bench crash)."""
    from kinesis_iterator_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # The operation that failed at plan time in round 5 must resolve.
    from pyspark.sql import functions as F

    ev.select(F.unix_micros("ts").alias("us")).limit(1).collect()
