"""Regression tests for the local correctness gate's canonicalizer
(tools/check_correctness.py) against the driver's observed behavior.

The driver canonicalizes BOTH engine outputs via pandas, which coerces
types before hashing. Round 2 shipped believing 50/50 because the local
gate used ``fetchall()`` (Python ints) while the driver saw DuckDB's
windowed ``SUM(INTEGER)`` as HUGEINT → float64 and red-flagged
``events_sessionize_30m``. These tests round-trip one value of every
output dtype through DuckDB→pandas and Spark→pandas and pin which pairs
must canonicalize EQUAL (driver-green classes observed in
CORRECTNESS_r02) and which must DIFFER (the class that was driver-red).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import canon, rows_to_multiset  # noqa: E402


def _duck_row(sql: str):
    import duckdb

    df = duckdb.connect().execute(sql).df()
    return list(df.columns), list(df.itertuples(index=False, name=None))


def _spark_row(spark, expr_sql: str):
    sdf = spark.sql(f"SELECT {expr_sql}")
    return sdf.columns, list(sdf.toPandas().itertuples(index=False, name=None))


def _ms(cols_rows):
    return rows_to_multiset(*cols_rows)


# ---------------------------------------------------------------------------
# Classes that MUST canonicalize identically (driver-green in r2)
# ---------------------------------------------------------------------------

MATCH_CASES = [
    # (name, duckdb SQL, spark SELECT expr)
    ("bigint", "SELECT CAST(7 AS BIGINT) AS v", "CAST(7 AS BIGINT) AS v"),
    (
        "windowed_sum_cast_bigint",  # the sessionize fix
        "SELECT CAST(SUM(x) OVER () AS BIGINT) AS v FROM (SELECT 3 AS x)",
        "CAST(3 AS BIGINT) AS v",
    ),
    (
        "decimal_cast_double",  # the dsum pattern
        "SELECT CAST(CAST(1.5 AS DECIMAL(18,2)) AS DOUBLE) AS v",
        "CAST(CAST(1.5 AS DECIMAL(18,2)) AS DOUBLE) AS v",
    ),
    ("double", "SELECT 2.25::DOUBLE AS v", "CAST(2.25 AS DOUBLE) AS v"),
    ("varchar", "SELECT 'abc' AS v", "'abc' AS v"),
    (
        "timestamp_us",
        "SELECT TIMESTAMP '2024-01-01 00:03:52.824425' AS v",
        "TIMESTAMP '2024-01-01 00:03:52.824425' AS v",
    ),
    (
        # DuckDB DATE -> pandas datetime64 (midnight); Spark DATE -> date
        # object. Driver-green (fn_date_suite) => must unify.
        "date_vs_midnight",
        "SELECT DATE '1995-01-31' AS v",
        "DATE '1995-01-31' AS v",
    ),
    (
        # NULL in a numeric column: pandas float64 NaN on either engine.
        # Driver-green (join_asof, window_lag_lead) => must unify with None.
        "null_double_vs_nan",
        "SELECT CAST(NULL AS DOUBLE) AS v",
        "CAST(NULL AS DOUBLE) AS v",
    ),
    (
        # int column WITH a NULL row: pandas coerces both engines to
        # float64 (driver-green in join_asof's purchase_user_id).
        "nullable_int_both_float64",
        "SELECT * FROM (VALUES (CAST(48 AS BIGINT)), (NULL)) t(v)",
        "* FROM VALUES (CAST(48 AS BIGINT)), (NULL) t(v)",
    ),
    ("bool", "SELECT TRUE AS v", "TRUE AS v"),
]


@pytest.mark.parametrize("name,duck_sql,spark_expr", MATCH_CASES)
def test_canon_match(spark, name, duck_sql, spark_expr):
    assert _ms(_duck_row(duck_sql)) == _ms(_spark_row(spark, spark_expr)), name


# ---------------------------------------------------------------------------
# Classes that MUST differ (driver-red in r2) — the gate must keep
# catching an oracle that reintroduces them.
# ---------------------------------------------------------------------------

MISMATCH_CASES = [
    (
        # UNCAST windowed SUM(INTEGER): DuckDB HUGEINT -> pandas float64
        # vs Spark bigint. This exact skew was CORRECTNESS_r02's one red
        # row; the gate must flag it.
        "uncast_windowed_sum_hugeint",
        "SELECT SUM(x) OVER () AS v FROM (SELECT 3 AS x)",
        "CAST(3 AS BIGINT) AS v",
    ),
    (
        # Raw DECIMAL output from SPARK: Arrow toPandas keeps
        # decimal.Decimal objects while the DuckDB side becomes float64 —
        # the asymmetry behind CLAUDE.md's "cast DECIMAL outputs to
        # DOUBLE in BOTH engines" rule. (DuckDB-side DECIMAL alone is
        # harmless: pandas coerces it to float64 too.)
        "spark_raw_decimal_vs_double",
        "SELECT CAST(1.5 AS DOUBLE) AS v",
        "CAST(1.5 AS DECIMAL(18,2)) AS v",
    ),
]


@pytest.mark.parametrize("name,duck_sql,spark_expr", MISMATCH_CASES)
def test_canon_mismatch(spark, name, duck_sql, spark_expr):
    assert _ms(_duck_row(duck_sql)) != _ms(_spark_row(spark, spark_expr)), name


def test_canon_scalar_forms():
    """Pin the canonical forms pandas scalars map to — numpy ints/floats
    and pd.Timestamp must land in the same buckets as Python ints/floats/
    datetimes, NaN must unify with NULL, and int must NOT unify with
    float."""
    import datetime

    import numpy as np
    import pandas as pd

    assert canon(np.int64(7)) == canon(7) == "i:7"
    assert canon(np.float64(7.0)) == canon(7.0) == "f:7.0"
    assert canon(7) != canon(7.0)
    assert canon(float("nan")) == canon(None) == "NULL"
    assert canon(np.float64("nan")) == "NULL"
    assert canon(pd.NaT) == "NULL"
    assert (
        canon(pd.Timestamp("1995-01-31"))
        == canon(datetime.date(1995, 1, 31))
        == "t:1995-01-31"
    )
    assert canon(pd.Timestamp("2024-01-01 00:03:52.824425")) == canon(
        datetime.datetime(2024, 1, 1, 0, 3, 52, 824425)
    )
    assert canon(np.bool_(True)) == canon(True) == "b:True"
    assert canon(True) != canon(1)
