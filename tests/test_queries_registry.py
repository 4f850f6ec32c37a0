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
