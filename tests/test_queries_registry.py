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


def test_registry_is_substantial():
    assert len(QUERIES) >= 60
    # ≥90% of the surface must be value-checked, not rows-only
    assert len(ORACLE) >= 0.9 * len(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    schema1 = df.schema
    n = df.count()
    assert n >= 0
    df2 = QUERIES[name](spark, sf_dir)
    assert df2.schema == schema1
    if name not in ("join_anti_customers_without_orders",):
        assert n > 0, f"{name} returned no rows at sf0.001"
