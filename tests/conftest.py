from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kinesis_iterator_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_query_persists():
    """Unpin any DataFrames a query builder persisted during the test, so
    the suite doesn't accumulate cached partitions across ~115 tests."""
    yield
    from kinesis_iterator_spark.queries import release_persists

    release_persists()
