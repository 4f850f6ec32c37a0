"""Persisted ANN index (similarity.write_ann_index + *_from_index).

The stored-index query paths share their candidate-generation and
scoring tails with the recompute paths, so equality here pins the
storage roundtrip: building the index once and querying it must return
exactly the recompute results, for both LSH and IVF, self-kNN and
bounded external query sets.
"""

from __future__ import annotations

import os

import pytest

from kinesis_iterator_spark.queries import release_persists
from kinesis_iterator_spark.queries.similarity import (
    similarity_ivf_topk,
    similarity_ivf_topk_for_queries,
    similarity_ivf_topk_from_index,
    similarity_lsh_topk,
    similarity_lsh_topk_for_queries,
    similarity_lsh_topk_from_index,
    write_ann_index,
)


def _rows(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index"))
    meta = write_ann_index(spark, sf_dir, d)
    assert meta["n"] > 0 and meta["b"] >= 4
    return d


def test_index_artifacts_on_disk(index_dir):
    assert os.path.exists(f"{index_dir}/meta.json")
    # lsh signatures are partitioned by table_id (directory pruning)
    tables = [
        p for p in os.listdir(f"{index_dir}/lsh_signatures")
        if p.startswith("table_id=")
    ]
    assert len(tables) == 5
    assert os.path.isdir(f"{index_dir}/ivf_assignment")


def test_lsh_from_index_equals_recompute(spark, sf_dir, index_dir):
    want = _rows(similarity_lsh_topk(spark, sf_dir))
    release_persists()
    got = _rows(similarity_lsh_topk_from_index(spark, sf_dir, index_dir))
    assert got == want


def test_ivf_from_index_equals_recompute(spark, sf_dir, index_dir):
    want = _rows(similarity_ivf_topk(spark, sf_dir))
    release_persists()
    got = _rows(similarity_ivf_topk_from_index(spark, sf_dir, index_dir))
    assert got == want


def test_from_index_external_query_sets(spark, sf_dir, index_dir):
    ids = [1, 7, 42]
    want_lsh = _rows(similarity_lsh_topk_for_queries(spark, sf_dir, ids))
    release_persists()
    got_lsh = _rows(
        similarity_lsh_topk_from_index(spark, sf_dir, index_dir, query_ids=ids)
    )
    assert got_lsh == want_lsh
    want_ivf = _rows(similarity_ivf_topk_for_queries(spark, sf_dir, ids))
    release_persists()
    got_ivf = _rows(
        similarity_ivf_topk_from_index(spark, sf_dir, index_dir, query_ids=ids)
    )
    assert got_ivf == want_ivf
