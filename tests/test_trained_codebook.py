"""Trained-codebook wiring (VERDICT r9 #3): the fixed-point k-means
trainer (`queries/clustering.py`) feeding the ANN index it was built to
train, and SemDeDup over trained cells.

Pins: (1) `write_ann_index(codebook=KMeansResult)` stores exactly the
trained centroids and its stored-index IVF queries equal the recompute
form over the same codebook; (2) extension stays frozen-codebook — new
vectors are assigned against the stored TRAINED centroids and the
sidecar is untouched; (3) `semantic_dedup_frame(clusters=...)` equals
the DuckDB oracle with the k-means CTE chain spliced in
(`clustering.kmeans_cent_ctes`) — the full derivation, cross-engine."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries import release_persists
from kinesis_iterator_spark.queries.clustering import (
    codebook_rows,
    kmeans_cent_ctes,
    kmeans_embeddings,
)
from kinesis_iterator_spark.queries.dedup import (
    COSINE_TAU,
    semantic_dedup_frame,
    semantic_dedup_oracle,
)
from kinesis_iterator_spark.queries.similarity import (
    _corpus_size,
    _ivf_candidate_pairs,
    _ivf_ranked_assignment,
    _score_pairs_topk,
    extend_ann_index,
    read_ann_codebook,
    similarity_ivf_topk_from_index,
    write_ann_index,
)
from kinesis_iterator_spark.tables import load_table

K, ITERS = 8, 4
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _rows(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    # Materialize the assignment lineage is not needed here; release the
    # trainer's managed persist so the module doesn't pin it.
    release_persists()
    return res


def test_write_ann_index_stores_trained_codebook(
    spark, sf_dir, trained, tmp_path_factory
):
    d = str(tmp_path_factory.mktemp("trained_idx"))
    meta = write_ann_index(spark, sf_dir, d, codebook=trained)
    assert meta["codebook"] == "trained"
    crows = codebook_rows(trained)
    stored = read_ann_codebook(d)
    assert [(r["cell"], r["centroid"]) for r in stored] == [
        (r["cell"], r["centroid"]) for r in crows
    ]
    # Stored-index IVF query ≡ recompute over the SAME trained codebook
    # (the test_ann_index equality, with the codebook swapped).
    emb = load_table(spark, sf_dir, "embeddings")
    ranked = _ivf_ranked_assignment(spark, emb, crows=crows)
    want = _rows(
        _score_pairs_topk(
            _ivf_candidate_pairs(ranked),
            emb,
            spark.sparkContext.defaultParallelism,
            sf_dir,
            _corpus_size(sf_dir),
        )
    )
    got = _rows(similarity_ivf_topk_from_index(spark, sf_dir, d))
    assert got == want


def test_extend_keeps_trained_codebook_frozen(spark, sf_dir, trained, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "idx")
    write_ann_index(spark, sf_dir, d, emb=even, codebook=trained)
    before = read_ann_codebook(d)
    extend_ann_index(spark, odd, d)
    after = read_ann_codebook(d)
    assert after == before  # sidecar untouched by extension
    # New vectors were assigned against the stored TRAINED centroids.
    stored_odd = (
        spark.read.parquet(f"{d}/ivf_assignment")
        .filter(F.col("vec_id") % 2 == 1)
    )
    want = _rows(_ivf_ranked_assignment(spark, odd, crows=codebook_rows(trained)))
    assert _rows(stored_odd) == want


@pytest.mark.parametrize("sf2", SF_DIRS)
def test_semantic_dedup_trained_clusters_matches_spliced_oracle(spark, sf2):
    emb = load_table(spark, sf2, "embeddings")
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    got = sorted(
        tuple(r)
        for r in semantic_dedup_frame(
            spark, emb, COSINE_TAU, clusters=res
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf2}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            semantic_dedup_oracle(
                COSINE_TAU, cent_ctes=kmeans_cent_ctes(K, ITERS)
            )
        ).fetchall()
    )
    assert got == want
