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


def test_embedding_writer_trains_codebook_at_build(spark, sf_dir, tmp_path):
    """EmbeddingWriter(train_codebook=True): the bootstrap build stores
    exactly the k-means|| codebook trained over the admitted store; the
    admit loop still assigns against the FROZEN stored centroids
    (sidecar untouched by the second admit); reconcile retrains over
    the grown store."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter
    from kinesis_iterator_spark.queries import release_persists

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    w = EmbeddingWriter(
        spark,
        str(tmp_path / "store"),
        str(tmp_path / "idx"),
        train_codebook=True,
        train_k=4,
        train_iters=2,
    )
    s1 = w.admit(b1)
    release_persists()
    # Stored centroids == a fresh train over exactly the admitted store.
    want = codebook_rows(
        kmeans_embeddings(spark, w.store(), k=4, iters=2, init="kmeans_par")
    )
    release_persists()
    stored = read_ann_codebook(str(tmp_path / "idx"))
    assert [(r["cell"], r["centroid"]) for r in stored] == [
        (r["cell"], r["centroid"]) for r in want
    ]
    before = stored
    s2 = w.admit(b2)
    release_persists()
    assert s2["n_admitted"] >= 0 and s1["n_admitted"] > 0
    assert read_ann_codebook(str(tmp_path / "idx")) == before  # frozen
    # Reconcile = fresh training over the grown store.
    w.reconcile()
    release_persists()
    want2 = codebook_rows(
        kmeans_embeddings(spark, w.store(), k=4, iters=2, init="kmeans_par")
    )
    release_persists()
    got2 = read_ann_codebook(str(tmp_path / "idx"))
    assert [(r["cell"], r["centroid"]) for r in got2] == [
        (r["cell"], r["centroid"]) for r in want2
    ]


def test_proportional_train_k_rule():
    """⌈√n⌉ floored at TRAIN_K_FLOOR, capped at n — the FAISS coarse-
    quantizer sizing rule `EmbeddingWriter(train_k=None)` resolves at
    every build."""
    from kinesis_iterator_spark.queries.clustering import (
        TRAIN_K_FLOOR,
        proportional_train_k,
    )

    assert TRAIN_K_FLOOR == 8
    assert proportional_train_k(1) == 1  # capped at n
    assert proportional_train_k(5) == 5  # floor 8 capped at n=5
    assert proportional_train_k(64) == 8
    assert proportional_train_k(65) == 9  # ceil(sqrt(65)) = 9
    assert proportional_train_k(250) == 16
    assert proportional_train_k(500) == 23
    assert proportional_train_k(2000) == 45
    assert proportional_train_k(10**12) == 10**6  # the 100 TB point
    with pytest.raises(ValueError, match="non-empty"):
        proportional_train_k(0)


@pytest.mark.slow
def test_writer_default_train_k_grows_cells_on_reconcile(
    spark, sf_dir, tmp_path
):
    """EmbeddingWriter(train_codebook=True) with train_k omitted: the
    bootstrap build trains ⌈√n_store⌉ cells, and a reconcile over the
    GROWN store trains MORE cells — the geometry scales with the
    corpus, so the cell-proportional nprobe default widens with it
    (closing RECALL.md's 'cell-coverage-bound at a frozen 10-cell
    fixture' finding at the writer level)."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter
    from kinesis_iterator_spark.queries.clustering import (
        proportional_train_k,
    )
    from kinesis_iterator_spark.queries.quantization import (
        proportional_nprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    w = EmbeddingWriter(
        spark,
        str(tmp_path / "store"),
        str(tmp_path / "idx"),
        train_codebook=True,
        train_iters=2,
    )
    s1 = w.admit(b1)
    release_persists()
    n1 = w.store().count()
    assert s1["n_admitted"] == n1
    stored1 = read_ann_codebook(str(tmp_path / "idx"))
    # == a fresh train at the proportional size (k-means may retire
    # empty cells, so the pin is the trained RESULT, not the raw rule)
    want1 = codebook_rows(
        kmeans_embeddings(
            spark, w.store(), k=proportional_train_k(n1), iters=2,
            init="kmeans_par",
        )
    )
    release_persists()
    assert [(r["cell"], r["centroid"]) for r in stored1] == [
        (r["cell"], r["centroid"]) for r in want1
    ]
    cells1 = len(stored1)
    w.admit(b2)
    release_persists()
    # frozen between builds: the admit extended, it did not retrain
    assert len(read_ann_codebook(str(tmp_path / "idx"))) == cells1
    w.reconcile()
    release_persists()
    n2 = w.store().count()
    cells2 = len(read_ann_codebook(str(tmp_path / "idx")))
    assert proportional_train_k(n2) > proportional_train_k(n1)
    assert cells2 > cells1
    # and the probe-width default widens with the geometry
    assert proportional_nprobe(cells2) > proportional_nprobe(cells1)
