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


# -- extend_ann_index: the embedding-side post-batch index save ---------


def test_extend_ann_index_makes_new_vectors_findable(
    spark, sf_dir, tmp_path
):
    """Build on the even-vec_id half, extend with the odd half: before
    extension a re-ingested odd vector may read novel; after extension
    every odd re-ingestion is a near_dup self-hit (cosine 1), exactly
    the text side's extend-then-redetect behavior."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark import incremental
    from kinesis_iterator_spark.queries.similarity import extend_ann_index
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "idx")
    write_ann_index(spark, sf_dir, d, emb=even)

    meta = extend_ann_index(spark, odd, d)
    assert meta["n_extended"] == odd.count()

    verdicts = incremental.embedding_dedup_against_index(
        spark, odd, d, sf_dir
    ).collect()
    assert verdicts, "no verdicts returned"
    for r in verdicts:
        assert r["verdict"] == "near_dup", r
        # the strongest stored match of a re-ingested vector is itself
        assert r["dup_of"] == r["vec_id"] and r["cosine"] == pytest.approx(1.0)
    release_persists()


def test_extend_ann_index_appends_exact_build_rows(spark, sf_dir, tmp_path):
    """Appended signature and inverted-file rows must be EXACTLY what the
    build kernels produce for those vectors against the stored
    codebook — signatures bit-identical to lsh_signatures(batch), IVF
    rows assigned to stored cells with rk {1, 2}."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.similarity import (
        extend_ann_index,
        lsh_signatures,
    )
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "idx")
    meta = write_ann_index(spark, sf_dir, d, emb=half)
    extend_ann_index(spark, rest, d)

    par = spark.sparkContext.defaultParallelism
    want_sig = _rows(lsh_signatures(rest, meta["b"], par))
    got_sig = _rows(
        spark.read.parquet(f"{d}/lsh_signatures")
        .join(rest.select("vec_id"), "vec_id", "leftsemi")
        .select("vec_id", "table_id", "bucket")
    )
    assert got_sig == want_sig

    cells = {
        r["cell"] for r in spark.read.parquet(f"{d}/centroids").collect()
    }
    ivf = (
        spark.read.parquet(f"{d}/ivf_assignment")
        .join(rest.select("vec_id"), "vec_id", "leftsemi")
        .collect()
    )
    by_vec = {}
    for r in ivf:
        by_vec.setdefault(r["vec_id"], []).append((r["rk"], r["cell"]))
    assert set(by_vec) == {r["vec_id"] for r in rest.select("vec_id").collect()}
    for vec_id, rows in by_vec.items():
        assert sorted(rk for rk, _ in rows) == [1, 2]
        assert all(c in cells for _, c in rows)
    release_persists()


def test_extend_ann_index_refuses_codebook_less_layout(spark, sf_dir, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.similarity import extend_ann_index
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    d = str(tmp_path / "idx")
    write_ann_index(spark, sf_dir, d, emb=emb.filter(F.col("vec_id") % 2 == 0))
    shutil.rmtree(f"{d}/centroids")
    with pytest.raises(ValueError, match="persisted-codebook"):
        extend_ann_index(spark, emb.limit(5), d)


def test_bucket_sizes_layer_equals_window_form(spark, sf_dir, tmp_path):
    """The stored bucket-occupancy layer (round 10): candidates from the
    sizes-relation anti-join ≡ the window form, at build AND after an
    extension (sum-of-segment-counts ≡ the recount), and the stored
    sizes themselves equal a recount of the stored signatures."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.similarity import (
        _lsh_candidate_pairs,
        extend_ann_index,
        stored_bucket_sizes,
        write_ann_index,
    )
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "idx")
    meta = write_ann_index(spark, sf_dir, d, emb=even)
    extend_ann_index(spark, odd, d)

    sig = spark.read.parquet(f"{d}/lsh_signatures")
    sizes = stored_bucket_sizes(spark, d)
    assert sizes is not None
    # stored occupancy == recount of the stored signatures
    want_sizes = _rows(
        sig.groupBy("table_id", "bucket").agg(
            F.count("*").cast("long").alias("bsz")
        )
    )
    assert _rows(sizes) == want_sizes
    # candidate sets identical under both cap mechanisms
    want = _rows(_lsh_candidate_pairs(sig, meta["b"], meta["cap"]))
    got = _rows(
        _lsh_candidate_pairs(
            sig, meta["b"], meta["cap"], bucket_sizes=sizes
        )
    )
    assert got == want and got
    release_persists()


def test_bucket_sizes_distributed_path_equals_driver(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The size-gated dual path for the per-segment occupancy append
    (r18): forcing the DISTRIBUTED groupBy+write branch (gate -1) must
    leave the summed layer identical to the default driver-side
    pyarrow segment."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries import similarity as S
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)

    n_odd = odd.count()

    def build(dirname):
        d = str(tmp_path / dirname)
        S.write_ann_index(spark, sf_dir, d, emb=even)
        # n_new declared: the driver path is only attempted when the
        # caller knows the batch size (the writer path).
        S.extend_ann_index(spark, odd, d, n_new=n_odd)
        return _rows(S.stored_bucket_sizes(spark, d))

    want = build("drv")
    monkeypatch.setattr(S, "DRIVER_BSZ_MAX_BYTES", -1)
    got = build("dist")
    assert want and got == want
    release_persists()


def test_stored_bucket_sizes_absent_on_pre_layer_index(spark, sf_dir, tmp_path):
    import shutil

    from kinesis_iterator_spark.queries.similarity import (
        stored_bucket_sizes,
        write_ann_index,
    )

    d = str(tmp_path / "idx")
    write_ann_index(spark, sf_dir, d)
    shutil.rmtree(f"{d}/bucket_sizes")  # simulate a pre-layer index
    assert stored_bucket_sizes(spark, d) is None
