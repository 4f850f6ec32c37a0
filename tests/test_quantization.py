"""Product quantization (Jégou et al. 2011): trainer pinned
bit-identical to the oracle-pinned per-slice k-means, codes / ADC
scores / shortlisted top-k pinned against full DuckDB derivations at
sf0.001 AND sf0.01, full-shortlist ≡ exact brute-force, invariance and
guard properties."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries import release_persists
from kinesis_iterator_spark.queries.quantization import (
    PQResult,
    pq_adc_scores,
    pq_adc_topk,
    pq_codes,
    pq_oracle_sqls,
    pq_train,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
M, KS, ITERS = 8, 16, 2


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _query_vec(spark, sf_dir):
    row = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == 7)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


def _trained(spark, sf_dir):
    try:
        return pq_train(spark, _emb(spark, sf_dir), m=M, ks=KS, iters=ITERS)
    finally:
        release_persists()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_pq_train_equals_sliced_kmeans(spark, sf_dir2):
    """The one-job-per-iteration grouped trainer IS m fused copies of
    the oracle-pinned `kmeans_embeddings(init='min_id')` on the sliced
    sub-vector frames — identical surviving ids and identical int64
    centroids for every subspace."""
    from kinesis_iterator_spark.queries.clustering import kmeans_embeddings

    pq = _trained(spark, sf_dir2)
    emb = _emb(spark, sf_dir2)
    dsub = pq.dsub
    for s in range(pq.m):
        sliced = emb.select(
            "vec_id",
            F.slice("embedding", s * dsub + 1, dsub).alias("embedding"),
        )
        try:
            ref = kmeans_embeddings(
                spark, sliced, k=KS, iters=ITERS, init="min_id"
            )
        finally:
            release_persists()
        assert pq.books[s][0] == ref.clusters
        assert np.array_equal(pq.books[s][1], ref.centroids)


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_pq_codes_match_duckdb(spark, sf_dir2):
    pq = _trained(spark, sf_dir2)
    got = _rows(pq_codes(_emb(spark, sf_dir2), pq))
    sqls = pq_oracle_sqls(pq, _query_vec(spark, sf_dir2))
    want = sorted(tuple(r) for r in _con(sf_dir2).execute(sqls["codes"]).fetchall())
    assert got == want
    # Codes are non-degenerate: more than one distinct code exists.
    assert len({c for _, c in got}) > 1


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_pq_adc_scores_match_duckdb(spark, sf_dir2):
    """ADC dot / reconstruction norm are exact int64; the approximate
    cosine is a deterministic function of those ints — all three
    bit-identical to the DuckDB derivation."""
    pq = _trained(spark, sf_dir2)
    q = _query_vec(spark, sf_dir2)
    emb = _emb(spark, sf_dir2)
    got = _rows(pq_adc_scores(pq_codes(emb, pq), q, pq))
    sqls = pq_oracle_sqls(pq, q)
    want = sorted(
        tuple(r) for r in _con(sf_dir2).execute(sqls["scores"]).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_pq_adc_topk_matches_duckdb(spark, sf_dir2):
    pq = _trained(spark, sf_dir2)
    q = _query_vec(spark, sf_dir2)
    emb = _emb(spark, sf_dir2)
    got = _rows(pq_adc_topk(spark, emb, pq_codes(emb, pq), q, pq))
    sqls = pq_oracle_sqls(pq, q)
    want = sorted(
        tuple(r) for r in _con(sf_dir2).execute(sqls["topk"]).fetchall()
    )
    assert got == want
    assert len(got) == 5
    # The query vector itself is in the corpus: exact re-rank must
    # surface it at cosine 1.0.
    assert any(r[0] == 7 and r[1] == pytest.approx(1.0) for r in got)


def test_pq_full_shortlist_equals_bruteforce(spark, sf_dir):
    """shortlist >= corpus ⇒ the ADC stage only orders candidates; the
    exact re-rank then IS brute-force exact top-k."""
    pq = _trained(spark, sf_dir)
    q = _query_vec(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    n = emb.count()
    got = _rows(
        pq_adc_topk(
            spark, emb, pq_codes(emb, pq), q, pq, topk=10, shortlist=n
        )
    )
    # Exact reference: the same sequential-fold cosine over ALL vectors.
    sqls = pq_oracle_sqls(pq, q, topk=10, shortlist=n)
    want = sorted(
        tuple(r) for r in _con(sf_dir).execute(sqls["topk"]).fetchall()
    )
    assert got == want
    assert len(got) == 10


def test_pq_codes_partitioning_invariant(spark, sf_dir):
    pq = _trained(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    a = _rows(pq_codes(emb.repartition(7), pq))
    b = _rows(pq_codes(emb.repartition(2), pq))
    assert a == b


def test_pq_guards(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    with pytest.raises(ValueError, match="ks"):
        pq_train(spark, emb, ks=0)
    with pytest.raises(ValueError, match="ks"):
        pq_train(spark, emb, ks=257)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(spark, emb, m=7)
    pq = _trained(spark, sf_dir)
    with pytest.raises(ValueError, match="shortlist"):
        pq_adc_topk(
            spark, emb, pq_codes(emb, pq), _query_vec(spark, sf_dir), pq,
            topk=10, shortlist=5,
        )
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_scores(pq_codes(emb, pq), [0.0] * 32, pq)


def test_pq_shortlist_recall_reasonable(spark, sf_dir):
    """Not an equality pin (PQ is approximate by design): the default
    64-candidate shortlist must still recover most of the exact top-10
    on the fixture — the sanity bound that the ADC ordering is doing
    its job rather than returning arbitrary candidates."""
    pq = _trained(spark, sf_dir)
    q = _query_vec(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    n = emb.count()
    exact = {
        r[0]
        for r in _rows(
            pq_adc_topk(
                spark, emb, pq_codes(emb, pq), q, pq, topk=10, shortlist=n
            )
        )
    }
    approx = {
        r[0]
        for r in _rows(
            pq_adc_topk(
                spark, emb, pq_codes(emb, pq), q, pq, topk=10, shortlist=64
            )
        )
    }
    assert len(exact & approx) >= 6

# -- stored PQ layer + EmbeddingWriter composition ----------------------


def test_pq_layer_roundtrip_and_from_index(spark, sf_dir, tmp_path):
    """write → read roundtrips the exact int64 books; the from-index
    query equals the recompute form over the same corpus."""
    from kinesis_iterator_spark.queries.quantization import (
        pq_topk_from_index,
        read_pq_books,
        write_pq_layer,
    )

    idx = str(tmp_path / "ann")
    emb = _emb(spark, sf_dir)
    pq = write_pq_layer(spark, idx, emb, m=M, ks=KS, iters=ITERS)
    got = read_pq_books(idx)
    assert got.m == pq.m and got.dsub == pq.dsub
    for s in range(pq.m):
        assert got.books[s][0] == pq.books[s][0]
        assert np.array_equal(got.books[s][1], pq.books[s][1])
    q = _query_vec(spark, sf_dir)
    a = _rows(pq_topk_from_index(spark, idx, emb, q, topk=10))
    b = _rows(
        pq_adc_topk(spark, emb, pq_codes(emb, pq), q, pq, topk=10)
    )
    assert a == b and len(a) == 10


def test_pq_layer_marker_refuses_and_rebuild_heals(spark, sf_dir, tmp_path):
    from kinesis_iterator_spark.queries.quantization import (
        read_pq_books,
        write_pq_layer,
    )

    idx = str(tmp_path / "ann")
    emb = _emb(spark, sf_dir)
    write_pq_layer(spark, idx, emb, m=M, ks=KS, iters=1)
    with open(f"{idx}/pq.inprogress", "w") as fh:
        fh.write("")
    with pytest.raises(ValueError, match="pq.inprogress"):
        read_pq_books(idx)
    write_pq_layer(spark, idx, emb, m=M, ks=KS, iters=1)
    assert read_pq_books(idx).m == M  # healed: marker gone, books read


def test_embedding_writer_pq_layer_frozen_and_equal(spark, sf_dir, tmp_path):
    """Writer-maintained layer: books train at bootstrap and stay
    FROZEN across admits (sidecar byte-identical); stored codes equal
    a fresh encode of the whole store against those books; pq_topk
    equals the recompute form."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.quantization import read_pq_books

    emb = _emb(spark, sf_dir)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    w = EmbeddingWriter(
        spark,
        str(tmp_path / "store"),
        str(tmp_path / "ann"),
        pq_layer=True,
        pq_ks=KS,
        pq_iters=1,
    )
    try:
        w.admit(even)
        books0 = read_pq_books(str(tmp_path / "ann"))
        w.admit(odd)
        books1 = read_pq_books(str(tmp_path / "ann"))
        for s in range(books0.m):
            assert books0.books[s][0] == books1.books[s][0]
            assert np.array_equal(books0.books[s][1], books1.books[s][1])
        stored_codes = _rows(
            spark.read.parquet(f"{tmp_path}/ann/pq_codes")
        )
        fresh_codes = _rows(pq_codes(w.store(), books1))
        assert stored_codes == fresh_codes
        q = _query_vec(spark, sf_dir)
        a = _rows(w.pq_topk(q, topk=10))
        b = _rows(
            pq_adc_topk(
                spark, w.store(), pq_codes(w.store(), books1), q, books1,
                topk=10,
            )
        )
        assert a == b and len(a) == 10
    finally:
        release_persists()


def test_embedding_writer_pq_late_enablement_heals(spark, sf_dir, tmp_path):
    """A store bootstrapped WITHOUT the layer gains it on the first
    admit of a pq_layer=True writer (rebuild from the store — the
    derived-layer self-heal), covering every stored vector."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter
    from kinesis_iterator_spark.queries import release_persists

    emb = _emb(spark, sf_dir)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    sdir, idir = str(tmp_path / "store"), str(tmp_path / "ann")
    try:
        EmbeddingWriter(spark, sdir, idir).admit(even)
        w = EmbeddingWriter(spark, sdir, idir, pq_layer=True, pq_iters=1)
        with pytest.raises(ValueError, match="no PQ layer"):
            w.pq_topk(_query_vec(spark, sf_dir))
        w.admit(odd)
        n_store = w.store().count()
        n_codes = spark.read.parquet(f"{idir}/pq_codes").count()
        assert n_codes == n_store
        got = w.pq_topk(_query_vec(spark, sf_dir), topk=5)
        assert got.count() == 5
    finally:
        release_persists()


def test_embedding_writer_pq_guard(spark, sf_dir, tmp_path):
    from kinesis_iterator_spark.pipeline import EmbeddingWriter

    w = EmbeddingWriter(spark, str(tmp_path / "s"), str(tmp_path / "i"))
    with pytest.raises(ValueError, match="pq_layer"):
        w.pq_topk([0.0] * 64)


def test_pq_ivf_topk_matches_duckdb_and_degenerates(spark, sf_dir, tmp_path):
    """The composed IVFADC read path (probe cells → inverted-file
    restriction → ADC shortlist → exact re-rank) is pinned against the
    all-SQL DuckDB chain over the same stored index; probing EVERY
    cell degenerates to the unrestricted from-index form."""
    from kinesis_iterator_spark.queries.quantization import (
        pq_ivf_topk_from_index,
        pq_topk_from_index,
        write_pq_layer,
    )
    from kinesis_iterator_spark.queries.similarity import write_ann_index

    idx = str(tmp_path / "ann")
    emb = _emb(spark, sf_dir)
    write_ann_index(spark, sf_dir, idx)
    pq = write_pq_layer(spark, idx, emb, m=M, ks=KS, iters=1)
    q = _query_vec(spark, sf_dir)
    got = _rows(
        pq_ivf_topk_from_index(spark, idx, emb, q, topk=5, nprobe=2)
    )
    con = _con(sf_dir)
    con.execute(
        f"CREATE VIEW centroids AS SELECT * FROM '{idx}/centroids/*.parquet'"
    )
    con.execute(
        "CREATE VIEW ivf_assignment AS "
        f"SELECT * FROM '{idx}/ivf_assignment/*.parquet'"
    )
    sqls = pq_oracle_sqls(pq, q, topk=5, nprobe=2)
    want = sorted(tuple(r) for r in con.execute(sqls["ivf_topk"]).fetchall())
    assert got == want and len(got) == 5
    n_cells = con.execute("SELECT COUNT(*) FROM centroids").fetchall()[0][0]
    a = _rows(
        pq_ivf_topk_from_index(spark, idx, emb, q, topk=5, nprobe=n_cells)
    )
    b = _rows(pq_topk_from_index(spark, idx, emb, q, topk=5))
    assert a == b
