"""Residual product quantization — the true FAISS `IndexIVFPQ`
encoding (books trained on x − c(cell), per-cell exact-integer
reconstruction algebra at query time). Trainer, codes, ADC scores, and
the full residual-IVFADC top-k are each pinned bit-identical to full
DuckDB derivations at sf0.001 AND sf0.01; the full-probe/full-shortlist
form equals exact brute-force; residual books reconstruct strictly
better than raw-vector books at the same (m, ks, iters); the stored
layer keeps the frozen-books/extension/crash contracts; and the
EmbeddingWriter composition serves the read path over exactly its
admitted store."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.quantization import (
    _cell_fix,
    _quantize,
    compact_ivfpq_codes,
    extend_ivfpq_layer,
    ivfpq_adc_scores,
    ivfpq_codes,
    ivfpq_oracle_sqls,
    ivfpq_topk,
    ivfpq_topk_from_index,
    ivfpq_train,
    ivfpq_train_oracle_sql,
    pq_adc_topk,
    pq_codes,
    pq_train,
    read_ivfpq_books,
    write_ivfpq_layer,
)
from kinesis_iterator_spark.queries.similarity import (
    extend_ann_index,
    read_ann_codebook,
    write_ann_index,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
M, KS, ITERS = 8, 16, 2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _query_vec(spark, sf_dir):
    return [
        float(v)
        for v in _emb(spark, sf_dir).orderBy("vec_id").first()["embedding"]
    ]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Per-scale (index_dir, crows, emb_cells, pq) — one ANN build +
    one residual training per scale, shared by the oracle pins."""
    out = {}
    for sf in SF_DIRS:
        idx = str(tmp_path_factory.mktemp("ivfpq")) + "/ann"
        write_ann_index(spark, sf, idx)
        crows = read_ann_codebook(idx)
        assign = (
            spark.read.parquet(f"{idx}/ivf_assignment")
            .filter(F.col("rk") == 1)
            .select("vec_id", "cell")
        )
        ec = _emb(spark, sf).join(assign, "vec_id")
        pq = ivfpq_train(spark, ec, crows, m=M, ks=KS, iters=ITERS)
        out[sf] = (idx, crows, ec, pq)
    return out


def _con(sf_dir: str, idx: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    con.execute(
        "CREATE VIEW ivf_assignment AS "
        f"SELECT * FROM parquet_scan('{idx}/ivf_assignment/*.parquet')"
    )
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_trainer_matches_oracle(spark, built, sf_dir):
    idx, crows, _, pq = built[sf_dir]
    want = {}
    for s, (cls, C) in enumerate(pq.books):
        for j, cl in enumerate(cls):
            for dim in range(pq.dsub):
                want[(s, cl, dim)] = int(C[j][dim])
    con = _con(sf_dir, idx)
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(
            ivfpq_train_oracle_sql(M, KS, ITERS, crows)
        ).fetchall()
    }
    assert got == want and len(got) == M * KS * pq.dsub


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_codes_scores_topk_match_oracle(spark, built, sf_dir):
    idx, crows, ec, pq = built[sf_dir]
    q = _query_vec(spark, sf_dir)
    sqls = ivfpq_oracle_sqls(pq, crows, q, topk=5, shortlist=64, nprobe=2)
    con = _con(sf_dir, idx)
    codes = ivfpq_codes(ec, crows, pq)
    assert _rows(codes) == sorted(con.execute(sqls["codes"]).fetchall())
    scored = ivfpq_adc_scores(codes, q, pq, crows)
    assert _rows(scored) == sorted(con.execute(sqls["scores"]).fetchall())
    got = [
        tuple(r)
        for r in ivfpq_topk(
            spark,
            _emb(spark, sf_dir),
            codes,
            q,
            pq,
            crows,
            topk=5,
            shortlist=64,
            nprobe=2,
        ).collect()
    ]
    assert got == con.execute(sqls["topk"]).fetchall() and len(got) == 5


def test_full_probe_full_shortlist_equals_exact(spark, built):
    """nprobe = n_cells and shortlist ≥ corpus reduce residual IVFADC
    to exact brute-force top-k — pinned against the raw-PQ full-
    shortlist form, itself pinned ≡ exact in test_quantization."""
    sf = SF_DIRS[0]
    _, crows, ec, pq = built[sf]
    emb = _emb(spark, sf)
    n = emb.count()
    q = _query_vec(spark, sf)
    full = ivfpq_topk(
        spark,
        emb,
        ivfpq_codes(ec, crows, pq),
        q,
        pq,
        crows,
        topk=5,
        shortlist=n,
        nprobe=len(crows),
    )
    raw = pq_train(spark, emb, m=M, ks=KS, iters=1)
    want = pq_adc_topk(
        spark, emb, pq_codes(emb, raw), q, raw, topk=5, shortlist=n
    )
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in want.collect()
    ]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_residual_books_reconstruct_strictly_better(spark, built, sf_dir):
    """The reason IVFPQ residual-encodes: at the same (m, ks, iters)
    budget, Σ|x_fix − x̂_fix|² over the corpus is LOWER when the books
    quantize residuals. Exact integers end to end (deterministic — no
    randomness anywhere in the trainers), computed driver-side over the
    fixture matrix."""
    _, crows, ec, pq_res = built[sf_dir]
    emb = _emb(spark, sf_dir)
    pq_raw = pq_train(spark, emb, m=M, ks=KS, iters=ITERS)
    rows = ec.select("vec_id", "embedding", "cell").collect()
    X = _quantize(
        np.array([r["embedding"] for r in rows], dtype=np.float32)
    )
    cells, CF = _cell_fix(crows)
    cidx = np.searchsorted(cells, np.array([r["cell"] for r in rows]))
    dsub = pq_res.dsub

    def recon_err(Xq, books):
        # Exact in int64: (x − ĉ)² ≤ (4·10⁶)², ×dsub ≈ 1.3·10¹⁴ per
        # row-min, summed over n·m rows ≲ 10¹⁸ < 2⁶³.
        err = 0
        for s in range(M):
            Xs = Xq[:, s * dsub : (s + 1) * dsub]
            C = books[s][1]
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            err += int(d2.min(axis=1).sum())
        return err

    raw_err = recon_err(X, pq_raw.books)
    res_err = recon_err(X - CF[cidx], pq_res.books)
    assert res_err < raw_err


def test_stored_layer_roundtrip_extension_and_crash(spark, tmp_path):
    sf = SF_DIRS[0]
    emb = _emb(spark, sf)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ann")
    write_ann_index(spark, sf, idx, emb=even, n=even.count())
    pq = write_ivfpq_layer(spark, idx, even, m=M, ks=KS, iters=1)
    got = read_ivfpq_books(idx)
    assert got.m == pq.m and got.dsub == pq.dsub
    for s in range(pq.m):
        assert got.books[s][0] == pq.books[s][0]
        assert np.array_equal(got.books[s][1], pq.books[s][1])
    # Extension: frozen books, codes equal a fresh encode of the union.
    extend_ann_index(spark, odd, idx)
    extend_ivfpq_layer(spark, idx, odd)
    assert read_ivfpq_books(idx).books[0][0] == pq.books[0][0]
    crows = read_ann_codebook(idx)
    assign = (
        spark.read.parquet(f"{idx}/ivf_assignment")
        .filter(F.col("rk") == 1)
        .select("vec_id", "cell")
    )
    want = _rows(ivfpq_codes(emb.join(assign, "vec_id"), crows, pq))
    assert _rows(spark.read.parquet(f"{idx}/ivfpq_codes")) == want
    # From-index ≡ recompute over the same store + books.
    q = _query_vec(spark, sf)
    a = _rows(ivfpq_topk_from_index(spark, idx, emb, q, topk=5, nprobe=2))
    b = _rows(
        ivfpq_topk(
            spark,
            emb,
            spark.read.parquet(f"{idx}/ivfpq_codes"),
            q,
            pq,
            crows,
            topk=5,
            nprobe=2,
        )
    )
    assert a == b and len(a) == 5
    # Compaction is query-invisible.
    compact_ivfpq_codes(spark, idx)
    assert _rows(spark.read.parquet(f"{idx}/ivfpq_codes")) == want
    assert (
        _rows(ivfpq_topk_from_index(spark, idx, emb, q, topk=5, nprobe=2))
        == a
    )
    # Marker refusal.
    with open(f"{idx}/ivfpq.inprogress", "w") as fh:
        fh.write("")
    with pytest.raises(ValueError, match="ivfpq.inprogress"):
        read_ivfpq_books(idx)
    write_ivfpq_layer(spark, idx, emb, m=M, ks=KS, iters=1)
    assert read_ivfpq_books(idx).m == M


def test_unknown_cells_fail_loudly(spark, built):
    _, crows, ec, pq = built[SF_DIRS[0]]
    codes = ivfpq_codes(ec, crows, pq)
    q = _query_vec(spark, SF_DIRS[0])
    with pytest.raises(ValueError, match="absent from the coarse codebook"):
        ivfpq_adc_scores(codes, q, pq, crows, cells=[999_999])


def test_embedding_writer_residual_layer(spark, tmp_path):
    """Writer-maintained residual layer: books train at bootstrap and
    stay FROZEN across admits; pq_topk serves the residual IVFADC read
    path over exactly the admitted store and equals the recompute
    form."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter

    sf = SF_DIRS[0]
    emb = _emb(spark, sf)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    w = EmbeddingWriter(
        spark,
        str(tmp_path / "store"),
        str(tmp_path / "ann"),
        pq_layer=True,
        pq_residual=True,
        pq_ks=KS,
        pq_iters=1,
    )
    w.admit(even)
    books0 = read_ivfpq_books(w.index_dir)
    w.admit(odd)
    books1 = read_ivfpq_books(w.index_dir)
    for s in range(books0.m):
        assert books0.books[s][0] == books1.books[s][0]
        assert np.array_equal(books0.books[s][1], books1.books[s][1])
    q = _query_vec(spark, sf)
    got = _rows(w.pq_topk(q, topk=5, shortlist=64, nprobe=2))
    crows = read_ann_codebook(w.index_dir)
    want = _rows(
        ivfpq_topk(
            spark,
            w.store(),
            spark.read.parquet(f"{w.index_dir}/ivfpq_codes"),
            q,
            books1,
            crows,
            topk=5,
            shortlist=64,
            nprobe=2,
        )
    )
    assert got == want and len(got) == 5
    # Every scored id is in the admitted store.
    store_ids = {r["vec_id"] for r in w.store().select("vec_id").collect()}
    assert {r[0] for r in got} <= store_ids
    # compact() covers the residual codes.
    w.compact()
    assert _rows(w.pq_topk(q, topk=5, shortlist=64, nprobe=2)) == got


def test_cell_fix_roundtrips_trained_codebook(spark):
    """`codebook_rows` (int64/10⁶ correctly-rounded doubles) →
    `_cell_fix` (rint·10⁶) recovers the trainer's exact int64
    centroids — the identity the literal-free registry oracle leans
    on (its cfix CTE uses the k-means ints directly)."""
    from kinesis_iterator_spark.queries.clustering import (
        codebook_rows,
        kmeans_embeddings,
    )

    emb = _emb(spark, SF_DIRS[0])
    res = kmeans_embeddings(spark, emb, k=4, iters=2)
    cells, CF = _cell_fix(codebook_rows(res))
    assert list(cells) == sorted(int(c) for c in res.clusters)
    order = np.argsort(np.asarray(res.clusters))
    assert np.array_equal(CF, np.asarray(res.centroids)[order])


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_registry_ivfpq_leg_matches_literal_free_oracle(spark, sf_dir):
    """The gate entry's residual leg vs the fully-derived (no
    data-dependent literal) DuckDB chain — training, inverted file,
    residual books, codes, probe, ADC, exact re-rank all in SQL."""
    from kinesis_iterator_spark.queries.quantization import (
        _REG_CIT,
        _REG_IT2,
        _REG_KC,
        _REG_KS2,
        _REG_M2,
        _REG_NPROBE,
        _REG_QID2,
        _REG_SHORT2,
        _REG_TOPK,
        _ivfpq_registry_leg,
        _ivfpq_registry_oracle,
    )

    got = _rows(_ivfpq_registry_leg(spark, sf_dir))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            _ivfpq_registry_oracle(
                _REG_KC,
                _REG_CIT,
                _REG_M2,
                _REG_KS2,
                _REG_IT2,
                _REG_TOPK,
                _REG_SHORT2,
                _REG_NPROBE,
                _REG_QID2,
            )
        ).fetchall()
    )
    assert got == want and len(got) == _REG_TOPK
