"""Recall sweep of every shipped approximate-ANN path vs exact brute
force (VERDICT r10 #1): sign-LSH, IVF, PQ/ADC, IVFADC (raw books), and
residual IVFPQ, each at 2-3 parameter points, at the given scale
factor(s). Prints a markdown table (the RECALL.md body) and a JSON line
per config.

Usage:
    python tools/recall_sweep.py [sf_dir ...]       # default sf0.01 sf0.1

Method: the corpus-wide paths (LSH, IVF) are self-kNN frames — recall
is measured over EVERY query in the corpus. The PQ family is a
single-query read path, so it is swept over a deterministic
``N_PQ_QUERIES``-point probe set (ids at evenly-spaced rank positions);
self-matches are dropped (the exact baseline excludes them) and the cut
re-applied at k. Recall numbers come from
`queries.similarity.ann_recall_summary` — micro = Σhit/Σexact,
macro = mean per-query recall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
N_PQ_QUERIES = 24


def _pq_query_ids(ids: list[int]) -> list[int]:
    """Evenly-spaced rank positions over the sorted id list —
    deterministic, spread across the corpus."""
    ids = sorted(ids)
    step = max(1, len(ids) // N_PQ_QUERIES)
    return ids[::step][:N_PQ_QUERIES]


def _approx_frame_from_single_query(spark, rows_by_qid):
    """(query_id, neighbor_id) Spark frame from per-query (vec_id,
    cosine) result rows, self-matches already dropped and cut at K."""
    data = [
        (int(q), int(r["vec_id"]))
        for q, rows in rows_by_qid.items()
        for r in rows
    ]
    return spark.createDataFrame(data, "query_id long, neighbor_id long")


def sweep(spark, sf_dir: str) -> list[dict]:
    """Run the recall sweep; temp index dirs are removed on exit
    (ADVICE r12 — repeated sweeps used to accumulate full ANN+PQ+IVFPQ
    indexes in /tmp)."""
    import shutil

    tmp_roots: list[str] = []
    try:
        return _sweep(spark, sf_dir, tmp_roots)
    finally:
        for r in tmp_roots:
            shutil.rmtree(r, ignore_errors=True)


def _sweep(spark, sf_dir: str, tmp_roots: list[str]) -> list[dict]:
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.quantization import (
        ivfpq_topk_from_index,
        pq_adc_topk,
        pq_codes,
        pq_ivf_topk_from_index,
        pq_train,
        read_ivfpq_books,
        read_pq_books,
        write_ivfpq_layer,
        write_pq_layer,
    )
    from kinesis_iterator_spark.queries.similarity import (
        ann_recall_summary,
        similarity_bruteforce_topk,
        similarity_ivf_topk,
        similarity_lsh_topk,
        write_ann_index,
    )
    from kinesis_iterator_spark.tables import load_table

    import tempfile

    results: list[dict] = []
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()

    exact = similarity_bruteforce_topk(spark, sf_dir).persist()
    exact.count()
    release_persists()

    def record(path: str, params: str, approx, k: int = K, note: str = ""):
        t0 = time.perf_counter()
        row = ann_recall_summary(exact, approx, k=k).collect()[0]
        dt = time.perf_counter() - t0
        rec = {
            "sf_dir": sf_dir,
            "n": n,
            "path": path,
            "params": params,
            "k": k,
            "n_queries": int(row["n_queries"]),
            "micro_recall": round(float(row["micro_recall"]), 4),
            "macro_recall": round(float(row["macro_recall"]), 4),
            "note": note,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        release_persists()
        _ = dt

    # -- corpus-wide self-kNN paths (recall over EVERY query) ----------
    record("sign-LSH", "shipped (b=log2-scaled, multiprobe, cap)",
           similarity_lsh_topk(spark, sf_dir), note="self-kNN, all queries")
    record("IVF", "shipped (label cells, nprobe=2)",
           similarity_ivf_topk(spark, sf_dir), note="self-kNN, all queries")

    # -- PQ family (single-query read path, probe-set sweep) -----------
    all_ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    qids = _pq_query_ids(all_ids)
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    # The PQ family is evaluated on the probe set only — restrict the
    # exact baseline to the same query ids (leaving the other queries
    # in would count them as misses and deflate recall ~n/|probe set|).
    exact_q = exact.filter(F.col("query_id").isin(qids)).persist()
    exact_q.count()

    def record_q(path: str, params: str, approx):
        t0 = time.perf_counter()
        row = ann_recall_summary(exact_q, approx, k=K).collect()[0]
        rec = {
            "sf_dir": sf_dir,
            "n": n,
            "path": path,
            "params": params,
            "k": K,
            "n_queries": int(row["n_queries"]),
            "micro_recall": round(float(row["micro_recall"]), 4),
            "macro_recall": round(float(row["macro_recall"]), 4),
            "note": f"{len(qids)}-query probe set",
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        release_persists()
        _ = time.perf_counter() - t0

    pq = pq_train(spark, emb, iters=2)  # m=8, ks=16 fixture default
    release_persists()
    codes = pq_codes(emb, pq).localCheckpoint(eager=True)

    def pq_adc_runner(shortlist: int):
        out = {}
        for q in qids:
            rows = pq_adc_topk(
                spark, emb, codes, qvecs[q], pq,
                topk=K + 1, shortlist=shortlist + 1,
            ).collect()
            out[q] = [r for r in rows if r["vec_id"] != q][:K]
        return _approx_frame_from_single_query(spark, out)

    for shortlist in (16, 32, 64):
        record_q("PQ-ADC", f"m=8 ks=16 shortlist={shortlist}",
                 pq_adc_runner(shortlist))

    # Stored layers: one ANN index (raw-PQ layer + residual layer).
    tmp_roots.append(tempfile.mkdtemp(prefix="recall_idx_"))
    idx = tmp_roots[-1] + "/ann"
    write_ann_index(spark, sf_dir, idx)
    write_pq_layer(spark, idx, emb, iters=2)
    write_ivfpq_layer(spark, idx, emb, iters=2)
    release_persists()
    raw_books = read_pq_books(idx)
    res_books = read_ivfpq_books(idx)

    def from_index_runner(fn, books, nprobe: int):
        out = {}
        for q in qids:
            rows = fn(
                spark, idx, emb, qvecs[q],
                topk=K + 1, shortlist=65, nprobe=nprobe, books=books,
            ).collect()
            out[q] = [r for r in rows if r["vec_id"] != q][:K]
        return _approx_frame_from_single_query(spark, out)

    for nprobe in (1, 2, 4, 8):
        record_q("IVFADC (raw books)",
                 f"m=8 ks=16 shortlist=64 nprobe={nprobe}",
                 from_index_runner(pq_ivf_topk_from_index, raw_books, nprobe))
    for nprobe in (1, 2, 4, 8):
        record_q("residual IVFPQ",
                 f"m=8 ks=16 shortlist=64 nprobe={nprobe}",
                 from_index_runner(ivfpq_topk_from_index, res_books, nprobe))

    # -- corpus-PROPORTIONAL defaults (VERDICT r11 #2): omit the knobs
    # entirely — the from-index paths resolve shortlist = ceil(n/8)
    # (floor 64) from parquet footers and nprobe = ceil(0.4·cells) from
    # the codebook sidecar. The column RECALL.md reads for flatness
    # across scales.
    from kinesis_iterator_spark.queries.quantization import (
        pq_topk_from_index,
        proportional_nprobe,
        proportional_shortlist,
    )
    from kinesis_iterator_spark.queries.similarity import read_ann_codebook

    n_cells = len(read_ann_codebook(idx))
    sl = proportional_shortlist(n, K + 1)
    np_ = proportional_nprobe(n_cells)

    def default_runner(fn, books, with_probe: bool):
        out = {}
        for q in qids:
            kw = {"topk": K + 1, "books": books}
            rows = fn(spark, idx, emb, qvecs[q], **kw).collect()
            out[q] = [r for r in rows if r["vec_id"] != q][:K]
        return _approx_frame_from_single_query(spark, out)

    record_q("PQ-ADC", f"proportional defaults (shortlist={sl})",
             default_runner(pq_topk_from_index, raw_books, False))
    record_q("IVFADC (raw books)",
             f"proportional defaults (shortlist={sl} nprobe={np_})",
             default_runner(pq_ivf_topk_from_index, raw_books, True))
    record_q("residual IVFPQ",
             f"proportional defaults (shortlist={sl} nprobe={np_})",
             default_runner(ivfpq_topk_from_index, res_books, True))

    # -- corpus-PROPORTIONAL CELLS (round 12): the same stored-index
    # read paths over an index whose coarse codebook was TRAINED at
    # ⌈√n⌉ cells (`proportional_train_k` — the EmbeddingWriter
    # train_k=None default) instead of the 10 frozen label-mean cells.
    # With the cell-proportional nprobe riding on top, the probed
    # corpus FRACTION stays ~constant while cells get finer — the
    # finding-#5 ceiling (cell-coverage-bound at a frozen geometry)
    # lifts with the corpus.
    from kinesis_iterator_spark.queries.clustering import (
        codebook_rows,
        kmeans_embeddings,
        proportional_train_k,
    )

    kp = proportional_train_k(n)
    tmp_roots.append(tempfile.mkdtemp(prefix="recall_idx_prop_"))
    idx2 = tmp_roots[-1] + "/ann"
    cb = kmeans_embeddings(spark, emb, k=kp, iters=2, init="kmeans_par")
    release_persists()
    write_ann_index(spark, sf_dir, idx2, codebook=codebook_rows(cb))
    write_pq_layer(spark, idx2, emb, iters=2)
    write_ivfpq_layer(spark, idx2, emb, iters=2)
    release_persists()
    raw2 = read_pq_books(idx2)
    res2 = read_ivfpq_books(idx2)
    n_cells2 = len(read_ann_codebook(idx2))
    np2 = proportional_nprobe(n_cells2)

    def default_runner2(fn, books):
        out = {}
        for q in qids:
            rows = fn(
                spark, idx2, emb, qvecs[q], topk=K + 1, books=books
            ).collect()
            out[q] = [r for r in rows if r["vec_id"] != q][:K]
        return _approx_frame_from_single_query(spark, out)

    record_q("IVFADC (raw books)",
             f"proportional cells (k={kp}->cells={n_cells2} "
             f"shortlist={sl} nprobe={np2})",
             default_runner2(pq_ivf_topk_from_index, raw2))
    record_q("residual IVFPQ",
             f"proportional cells (k={kp}->cells={n_cells2} "
             f"shortlist={sl} nprobe={np2})",
             default_runner2(ivfpq_topk_from_index, res2))

    exact_q.unpersist()
    exact.unpersist()
    return results


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    from kinesis_iterator_spark.session import get_spark

    spark = get_spark("recall_sweep")
    all_results = []
    for sf_dir in sf_dirs:
        all_results.extend(sweep(spark, sf_dir))

    print("\n## Recall table (markdown)\n")
    print("| scale | n | path | params | k | queries | micro recall | macro recall |")
    print("|---|---|---|---|---|---|---|---|")
    for r in all_results:
        sf = r["sf_dir"].rstrip("/").split("/")[-1]
        print(
            f"| {sf} | {r['n']} | {r['path']} | {r['params']} | {r['k']} "
            f"| {r['n_queries']} | {r['micro_recall']:.3f} "
            f"| {r['macro_recall']:.3f} |"
        )


if __name__ == "__main__":
    main()
