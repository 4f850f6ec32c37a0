"""Recall under reconcile-growth, end-to-end (VERDICT r12 #6): admit a
4x growth onto a bootstrap store in LABEL-SKEWED batches (so the cell
histogram actually drifts), with `EmbeddingWriter(drift_reconcile=True)`
retraining the coarse codebook when the monitor trips — then measure
recall@10 of the stored-layer serving path (`writer.pq_topk`) against
exact cosine over the grown store, side-by-side with a CONTROL writer
that keeps the frozen bootstrap geometry. The row RECALL.md's round-13
section records; the floor pin lives in tests/test_ann_recall.py.

Usage: python tools/recall_reconcile.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10


def reconcile_growth_recall(
    spark, sf_dir: str, n_queries: int = 24, root: str | None = None
) -> dict:
    """Run the growth scenario; returns
    {"reconciles", "recall_reconciled", "recall_control",
    "cells_reconciled", "cells_control"}."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import EmbeddingWriter
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.similarity import (
        ann_recall_summary,
        read_ann_codebook,
        similarity_bruteforce_topk,
    )
    from kinesis_iterator_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = sorted(
        r["label"] for r in emb.select("label").distinct().collect()
    )
    # Bootstrap = first quarter of the label range; three growth
    # batches sweep the remaining labels — each batch's cell mixture
    # differs sharply from the store's, so the drift monitor trips.
    q = max(1, len(labels) // 4)
    groups = [labels[:q], labels[q : 2 * q], labels[2 * q : 3 * q],
              labels[3 * q :]]
    own_root = root is None
    if own_root:
        root = tempfile.mkdtemp(prefix="recall_reconcile_")
    out: dict = {}
    try:
        writers = {}
        for name, reconcile in (("reconciled", True), ("control", False)):
            w = EmbeddingWriter(
                spark,
                f"{root}/{name}/store",
                f"{root}/{name}/ann",
                pq_layer=True,
                pq_ks=16,
                pq_iters=2,
                # The r12 proportional geometry (train_k=None -> ceil
                # sqrt(n) k-means cells) — the path whose reconcile
                # story this measures. A label-mean codebook would
                # confound the comparison: the skewed bootstrap sees a
                # fraction of the labels, so the control would serve
                # from a couple of giant cells.
                train_codebook=True,
                train_iters=2,
                drift_monitor=reconcile,
                drift_warn=(1, 1) if reconcile else None,
                drift_reconcile=reconcile,
            )
            n_rec = 0
            for g in groups:
                s = w.admit(emb.filter(F.col("label").isin([int(x) for x in g])))
                n_rec += s.get("drift_reconciled", 0)
            writers[name] = w
            if reconcile:
                out["reconciles"] = n_rec
        # Exact baseline over the GROWN store: fixture-wide brute-force
        # self-kNN restricted to stored ids on both sides (near-dup
        # rejects are absent from the store and must not count as
        # misses), and to the probe queries (the subset rule RECALL.md
        # round 11 pinned).
        store_ids = writers["reconciled"].store().select(
            F.col("vec_id").alias("query_id")
        )
        qids = [
            int(r["query_id"])
            for r in store_ids.orderBy("query_id").collect()
        ]
        step = max(1, len(qids) // n_queries)
        probe = qids[::step][:n_queries]
        exact = (
            similarity_bruteforce_topk(spark, sf_dir)
            .filter(F.col("query_id").isin(probe))
            .join(
                store_ids.select(
                    F.col("query_id").alias("neighbor_id")
                ),
                "neighbor_id",
                "leftsemi",
            )
            .persist()
        )
        exact.count()
        release_persists()
        qvec = {
            int(r["vec_id"]): [float(v) for v in r["embedding"]]
            for r in emb.filter(F.col("vec_id").isin(probe)).collect()
        }
        for name, w in writers.items():
            rows_by_q = {}
            for qid in probe:
                rows = w.pq_topk(qvec[qid], topk=K + 1).collect()
                rows_by_q[qid] = [
                    r for r in rows if int(r["vec_id"]) != qid
                ][:K]
            approx = spark.createDataFrame(
                [
                    (q, int(r["vec_id"]))
                    for q, rows in rows_by_q.items()
                    for r in rows
                ],
                "query_id long, neighbor_id long",
            )
            s = ann_recall_summary(exact, approx, k=K).collect()[0]
            out[f"recall_{name}"] = round(float(s["micro_recall"]), 3)
            out[f"cells_{name}"] = len(
                read_ann_codebook(f"{root}/{name}/ann")
            )
        exact.unpersist()
        return out
    finally:
        if own_root:
            shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from kinesis_iterator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("recall_reconcile")
    res = reconcile_growth_recall(spark, sf_dir, nq)
    print(json.dumps({"sf_dir": sf_dir, "k": K, **res}))


if __name__ == "__main__":
    main()
