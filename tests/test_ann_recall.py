"""Recall evaluation harness (`similarity.ann_recall` /
`ann_recall_summary`): pinned against a Python-side reference computed
from the collected top-k frames (both are queries×k rows — driver-sized
by construction), plus identity / disjoint / k-cut / guard properties."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.similarity import (
    ann_recall,
    ann_recall_summary,
    similarity_bruteforce_topk,
    similarity_lsh_topk,
)


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    exact = similarity_bruteforce_topk(spark, sf_dir).persist()
    approx = similarity_lsh_topk(spark, sf_dir).persist()
    exact.count(), approx.count()
    yield exact, approx
    exact.unpersist(), approx.unpersist()


def _ref(exact_rows, approx_rows, k):
    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact_rows:
        if r["rnk"] <= k:
            ex[r["query_id"]].add(r["neighbor_id"])
    for r in approx_rows:
        if r["rnk"] <= k:
            ap[r["query_id"]].add(r["neighbor_id"])
    return {
        q: (len(ns), len(ns & ap[q]), len(ns & ap[q]) / len(ns))
        for q, ns in ex.items()
    }


def test_recall_matches_python_reference(frames):
    exact, approx = frames
    want = _ref(exact.collect(), approx.collect(), 5)
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in ann_recall(exact, approx, 5).collect()
    }
    assert got == want and len(got) > 0


def test_recall_of_exact_against_itself_is_one(frames):
    exact, _ = frames
    per = ann_recall(exact, exact, 5)
    assert per.filter(F.col("recall") != 1.0).count() == 0
    s = ann_recall_summary(exact, exact, 5).collect()[0]
    assert s["micro_recall"] == 1.0 and s["macro_recall"] == 1.0
    assert s["n_hit"] == s["n_exact"] > 0


def test_disjoint_approx_scores_zero(frames):
    exact, _ = frames
    shifted = exact.withColumn(
        "neighbor_id", F.col("neighbor_id") + F.lit(10_000_000)
    )
    s = ann_recall_summary(exact, shifted, 5).collect()[0]
    assert s["n_hit"] == 0 and s["micro_recall"] == 0.0


def test_k_cut_applies_to_both_sides(frames):
    """At k=1 only each side's rank-1 row counts — pinned against the
    reference at that depth (a deeper frame must not inflate recall)."""
    exact, approx = frames
    want = _ref(exact.collect(), approx.collect(), 1)
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in ann_recall(exact, approx, 1).collect()
    }
    assert got == want


def test_summary_micro_macro_consistency(frames):
    exact, approx = frames
    per = ann_recall(exact, approx, 5).collect()
    s = ann_recall_summary(exact, approx, 5).collect()[0]
    assert s["n_queries"] == len(per)
    assert s["n_exact"] == sum(r["n_exact"] for r in per)
    assert s["n_hit"] == sum(r["n_hit"] for r in per)
    assert s["micro_recall"] == s["n_hit"] / s["n_exact"]
    assert abs(s["macro_recall"] - sum(r["recall"] for r in per) / len(per)) < 1e-12


def test_k_guard(frames):
    exact, approx = frames
    with pytest.raises(ValueError, match="k must be"):
        ann_recall(exact, approx, 0)
