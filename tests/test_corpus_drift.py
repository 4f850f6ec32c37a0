"""Corpus drift monitor (`text.corpus_drift`): KL(new‖ref) and total
variation over add-1-smoothed hashed-unigram histograms, exact-integer
fixed-point — pinned bit-identical to the DuckDB derivation at sf0.001
AND sf0.01, zero-on-identical-inputs exactness, cross-language
monotonicity, partitioning invariance, guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.text import (
    corpus_drift,
    corpus_drift_oracle,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
B = 256


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_matches_oracle(spark, sf_dir):
    doc = _docs(spark, sf_dir)
    got = corpus_drift(
        spark,
        doc.filter(F.col("doc_id") % 2 == 0),
        doc.filter(F.col("doc_id") % 2 == 1),
        n_buckets=B,
    ).collect()
    want = (
        _con(sf_dir)
        .execute(
            corpus_drift_oracle(
                "SELECT text FROM documents WHERE doc_id % 2 = 0",
                "SELECT text FROM documents WHERE doc_id % 2 = 1",
                n_buckets=B,
            )
        )
        .fetchall()
    )
    assert [tuple(r) for r in got] == want and len(got) == 1
    row = got[0]
    assert row["kl_fix"] >= 0 and 0 <= row["tv_fix"] <= 1_000_000


def test_identical_corpora_drift_exactly_zero(spark, sf_dir):
    doc = _docs(spark, sf_dir)
    row = corpus_drift(spark, doc, doc, n_buckets=B).collect()[0]
    assert row["kl_fix"] == 0 and row["tv_fix"] == 0
    assert row["kl"] == 0.0 and row["tv"] == 0.0
    assert row["ref_tokens"] == row["new_tokens"] > 0


def test_cross_language_drift_exceeds_random_split(spark, sf_dir):
    """A language slice measured against a DIFFERENT language's slice
    must drift more than two random halves of the same mixture — the
    signal the monitor exists to raise."""
    doc = _docs(spark, sf_dir)
    langs = [
        r["lang"]
        for r in doc.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "lang")
        .limit(2)
        .collect()
    ]
    a = doc.filter(F.col("lang") == langs[0])
    b = doc.filter(F.col("lang") == langs[1])
    cross = corpus_drift(spark, a, b, n_buckets=B).collect()[0]
    halves = corpus_drift(
        spark,
        doc.filter(F.col("doc_id") % 2 == 0),
        doc.filter(F.col("doc_id") % 2 == 1),
        n_buckets=B,
    ).collect()[0]
    assert cross["kl_fix"] > halves["kl_fix"] >= 0
    assert cross["tv_fix"] > halves["tv_fix"] >= 0


def test_partitioning_invariance(spark, sf_dir):
    doc = _docs(spark, sf_dir)
    a = doc.filter(F.col("doc_id") % 2 == 0)
    b = doc.filter(F.col("doc_id") % 2 == 1)
    one = corpus_drift(spark, a, b, n_buckets=B).collect()
    other = corpus_drift(
        spark, a.repartition(7), b.repartition(3), n_buckets=B
    ).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in other]


def test_guard(spark, sf_dir):
    doc = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="n_buckets"):
        corpus_drift(spark, doc, doc, n_buckets=0)
