"""Model-based quality classifier (CCNet/FineWeb-style linear filter
over hashed-unigram features): DuckDB value-oracle equality at two
scales, fixed-point keep-decision semantics, partitioning invariance,
and the pluggable-weights contract.

Library-level (the 50-entry registry is capped) — the driver-gate
discipline replicated per the test_scrub_paragraphs pattern.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.text import (
    QC_FIX,
    quality_classifier_oracle,
    quality_classifier_score,
    quality_classifier_weights,
)
from kinesis_iterator_spark.tables import load_table


def _oracle_rows(sf_dir: str, **kw):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return sorted(
        tuple(r)
        for r in con.execute(quality_classifier_oracle(**kw)).fetchall()
    )


def _spark_rows(spark, doc, **kw):
    w = quality_classifier_weights(
        spark,
        n_buckets=kw.get("n_buckets", 4096),
        seed=kw.get("seed", 0),
    )
    return sorted(
        tuple(r)
        for r in quality_classifier_score(
            doc,
            w,
            n_buckets=kw.get("n_buckets", 4096),
            threshold=kw.get("threshold", 0.0),
        ).collect()
    )


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_quality_classifier_matches_duckdb_oracle(spark, sf):
    doc = load_table(spark, sf, "documents").select("doc_id", "text")
    got = _spark_rows(spark, doc)
    want = _oracle_rows(sf)
    assert got == want


def test_quality_classifier_threshold_is_integer_exact(spark, sf_dir):
    """keep ⇔ s_fix ≥ round(thr·FIX)·n_words — the float score never
    decides; a nonzero threshold agrees with the oracle bit-for-bit."""
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for thr in (0.001, -0.001):
        got = _spark_rows(spark, doc, threshold=thr)
        want = _oracle_rows(sf_dir, threshold=thr)
        assert got == want
        thr_fix = int(round(thr * QC_FIX))
        for _d, n, s, _score, keep in got:
            assert keep == (s >= thr_fix * n)
    kept = {
        r[0] for r in _spark_rows(spark, doc, threshold=-0.001) if r[4]
    }
    stricter = {
        r[0] for r in _spark_rows(spark, doc, threshold=0.001) if r[4]
    }
    assert stricter <= kept


def test_quality_classifier_partitioning_invariant(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = _spark_rows(spark, doc)
    assert _spark_rows(spark, doc.repartition(13)) == base
    assert _spark_rows(spark, doc.repartition(1)) == base


def test_quality_classifier_pluggable_weights(spark, sf_dir):
    """The weight relation is the plug point: a constant +1 table makes
    s_fix = n_words for every doc (each word contributes exactly one
    fixed-point unit regardless of bucket)."""
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ones = spark.range(64).select(
        F.col("id").alias("b"), F.lit(1).cast("long").alias("w_fix")
    )
    rows = quality_classifier_score(doc, ones, n_buckets=64).collect()
    assert rows and all(r["s_fix"] == r["n_words"] for r in rows)
