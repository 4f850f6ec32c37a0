"""CCNet-style LM-perplexity quality scoring (hashed-bigram add-1 LM
trained on a target frame): DuckDB value-oracle equality at two scales,
partitioning invariance, the trained-on-slice-scores-lower sanity, and
the no-bigram guard.

Library-level (the 50-entry registry is capped) — driver-gate
discipline replicated per the test_scrub_paragraphs pattern.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.text import (
    lm_perplexity,
    lm_perplexity_oracle,
)
from kinesis_iterator_spark.tables import load_table


def _oracle_rows(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return sorted(
        tuple(r) for r in con.execute(lm_perplexity_oracle()).fetchall()
    )


def _spark_rows(spark, doc, target):
    return sorted(
        tuple(r) for r in lm_perplexity(doc, target).collect()
    )


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_lm_perplexity_matches_duckdb_oracle(spark, sf):
    d = load_table(spark, sf, "documents")
    doc = d.select("doc_id", "text")
    target = d.filter(F.col("lang") == "en").select("doc_id", "text")
    assert _spark_rows(spark, doc, target) == _oracle_rows(sf)


def test_lm_perplexity_partitioning_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    doc = d.select("doc_id", "text")
    target = d.filter(F.col("lang") == "en").select("doc_id", "text")
    base = _spark_rows(spark, doc, target)
    assert _spark_rows(spark, doc.repartition(17), target.repartition(3)) == base


def test_lm_perplexity_target_slice_scores_lower(spark, sf_dir):
    """The CCNet premise: documents from the training distribution have
    lower mean NLL than out-of-distribution ones (zh bigrams are unseen
    and pay the smoothing penalty)."""
    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en").select("doc_id", "text")
    scored = lm_perplexity(d.select("doc_id", "text"), target).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["lang"]: r["m"]
        for r in scored.filter("n_bigrams > 0")
        .groupBy("lang")
        .agg(F.avg("nll").alias("m"))
        .collect()
    }
    assert means["en"] < means["zh"]


def test_lm_perplexity_no_bigram_guard(spark):
    """Zero- and one-word documents have no bigrams: n_bigrams = 0 and
    nll = 0.0 (ANSI division guarded), never an error or NULL."""
    doc = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words here")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "two words here again")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_perplexity(doc, target).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["nll"] == 0.0
    assert out[2]["n_bigrams"] == 0 and out[2]["nll"] == 0.0
    assert out[3]["n_bigrams"] == 2 and out[3]["nll"] > 0.0
