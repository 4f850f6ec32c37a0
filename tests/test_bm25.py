"""BM25 retrieval (`queries/retrieval.py`) pinned bit-identical
against the DuckDB oracle at sf0.001 AND sf0.01 (fixed-point scores,
decimal/int128 intermediates), plus top-k determinism, partitioning
invariance, match-only semantics, and parameter guards."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_iterator_spark.queries.retrieval import (
    bm25_oracle_sql,
    bm25_scores,
    bm25_topk,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def _query_terms(con) -> tuple[list[str], int, dict[str, int]]:
    """Deterministic mixed-frequency query: the most common term (df
    above N/2 — NEGATIVE idf territory) plus the four rarest terms
    with df >= 2 (positive idf), so both idf signs and real tf
    variation are exercised. Returns (terms, n_docs, df_by_term)."""
    rows = con.execute(
        "SELECT term, df FROM ("
        "  SELECT term, COUNT(DISTINCT doc_id) AS df FROM ("
        "    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term"
        "    FROM documents) GROUP BY term)"
        " WHERE df >= 2 ORDER BY df DESC, term"
    ).fetchall()
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    terms = [rows[0][0], *[t for t, _ in rows[-4:]]]
    return terms, n_docs, dict(rows)


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_bm25_matches_duckdb_oracle(spark, sf_dir2):
    con = _con(sf_dir2)
    terms, n_docs, df = _query_terms(con)
    doc = load_table(spark, sf_dir2, "documents")
    got = sorted(tuple(r) for r in bm25_scores(doc, terms).collect())
    want = sorted(
        tuple(r) for r in con.execute(bm25_oracle_sql(terms)).fetchall()
    )
    assert got == want and len(got) > 0
    # Both idf signs actually exercised by the chosen terms.
    signs = {df[t] * 2 > n_docs for t in terms}
    assert signs == {True, False}


def test_bm25_topk_matches_oracle_order(spark, sf_dir):
    con = _con(sf_dir)
    terms, _, _ = _query_terms(con)
    doc = load_table(spark, sf_dir, "documents")
    got = [tuple(r) for r in bm25_topk(doc, terms, topk=7).collect()]
    want = con.execute(
        bm25_oracle_sql(terms)
        + " ORDER BY bm25_fix DESC, doc_id LIMIT 7"
    ).fetchall()
    assert got == [tuple(r) for r in want] and len(got) == 7


def test_bm25_partitioning_invariant(spark, sf_dir):
    con = _con(sf_dir)
    terms, _, _ = _query_terms(con)
    doc = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, bm25_scores(doc.repartition(7), terms).collect()))
    b = sorted(map(tuple, bm25_scores(doc.coalesce(1), terms).collect()))
    assert a == b


def test_bm25_match_only_semantics(spark, sf_dir):
    """Retrieval returns exactly the documents containing >= 1 query
    term; a never-occurring term contributes nothing."""
    from pyspark.sql import functions as F

    con = _con(sf_dir)
    terms = _query_terms(con)[0][1:3]
    doc = load_table(spark, sf_dir, "documents")
    scored = {r["doc_id"] for r in bm25_scores(doc, terms).collect()}
    matching = {
        r["doc_id"]
        for r in doc.select(
            "doc_id", F.explode(F.split("text", " ")).alias("t")
        )
        .filter(F.col("t").isin(terms))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert scored == matching
    with_ghost = sorted(
        map(tuple, bm25_scores(doc, [*terms, "zz_never_a_term"]).collect())
    )
    without = sorted(map(tuple, bm25_scores(doc, terms).collect()))
    assert with_ghost == without


def test_bm25_guards(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(doc, [])
    with pytest.raises(ValueError, match="rational"):
        bm25_scores(doc, ["x"], b=(5, 4))
    with pytest.raises(ValueError, match="topk"):
        bm25_topk(doc, ["x"], topk=0)
