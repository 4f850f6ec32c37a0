"""DSIR importance-resampling data selection (Xie et al., NeurIPS 2023)
pinned against the shipped DuckDB oracle generators over the fixture
`documents` table at BOTH sf0.001 and sf0.01.

Pool = the full documents table; target = its English slice — a
deterministic, SQL-expressible rule applied identically on both engines
(no synthesized fixture data). The central claim under test is the
fixed-point discipline: per-document reductions are exact integer
arithmetic, so Spark's parallel aggregation and DuckDB's sequential one
are bit-identical (a raw double sum would differ on reduction order)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.text import (
    DSIR_BUCKETS,
    dsir_select,
    dsir_select_oracle,
    dsir_weights,
    dsir_weights_oracle,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

POOL_SQL = "SELECT doc_id, text FROM documents"
TARGET_SQL = "SELECT text FROM documents WHERE lang = 'en'"
KEEP = 50


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _frames(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    pool = doc.select("doc_id", "text")
    target = doc.filter(F.col("lang") == "en").select("text")
    return pool, target


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_dsir_weights_matches_duckdb_oracle(spark, sf_dir2):
    pool, target = _frames(spark, sf_dir2)
    got = _rows(dsir_weights(pool, target))
    sql = dsir_weights_oracle(POOL_SQL, TARGET_SQL)
    want = sorted(tuple(r) for r in _con(sf_dir2).execute(sql).fetchall())
    assert got == want
    # Every pool document is scored exactly once.
    assert len(got) == pool.count()
    # w_fix is the exact fixed-point twin of logweight (bit-identity is
    # what makes the cross-engine comparison above meaningful).
    from kinesis_iterator_spark.queries.text import DSIR_FIX

    assert all(lw == wf / DSIR_FIX for _, _, lw, wf in got)


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_dsir_select_matches_duckdb_oracle(spark, sf_dir2):
    pool, target = _frames(spark, sf_dir2)
    got = _rows(dsir_select(pool, target, keep=KEEP, seed=7))
    sql = dsir_select_oracle(POOL_SQL, TARGET_SQL, keep=KEEP, seed=7)
    want = sorted(tuple(r) for r in _con(sf_dir2).execute(sql).fetchall())
    assert got == want
    assert len(got) == KEEP
    assert sorted(r[-1] for r in got) == list(range(1, KEEP + 1))


def test_dsir_target_slice_scores_higher(spark, sf_dir):
    """Behavioral sanity: pool documents IN the English target slice
    must average a higher importance weight than the rest — the whole
    point of DSIR is to upweight target-looking documents."""
    doc = load_table(spark, sf_dir, "documents")
    pool, target = _frames(spark, sf_dir)
    w = dsir_weights(pool, target).join(
        doc.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["grp"]: r["m"]
        for r in w.groupBy(
            (F.col("lang") == "en").alias("grp")
        )
        .agg(F.avg("logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_dsir_select_is_partitioning_invariant(spark, sf_dir):
    """Selection is a pure function of the corpus: any repartitioning of
    the pool yields the identical keyed ranking (the fixed-point integer
    reduction is order-independent, and the Gumbel key is a hash of
    (doc_id, seed) only)."""
    pool, target = _frames(spark, sf_dir)
    base = _rows(dsir_select(pool, target, keep=KEEP, seed=3))
    for n in (1, 7):
        again = _rows(
            dsir_select(pool.repartition(n), target, keep=KEEP, seed=3)
        )
        assert again == base


def test_dsir_seed_changes_selection_not_weights(spark, sf_dir):
    """The Gumbel draw (seed) perturbs WHICH documents are kept, never
    their importance weights; different seeds must disagree somewhere
    (keep << pool so a collision-free draw is astronomically unlikely
    to reproduce the same top-k order)."""
    pool, target = _frames(spark, sf_dir)
    a = dsir_select(pool, target, keep=KEEP, seed=0)
    b = dsir_select(pool, target, keep=KEEP, seed=1)
    wa = {r[0]: (r[1], r[2]) for r in _rows(a)}
    wb = {r[0]: (r[1], r[2]) for r in _rows(b)}
    shared = set(wa) & set(wb)
    assert shared, "two draws of 50/500 docs should overlap somewhere"
    for d in shared:
        assert wa[d] == wb[d]
    assert _rows(a.select("doc_id")) != _rows(b.select("doc_id"))


def test_dsir_buckets_default_is_power_of_two(spark, sf_dir):
    """Pin the published-config shape: hashed-unigram DSIR uses a
    power-of-two bucket count and a non-trivial number of buckets."""
    assert DSIR_BUCKETS >= 256 and (DSIR_BUCKETS & (DSIR_BUCKETS - 1)) == 0
