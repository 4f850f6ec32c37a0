"""Fixed-point Lloyd's k-means (`queries/clustering.py`) pinned
bit-identical against the unrolled-CTE DuckDB oracle at sf0.001 AND
sf0.01, plus partitioning invariance, the nearest-final-centroid
assignment invariant, the Lloyd's objective non-increase, and
empty-cluster drop semantics on a duplicate-collapsed derived frame."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.clustering import (
    _dists_int,
    _quantize,
    kmeans_embeddings,
    kmeans_oracle_sqls,
    kmeans_sse,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
K, ITERS = 8, 4


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_kmeans_matches_duckdb_oracle(spark, sf_dir2):
    emb = load_table(spark, sf_dir2, "embeddings")
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    assign_sql, cent_sql = kmeans_oracle_sqls(K, ITERS)
    con = _con(sf_dir2)

    got_assign = sorted(tuple(r) for r in res.assignment.collect())
    want_assign = sorted(tuple(r) for r in con.execute(assign_sql).fetchall())
    assert got_assign == want_assign

    got_cent = sorted(
        (cl, dim, int(res.centroids[j, dim]))
        for j, cl in enumerate(res.clusters)
        for dim in range(res.centroids.shape[1])
    )
    want_cent = sorted(tuple(r) for r in con.execute(cent_sql).fetchall())
    assert got_cent == want_cent
    # Real clustering happened: more than one surviving cluster, and
    # assignments actually use several of them.
    assert len(res.clusters) > 1
    assert len({cl for _, cl in got_assign}) == len(res.clusters)


def test_kmeans_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_embeddings(spark, emb.repartition(7), k=K, iters=ITERS)
    b = kmeans_embeddings(spark, emb.repartition(2), k=K, iters=ITERS)
    assert a.clusters == b.clusters
    assert np.array_equal(a.centroids, b.centroids)
    assert sorted(map(tuple, a.assignment.collect())) == sorted(
        map(tuple, b.assignment.collect())
    )


def test_kmeans_assignment_is_nearest_final_centroid(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    rows = emb.select("vec_id", "embedding").collect()
    X = _quantize(
        np.array([r["embedding"] for r in rows], dtype=np.float32)
    )
    idx = np.argmin(_dists_int(X, res.centroids), axis=1)
    want = {
        r["vec_id"]: int(np.asarray(res.clusters)[i])
        for r, i in zip(rows, idx)
    }
    got = {r["vec_id"]: r["cluster"] for r in res.assignment.collect()}
    assert got == want


def test_kmeans_objective_non_increasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    init_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(K).collect()
    )
    C0 = _quantize(
        np.array([r["embedding"] for r in init_rows], dtype=np.float32)
    )
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    sse0 = kmeans_sse(emb, list(range(K)), C0)
    sse1 = kmeans_sse(emb, res.clusters, res.centroids)
    assert sse1 <= sse0
    assert sse1 > 0  # fixture vectors aren't all centroid-identical


# -- deterministic k-means|| seeding (init="kmeans_par") ----------------


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
@pytest.mark.slow
def test_kmeans_par_matches_duckdb_oracle(spark, sf_dir2):
    """The hashed-oversampling seeding chain is as oracle-exact as the
    Lloyd rounds: assignment AND centroids bit-identical with the
    k-means|| CTEs spliced in place of the min-id init."""
    emb = load_table(spark, sf_dir2, "embeddings")
    res = kmeans_embeddings(spark, emb, k=K, iters=ITERS, init="kmeans_par")
    assign_sql, cent_sql = kmeans_oracle_sqls(K, ITERS, init="kmeans_par")
    con = _con(sf_dir2)
    got_assign = sorted(tuple(r) for r in res.assignment.collect())
    want_assign = sorted(tuple(r) for r in con.execute(assign_sql).fetchall())
    assert got_assign == want_assign
    got_cent = sorted(
        (cl, dim, int(res.centroids[j, dim]))
        for j, cl in enumerate(res.clusters)
        for dim in range(res.centroids.shape[1])
    )
    want_cent = sorted(tuple(r) for r in con.execute(cent_sql).fetchall())
    assert got_cent == want_cent
    assert len(res.clusters) > 1


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_kmeans_par_objective_not_worse_than_min_id(spark, sf_dir2):
    """The seeding earns its cost: after the same Lloyd budget, the
    k-means|| init never scores a WORSE objective than the degenerate
    min-id init (the VERDICT r9 #5 'done' pin; measured strictly better
    at both fixture scales when added)."""
    from kinesis_iterator_spark.queries import release_persists

    emb = load_table(spark, sf_dir2, "embeddings")
    r_min = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    sse_min = kmeans_sse(emb, r_min.clusters, r_min.centroids)
    release_persists()
    r_par = kmeans_embeddings(spark, emb, k=K, iters=ITERS, init="kmeans_par")
    sse_par = kmeans_sse(emb, r_par.clusters, r_par.centroids)
    assert 0 < sse_par <= sse_min


def test_kmeans_par_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_embeddings(
        spark, emb.repartition(7), k=K, iters=ITERS, init="kmeans_par"
    )
    b = kmeans_embeddings(
        spark, emb.repartition(2), k=K, iters=ITERS, init="kmeans_par"
    )
    assert a.clusters == b.clusters
    assert np.array_equal(a.centroids, b.centroids)
    assert sorted(map(tuple, a.assignment.collect())) == sorted(
        map(tuple, b.assignment.collect())
    )


def test_kmeans_unknown_init_raises(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="unknown init"):
        kmeans_embeddings(spark, emb, k=K, iters=1, init="random")


# -- cluster-balanced mixture: learned clusters as recipe domains -------


def _doc_with_tokens(spark, sf_dir):
    from kinesis_iterator_spark.queries.text import quality_signal_columns

    doc = load_table(spark, sf_dir, "documents")
    sig = quality_signal_columns()
    return doc.select(
        "doc_id", "source", sig["bpe_ish_tokens"].alias("tokens")
    )


def test_cluster_balanced_mixture_balances_tokens(spark, sf_dir):
    """Each surviving cluster's realized tokens land between the
    floor- and ceil-epoch bounds of an EQUAL share of the budget —
    the only slack is one Bernoulli copy per document."""
    import math

    from kinesis_iterator_spark.pipeline import (
        cluster_balanced_mixture,
        mixture_rates,
    )
    from kinesis_iterator_spark.queries import release_persists

    doc = _doc_with_tokens(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    budget = 30_000
    out = cluster_balanced_mixture(spark, doc, emb, budget, k=K, iters=2)
    realized = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("tokens").alias("t")).collect()
    }
    # Recompute the domain frame the composition built to derive the
    # exact per-cluster rates it must have used.
    res = kmeans_embeddings(spark, emb, k=K, iters=2)
    domains = (
        doc.drop("source")
        .join(res.assignment.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .withColumn(
            "source",
            F.concat(F.lit("cluster_"), F.col("cluster").cast("string")),
        )
    )
    weights = {f"cluster_{c}": 1.0 for c in res.clusters}
    rates = mixture_rates(domains, weights, budget)
    totals = {
        r["source"]: r["t"]
        for r in domains.groupBy("source")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    }
    assert set(realized) <= set(weights) and len(realized) > 1
    for s, rate in rates.items():
        lo = math.floor(rate) * totals[s]
        hi = math.ceil(rate) * totals[s]
        assert lo <= realized.get(s, 0) <= hi, (s, rate)
    release_persists()


def test_cluster_balanced_mixture_equals_manual_composition(spark, sf_dir):
    """The convenience op is EXACTLY kmeans → label → build_mixture —
    same rows, same epochs, at a different input partitioning (the
    whole chain is a pure function of the corpus)."""
    from kinesis_iterator_spark.pipeline import (
        build_mixture,
        cluster_balanced_mixture,
    )
    from kinesis_iterator_spark.queries import release_persists

    doc = _doc_with_tokens(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    got = cluster_balanced_mixture(
        spark, doc.repartition(5), emb.repartition(3), 20_000, k=5,
        iters=2, seed=7,
    )
    res = kmeans_embeddings(spark, emb, k=5, iters=2)
    domains = (
        doc.drop("source")
        .join(res.assignment.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .withColumn(
            "source",
            F.concat(F.lit("cluster_"), F.col("cluster").cast("string")),
        )
    )
    want = build_mixture(
        domains, {f"cluster_{c}": 1.0 for c in res.clusters}, 20_000, seed=7
    )
    key = ["doc_id", "source", "cluster", "epoch", "tokens"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )
    release_persists()


def test_cluster_balanced_mixture_unknown_cluster_raises(spark, sf_dir):
    from kinesis_iterator_spark.pipeline import cluster_balanced_mixture
    from kinesis_iterator_spark.queries import release_persists

    doc = _doc_with_tokens(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="non-surviving"):
        cluster_balanced_mixture(
            spark, doc, emb, 10_000, k=4, iters=1,
            cluster_weights={0: 1.0, 99: 1.0},
        )
    release_persists()


def test_kmeans_duplicate_points_drop_empty_clusters(spark, sf_dir):
    # Collapse the first 9 vectors onto 3 distinct embeddings
    # (vec_id % 3 picks the payload) and ask for k=5: the init seeds 5
    # centroids on ≤3 distinct points, so Lloyd's must DROP the starved
    # clusters and converge to exactly one cluster per distinct point,
    # with duplicates co-assigned.
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 9).select("vec_id")
    payload = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("pid"), "embedding"
    )
    derived = base.withColumn("pid", F.col("vec_id") % 3).join(
        payload, "pid"
    ).select("vec_id", "embedding")
    res = kmeans_embeddings(spark, derived, k=5, iters=3)
    assert len(res.clusters) == 3
    got = {r["vec_id"]: r["cluster"] for r in res.assignment.collect()}
    assert len(got) == 9
    for v in range(9):
        assert got[v] == got[v % 3]
    assert kmeans_sse(derived, res.clusters, res.centroids) == 0


def test_kmeans_distributed_partial_sum_path_identical(spark, sf_dir):
    # ADVICE r17: the distributed else-branch of the Lloyd update's
    # cross-partition reduction (groupBy(cl, dim) F.sum) must produce
    # centroids/assignment identical to the driver-sum fast path. At
    # fixture scale k*d*n_part stays far below DRIVER_SUM_MAX_ROWS, so
    # only this forced run exercises the branch (the DRIVER_CC_MAX_EDGES
    # test pattern).
    from kinesis_iterator_spark.queries import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    fast = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
    fast_assign = sorted(tuple(r) for r in fast.assignment.collect())
    orig = C.DRIVER_SUM_MAX_ROWS
    C.DRIVER_SUM_MAX_ROWS = -1
    try:
        dist = kmeans_embeddings(spark, emb, k=K, iters=ITERS)
        dist_assign = sorted(tuple(r) for r in dist.assignment.collect())
    finally:
        C.DRIVER_SUM_MAX_ROWS = orig
    assert dist.clusters == fast.clusters
    assert (dist.centroids == fast.centroids).all()
    assert dist_assign == fast_assign
