"""Connected components / union-find survivors (queries/graph.py) —
pinned against a pure-Python union-find oracle (the op is iterative,
hence the pytest pin instead of a single-SQL DuckDB oracle; SURVEY §5.2
class). Covers the high-diameter chain case that defeats plain min-label
propagation in O(diameter) rounds, the greedy-rule counterexample from
VERDICT r3 #5, and the real embedding near-dup edge set at sf0.001."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.graph import (
    connected_components,
    dedup_survivors,
    label_corpus,
)


def _uf_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python union-find: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@contextmanager
def _forced_distributed():
    """Disable the driver union-find fast path so a test exercises the
    star-round machinery regardless of edge count."""
    from kinesis_iterator_spark.queries import graph as G

    orig = G.DRIVER_CC_MAX_EDGES
    G.DRIVER_CC_MAX_EDGES = -1
    try:
        yield
    finally:
        G.DRIVER_CC_MAX_EDGES = orig


def _check(spark, edges: list[tuple[int, int]]) -> None:
    # Both execution paths (driver union-find fast path for small edge
    # sets, distributed star rounds) must produce the identical
    # min-label output.
    df = spark.createDataFrame(edges, "src long, dst long")
    want = set(_uf_oracle(edges).items())
    got_fast = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    assert got_fast == want
    with _forced_distributed():
        got_dist = {
            (r["node"], r["component"])
            for r in connected_components(df).collect()
        }
    assert got_dist == want


def test_cc_matches_union_find_on_mixed_graph(spark):
    _check(
        spark,
        [
            (1, 2), (2, 3),          # triangle-free chain component → 1
            (10, 11), (11, 10),      # duplicate/reversed edges
            (20, 20), (20, 21),      # self-loop ignored, pair → 20
            (30, 31), (31, 32), (30, 32),  # triangle → 30
        ],
    )


def test_cc_high_diameter_chain_converges_in_log_rounds(spark):
    # A 64-node chain has diameter 63: min-label propagation needs 63
    # join rounds, large-star/small-star needs O(log 64). MAX_ROUNDS
    # would trip long before 63 sequential Spark rounds finished if the
    # implementation were propagation-shaped.
    _check(spark, [(i, i + 1) for i in range(64)])


def test_cc_two_components_star_and_chain(spark):
    edges = [(100, 5), (100, 6), (100, 7), (1, 2), (2, 3), (3, 4)]
    _check(spark, edges)


def test_survivors_fix_greedy_chain_overkeep(spark):
    # VERDICT r3 #5's counterexample: edges a-b, b-c with no a-c edge.
    # Greedy "drop if a smaller-id neighbor exists" keeps {1, 3}; the
    # union-find policy keeps exactly one survivor for the component.
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {
        r["node"]: (r["component"], r["is_survivor"])
        for r in dedup_survivors(df).collect()
    }
    assert out == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_cc_string_ids_label_with_lexicographic_min(spark):
    # The op is generic over orderable id types — string doc keys must
    # work (a long cast previously NULLed them and silently dropped
    # every edge).
    df = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "src string, dst string",
    )
    want = {
        ("doc-a", "doc-a"),
        ("doc-b", "doc-a"),
        ("doc-c", "doc-a"),
        ("doc-x", "doc-x"),
        ("doc-y", "doc-x"),
    }
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    assert got == want
    with _forced_distributed():
        got_dist = {
            (r["node"], r["component"])
            for r in connected_components(df).collect()
        }
    assert got_dist == want


def test_cc_empty_after_self_loop_filter(spark):
    # Only self-loops → empty effective edge set → empty labeling (and
    # no non-convergence error).
    df = spark.createDataFrame([(7, 7), (9, 9)], "src long, dst long")
    assert connected_components(df).collect() == []
    with _forced_distributed():
        assert connected_components(df).collect() == []


def test_cc_random_graph_matches_union_find(spark):
    # Deterministic pseudo-random graph: 300 nodes, 500 edges — enough
    # collisions/cycles/multi-edges to exercise every merge shape.
    import random

    rng = random.Random(20260814)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(500)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_survivors_over_minhash_near_dup_pairs(spark, sf_dir):
    # The op composes across dedup families: feed it the MinHash-LSH
    # verified document pairs (text domain), not just embedding edges.
    from kinesis_iterator_spark.queries.dedup import dedup_minhash_lsh
    from kinesis_iterator_spark.queries import release_persists

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = [(r["src"], r["dst"]) for r in pairs.collect()]
    release_persists()
    if not edges:
        pytest.skip("no near-dup pairs at this scale factor")
    got = {
        r["node"]: r["component"]
        for r in dedup_survivors(pairs).collect()
    }
    assert got == _uf_oracle(edges)


def test_label_corpus_full_coverage_one_survivor_per_component(spark):
    corpus = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    out = label_corpus(corpus, edges, "doc_id").collect()
    assert len(out) == 7  # every corpus row labeled
    comp = {r["doc_id"]: r["component"] for r in out}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
    survivors = {r["doc_id"] for r in out if r["is_survivor"]}
    assert survivors == {1, 4, 5, 7}  # exactly one per component


def test_survivors_on_real_embedding_near_dup_edges(spark, sf_dir):
    # Drive the documented production upgrade end-to-end: the same
    # LSH-blocked + exact-cosine-verified pair generation that backs
    # dedup_embedding_cosine, then union-find survivors over it.
    from kinesis_iterator_spark.queries.dedup import COSINE_TAU
    from kinesis_iterator_spark.queries.similarity import (
        _bits_for,
        _corpus_size,
        _score_pairs_topk,
        lsh_signatures,
    )
    from kinesis_iterator_spark.tables import load_table
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    n = _corpus_size(sf_dir)
    b = _bits_for(n)
    par = spark.sparkContext.defaultParallelism
    sig = lsh_signatures(emb, b, par)
    a = sig.select(F.col("vec_id").alias("query_id"), "table_id", "bucket")
    c = sig.select(F.col("vec_id").alias("neighbor_id"), "table_id", "bucket")
    cand = (
        a.join(c, ["table_id", "bucket"])
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    scored = _score_pairs_topk(cand, emb, par, sf_dir, n)
    edges_df = scored.filter(F.col("cosine") >= COSINE_TAU).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    if not edges:
        pytest.skip("no near-dup edges at this scale factor")

    surv = dedup_survivors(edges_df).collect()
    want = _uf_oracle(edges)
    got = {r["node"]: r["component"] for r in surv}
    assert got == want
    # Exactly one survivor per component, and it is the component min.
    for r in surv:
        assert r["is_survivor"] == (r["node"] == r["component"])


def test_round_checkpoints_released(spark):
    """Every superseded star round's localCheckpoint blocks must be freed
    as soon as the next round materializes, and the final round's via the
    managed-release mechanism — a long chain (many rounds) must leave NO
    extra persistent RDDs behind (ADVICE r6: intermediate edge sets were
    pinned in executor storage until DataFrame GC)."""
    from kinesis_iterator_spark.queries import release_persists

    jsc = spark.sparkContext._jsc.sc()
    release_persists()
    base = jsc.getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(64)]  # 64-node chain, multi-round
    df = spark.createDataFrame(edges, "src long, dst long")
    with _forced_distributed():
        out = connected_components(df).collect()
    assert {r["component"] for r in out} == {0}
    release_persists()
    assert jsc.getPersistentRDDs().size() == base
