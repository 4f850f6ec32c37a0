"""Connected components + union-find survivor selection (`[EXT]`,
VERDICT r3 "Next round" #5: the documented production upgrade of
``dedup_embedding_cosine``'s greedy step 5).

Near-duplicate edges (from MinHash-LSH, SimHash, or embedding-cosine
verification) form clusters; a production dedup keeps ONE survivor per
connected component, not merely "drop anything that has a smaller-id
neighbor" (the greedy rule over-keeps on chains: a-b, b-c with no a-c
edge keeps {a, c} though all three are one near-dup cluster).

The iterative algorithm here is the alternating large-star / small-star
map-reduce formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public literature): each round is two
self-contained DataFrame aggregate+join passes, and the edge set
converges to min-rooted stars in O(log n) rounds REGARDLESS of component
diameter — the property plain min-label propagation lacks (a chain of k
near-dups needs k propagation rounds but only ~log k star rounds). Every
round shuffles on node id only (edges stay 16 bytes), so the op scales
exactly like the candidate joins that feed it.

Driver involvement per round is ONE tiny action (the convergence check
aggregates the edge multiset to two scalars) — no collect of nodes or
edges, so 100 TB-scale edge sets stay distributed end to end. Results
are deterministic for any input (component id = min node id in the
component), hence oracle-friendly; the pytest pin compares against a
pure-Python union-find on the same edges (tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table
from . import managed_checkpoint, query, release_local_checkpoint

# Star rounds are O(log n); 50 rounds covers n ~ 2^50 nodes with margin.
# Hitting the cap raises rather than silently returning a half-merged
# labeling (a wrong dedup would silently drop the wrong documents).
MAX_ROUNDS = 50

# At or below this edge count the star rounds are pure fixed overhead:
# each round is ~3 Spark jobs (two star passes + checkpoint + key), and a
# near-dup edge set this small solves in one bounded driver union-find
# (measured: 2.3-2.7 s of rounds for a 69-edge batch graph → ~0.1 s).
# The collect is BOUNDED — the convergence key already computed the
# exact count, and 200k edges ≈ 3 MB via Arrow — the same size-gated
# dual-path rule as similarity.SMALL_CORPUS_MAX; a 100 TB-scale edge set
# exceeds the gate and stays distributed end to end. Both paths produce
# the identical min-label output (pinned in tests/test_graph.py).
DRIVER_CC_MAX_EDGES = 200_000


def _driver_components(pdf):
    """Min-label union-find over a pandas edge frame (columns u, v).
    Returns (nodes, labels) lists. Union-by-min keeps every root the
    minimum of its tree, so find(x) after all unions IS the component's
    global minimum — the distributed path's labeling exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    us, vs = pdf["u"].tolist(), pdf["v"].tolist()
    for u, v in zip(us, vs):
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    nodes = sorted(set(us) | set(vs))
    return nodes, [find(n) for n in nodes]


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """(u, m) where m = min(Γ(u) ∪ {u}) over the DIRECTED edge list."""
    return edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: connect every strictly-larger neighbor of u to
    min(Γ(u) ∪ {u}). Operates on the symmetrized neighborhood."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = _min_neighbor(sym)
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: connect every ≤-neighbor of u (and u) to the minimum
    of that set. Input edges are first oriented larger→smaller so each
    u's group holds exactly its ≤-neighbors."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = _min_neighbor(directed)
    nbr = directed.join(m, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = m.select("u", F.col("m").alias("v"))
    return (
        nbr.union(self_edge)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = the minimum node id of its connected component.

    ``edges_distinct`` (r18): the caller GUARANTEES the edge rows are
    already distinct with ``src != dst`` on every row — skips the
    defensive filter+distinct (one full exchange of the edge lineage;
    both internal edge generators emit distinct ``doc_a < doc_b`` rows
    by construction). The algorithm is insensitive to duplicates/self
    -edges in VALUE (union-find and the star rounds both absorb them),
    so a wrong claim costs only the work the flag was meant to save —
    but keep it False for arbitrary caller-supplied edges.

    Each round materializes the new edge set with an EAGER
    ``localCheckpoint`` — not a plain persist: persist caches data but
    keeps the full logical plan, so round k's plan nests every previous
    round's and Catalyst re-optimizes a tree that doubles per round
    (measured: round times 8 s → 18 s → minutes by round 3 on a 64-node
    chain). Checkpointing truncates the lineage so every round plans
    against a leaf relation. (At production scale the same call site
    takes ``checkpoint()`` against a reliable checkpoint dir — same
    truncation, executor-loss-safe.) Convergence is a 2-scalar aggregate
    per round (count + commutative checksum of the edge multiset: equal
    sets ⇒ equal stats; a changed round changes them with overwhelming
    probability, and the fixpoint property below makes a late stop free).

    Convergence: large-star/small-star fixpoints are exactly the
    min-rooted star forests, and a star forest maps to itself under both
    operators — so stopping one round late is free and stopping early is
    impossible (a non-fixpoint round changes the edge set)."""
    def _key(df: DataFrame):
        s = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("sig"),
        ).collect()[0]
        return (s["n"], s["sig"])

    # No cast: the algorithm is generic over any orderable id type
    # (min/least/greatest + equality are all it needs — string doc keys
    # label components with their lexicographic minimum). An explicit
    # long cast here silently NULLed non-numeric ids and dropped their
    # edges, turning a wrong input type into an empty "no duplicates"
    # answer instead of an error.
    dedup = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not edges_distinct:
        dedup = dedup.filter(F.col("u") != F.col("v")).distinct()
    if DRIVER_CC_MAX_EDGES > 0:
        # Size-gated driver path as ONE bounded action: collect at most
        # gate+1 distinct edges (limit short-circuits; ≤ ~3 MB Arrow at
        # the 200k gate) — if everything fit, solve driver-side without
        # ever checkpointing. The previous shape (checkpoint → count →
        # collect) cost 3 jobs for the same decision; a near-dup batch
        # graph is the common case in the admit loop and iterative
        # rounds are ~3 jobs each regardless of size. Beyond the gate
        # the probe's cost is one bounded extra job before the real
        # checkpoint (its partial-distinct stops at the limit), and the
        # distributed path below is unchanged.
        import pandas as pd
        from pyspark.sql import types as T

        probe = dedup.limit(DRIVER_CC_MAX_EDGES + 1).toPandas()
        if len(probe) <= DRIVER_CC_MAX_EDGES:
            id_type = dedup.schema["u"].dataType
            nodes, labels = _driver_components(probe)
            return edges.sparkSession.createDataFrame(
                pd.DataFrame({"node": nodes, "component": labels}),
                T.StructType(
                    [
                        T.StructField("node", id_type, False),
                        T.StructField("component", id_type, False),
                    ]
                ),
            )
    cur = dedup.localCheckpoint(eager=True)
    prev_key = _key(cur)
    converged = False
    for _ in range(MAX_ROUNDS):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        key = _key(nxt)
        # The new round is fully materialized (eager), so the superseded
        # round's checkpoint blocks are dead weight — free them now
        # instead of pinning O(log n) edge-set copies in executor storage
        # until DataFrame GC (ADVICE r6). The FINAL round's blocks feed
        # the labels below and ride the managed-release mechanism.
        release_local_checkpoint(cur)
        cur = nxt
        if key == prev_key:
            converged = True
            break
        prev_key = key
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} rounds"
        )
    managed_checkpoint(cur)
    # cur is a min-rooted star forest: (child, root). Roots label
    # themselves.
    labels = cur.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).union(
        cur.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    return labels.groupBy("node").agg(F.min("component").alias("component"))


def dedup_survivors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """Union-find survivor policy over near-dup ``edges``: one survivor
    per connected component (its minimum id). Returns
    (node, component, is_survivor); nodes with no edges are their own
    survivors and simply don't appear (``label_corpus`` joins the
    labeling back over a full corpus)."""
    cc = connected_components(edges, src, dst, edges_distinct=edges_distinct)
    return cc.withColumn("is_survivor", F.col("node") == F.col("component"))


def label_corpus(
    corpus: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """Every corpus row + (component, is_survivor): the end-to-end dedup
    labeling a pipeline writes back. Rows absent from ``edges`` are their
    own component (coalesce-to-self), so exactly one row per component —
    its minimum id — carries ``is_survivor = true``. The labeling join is
    a LEFT join against only the edge-touched nodes (tiny next to the
    corpus at near-dup rates — AQE broadcasts it), so the corpus itself
    never shuffles."""
    cc = connected_components(edges, src, dst, edges_distinct=edges_distinct)
    return (
        corpus.join(cc, corpus[id_col] == cc["node"], "left")
        .drop("node")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .withColumn("is_survivor", F.col(id_col) == F.col("component"))
    )


@query(
    "dedup_survivors",
    oracle="""
    WITH RECURSIVE sets AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             list_distinct(string_split(text, ' ')) AS wset
      FROM documents
    ),
    edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM sets a JOIN sets b
        ON a.lang = b.lang
       AND (a.n_words // 10) = (b.n_words // 10)
       AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
              / len(list_distinct(list_concat(a.wset, b.wset))) >= 0.6
    ),
    sym AS (
      SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
    ),
    walk(node, reach) AS (
      SELECT u AS node, u AS reach FROM sym
      UNION
      SELECT s.u AS node, w.reach
      FROM sym s JOIN walk w ON w.node = s.v
    ),
    comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           d.doc_id = COALESCE(c.component, d.doc_id) AS is_survivor
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """,
)
def dedup_survivors_labeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (VERDICT r6 #1): full-corpus union-find survivor
    labeling over the REAL near-dup edges produced by
    ``dedup_ngram_jaccard`` (blocked exact-Jaccard at τ=0.6 — its edge
    set is value-hash-verified against the oracle in its own entry, so
    both engines provably label the same graph). Spark side runs the
    O(log n)-round alternating-star connected components above; the
    DuckDB oracle computes the same fixpoint by transitive min-label
    closure (`WITH RECURSIVE` reachability → MIN(reach) per node —
    depth-bounded by component diameter, fine at oracle scale; the star
    algorithm exists precisely because that closure doesn't scale).
    Output: one row per document — (doc_id, component, is_survivor),
    exactly one survivor (the min doc_id) per component."""
    from .dedup import dedup_ngram_jaccard

    edges = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    corpus = load_table(spark, sf_dir, "documents").select("doc_id")
    # ngram_jaccard_edges emits distinct doc_a < doc_b rows by
    # construction — skip CC's defensive filter+distinct exchange.
    return label_corpus(corpus, edges, "doc_id", edges_distinct=True)
