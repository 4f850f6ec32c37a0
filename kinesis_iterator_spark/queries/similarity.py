"""Similarity search over ``embeddings.embedding`` (`[EXT]`, SURVEY.md
§2.C / §7 phase 5).

Two tiers:
- ``similarity_bruteforce_topk`` — exact cosine top-k, the correctness
  baseline. O(|Q|·|N|) — fine for a bounded query set, never for all-pairs
  at 100 TB.
- ``similarity_lsh_topk`` — random-hyperplane LSH (sign sketch): vectors
  hash to a bucket; only same-bucket pairs are scored. Sub-linear candidate
  generation — the scale path. Hyperplanes are fixed pseudo-random
  constants derived from md5 so the whole pipeline is deterministic and
  oracle-checkable.

All dot products are explicit left-fold accumulations over doubles
(``F.aggregate`` in Spark, ``list_reduce`` in DuckDB) — bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import query

TOP_K = 5
N_QUERIES = 10  # query set = vec_id < N_QUERIES
N_PLANES = 4  # LSH sign bits → 16 buckets; tuned with 1-bit multi-probe
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# DuckDB equivalent: left fold via list_reduce (x1 + x2 + ... ≡ 0.0 + x1 +
# x2 + ... exactly, since 0.0 + x is exact in IEEE).
_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (p, q) -> p + q)"
)


def _cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return _dot(a, b) / (na * nb)


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT_SQL.format(a="embedding", b="embedding")}) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             {_DOT_SQL.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM normed q JOIN normed c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a bounded query set.

    Scale shape: queries (tiny) are broadcast against the corpus — a
    map-side nested loop per partition, no shuffle of the corpus; the top-k
    is a per-query window with rank pushdown (WindowGroupLimit). 100 TB
    corpus ⇒ still one scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    q = normed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        normed.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            _cosine(F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "cosine",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


def _plane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i of plane j is
    derived from md5(f"{j}:{i}") mapped to [-1, 1). Pure constants — both
    engines receive identical literal plane vectors."""
    import hashlib

    out = []
    for i in range(DIM):
        h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16)
        out.append(round(h / float(1 << 60) * 2.0 - 1.0, 9))
    return out


def _planes_sql() -> str:
    rows = ", ".join(
        f"({j}, [{', '.join(repr(v) for v in _plane(j))}]::DOUBLE[])"
        for j in range(N_PLANES)
    )
    return f"(VALUES {rows}) p(plane_id, plane)"


@query(
    "similarity_lsh_topk",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT_SQL.format(a="embedding", b="embedding")}) AS nrm
      FROM embeddings
    ),
    sigbits AS (
      SELECT n.vec_id,
             CAST(SUM(CASE WHEN {_DOT_SQL.format(a="n.embedding", b="p.plane")} >= 0
                      THEN (1::BIGINT << p.plane_id) ELSE 0 END) AS BIGINT) AS bucket
      FROM normed n, {_planes_sql()}
      GROUP BY n.vec_id
    ),
    buck AS (
      SELECT n.*, s.bucket FROM normed n JOIN sigbits s ON n.vec_id = s.vec_id
    ),
    probe AS (
      SELECT q.vec_id, q.embedding, q.nrm,
             CASE WHEN g.k < 0 THEN q.bucket
                  ELSE xor(q.bucket, (1::BIGINT << g.k)) END AS q_bucket
      FROM buck q, (SELECT UNNEST(range(-1, {N_PLANES})) AS k) g
      WHERE q.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             {_DOT_SQL.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM probe q JOIN buck c
        ON q.q_bucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-k with 1-bit multi-probe.

    Each vector gets a 4-bit sign sketch (dot against fixed hyperplanes);
    each query probes its own bucket plus the 4 buckets at Hamming
    distance 1 (multi-probe trades one candidate-set expansion for far
    better recall than adding independent tables). The bucket join is the
    single shuffle — at 100 TB raise the plane count with the corpus size
    so bucket occupancy stays bounded, and widen probing to keep recall.
    Recall vs the exact baseline is asserted in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    planes = spark.createDataFrame(
        [(j, _plane(j)) for j in range(N_PLANES)],
        "plane_id int, plane array<double>",
    )
    sigbits = (
        normed.crossJoin(F.broadcast(planes))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(
                    _dot(F.col("embedding"), F.col("plane")) >= 0,
                    F.expr("shiftleft(cast(1 as bigint), plane_id)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("bucket")
        )
    )
    buck = normed.join(sigbits, "vec_id")
    q = buck.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.expr(f"bucket ^ {1 << k}") for k in range(N_PLANES)],
            )
        ).alias("q_bucket"),
    )
    scored = (
        buck.join(
            F.broadcast(q),
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn(
            "cosine",
            _cosine(F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "cosine",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


@query("similarity_ivf_topk")  # centroids are data-dependent FP means → rows-only
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse centroids (per-label mean vector), probe the
    nearest 2 centroids, exact-score only vectors in probed cells.

    The inverted-file structure is the embedding analogue of partition
    pruning: the corpus is bucketed by nearest centroid once (write-time at
    scale), each query touches ~n_probe/n_cells of the data. Centroid
    means are FP-order-dependent → no value oracle; recall is asserted in
    tests."""
    emb = load_table(spark, sf_dir, "embeddings")

    # Coarse codebook: mean embedding per label (distributed: explode →
    # avg per (label, dim) → rebuild vector).
    cent = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda p: p.c).alias("centroid"),
        )
    )

    # Assign every vector to its nearest cell (1 probe for corpus).
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("d", _dot(F.col("embedding"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("d"), "cell")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", "embedding", "cell")
    )
    # Queries probe their 2 nearest cells.
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .withColumn("d", _dot(F.col("embedding"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.desc("d"), "cell")
            ),
        )
        .filter(F.col("rk") <= 2)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "cell",
        )
    )
    nq = F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
    nc = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    scored = (
        assigned.join(F.broadcast(queries), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine", _dot(F.col("q_emb"), F.col("embedding")) / (nq * nc))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            "cosine",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )
