"""One-off profiler for similarity_lsh_topk: times the sub-plans
(signature materialization, candidate generation, full query) interleaved
min-of-N so a host stall can't poison one stage's number.

Usage: python tools/profile_lsh.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from kinesis_iterator_spark.queries import QUERIES, load_all, release_persists
    from kinesis_iterator_spark.queries import similarity as S
    from kinesis_iterator_spark.session import get_spark
    from kinesis_iterator_spark.tables import load_table

    load_all()
    spark = get_spark("profile_lsh")

    n = S._corpus_size(sf_dir)
    b = S._bits_for(n)
    cap = 32 + 8 * n // (1 << b)
    par = spark.sparkContext.defaultParallelism
    print(f"n={n} b={b} cap={cap} par={par}", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def build_cand():
        """similarity_lsh_topk's candidate sub-plan, reconstructed ONCE
        here (keep in sync with queries/similarity.py — this tool
        profiles plan stages the query function doesn't expose)."""
        emb = load_table(spark, sf_dir, "embeddings")
        sig = S.managed_persist(S.lsh_signatures(emb, b, par))
        probe_side = sig.select(
            F.col("vec_id").alias("query_id"),
            "table_id",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[F.expr(f"bucket ^ {1 << k}") for k in range(b)],
                )
            ).alias("bucket"),
        )
        capped = (
            sig.withColumn(
                "bsz", F.count("*").over(W.partitionBy("table_id", "bucket"))
            )
            .filter(F.col("bsz") <= cap)
            .select(F.col("vec_id").alias("neighbor_id"), "table_id", "bucket")
        )
        return (
            probe_side.join(capped, ["table_id", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )

    def sig_only():
        emb = load_table(spark, sf_dir, "embeddings")
        noop(S.lsh_signatures(emb, b, par))

    def cand_only():
        noop(build_cand())
        release_persists()

    def cand_shuffled():
        noop(build_cand().repartition(par, "query_id"))
        release_persists()

    def full():
        noop(QUERIES["similarity_lsh_topk"](spark, sf_dir))
        release_persists()

    def bruteforce():
        noop(QUERIES["similarity_bruteforce_topk"](spark, sf_dir))
        release_persists()

    stages = {
        "sig_only": sig_only,
        "cand_only": cand_only,
        "cand_shuffled": cand_shuffled,
        "full": full,
        "bruteforce": bruteforce,
    }

    # warm
    for fn in stages.values():
        fn()

    best = {k: float("inf") for k in stages}
    for _ in range(rounds):
        for k, fn in stages.items():
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)
    for k, v in best.items():
        print(f"{k:16s} {v:.3f}s")


if __name__ == "__main__":
    main()
