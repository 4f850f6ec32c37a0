"""Scale-pattern demonstrations: key-salting for skew and bucketed
co-located joins. These pin the 100 TB playbook techniques on synthetic
data — correctness of the rewritten (salted / bucketed) form against the
naive form, and the plan shape that makes them worth it.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

N_SALTS = 8


def _skewed_df(spark):
    """1 key ('hot') owns ~90% of rows; 10 cold keys share the rest."""
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 10).cast("string")).alias("k"),
        (F.col("id") % 89).alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregation_equals_plain(spark):
    """Two-stage salted aggregation (groupBy(k, salt) partial → groupBy(k)
    final) must equal the plain groupBy — the rewrite that spreads a hot
    grouping key over N_SALTS reducers. (Spark's own partial aggregation
    already handles SUM-like aggs; the explicit salt is the pattern for
    the cases it can't, e.g. exact distinct collection per key.)"""
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("v"), F.lit(N_SALTS)))
        .groupBy("k", "salt")
        .agg(F.sum("v").alias("ps"), F.count("*").alias("pn"))
        .groupBy("k")
        .agg(F.sum("ps").alias("s"), F.sum("pn").alias("n"))
    )
    got = {(r["k"]): (r["s"], r["n"]) for r in salted.collect()}
    assert got == plain


def test_salted_join_equals_plain(spark):
    """Skew-join salting: replicate the dim N_SALTS× with an exploded salt
    column, salt the fact deterministically, join on (k, salt) — an
    equi-join whose hot key spreads over N_SALTS tasks. Must equal the
    plain join. (AQE's skewJoin does this automatically for sort-merge
    joins past its thresholds; the manual form is the guaranteed path.)"""
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(10)],
        "k string, weight double",
    )
    plain = sorted(
        (r["k"], r["v"], r["weight"])
        for r in fact.join(dim, "k").collect()
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)]))
    )
    fact_salted = fact.withColumn("salt", F.pmod(F.hash("v"), F.lit(N_SALTS)))
    got = sorted(
        (r["k"], r["v"], r["weight"])
        for r in fact_salted.join(dim_salted, ["k", "salt"]).collect()
    )
    assert got == plain


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketed co-located join: both sides written bucketBy(8, key) →
    the sort-merge join reads pre-bucketed data and the plan contains NO
    Exchange — the write-once-join-many pattern that removes the shuffle
    from every subsequent big-big join at 100 TB."""
    # warehouse dir is a static conf — tables land in the session default
    # (./spark-warehouse) and are dropped afterwards.
    try:
        a = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("va")
        )
        b = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("vb")
        )
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        (
            a.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable("bkt_a")
        )
        (
            b.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable("bkt_b")
        )
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        # disable broadcast so the join is genuinely a big-big SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            assert joined.count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
