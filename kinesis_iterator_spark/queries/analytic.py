"""Analytic / statistical aggregates (`[EXT]`, SURVEY.md §2.C).

Exact percentiles are cross-engine-checkable (both interpolate linearly
over sorted doubles). Moment statistics (variance/stddev/corr) are
accumulation-order-dependent in their native implementations, so the
oracle-checked forms here are derived from exact decimal power sums —
bit-identical in both engines. Sketch aggregates (HLL, approx quantile)
are inherently engine-specific → each query emits the exact value plus a
``approx_within_tol`` boolean comparing the sketch against it, so even the
sketch paths are value-hash-checkable (oracle computes exact + TRUE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import query


def analytic_percentiles_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution profile in ONE grouped aggregation: exact
    percentiles (linear interpolation — identical in both engines), the
    approximate-percentile sketch validated against them, and
    variance/stddev/correlation from exact decimal power sums.

    The percentile sketch (Greenwald-Khanna here, t-digest elsewhere) is
    engine-specific, so its raw values can't be value-hashed across
    engines; the query emits the exact percentiles AND a boolean
    asserting every approx value lands within 2% of exact — the oracle
    computes exact + literal TRUE, making the sketch's correctness itself
    hash-checkable. At 100 TB the sketch replaces the exact per-group
    sort, and the power sums are order-independent decimals (native
    var_samp/corr use Welford-style merging whose FP result depends on
    partition boundaries — fine for real use, wrong for a bit-exact
    oracle; native forms are exercised in tests instead)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.9, 0.99], 10000
        ).alias("ap"),
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((q * q).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(28,4)")).cast("double").alias("sxy"),
    )

    def ok(exact: str, i: int):
        return (
            F.abs(F.element_at("ap", i) - F.col(exact)) / F.col(exact) <= 0.02
        )

    n = F.col("n")
    sx, sxx, sy, syy, sxy = (F.col(c) for c in ("sx", "sxx", "sy", "syy", "sxy"))
    var_qty = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "p50",
        "p90",
        "p99",
        (ok("p50", 1) & ok("p90", 2) & ok("p99", 3)).alias("approx_within_tol"),
        n.alias("n"),
        (sx / n).alias("mean_qty"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("stddev_qty"),
        # one engine contracts a*b-c into FMA here → 1-ulp divergence;
        # round to 10dp (far above the ulp, far below data noise).
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            10,
        ).alias("corr_qty_price"),
    )


def analytic_histogram_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (floor-bucketing — one shuffle at bucket
    cardinality regardless of input size) crossed with the HyperLogLog++
    distinct estimate, THE 100 TB cardinality primitive (constant memory
    vs a full distinct shuffle). The sketch value is engine-specific, so
    each histogram cell emits the exact distinct count plus a boolean
    asserting the HLL estimate lands within 5% of it (rsd is configured at
    1%, so 5% is a hard-fail bound, not a tautology); the oracle computes
    exact + literal TRUE."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 50).cast("long").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "bucket",
            "n",
            "lo",
            "hi",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("approx_within_tol"),
        )
    )


@query(
    "analytic_suite",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5)  AS p50,
             quantile_cont(l_extendedprice, 0.9)  AS p90,
             quantile_cont(l_extendedprice, 0.99) AS p99,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'lineitem_profile' AS part, l_returnflag AS grp,
           CAST(NULL AS BIGINT) AS bucket,
           n,
           p50, p90, p99,
           TRUE AS approx_within_tol,
           sx / n AS mean_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           ROUND((sxy - sx * sy / n)
             / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 10) AS corr_qty_price,
           CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
           CAST(NULL AS BIGINT) AS exact_users
    FROM s
    UNION ALL
    SELECT 'events_histogram', event_type,
           CAST(FLOOR(value / 50) AS BIGINT),
           COUNT(*),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           TRUE,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE),
           MIN(value), MAX(value),
           COUNT(DISTINCT user_id)
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both analytic passes in one registry entry (merged per VERDICT r9
    #2 to free a slot for `semantic_dedup` under the driver's 50-query
    gate; every function of both originals kept): the per-returnflag
    lineitem distribution profile (`analytic_percentiles_moments`) and
    the events histogram × HLL cardinality check
    (`analytic_histogram_hll`), union-tagged by ``part`` over a
    NULL-padded common schema — the `join_outer_suite` discipline. Both
    leg builders remain the public library surface; each leg's grain and
    plan are unchanged (two independent grouped passes, no extra
    exchange). Nullable bigints (bucket, exact_users) land as float64
    under BOTH engines' pandas canonicalization, so the padding is
    hash-symmetric."""
    nd = F.lit(None).cast("double")
    nl = F.lit(None).cast("long")
    prof = analytic_percentiles_moments(spark, sf_dir).select(
        F.lit("lineitem_profile").alias("part"),
        F.col("l_returnflag").alias("grp"),
        nl.alias("bucket"),
        "n",
        "p50",
        "p90",
        "p99",
        "approx_within_tol",
        "mean_qty",
        "var_qty",
        "stddev_qty",
        "corr_qty_price",
        nd.alias("lo"),
        nd.alias("hi"),
        nl.alias("exact_users"),
    )
    hist = analytic_histogram_hll(spark, sf_dir).select(
        F.lit("events_histogram").alias("part"),
        F.col("event_type").alias("grp"),
        "bucket",
        "n",
        nd.alias("p50"),
        nd.alias("p90"),
        nd.alias("p99"),
        "approx_within_tol",
        nd.alias("mean_qty"),
        nd.alias("var_qty"),
        nd.alias("stddev_qty"),
        nd.alias("corr_qty_price"),
        "lo",
        "hi",
        "exact_users",
    )
    return prof.unionByName(hist)


