"""Relational core — `[EXT]` operators (SURVEY.md §2.C, provenance
BASELINE.json north_star; the reference itself has no relational surface,
SURVEY.md §2.B).

Every query is declarative DataFrame API so Catalyst owns pushdown, pruning
and join selection. Scale notes are given per query where non-obvious.

Determinism: SUM/AVG over doubles is accumulation-order-dependent, so all
money aggregates go through exact ``decimal`` casts; averages are expressed
as exact-decimal-sum cast to double ÷ count (bit-identical in Spark and
DuckDB). Per-row double arithmetic is IEEE-deterministic and left alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import query


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact sum: cast to decimal first so accumulation order is irrelevant.

    The *output* is cast to DOUBLE: the driver's value hasher canonicalizes
    Spark decimals and DuckDB decimals differently (round 1: 11 queries with
    bit-identical decimal values failed hash_match), so the accumulation stays
    exact decimal but the final column type is engine-agnostic double. Every
    oracle SQL wraps the matching SUM in CAST(... AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Exact-sum average: decimal sum → double, ÷ count. Deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


# ---------------------------------------------------------------------------
# TPC-H-style headline queries
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy groupBy-agg. Plan at scale: parquet scan with the
    shipdate predicate pushed down, partial (map-side) hash agg → single
    shuffle on 2 low-cardinality keys → final agg. No joins."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → join → agg → global top-10.

    Scale: customer grows linearly with SF, so we do NOT hint-force a
    broadcast (an explicit hint is never demoted by AQE → OOM class at
    100 TB). Plain equi-join: AQE broadcasts the filtered customer side
    while it fits the threshold and falls back to shuffle when it
    doesn't. lineitem⋈orders stays a shuffled hash join on orderkey.
    Top-10 is TakeOrdered (per-partition heap + driver merge), never a
    full sort. Tie-break on l_orderkey for determinism."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            od.join(cu, od.o_custkey == cu.c_custkey),
            li.l_orderkey == od.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. Scale: nation/region are FIXED-size dims
    (25/5 rows at every SF) → safe to hint-broadcast. Supplier GROWS with
    SF (~10⁹ rows at 100 TB), so it gets a plain equi-join — AQE
    broadcasts it while it fits and demotes to shuffle when it doesn't
    (an explicit hint would never be demoted). The only unavoidable
    big-big shuffle is lineitem⋈orders on orderkey."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(
            su,
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — the pushdown benchmark.
    All four predicates reach the parquet scan (min/max row-group pruning
    at scale); the aggregate is a single partial+final pair with a 1-row
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "filter_project_pushdown",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_size < 15 AND p_retailprice > 905.0
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate; both reach the parquet scan
    (PushedFilters + 3-column ReadSchema — verified in tests/test_plans.py)."""
    pa = load_table(spark, sf_dir, "part")
    return pa.filter((F.col("p_size") < 15) & (F.col("p_retailprice") > 905.0)).select(
        "p_partkey", "p_name", "p_retailprice"
    )


# Predicate coverage note: IN/BETWEEN/LIKE predicates live in
# fn_string_suite (functions.py); null checks / negation / null-safe
# equality live in subquery_above_avg_balance below — consolidated so every
# registry entry fits inside the driver's 50-entry correctness window.


# ---------------------------------------------------------------------------
# Joins — every flavor
# ---------------------------------------------------------------------------


@query(
    "join_inner_orders_per_nation",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_inner_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@query(
    "join_outer_suite",
    oracle="""
    SELECT 'cust_orders' AS side, c.c_custkey AS entity_key, c.c_name AS label,
           COUNT(o.o_orderkey) AS n_matches,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS matched_amount
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 2, 3
    UNION ALL
    SELECT 'part_lineitems', p.p_partkey, p.p_name,
           COUNT(l.l_orderkey),
           CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
    FROM lineitem l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 2, 3
    """,
)
def join_outer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join null-extension semantics, both directions in one entry
    (merged per SURVEY §8 registry-headroom plan #3): a LEFT join preserving
    customers with zero orders and a RIGHT join preserving parts with zero
    lineitems, tagged by ``side``. COUNT(col) skips the null-extended rows
    in both engines; the absent side's amount coalesces to 0."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    left_leg = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_matches"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("matched_amount"),
        )
        .select(
            F.lit("cust_orders").alias("side"),
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("label"),
            "n_matches",
            "matched_amount",
        )
    )
    right_leg = (
        li.join(pa, li.l_partkey == pa.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(
            F.count("l_orderkey").alias("n_matches"),
            F.coalesce(dsum("l_extendedprice"), F.lit(0.0)).alias("matched_amount"),
        )
        .select(
            F.lit("part_lineitems").alias("side"),
            F.col("p_partkey").alias("entity_key"),
            F.col("p_name").alias("label"),
            "n_matches",
            "matched_amount",
        )
    )
    return left_leg.unionByName(right_leg)


@query(
    "join_full_outer_nation_balance",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1
    ),
    supp AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM cust c FULL OUTER JOIN supp s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cu.join(su, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi_anti_customers",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins in one tagged
    result — both appear as distinct join nodes in the plan. No payload
    columns from the right side cross the shuffle in either: cheaper than
    inner-join+distinct at scale."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = cu.join(urgent, cu.c_custkey == urgent.o_custkey, "left_semi").select(
        F.lit("semi").alias("op"), "c_custkey", "c_name"
    )
    anti = cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        F.lit("anti").alias("op"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


@query(
    "join_range_quantity_bands",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('low', 0.0, 17.0), ('mid', 17.0, 34.0), ('high', 34.0, 51.0)
    )
    SELECT b.band_name, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS band_price
    FROM lineitem l
    JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: fact column falls in dim [lo, hi). The dim is
    broadcast so the range predicate evaluates map-side — the pattern that
    replaces a big-big range join at scale (bucket first, then broadcast).
    This is also the cross/theta-join coverage: a non-equi condition against
    a broadcast side is physically a BroadcastNestedLoopJoin (cross product
    + theta filter); a big-big theta join would be rewritten via range
    bucketing instead."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0.0, 17.0), ("mid", 17.0, 34.0), ("high", 34.0, 51.0)],
        "band_name string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("band_price"),
        )
    )


@query(
    "join_asof_click_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
             MAX(event_id) AS purchase_event_id,
             MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    c AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts AS click_ts, c.value AS click_value,
           p.purchase_event_id, p.ts AS purchase_ts, p.purchase_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — each click matched to the user's most recent purchase
    at or before the click (the event-time point lookup behind feature
    backfills and trade/quote alignment). Spark has no ASOF JOIN operator
    (DuckDB does — the oracle uses it natively), so this implements it the
    scale-honest way: UNION both sides with a side marker, then one window
    pass per user carrying the last non-null purchase attributes forward
    (`last(..., ignorenulls=True)` over rows unbounded-preceding..current,
    ordered by (ts, side) so a same-instant purchase sorts before the
    click, matching the oracle's `>=`).

    Why not a range join: `c.ts >= p.ts` as a join predicate is O(clicks ×
    purchases) per user; the union+window form is ONE shuffle on user_id
    and a linear scan per partition — it survives 100× where the range
    join quadratically dies. Purchases are first deduped per (user_id, ts)
    with MAX so the as-of pick is tie-free in both engines."""
    return asof_click_purchase(load_table(spark, sf_dir, "events"))


def asof_click_purchase(ev: DataFrame) -> DataFrame:
    """The as-of pipeline over any events-shaped DataFrame — split out so
    property tests can feed it generated micro-tables
    (tests/test_properties.py) alongside the fixture-backed registry
    query."""
    ts_type = ev.schema["ts"].dataType
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_event_id"),
            F.max("value").alias("purchase_value"),
        )
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            "purchase_event_id",
            F.col("ts").alias("purchase_ts"),
            "purchase_value",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("click_value"),
        )
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(None).cast(ts_type).alias("purchase_ts"),
        F.lit(None).cast("double").alias("purchase_value"),
        "event_id",
        F.col("value").alias("click_value"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = p.unionByName(c).select(
        "*",
        F.last("purchase_event_id", ignorenulls=True).over(w).alias("pe"),
        F.last("purchase_ts", ignorenulls=True).over(w).alias("pt"),
        F.last("purchase_value", ignorenulls=True).over(w).alias("pv"),
    )
    return filled.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "click_value",
        F.col("pe").alias("purchase_event_id"),
        F.col("pt").alias("purchase_ts"),
        F.col("pv").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@query(
    "agg_multi_function",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_multi_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with mixed functions incl. distinct agg (two-phase:
    partial agg → expand for distinct → final)."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice").alias("sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           GROUPING(r.r_name) + 2 * GROUPING(n.n_name) AS gid,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals. gid disambiguates a NULL group value from the
    rollup-total row (same trick both engines)."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    joined = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).join(
        F.broadcast(re), na.n_regionkey == re.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        (F.grouping("r_name") + F.lit(2) * F.grouping("n_name"))
        .cast("long")
        .alias("gid"),
        F.count("*").alias("n_cust"),
        dsum("c_acctbal").alias("sum_bal"),
    ).select("r_name", "n_name", "gid", "n_cust", "sum_bal")


@query(
    "agg_cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus"))
        .cast("long")
        .alias("gid"),
        F.count("*").alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_qty")


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (single Expand node — one pass over the
    fact table for both groupings, not a UNION of two aggs)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# Distinct-aggregation coverage lives in agg_multi_function
# (COUNT(DISTINCT o_custkey)) and analytic_approx_count_distinct
# (exact vs HLL distinct on events).


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_functions_suite",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta_prev,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window-function sweep in ONE window node (merged per
    SURVEY §8 registry-headroom plan #4): ranking family (row_number /
    rank / dense_rank / ntile), offset family (lag/lead + delta), and
    frame specs (running total via unbounded-preceding, 3-row moving
    average) over one shared spec — one shuffle on the partition key,
    one sort within partition. Order includes the unique key so
    row_number/ntile are deterministic."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    return od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias(
            "delta_prev"
        ),
        F.sum(dec_price)
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        (
            F.sum(dec_price).over(w.rowsBetween(-2, 0)).cast("double")
            / F.count("*").over(w.rowsBetween(-2, 0))
        ).alias("moving_avg_3"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
    FROM part
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering column (value-based, not row-based):
    for each part, how many same-brand parts have size within [size-5, size]."""
    pa = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 0)
    return pa.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count("*").over(w).alias("n_within_5"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand: window + filter. Catalyst 3.5+/4.x rewrites
    rank<=k filters into a per-partition top-k (WindowGroupLimit) — no full
    sort of each group."""
    pa = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        pa.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


# ---------------------------------------------------------------------------
# Sort / limit, set ops, subqueries, conditionals, pivot
# ---------------------------------------------------------------------------


@query(
    "orderby_limit_top100",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def orderby_limit_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 → TakeOrderedAndProject (heap per partition, merge on
    driver), not a total sort. Fully tie-broken for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "set_union_intersect_except",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'union' AS op, nk FROM (SELECT nk FROM cust_nations UNION SELECT nk FROM supp_nations)
    UNION ALL
    SELECT 'intersect' AS op, nk FROM (SELECT nk FROM cust_nations INTERSECT SELECT nk FROM supp_nations)
    UNION ALL
    SELECT 'except' AS op, nk FROM (SELECT nk FROM cust_nations EXCEPT SELECT nk FROM supp_nations)
    """,
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct), INTERSECT, EXCEPT in one result, tagged by op."""
    cu = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nk")  # noqa: E731
    return (
        tag(cu.union(su).distinct(), "union")
        .unionByName(tag(cu.intersect(su), "intersect"))
        .unionByName(tag(cu.subtract(su), "except"))
    )


@query(
    "subquery_above_avg_balance",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer WHERE c_acctbal > 0)
      AND c_acctbal IS NOT NULL
      AND NOT (c_acctbal BETWEEN 1000 AND 2000)
      AND c_mktsegment IS DISTINCT FROM 'MACHINERY'
    """,
)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery → broadcast of a 1-row aggregate, then map-side filter.
    Threshold computed as exact-decimal-sum ÷ count so it is bit-identical
    in both engines and cannot flip row membership. Also carries the
    null-check / negation / null-safe-equality predicate coverage
    (IS NOT NULL, NOT BETWEEN, <=> in Spark = IS DISTINCT FROM in ANSI)."""
    cu = load_table(spark, sf_dir, "customer")
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("threshold")
    )
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(
            (F.col("c_acctbal") > F.col("threshold"))
            & F.col("c_acctbal").isNotNull()
            & ~F.col("c_acctbal").between(1000, 2000)
            & ~F.col("c_mktsegment").eqNullSafe("MACHINERY")
        )
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS "click",
           COUNT(*) FILTER (WHERE event_type = 'view')     AS "view",
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS "signup",
           COUNT(*) FILTER (WHERE event_type = 'error')    AS "error"
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (never let Spark scan for distinct
    pivot values at 100 TB — pass them)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )
