"""Semantic pins for the round-2 operators: as-of join (vs a brute-force
range-join reference computed in-Spark) and embedding-cosine near-dup
(survivor-policy invariants vs the corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_iterator_spark.queries import QUERIES, load_all
from kinesis_iterator_spark.tables import load_table

load_all()


def test_asof_matches_bruteforce_range_join(spark, sf_dir):
    """The union+window as-of implementation must equal the O(n²)
    range-join definition: for each click, the purchase row with the
    greatest ts ≤ click ts (ties pre-collapsed by MAX per (user, ts))."""
    out = QUERIES["join_asof_click_purchase"](spark, sf_dir)

    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_event_id"),
            F.max("value").alias("purchase_value"),
        )
        .withColumnRenamed("ts", "pts")
        .withColumnRenamed("user_id", "puser")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    naive = (
        c.join(p, (c.user_id == p.puser) & (F.col("click_ts") >= p.pts), "left")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("event_id").orderBy(F.desc_nulls_last("pts"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "event_id",
            F.col("pts").alias("purchase_ts"),
            "purchase_event_id",
            "purchase_value",
        )
    )
    got = {
        r["event_id"]: (r["purchase_ts"], r["purchase_event_id"], r["purchase_value"])
        for r in out.collect()
    }
    want = {
        r["event_id"]: (r["purchase_ts"], r["purchase_event_id"], r["purchase_value"])
        for r in naive.collect()
    }
    assert got == want
    # Fixture must exercise both branches: matched and no-prior-purchase.
    assert any(v[0] is None for v in got.values())
    assert any(v[0] is not None for v in got.values())


def test_embedding_cosine_dedup_invariants(spark, sf_dir):
    out = {r["label"]: r for r in QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    totals = {
        r["label"]: r["n"]
        for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert set(out) == set(totals)
    for label, row in out.items():
        assert row["n_vectors"] == totals[label]
        assert row["n_removed"] + row["n_survivors"] == row["n_vectors"]
        # every removed vector has at least one dup pair naming it
        assert row["n_dup_pairs"] >= row["n_removed"]
    # the fixture's τ keeps the pipeline non-trivial: something is removed,
    # most of the corpus survives
    n_removed = sum(r["n_removed"] for r in out.values())
    n_total = sum(totals.values())
    assert 0 < n_removed < n_total / 2
