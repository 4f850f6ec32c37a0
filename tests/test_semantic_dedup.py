"""SemDeDup-style semantic dedup (cluster-then-prune over embeddings):
value-oracle equality vs DuckDB at two scales, the keep-least-central
election property, and distributed-vs-driver CC path equality.

The operator is library-level (the 50-entry registry is capped), so the
driver-gate discipline is replicated here: run the Spark frame and the
shipped oracle SQL over the same parquet and compare values — the
tests/test_scrub_paragraphs.py pattern.
"""

from __future__ import annotations

import duckdb
import pytest

from kinesis_iterator_spark.queries.dedup import (
    COSINE_TAU,
    semantic_dedup,
    semantic_dedup_oracle,
)


def _oracle_rows(sf_dir: str, tau: float):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(
        semantic_dedup_oracle(tau)
    ).fetchall())


def _spark_rows(spark, sf_dir: str, tau: float):
    return sorted(
        tuple(r) for r in semantic_dedup(spark, sf_dir, tau).collect()
    )


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_semantic_dedup_matches_duckdb_oracle(spark, sf):
    """Bit-identical labeling at both fixture scales: cell assignment,
    cos-to-centroid, component, and the keep-least-central election all
    ride sequential left folds shared with the oracle's list_reduce."""
    got = _spark_rows(spark, sf, COSINE_TAU)
    want = _oracle_rows(sf, COSINE_TAU)
    assert got == want


def test_semantic_dedup_keeper_is_least_central(spark, sf_dir):
    rows = semantic_dedup(spark, sf_dir, COSINE_TAU).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    assert sum(r["is_kept"] for r in rows) == len(by_comp)
    for members in by_comp.values():
        keeper = min(members, key=lambda r: (r["cos_cent"], r["vec_id"]))
        assert keeper["is_kept"]
        assert all(
            not m["is_kept"] for m in members if m["vec_id"] != keeper["vec_id"]
        )


def test_semantic_dedup_impossible_tau_keeps_everything(spark, sf_dir):
    """tau > 1 ⇒ no edges ⇒ every vector is its own component and kept."""
    rows = semantic_dedup(spark, sf_dir, tau=1.1).collect()
    assert rows and all(r["is_kept"] for r in rows)
    assert all(r["component"] == r["vec_id"] for r in rows)


def test_semantic_dedup_distributed_cc_path_identical(
    spark, sf_dir, monkeypatch
):
    """Forcing the star-round CC path (driver gate off) yields the same
    labeling — the test_graph dual-path pin, composed end-to-end."""
    from kinesis_iterator_spark.queries import graph

    base = _spark_rows(spark, sf_dir, COSINE_TAU)
    monkeypatch.setattr(graph, "DRIVER_CC_MAX_EDGES", -1)
    assert _spark_rows(spark, sf_dir, COSINE_TAU) == base


def test_semantic_dedup_frame_hand_crafted_clusters(spark):
    """Readable pin of the defining semantics on a 6-vector frame:
    exact copies in one cell collapse to a single keeper (min vec_id on
    the cos_cent tie); singletons keep themselves; and a cos-0.96 pair
    SPLIT ACROSS CELLS is untouched — within-cluster-only comparison is
    SemDeDup's published approximation, not a bug."""
    from kinesis_iterator_spark.queries.dedup import semantic_dedup_frame

    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0, 0.0]),
        (3, 1, [0.0, 1.0, 0.0, 0.0]),
        (4, 0, [0.8, 0.6, 0.0, 0.0]),  # nearest cell 0
        (5, 1, [0.6, 0.8, 0.0, 0.0]),  # nearest cell 1; cos(4,5)=0.96
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_frame(spark, emb, tau=0.9).collect()
    }
    assert len(out) == 6
    # copies: one component rooted at 0, keeper = min id on the tie
    assert {out[i]["component"] for i in (0, 1, 2)} == {0}
    assert out[0]["is_kept"] and not out[1]["is_kept"] and not out[2]["is_kept"]
    # cells: nearest-centroid assignment, not the raw label
    assert out[4]["cell"] == out[0]["cell"]
    assert out[5]["cell"] == out[3]["cell"]
    # the cross-cell near-identical pair is never compared: both kept
    assert out[4]["is_kept"] and out[5]["is_kept"]
    assert out[4]["component"] == 4 and out[5]["component"] == 5
    assert out[3]["is_kept"]
