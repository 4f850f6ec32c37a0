"""Drift-on-admit (VERDICT r10 #4): `CorpusWriter(drift_monitor=True)`
maintains a stored reference-histogram layer (`drift_ref/`, per-admit
(b, c) segments — the `df/`/`bucket_sizes/` discipline) and reports each
batch's exact fixed-point KL/TV drift against the pre-admit corpus in
the admit stats. Pins: the on-admit numbers equal the standalone
`corpus_drift` over the same frames; sum-of-segments ≡ a recount of the
corpus text; a resubmitted corpus measures exactly zero drift;
crash/late-enablement self-heal; compact() is query-invisible; the
`corpus_drift_stats` registry row is untouched (driver gate)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.pipeline import (
    CorpusWriter,
    CurationConfig,
    curate_frame,
)
from kinesis_iterator_spark.queries.text import corpus_drift, corpus_hist
from kinesis_iterator_spark.tables import load_table

B = 256


@pytest.fixture(scope="module")
def batches(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    b1 = doc.filter(F.col("doc_id") % 2 == 0).persist()
    b2 = doc.filter(F.col("doc_id") % 2 == 1).persist()
    b1.count(), b2.count()
    yield b1, b2
    b1.unpersist(), b2.unpersist()


def _writer(spark, root) -> CorpusWriter:
    return CorpusWriter(
        spark,
        f"{root}/corpus",
        f"{root}/index",
        CurationConfig(),
        drift_monitor=True,
        drift_buckets=B,
    )


@pytest.fixture(scope="module")
def run(spark, batches, tmp_path_factory):
    """(writer, s1, ref_after_b1, s2): two admits with the monitor on,
    plus the materialized pre-admit-2 corpus for the equality pin."""
    root = str(tmp_path_factory.mktemp("driftw"))
    w = _writer(spark, root)
    s1 = w.admit(batches[0])
    ref = w.corpus().localCheckpoint(eager=True)
    s2 = w.admit(batches[1])
    return w, s1, ref, s2


def test_bootstrap_has_layer_but_no_drift_stats(run):
    w, s1, _, _ = run
    assert "drift_kl_fix" not in s1 and "drift_tv_fix" not in s1
    assert os.path.isdir(w._drift_dir())


def test_admit_drift_equals_standalone_corpus_drift(spark, batches, run):
    """The on-admit numbers ARE `corpus_drift(pre-admit corpus,
    batch survivors)` — same exact fixed-point integers."""
    w, _, ref, s2 = run
    cur = curate_frame(batches[1], CurationConfig())
    try:
        want = corpus_drift(spark, ref, cur.final, n_buckets=B).collect()[0]
    finally:
        cur.release()
    assert s2["drift_kl_fix"] == int(want["kl_fix"])
    assert s2["drift_tv_fix"] == int(want["tv_fix"])
    assert s2["drift_kl_fix"] > 0 or s2["drift_tv_fix"] > 0


def test_layer_sum_of_segments_equals_recount(spark, run):
    w, _, _, _ = run
    stored = sorted(
        tuple(r)
        for r in spark.read.parquet(w._drift_dir())
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    want = sorted(
        tuple(r) for r in corpus_hist(w.corpus(), B).collect()
    )
    assert stored == want


def test_resubmitted_corpus_measures_exactly_zero(run):
    """Identical distributions → kl_fix = tv_fix = 0 EXACTLY (the
    corpus_drift zero contract, now observable in the ingestion loop)."""
    w, _, _, _ = run
    resubmit = w.corpus().select(
        (F.col("doc_id") + 7_000_000).alias("doc_id"),
        "lang",
        "source",
        "text",
    )
    s = w.admit(resubmit)
    assert s["n_admitted"] == 0  # all exact dups
    assert s["drift_kl_fix"] == 0 and s["drift_tv_fix"] == 0


def test_compact_is_query_invisible(spark, run):
    w, _, _, _ = run
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(w._drift_dir())
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    w.compact()
    after_df = spark.read.parquet(w._drift_dir())
    after = sorted(
        tuple(r)
        for r in after_df.groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    assert before == after
    # collapsed to one segment's worth of rows (≤ one row per bucket)
    assert after_df.count() == after_df.select("b").distinct().count()


def test_marker_crash_heals_by_rebuild(spark, batches, run):
    """A crash mid-append leaves the marker; the next reader rebuilds
    the layer from the corpus instead of double-counting — the summed
    layer still equals the recount afterwards."""
    w, _, _, _ = run
    open(w._drift_marker(), "w").close()
    hist = w._drift_hist_or_heal()
    assert not os.path.exists(w._drift_marker())
    stored = sorted(
        tuple(r)
        for r in hist.groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    want = sorted(tuple(r) for r in corpus_hist(w.corpus(), B).collect())
    assert stored == want


def test_late_enablement_heals_from_corpus(spark, batches, tmp_path_factory):
    """A corpus admitted BEFORE drift_monitor=True: the first monitored
    admit rebuilds the layer from the corpus and still reports drift."""
    root = str(tmp_path_factory.mktemp("driftlate"))
    w0 = CorpusWriter(
        spark, f"{root}/corpus", f"{root}/index", CurationConfig()
    )
    s0 = w0.admit(
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "lang", "source", "text")
        .filter(F.col("doc_id") % 2 == 0)
    )
    assert "drift_kl_fix" not in s0
    w1 = _writer(spark, root)
    s1 = w1.admit(
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "lang", "source", "text")
        .filter(F.col("doc_id") % 2 == 1)
    )
    assert "drift_kl_fix" in s1
    stored = sorted(
        tuple(r)
        for r in spark.read.parquet(w1._drift_dir())
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    want = sorted(tuple(r) for r in corpus_hist(w1.corpus(), B).collect())
    assert stored == want


# -- embedding-side twin: IVF-cell occupancy drift -----------------------


@pytest.fixture(scope="module")
def erun(spark, tmp_path_factory):
    """(writer, s1, ref_hist_rows, batch2, s2) — two embedding admits
    with the monitor on; the pre-admit-2 reference histogram snapshot
    feeds the equality pin."""
    from kinesis_iterator_spark.pipeline import EmbeddingWriter

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1).persist()
    b2.count()
    root = str(tmp_path_factory.mktemp("edrift"))
    w = EmbeddingWriter(
        spark, f"{root}/store", f"{root}/ann", drift_monitor=True
    )
    s1 = w.admit(b1)
    ref = sorted(
        tuple(r)
        for r in w._cell_hist_or_heal()
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    s2 = w.admit(b2)
    return w, s1, ref, b2, s2


def test_embedding_bootstrap_layer_no_stats(erun):
    w, s1, _, _, _ = erun
    assert "drift_kl_fix" not in s1
    assert os.path.isdir(w._cell_hist_dir())


def test_embedding_admit_drift_equals_library(spark, erun):
    from kinesis_iterator_spark.queries.text import corpus_drift_from_hists

    w, _, ref, b2, s2 = erun
    assert "drift_kl_fix" in s2 and "drift_tv_fix" in s2
    ref_df = spark.createDataFrame(list(ref), "b long, c long")
    want = corpus_drift_from_hists(
        spark, ref_df, w._cell_hist_of(b2), len(w._crows)
    ).collect()[0]
    assert s2["drift_kl_fix"] == int(want["kl_fix"])
    assert s2["drift_tv_fix"] == int(want["tv_fix"])


def test_embedding_layer_sum_equals_inverted_file(spark, erun):
    w, _, _, _, _ = erun
    stored = sorted(
        tuple(r)
        for r in spark.read.parquet(w._cell_hist_dir())
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    want = sorted(tuple(r) for r in w._stored_cell_source().collect())
    assert stored == want


def test_embedding_resubmitted_store_measures_zero(spark, erun):
    """A batch that IS the store (fresh ids) occupies exactly the same
    cells — kl_fix = tv_fix = 0 EXACTLY, and everything near-dup
    rejects."""
    w, _, _, _, _ = erun
    resubmit = w.store().select(
        (F.col("vec_id") + 9_000_000).alias("vec_id"), "label", "embedding"
    )
    s = w.admit(resubmit)
    assert s["n_admitted"] == 0
    assert s["drift_kl_fix"] == 0 and s["drift_tv_fix"] == 0


def test_embedding_compact_and_marker_heal(spark, erun):
    w, _, _, _, _ = erun
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(w._cell_hist_dir())
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    w.compact()
    after_df = spark.read.parquet(w._cell_hist_dir())
    after = sorted(
        tuple(r)
        for r in after_df.groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    assert before == after
    assert after_df.count() == after_df.select("b").distinct().count()
    # marker crash -> heal rebuilds ≡ the inverted-file recount
    open(w._cell_hist_marker(), "w").close()
    hist = w._cell_hist_or_heal()
    assert not os.path.exists(w._cell_hist_marker())
    healed = sorted(
        tuple(r)
        for r in hist.groupBy("b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    assert healed == after
