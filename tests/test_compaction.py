"""Derived-layer compaction: every writer-maintained append-only layer
(BM25 postings/doclen/df, ANN signatures/inverted-file/bucket occupancy,
PQ codes, paragraph + exact-substr digests) grows one parquet segment
per admit — unbounded file-count growth in a long-running ingestion
loop. The compactors collapse them under `incremental._swap_staged`'s
staged-swap crash discipline, and the rewrite MUST be invisible at
query level: every pin here is exact result equality before/after
compaction, plus forward-roll / stage-discard healing of a crash at
each point inside the swap."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.retrieval import (
    bm25_scores,
    bm25_scores_from_index,
    compact_bm25_index,
    extend_bm25_index,
    write_bm25_index,
)
from kinesis_iterator_spark.queries.similarity import (
    compact_ann_index,
    extend_ann_index,
    similarity_ivf_topk_from_index,
    similarity_lsh_topk_from_index,
    stored_bucket_sizes,
    write_ann_index,
)
from kinesis_iterator_spark.tables import load_table

TERMS = ["scan", "column", "window", "order", "sort"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def doc(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.persist()
    d.count()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").persist()
    e.count()
    yield e
    e.unpersist()


def _extended_bm25(spark, doc, root: str) -> str:
    idx = f"{root}/bm25"
    write_bm25_index(spark, doc.filter(F.col("doc_id") % 2 == 0), idx)
    extend_bm25_index(spark, doc.filter(F.col("doc_id") % 2 == 1), idx)
    return idx


# -- BM25 ---------------------------------------------------------------


def test_bm25_compaction_is_query_invisible(spark, doc, tmp_path):
    idx = _extended_bm25(spark, doc, str(tmp_path))
    before = _rows(bm25_scores_from_index(spark, idx, TERMS))
    df_rows_before = spark.read.parquet(f"{idx}/df").count()
    meta = compact_bm25_index(spark, idx)
    after = _rows(bm25_scores_from_index(spark, idx, TERMS))
    assert before and after == before
    # The per-segment df rows collapsed to ONE row per term.
    dfr = spark.read.parquet(f"{idx}/df")
    assert dfr.count() == dfr.select("term").distinct().count()
    assert dfr.count() < df_rows_before
    # Totals are invariant — the meta was not rewritten.
    assert meta["n_docs"] == doc.count()


def test_bm25_extend_after_compaction_keeps_scan_equality(
    spark, doc, tmp_path
):
    idx = f"{tmp_path}/bm25"
    thirds = [doc.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    write_bm25_index(spark, thirds[0], idx)
    extend_bm25_index(spark, thirds[1], idx)
    compact_bm25_index(spark, idx)
    extend_bm25_index(spark, thirds[2], idx)
    want = _rows(bm25_scores(doc, TERMS))
    assert _rows(bm25_scores_from_index(spark, idx, TERMS)) == want


def test_bm25_interrupted_swap_rolls_forward(spark, doc, tmp_path):
    """Crash between 'live renamed away' and 'stage renamed in': the
    reader self-heals by rolling the fully-written stage forward."""
    idx = _extended_bm25(spark, doc, str(tmp_path))
    want = _rows(bm25_scores_from_index(spark, idx, TERMS))
    os.rename(f"{idx}/df", f"{idx}/df.compact")
    assert _rows(bm25_scores_from_index(spark, idx, TERMS)) == want
    assert os.path.isdir(f"{idx}/df")
    assert not os.path.isdir(f"{idx}/df.compact")


def test_bm25_uncommitted_stage_is_discarded(spark, doc, tmp_path):
    """Crash BEFORE any swap: live dirs intact, stage leftovers next to
    them. The UNLOCKED read path must leave the stage alone (ADVICE r14
    — it may be another process's in-flight compaction) while still
    serving the live data; the next locked compaction consumes/replaces
    it and queries stay equal."""
    idx = _extended_bm25(spark, doc, str(tmp_path))
    want = _rows(bm25_scores_from_index(spark, idx, TERMS))
    os.makedirs(f"{idx}/postings.compact")
    with open(f"{idx}/postings.compact/garbage", "w") as fh:
        fh.write("not parquet")
    assert _rows(bm25_scores_from_index(spark, idx, TERMS)) == want
    assert os.path.isdir(f"{idx}/postings.compact")  # reader kept it
    compact_bm25_index(spark, idx)
    assert _rows(bm25_scores_from_index(spark, idx, TERMS)) == want
    assert not os.path.isdir(f"{idx}/postings.compact")


# -- ANN index ----------------------------------------------------------


def _extended_ann(spark, sf_dir, emb, root: str) -> str:
    idx = f"{root}/ann"
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    write_ann_index(spark, sf_dir, idx, emb=even, n=even.count())
    extend_ann_index(spark, odd, idx)
    return idx


def test_ann_compaction_is_query_invisible(spark, sf_dir, emb, tmp_path):
    idx = _extended_ann(spark, sf_dir, emb, str(tmp_path))
    lsh_before = _rows(similarity_lsh_topk_from_index(spark, sf_dir, idx))
    ivf_before = _rows(similarity_ivf_topk_from_index(spark, sf_dir, idx))
    sizes_before = _rows(stored_bucket_sizes(spark, idx))
    seg_rows_before = spark.read.parquet(f"{idx}/bucket_sizes").count()
    compact_ann_index(spark, idx)
    assert _rows(similarity_lsh_topk_from_index(spark, sf_dir, idx)) == lsh_before
    assert _rows(similarity_ivf_topk_from_index(spark, sf_dir, idx)) == ivf_before
    assert _rows(stored_bucket_sizes(spark, idx)) == sizes_before
    # Occupancy segments summed to one row per (table, bucket).
    assert (
        spark.read.parquet(f"{idx}/bucket_sizes").count()
        == len(sizes_before)
        < seg_rows_before
    )


def test_ann_pre_layer_index_gains_occupancy_layer(
    spark, sf_dir, emb, tmp_path
):
    """Compacting an index built before the bucket_sizes layer existed
    CREATES the layer (derived from stored signatures) — the upgrade
    path that retires the per-query window fallback."""
    idx = _extended_ann(spark, sf_dir, emb, str(tmp_path))
    want = _rows(similarity_lsh_topk_from_index(spark, sf_dir, idx))
    recount = _rows(
        spark.read.parquet(f"{idx}/lsh_signatures")
        .groupBy("table_id", "bucket")
        .agg(F.count("*").cast("long").alias("bsz"))
    )
    shutil.rmtree(f"{idx}/bucket_sizes")
    assert stored_bucket_sizes(spark, idx) is None
    compact_ann_index(spark, idx)
    assert _rows(stored_bucket_sizes(spark, idx)) == recount
    assert _rows(similarity_lsh_topk_from_index(spark, sf_dir, idx)) == want


def test_ann_interrupted_swap_rolls_forward(spark, sf_dir, emb, tmp_path):
    idx = _extended_ann(spark, sf_dir, emb, str(tmp_path))
    want = _rows(similarity_ivf_topk_from_index(spark, sf_dir, idx))
    os.rename(f"{idx}/ivf_assignment", f"{idx}/ivf_assignment.compact")
    assert _rows(similarity_ivf_topk_from_index(spark, sf_dir, idx)) == want
    assert os.path.isdir(f"{idx}/ivf_assignment")


# -- PQ codes -----------------------------------------------------------


def test_pq_codes_compaction_is_query_invisible(spark, sf_dir, emb, tmp_path):
    from kinesis_iterator_spark.queries.quantization import (
        compact_pq_codes,
        pq_topk_from_index,
        write_pq_layer,
        extend_pq_layer,
    )

    idx = str(tmp_path / "ann")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    write_pq_layer(spark, idx, even, m=8, ks=16, iters=1)
    extend_pq_layer(spark, idx, odd)
    q = [
        float(v)
        for v in emb.orderBy("vec_id").first()["embedding"]
    ]
    before = _rows(pq_topk_from_index(spark, idx, emb, q, topk=10))
    rows_before = spark.read.parquet(f"{idx}/pq_codes").count()
    compact_pq_codes(spark, idx)
    assert _rows(pq_topk_from_index(spark, idx, emb, q, topk=10)) == before
    assert spark.read.parquet(f"{idx}/pq_codes").count() == rows_before


# -- writer composition --------------------------------------------------


@pytest.mark.slow
def test_corpus_writer_compact_preserves_admission_semantics(
    spark, sf_dir, tmp_path
):
    """A writer that compacts mid-sequence admits EXACTLY what a control
    writer admits (same verdict stats, same final corpus, same BM25
    answers) — compaction is layout maintenance, never a semantic
    change."""
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    b1 = doc.filter(F.col("doc_id") % 2 == 0)
    b2 = doc.filter(F.col("doc_id") % 2 == 1)
    cfg = CurationConfig(dedup_paragraphs=True, dedup_exact_substr=True)
    writers = {}
    for name in ("compacted", "control"):
        w = CorpusWriter(
            spark,
            f"{tmp_path}/{name}/corpus",
            f"{tmp_path}/{name}/index",
            cfg,
            bm25_index=True,
        )
        w.admit(b1)
        if name == "compacted":
            w.compact()
            # Digest layers collapsed to distinct h rows, one rewrite.
            paras = spark.read.parquet(f"{tmp_path}/{name}/index/paragraphs")
            assert paras.count() == paras.distinct().count()
        stats2 = w.admit(b2)
        writers[name] = (w, stats2)
    w_c, s_c = writers["compacted"]
    w_r, s_r = writers["control"]
    assert s_c == s_r
    assert _rows(w_c.corpus().select("doc_id", "text")) == _rows(
        w_r.corpus().select("doc_id", "text")
    )
    assert _rows(w_c.bm25_topk(TERMS, topk=10)) == _rows(
        w_r.bm25_topk(TERMS, topk=10)
    )


def test_embedding_writer_compact_preserves_admission(
    spark, sf_dir, emb, tmp_path
):
    from kinesis_iterator_spark.pipeline import EmbeddingWriter

    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    writers = {}
    for name in ("compacted", "control"):
        w = EmbeddingWriter(
            spark,
            f"{tmp_path}/{name}/store",
            f"{tmp_path}/{name}/ann",
            pq_layer=True,
            pq_ks=16,
            pq_iters=1,
        )
        w.admit(b1)
        if name == "compacted":
            w.compact()
        stats2 = w.admit(b2)
        writers[name] = (w, stats2)
    w_c, s_c = writers["compacted"]
    w_r, s_r = writers["control"]
    assert s_c == s_r
    assert _rows(w_c.store().select("vec_id")) == _rows(
        w_r.store().select("vec_id")
    )


def test_data_compactor_single_pass_jobs_and_asof_equality(
    spark, doc, tmp_path
):
    """VERDICT r13 #2: `compact_data_snapshots` rewrites ALL generations
    in ONE partitioned Spark write (file→generation broadcast map +
    partitionBy(__gen)), not a sequential per-generation job loop —
    O(few) jobs however many generations the manifest records. Pins:
    every as_of bit-equal before/after (including an empty-delta
    generation), per-generation file attribution (gen prefixes), and
    the job count for a 6-generation dir stays under the old loop's
    floor (>= 2 jobs/generation)."""
    from kinesis_iterator_spark import incremental

    d = f"{tmp_path}/data"
    n_gens = 6
    for g in range(n_gens):
        delta = doc.filter(F.col("doc_id") % n_gens == g).select(
            "doc_id", "text"
        )
        if g == 4:  # an all-duplicate admit: empty delta, line recorded
            delta = delta.limit(0)
        delta.write.mode("append").parquet(d)
        assert incremental.record_snapshot(d, n=delta.count()) == g + 1
    before = {
        g: _rows(
            incremental.snapshot_read(spark, d, g).select("doc_id", "text")
        )
        for g in range(1, n_gens + 1)
    }
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    out = incremental.compact_data_snapshots(spark, d, ("doc_id",))
    jobs = len(tracker.getJobIdsForGroup(None)) - j0
    assert out["generations"] == n_gens
    assert jobs <= 5, f"expected O(few) jobs, measured {jobs}"
    for g in range(1, n_gens + 1):
        assert (
            _rows(
                incremental.snapshot_read(spark, d, g).select(
                    "doc_id", "text"
                )
            )
            == before[g]
        )
    # Per-generation attribution survives the single-pass rewrite.
    recs = incremental._read_snapshots(d)
    for i, rec in enumerate(recs):
        assert all(f.startswith(f"gen{i + 1:06d}-") for f in rec["files"])
    assert recs[4]["files"] == []  # the empty-delta generation
    assert [r["n"] for r in recs] == [
        doc.filter(F.col("doc_id") % n_gens == g).count() if g != 4 else 0
        for g in range(n_gens)
    ]


def test_data_compactor_collision_fallback_exact(spark, doc, tmp_path):
    """VERDICT r14 #2: the single-pass rewrite attributes rows by the
    minimal unique PATH SUFFIX, so two generations' files sharing a
    BASENAME (subdir-housed deltas) no longer fall back to the
    O(generations) sequential loop — the colliding dir compacts in the
    same O(few) jobs with exact as_of equality and gen-prefixed
    attribution."""
    import os

    from kinesis_iterator_spark import incremental

    d = f"{tmp_path}/data"
    for g, sub in enumerate(("a", "b"), start=1):
        delta = doc.filter(F.col("doc_id") % 2 == g - 1).select(
            "doc_id", "text"
        )
        delta.coalesce(1).write.mode("overwrite").parquet(f"{d}/{sub}")
        # Rename to a COLLIDING basename across the two subdirs.
        part = next(
            f for f in os.listdir(f"{d}/{sub}") if f.endswith(".parquet")
        )
        os.replace(f"{d}/{sub}/{part}", f"{d}/{sub}/part-same.parquet")
        for junk in os.listdir(f"{d}/{sub}"):
            if not junk.endswith(".parquet"):
                os.remove(f"{d}/{sub}/{junk}")
        assert incremental.record_snapshot(d) == g
    recs = incremental._read_snapshots(d)
    names = [os.path.basename(f) for r in recs for f in r["files"]]
    assert names == ["part-same.parquet", "part-same.parquet"]  # collision
    before = {
        g: _rows(
            incremental.snapshot_read(spark, d, g).select("doc_id", "text")
        )
        for g in (1, 2)
    }
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    incremental.compact_data_snapshots(spark, d, ("doc_id",))
    jobs = len(tracker.getJobIdsForGroup(None)) - j0
    assert jobs <= 5, f"collision must stay single-pass, measured {jobs}"
    for g in (1, 2):
        assert (
            _rows(
                incremental.snapshot_read(spark, d, g).select(
                    "doc_id", "text"
                )
            )
            == before[g]
        )
    recs = incremental._read_snapshots(d)
    for i, rec in enumerate(recs):
        assert rec["files"] and all(
            f.startswith(f"gen{i + 1:06d}-") for f in rec["files"]
        )


def test_data_compactor_schema_evolution_per_generation(
    spark, doc, tmp_path
):
    """ADVICE r14: generations whose parquet schemas differ (a column
    added in a later admit) must each keep their OWN schema through the
    rewrite — a single unchecked spark.read would take one file's schema
    and silently drop the evolved column. The compactor groups files by
    footer schema driver-side and runs one pass per group (O(#schemas)
    jobs, not O(generations))."""
    import os

    import pyarrow.parquet as pq

    from kinesis_iterator_spark import incremental

    d = f"{tmp_path}/data"
    g1 = doc.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    g1.write.mode("append").parquet(d)
    assert incremental.record_snapshot(d, n=g1.count()) == 1
    g2 = (
        doc.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .withColumn("lang_tag", F.lit("en"))
    )
    g2.write.mode("append").parquet(d)
    assert incremental.record_snapshot(d, n=g2.count()) == 2
    before1 = _rows(
        incremental.snapshot_read(spark, d, 1).select("doc_id", "text")
    )
    incremental.compact_data_snapshots(spark, d, ("doc_id",))
    recs = incremental._read_snapshots(d)
    cols = {
        g: sorted(
            {
                name
                for f in recs[g - 1]["files"]
                for name in pq.ParquetFile(
                    os.path.join(d, f)
                ).schema_arrow.names
            }
        )
        for g in (1, 2)
    }
    assert cols[1] == ["doc_id", "text"]
    assert cols[2] == ["doc_id", "lang_tag", "text"]
    assert (
        _rows(
            incremental.snapshot_read(spark, d, 1).select("doc_id", "text")
        )
        == before1
    )
    g2_rows = sorted(
        r["doc_id"]
        for f in recs[1]["files"]
        for r in pq.ParquetFile(os.path.join(d, f))
        .read()
        .to_pylist()
    )
    assert g2_rows == sorted(
        r["doc_id"] for r in g2.select("doc_id").collect()
    )


def test_data_compactor_jobs_flat_at_10k_generations(spark, tmp_path):
    """VERDICT r14 #4: the single-pass compactor's job count is O(few)
    at the 10^4-generation horizon SCALING.md budgets — pinned with a
    10,000-line manifest (tools/manifest_scale.py measures the
    full-file variant: 5 jobs flat at 10^2/10^3/10^4). Most deltas here
    are empty lines (the job count depends on live file groups, never
    on manifest depth), with real files spread across the history."""
    import json
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_iterator_spark import incremental

    d = tmp_path / "data"
    d.mkdir()
    n_gens = 10_000
    lines = []
    real = {}
    for g in range(n_gens):
        if g % 50 == 0:  # 200 generations with actual files
            name = f"part-{g:06d}-{uuid.uuid4().hex[:8]}.parquet"
            pq.write_table(
                pa.table({"doc_id": [2 * g, 2 * g + 1]}),
                str(d / name),
            )
            lines.append(json.dumps({"files": [name], "n": 2}))
            real[g + 1] = [2 * g, 2 * g + 1]
        else:
            lines.append(json.dumps({"files": [], "n": 0}))
    with open(incremental._snapshot_path(str(d)), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    assert incremental.snapshot_gens(str(d)) == n_gens
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    stats = incremental.compact_data_snapshots(spark, str(d), ("doc_id",))
    jobs = len(tracker.getJobIdsForGroup(None)) - j0
    assert jobs <= 5, f"expected O(few) jobs at 10k generations, got {jobs}"
    assert stats["generations"] == n_gens
    # Spot-check as_of equality at the head, a middle live gen, the tail.
    for g in (1, 5001, n_gens):
        want = sorted(
            v for gg, ids in real.items() if gg <= g for v in ids
        )
        got = sorted(
            r["doc_id"]
            for r in incremental.snapshot_read(spark, str(d), g).collect()
        )
        assert got == want, g
