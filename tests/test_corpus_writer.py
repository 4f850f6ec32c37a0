"""CorpusWriter: batch-at-a-time corpus admission (gates + in-batch dedup
+ vs-corpus dedup + index extension). Fixture docs arrive as two batches;
re-submissions and cross-batch duplicates must be rejected, and the
sequence must be deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
from kinesis_iterator_spark.tables import load_table


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


def _run_sequence(spark, batches, root):
    w = CorpusWriter(
        spark, f"{root}/corpus", f"{root}/index", CurationConfig()
    )
    s1 = w.admit(batches[0])
    s2 = w.admit(batches[1])
    return w, s1, s2


@pytest.fixture(scope="module")
def run(spark, batches, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("writer"))
    return _run_sequence(spark, batches, root)


def test_first_batch_bootstrap(run):
    _, s1, _ = run
    assert s1["n_admitted"] == s1["n_kept"] > 0
    assert s1["rejected_exact"] == 0 and s1["rejected_near"] == 0


def test_second_batch_rejects_cross_batch_dups(run):
    """The fixture's planted near-dup clusters straddle the even/odd
    split, so batch 2 must lose documents to the corpus admitted from
    batch 1."""
    _, _, s2 = run
    assert s2["n_admitted"] < s2["n_kept"]
    assert s2["rejected_exact"] + s2["rejected_near"] > 0
    assert s2["n_admitted"] == (
        s2["n_kept"] - s2["rejected_exact"] - s2["rejected_near"]
    )


def test_corpus_matches_admission_counts_and_is_exact_dup_free(run):
    w, s1, s2 = run
    corpus = w.corpus()
    assert set(corpus.columns) == {"doc_id", "lang", "source", "text", "tokens"}
    assert corpus.count() == s1["n_admitted"] + s2["n_admitted"]
    assert (
        corpus.select(F.md5("text")).distinct().count() == corpus.count()
    ), "admitted corpus contains exact duplicates"


def test_resubmission_of_admitted_corpus_is_fully_rejected(spark, run):
    w, _, _ = run
    resubmit = w.corpus().select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "lang", "source", "text"
    )
    s = w.admit(resubmit)
    assert s["n_admitted"] == 0
    assert s["rejected_exact"] == s["n_kept"]


def test_sequence_is_deterministic(spark, batches, run, tmp_path_factory):
    w, s1, s2 = run
    root2 = str(tmp_path_factory.mktemp("writer_replay"))
    w2, r1, r2 = _run_sequence(spark, batches, root2)
    assert (r1, r2) == (s1, s2)
    ids = lambda frame: sorted(  # noqa: E731
        r["doc_id"] for r in frame.select("doc_id").collect()
    )
    # The replay corpus contains the resubmission-test state only in the
    # original writer; compare against the first two admissions.
    expected = [i for i in ids(w.corpus()) if i < 5_000_000]
    assert ids(w2.corpus()) == expected


def test_reconcile_recovers_corpus_index_divergence(spark, run, tmp_path):
    """Simulate a crash inside admit()'s append-then-extend window: docs
    in the corpus but missing from the index are re-admittable until
    reconcile() rebuilds the index from the corpus."""
    import shutil

    from kinesis_iterator_spark.pipeline import CorpusWriter

    w, _, _ = run
    root = str(tmp_path / "crashed")
    shutil.copytree(w.corpus_dir, f"{root}/corpus")
    w2 = CorpusWriter(spark, f"{root}/corpus", f"{root}/index", w.config)
    # Index built from only a fraction of the corpus = the crash state.
    from kinesis_iterator_spark import incremental

    incremental.write_index(w2.corpus().limit(5), f"{root}/index")
    resub = w2.corpus().select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "lang", "source", "text"
    )
    leaky = w2.admit(resub)
    assert leaky["n_admitted"] > 0, "crash window must be reproducible"
    # Recover: rebuild index from corpus (which now includes the leaked
    # duplicates); a fresh resubmission is fully rejected again.
    w2.reconcile()
    resub2 = w2.corpus().select(
        (F.col("doc_id") + 90_000_000).alias("doc_id"), "lang", "source", "text"
    )
    s = w2.admit(resub2)
    assert s["n_admitted"] == 0


def test_bootstrap_crash_does_not_overwrite_corpus(spark, run, tmp_path):
    """ADVICE r7: a crash AFTER the bootstrap corpus write but BEFORE the
    index meta lands used to make the next admit() re-bootstrap — and
    overwrite the corpus with the new batch. admit() must instead
    recover the index from the existing corpus and append."""
    import os
    import shutil

    w, _, _ = run
    root = str(tmp_path / "crashed_bootstrap")
    shutil.copytree(w.corpus_dir, f"{root}/corpus")
    # The crash state: corpus on disk, index directory absent entirely.
    w2 = CorpusWriter(spark, f"{root}/corpus", f"{root}/index", w.config)
    assert not os.path.exists(f"{root}/index/meta.json")
    before = {r["doc_id"] for r in w2.corpus().select("doc_id").collect()}

    fresh = w2.corpus().select(
        (F.col("doc_id") + 70_000_000).alias("doc_id"), "lang", "source", "text"
    )
    s = w2.admit(fresh)
    after = {r["doc_id"] for r in w2.corpus().select("doc_id").collect()}
    assert before <= after, "pre-crash corpus content was lost"
    # The resubmitted copies were recognized against the recovered index.
    assert s["n_admitted"] == 0 and s["rejected_exact"] == s["n_kept"]
    assert os.path.exists(f"{root}/index/meta.json")


@pytest.mark.slow
def test_stream_feeds_corpus_writer_checkpoint_resume(spark, sf_dir, tmp_path):
    """The composition the repo exists for (VERDICT r7 #5): the
    reference's consumption loop (A5 handler / A6 post-handler
    checkpoint / A8 resume) driving the LLM-curation surface. An
    Iterator feeds every trigger batch into CorpusWriter.admit; the run
    stops mid-stream and a NEW Iterator resumes from the same
    checkpoint store. The resumed corpus must equal an uninterrupted
    run's, and a full replay from TRIM_HORIZON must admit nothing
    (first-seen wins)."""
    from kinesis_iterator_spark.streaming import (
        Iterator,
        JsonFileSaver,
        SimulatedShardedSource,
    )

    def records_to_docs(df):
        # sequenceNumber is the zero-padded event_id: globally unique —
        # exactly the "sequence-number-derived ids" admit() requires.
        return df.select(
            F.col("sequenceNumber").cast("long").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.col("streamName").alias("source"),
            F.decode("data", "UTF-8").alias("text"),
        )

    # props payloads are 2-word JSON strings: min_words=1 admits them,
    # and 3-shingle MinHash has no shingles to band, so the vs-corpus
    # rejection is the deterministic exact-digest layer.
    cfg = CurationConfig(min_words=1)
    root = str(tmp_path)

    def consume(writer, saver_path, max_polls=1000):
        stats = []
        it = (
            Iterator(SimulatedShardedSource(spark, sf_dir, n_shards=4))
            .set_saver(JsonFileSaver(saver_path))
            .set_fetch_limit(80)
            .foreach_batch(
                lambda df, e: stats.append(writer.admit(records_to_docs(df)))
            )
        )
        it.run_until_drained(max_polls=max_polls)
        return stats

    # Interrupted-then-resumed run: one poll, then a NEW Iterator on the
    # same saver finishes the stream.
    w = CorpusWriter(spark, f"{root}/corpus", f"{root}/index", cfg)
    first = consume(w, f"{root}/ck.json", max_polls=1)
    assert sum(s["n_admitted"] for s in first) > 0
    mid_ids = {r["doc_id"] for r in w.corpus().select("doc_id").collect()}
    # r14: every trigger batch recorded one admission generation — the
    # stream feed composes with the snapshot machinery.
    gens_mid = w.snapshots()
    assert gens_mid == len(first)
    frozen = {
        g: sorted(
            r["doc_id"]
            for r in w.corpus(as_of=g).select("doc_id").collect()
        )
        for g in range(1, gens_mid + 1)
    }
    rest = consume(w, f"{root}/ck.json")
    assert sum(s["n_input"] for s in rest) > 0, "resume delivered nothing"
    # The fixture's first 80-per-shard poll covers 99 of the 100 distinct
    # payloads — the resumed run must pick up the remainder.
    assert sum(s["n_admitted"] for s in rest) > 0, "resume admitted nothing"

    # Uninterrupted reference run with the same batch shape (the source
    # is deterministic, so the trigger sequence is identical).
    w_ref = CorpusWriter(spark, f"{root}/ref_corpus", f"{root}/ref_index", cfg)
    consume(w_ref, f"{root}/ref_ck.json")

    ids = lambda wr: sorted(  # noqa: E731
        r["doc_id"] for r in wr.corpus().select("doc_id").collect()
    )
    assert ids(w) == ids(w_ref), "resumed corpus diverged from uninterrupted"
    assert mid_ids <= set(ids(w)), "resume lost pre-interruption admissions"
    # Exactly one representative per distinct payload survived.
    texts = w.corpus().select("text").collect()
    assert len({r["text"] for r in texts}) == len(texts)

    # Full replay from TRIM_HORIZON (fresh checkpoint store) into the
    # SAME corpus: at-least-once re-delivery of everything, zero
    # double-admissions.
    replay = consume(w, f"{root}/replay_ck.json")
    assert sum(s["n_admitted"] for s in replay) == 0
    assert all(
        s["rejected_exact"] + s["rejected_near"] == s["n_kept"] for s in replay
    )
    assert ids(w) == ids(w_ref), "replay mutated the corpus"
    # r14: the at-least-once replay appended (all-duplicate, empty-
    # delta) generations; every pre-interruption era still reads
    # bit-equal under its pin — a crash/replay of the ingestion loop
    # never disturbs a training snapshot someone already took.
    assert w.snapshots() == gens_mid + len(rest) + len(replay)
    for g in range(1, gens_mid + 1):
        assert (
            sorted(
                r["doc_id"]
                for r in w.corpus(as_of=g).select("doc_id").collect()
            )
            == frozen[g]
        )
    assert sorted(mid_ids) == frozen[gens_mid]


def test_admit_decontaminates_against_benchmark(spark, batches, tmp_path):
    """ADVICE r7 stretch: with a benchmark frame configured, admit()
    applies the text_decontaminate kernel per batch — survivors sharing
    k-gram shingles with the benchmark are rejected BEFORE touching the
    corpus or index, and the stats account for them."""
    b1, _ = batches
    bench = b1.orderBy("doc_id").limit(3).select("doc_id", "text").persist()
    bench_texts = {r["text"] for r in bench.collect()}
    root = str(tmp_path)
    w = CorpusWriter(
        spark,
        f"{root}/corpus",
        f"{root}/index",
        CurationConfig(),
        benchmark_doc=bench,
    )
    s = w.admit(b1)
    # The benchmark docs travel inside the batch: any of them that
    # survive the in-batch pipeline are 100%-contaminated and rejected.
    assert s["rejected_contaminated"] > 0
    assert s["n_admitted"] == (
        s["n_kept"]
        - s["rejected_contaminated"]
        - s["rejected_exact"]
        - s["rejected_near"]
    )
    corpus_texts = {r["text"] for r in w.corpus().select("text").collect()}
    assert not (bench_texts & corpus_texts), (
        "benchmark text leaked into the corpus"
    )
    # A writer with no benchmark admits strictly more from the same batch.
    w0 = CorpusWriter(
        spark, f"{root}/c0", f"{root}/i0", CurationConfig()
    )
    s0 = w0.admit(b1)
    assert s0["rejected_contaminated"] == 0
    assert s0["n_admitted"] > s["n_admitted"]
    bench.unpersist()


@pytest.mark.slow
def test_auto_compact_bounds_index_drift(spark, batches, tmp_path):
    """auto_compact=True: an admit that leaves band-row growth past
    COMPACT_DRIFT_FACTOR must compact in-loop — the index afterwards
    equals a fresh rebuild of the written corpus, and the next admit
    raises no drift warning."""
    import warnings

    from kinesis_iterator_spark import incremental

    b1, b2 = batches
    # Tiny bootstrap (8 docs) then a large append → guaranteed drift.
    root = str(tmp_path / "ac")
    w = CorpusWriter(
        spark,
        f"{root}/corpus",
        f"{root}/index",
        CurationConfig(),
        auto_compact=True,
    )
    w.admit(b1.limit(8))
    w.admit(b1.join(b1.limit(8).select("doc_id"), "doc_id", "left_anti"))
    drift = incremental.index_drift(f"{root}/index")
    assert drift is not None and drift <= incremental.COMPACT_DRIFT_FACTOR

    fresh = str(tmp_path / "fresh_idx")
    incremental.write_index(
        w.corpus().select("doc_id", "text"), fresh
    )
    bands = lambda d: {  # noqa: E731
        (r["doc_id"], r["band_id"], r["band_key"])
        for r in spark.read.parquet(f"{d}/bands").collect()
    }
    assert bands(f"{root}/index") == bands(fresh)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w.admit(b2.limit(5))


@pytest.mark.slow
def test_structured_stream_feeds_corpus_writer(spark, sf_dir, tmp_path):
    """The Spark-native shape of the stream→curation composition (the
    Iterator form is pinned above): the sim_kinesis DataSource's paged
    available_now drain feeds every micro-batch into CorpusWriter.admit
    via foreachBatch, Spark's checkpoint store providing the batch
    boundaries; a full replay with a fresh checkpoint admits nothing
    (first-seen wins through the persisted index)."""
    from kinesis_iterator_spark.streaming import (
        datasource as ds,
        register_sim_kinesis,
    )

    register_sim_kinesis(spark, under_drain_guard=False)
    cfg = CurationConfig(min_words=1)
    root = str(tmp_path)

    def to_docs(df):
        return df.select(
            F.col("sequenceNumber").cast("long").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.col("streamName").alias("source"),
            F.decode("data", "UTF-8").alias("text"),
        )

    def drain(writer, ck):
        stats = []
        q = (
            spark.readStream.format(ds.FORMAT_NAME)
            .option("path", sf_dir)
            .option("n_shards", 4)
            .option("available_now", "true")
            .option("limit", 200)
            .load()
            .writeStream.foreachBatch(
                lambda df, e: stats.append(writer.admit(to_docs(df)))
            )
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        assert ds.await_drained(q, sf_dir, n_shards=4, timeout=300)
        return stats

    w = CorpusWriter(spark, f"{root}/corpus", f"{root}/index", cfg)
    stats = drain(w, f"{root}/ck")
    assert len(stats) > 1, "paged drain should produce multiple batches"
    assert sum(s["n_admitted"] for s in stats) > 0
    # one representative per distinct payload across ALL micro-batches
    texts = w.corpus().select("text").collect()
    assert len({r["text"] for r in texts}) == len(texts)

    replay = drain(w, f"{root}/ck_replay")
    assert sum(s["n_input"] for s in replay) > 0
    assert sum(s["n_admitted"] for s in replay) == 0
    assert all(
        s["rejected_exact"] + s["rejected_near"] == s["n_kept"]
        for s in replay
    )
