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
