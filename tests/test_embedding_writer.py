"""EmbeddingWriter: batch-at-a-time vector admission over the persisted
ANN index — the embedding-side twin of CorpusWriter (same first-seen-wins
semantics, same append-then-extend crash-safety posture).

Reference parity note: the incremental-admission shape follows the
reference's checkpoint discipline (kinesis.go sequence-store usage, see
SURVEY §2.A A6/A8) — state persisted per batch so the next batch's work
is bounded by the batch, not the history.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.pipeline import EmbeddingWriter
from kinesis_iterator_spark.tables import load_table


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _writer(spark, tmp_path) -> EmbeddingWriter:
    return EmbeddingWriter(
        spark, str(tmp_path / "store"), str(tmp_path / "ann_idx")
    )


def test_bootstrap_then_full_reingest_rejected(spark, emb, tmp_path):
    """First batch bootstraps store + index; re-admitting the SAME batch
    admits nothing (every in-batch survivor is its own stored near-dup
    at cosine 1)."""
    w = _writer(spark, tmp_path)
    batch = emb.filter(F.col("vec_id") % 2 == 0)
    s1 = w.admit(batch)
    assert s1["n_input"] == batch.count()
    assert s1["rejected_near"] == 0
    assert s1["n_admitted"] == s1["n_input"] - s1["rejected_in_batch"]
    assert w.store().count() == s1["n_admitted"]

    s2 = w.admit(batch)
    assert s2["n_admitted"] == 0
    assert (
        s2["rejected_in_batch"] + s2["rejected_near"] == s2["n_input"]
    )
    assert w.store().count() == s1["n_admitted"]


def test_disjoint_batches_accumulate_and_become_findable(
    spark, emb, tmp_path
):
    """A second disjoint batch appends its novel vectors and extends the
    index, so re-ingesting the ADMITTED part of that batch is then fully
    rejected — extend-then-redetect, the text side's invariant."""
    w = _writer(spark, tmp_path)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    s1 = w.admit(even)
    s2 = w.admit(odd)
    assert w.store().count() == s1["n_admitted"] + s2["n_admitted"]

    admitted_odd = w.store().join(
        odd.select("vec_id"), "vec_id", "leftsemi"
    )
    assert admitted_odd.count() == s2["n_admitted"]
    s3 = w.admit(admitted_odd)
    assert s3["n_admitted"] == 0


def test_in_batch_copies_lose_to_smaller_ids(spark, emb, tmp_path):
    """A batch carrying exact copies under larger ids keeps only the
    original ids (the greedy smallest-id policy of the registered
    dedup_embedding_cosine query)."""
    w = _writer(spark, tmp_path)
    base = emb.filter(F.col("vec_id") < 50)
    copies = base.withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    s = w.admit(base.unionByName(copies))
    assert s["rejected_in_batch"] >= base.count()
    assert (
        w.store().filter(F.col("vec_id") >= 1_000_000).count() == 0
    )


def test_bootstrap_crash_heals_without_overwriting_store(
    spark, emb, tmp_path
):
    """A crash between the bootstrap store write and the index meta.json
    (simulated by deleting meta.json) must NOT re-bootstrap with an
    overwrite: the next admit reconciles the index from the store and
    appends normally."""
    import os

    w = _writer(spark, tmp_path)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    s1 = w.admit(even)
    os.remove(f"{w.index_dir}/meta.json")

    odd = emb.filter(F.col("vec_id") % 2 == 1)
    s2 = w.admit(odd)
    kept_even = w.store().join(even.select("vec_id"), "vec_id", "leftsemi")
    assert kept_even.count() == s1["n_admitted"]
    assert w.store().count() == s1["n_admitted"] + s2["n_admitted"]


def test_sign_once_probe_equals_recomputed_probe(spark, emb, tmp_path):
    """The writer's sign-once path (batch_sig handed to
    embedding_dedup_against_index) must classify identically to the
    recomputed-signature path — signatures are a pure per-vector
    function, so filtered reuse is exact."""
    from kinesis_iterator_spark import incremental
    from kinesis_iterator_spark.queries.similarity import (
        _read_ann_meta,
        lsh_signatures,
    )

    w = _writer(spark, tmp_path)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    w.admit(even)

    meta = _read_ann_meta(w.index_dir)
    par = spark.sparkContext.defaultParallelism
    sig = lsh_signatures(odd.select("vec_id", "embedding"), meta["b"], par)

    def rows(df):
        return sorted(
            (r["vec_id"], r["verdict"], r["dup_of"]) for r in df.collect()
        )

    got = rows(
        incremental.embedding_dedup_against_index(
            spark, odd, w.index_dir, corpus_emb=w.store(), batch_sig=sig
        )
    )
    want = rows(
        incremental.embedding_dedup_against_index(
            spark, odd, w.index_dir, corpus_emb=w.store()
        )
    )
    assert got == want


def test_drift_warns_then_auto_reconcile_refreshes_codebook(
    spark, emb, tmp_path
):
    """Appending far more than the build-time corpus must surface: the
    default writer warns past ANN_DRIFT_FACTOR; auto_reconcile=True
    rebuilds instead (fresh codebook, meta n reset to the store, drift
    back to zero) — the `CorpusWriter.auto_compact` split."""
    import warnings

    from kinesis_iterator_spark.queries.similarity import (
        _read_ann_meta,
        ann_index_drift,
    )

    small = emb.filter(F.col("vec_id") < 100)
    rest = emb.filter(F.col("vec_id") >= 100)

    w = _writer(spark, tmp_path / "warn")
    w.admit(small)
    with pytest.warns(UserWarning, match="codebook"):
        w.admit(rest)
    assert ann_index_drift(w.index_dir) > 1.0

    w2 = EmbeddingWriter(
        spark,
        str(tmp_path / "auto" / "store"),
        str(tmp_path / "auto" / "ann_idx"),
        auto_reconcile=True,
    )
    w2.admit(small)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w2.admit(rest)
    meta = _read_ann_meta(w2.index_dir)
    assert ann_index_drift(w2.index_dir) == 0.0
    assert meta["n"] == w2.store().count()


def test_interrupted_rebuild_fails_queries_and_heals_on_admit(
    spark, emb, tmp_path
):
    """A rebuild.inprogress marker (crash inside write_ann_index's
    in-place overwrite) must fail index queries LOUDLY — a
    half-rebuilt signature store can mix bit geometries and silently
    match nothing — and the next admit must heal via reconcile."""
    import os

    from kinesis_iterator_spark import incremental

    w = _writer(spark, tmp_path)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    s1 = w.admit(even)
    marker = f"{w.index_dir}/rebuild.inprogress"
    open(marker, "w").close()

    with pytest.raises(ValueError, match="unfinished in-place rebuild"):
        incremental.embedding_dedup_against_index(
            spark, odd, w.index_dir, corpus_emb=w.store()
        )

    s2 = w.admit(odd)
    assert not os.path.exists(marker)
    assert w.store().count() == s1["n_admitted"] + s2["n_admitted"]
    s3 = w.admit(odd)
    assert s3["n_admitted"] == 0


def test_torn_meta_write_heals_instead_of_bricking(spark, emb, tmp_path):
    """A 0-byte meta.json (torn write under the pre-atomic layout, or a
    crashed replace) must NOT brick the writer: _bootstrapped treats
    unreadable meta as un-bootstrapped, the existing store routes admit
    through reconcile, and admission proceeds."""
    w = _writer(spark, tmp_path)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    s1 = w.admit(even)
    open(f"{w.index_dir}/meta.json", "w").close()

    s2 = w.admit(odd)
    kept_even = w.store().join(even.select("vec_id"), "vec_id", "leftsemi")
    assert kept_even.count() == s1["n_admitted"]
    assert w.store().count() == s1["n_admitted"] + s2["n_admitted"]


def test_admit_rejects_duplicated_batch_ids(spark, emb, tmp_path):
    w = _writer(spark, tmp_path)
    batch = emb.filter(F.col("vec_id") < 20)
    with pytest.raises(ValueError, match="unique"):
        w.admit(batch.unionByName(batch.limit(3)))


def test_admit_validates_uint32_ids_at_bootstrap(spark, emb, tmp_path):
    w = _writer(spark, tmp_path)
    bad = emb.limit(5).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1 << 32)
    )
    with pytest.raises(ValueError, match="uint64"):
        w.admit(bad)


@pytest.mark.slow
def test_stream_feeds_embedding_writer_checkpoint_resume(
    spark, sf_dir, tmp_path
):
    """The vector twin of the text side's stream composition (VERDICT r8
    #4): an Iterator (A5 handler / A6 post-handler checkpoint / A8
    resume) feeds every trigger batch into EmbeddingWriter.admit. The
    run stops mid-stream; a NEW Iterator resumes from the same saver and
    the resumed store must equal an uninterrupted run's; a full replay
    from TRIM_HORIZON re-delivers everything and admits zero (every
    replayed vector is its own stored near-dup at cosine 1)."""
    from kinesis_iterator_spark.streaming import (
        Iterator,
        JsonFileSaver,
        SimulatedShardedSource,
    )

    # Deterministic 32-dim embedding derived from the payload text
    # (md5-mixed per dimension, one F.expr so plan building costs one
    # py4j call, not 32): identical payloads -> identical vectors
    # (cosine 1, the near-dup layer's job); distinct payloads ->
    # pseudo-random directions, far apart at the writer's tau=0.9.
    # The key is (partitionKey, payload): the stream's 100 distinct
    # payloads alone fit inside one generous first poll, which would
    # leave the resumed run nothing to admit — the richer key keeps
    # novel directions arriving across polls while staying a pure
    # function of the record (so a replayed record is always its own
    # stored near-dup at cosine 1).
    dims = ",".join(
        "cast((cast(conv(substring(md5(concat(pk, ':', payload, '"
        f"{j}')), 1, 15), 16, 10) as bigint) % 1000) / 1000.0 - 0.5 "
        "as float)"
        for j in range(32)
    )

    def records_to_vectors(df):
        # label is an int column in the store schema (the fixture's
        # convention, and the scorer returns it as int32).
        return df.select(
            F.col("sequenceNumber").cast("long").alias("vec_id"),
            F.pmod(F.col("sequenceNumber").cast("long"), F.lit(97))
            .cast("int")
            .alias("label"),
            F.col("partitionKey").alias("pk"),
            F.decode("data", "UTF-8").alias("payload"),
        ).select("vec_id", "label", F.expr(f"array({dims})").alias("embedding"))

    root = str(tmp_path)

    def consume(writer, saver_path, max_polls=1000):
        stats = []
        it = (
            Iterator(SimulatedShardedSource(spark, sf_dir, n_shards=4))
            .set_saver(JsonFileSaver(saver_path))
            .set_fetch_limit(120)
            .foreach_batch(
                lambda df, e: stats.append(
                    writer.admit(records_to_vectors(df))
                )
            )
        )
        it.run_until_drained(max_polls=max_polls)
        return stats

    w = EmbeddingWriter(spark, f"{root}/store", f"{root}/ann", tau=0.9)
    first = consume(w, f"{root}/ck.json", max_polls=1)
    assert sum(s["n_admitted"] for s in first) > 0
    mid_ids = {r["vec_id"] for r in w.store().select("vec_id").collect()}
    rest = consume(w, f"{root}/ck.json")
    assert sum(s["n_input"] for s in rest) > 0, "resume delivered nothing"
    assert sum(s["n_admitted"] for s in rest) > 0, "resume admitted nothing"

    # Uninterrupted reference run (the source is deterministic, so the
    # trigger sequence is identical).
    w_ref = EmbeddingWriter(
        spark, f"{root}/ref_store", f"{root}/ref_ann", tau=0.9
    )
    consume(w_ref, f"{root}/ref_ck.json")

    ids = lambda wr: sorted(  # noqa: E731
        r["vec_id"] for r in wr.store().select("vec_id").collect()
    )
    assert ids(w) == ids(w_ref), "resumed store diverged from uninterrupted"
    assert mid_ids <= set(ids(w)), "resume lost pre-interruption admissions"
    # First-seen-wins left exactly one stored vector per distinct
    # payload direction: every stored pair is below tau by construction
    # of the admission rule, and re-deriving embeddings from stored
    # labels is unnecessary — the replay below is the semantic check.

    # Full replay from TRIM_HORIZON (fresh checkpoint store) into the
    # SAME writer: at-least-once re-delivery, zero double-admissions.
    replay = consume(w, f"{root}/replay_ck.json")
    assert sum(s["n_admitted"] for s in replay) == 0
    assert all(
        s["rejected_in_batch"] + s["rejected_near"] == s["n_input"]
        for s in replay
    )
    assert ids(w) == ids(w_ref), "replay mutated the store"


def test_cross_writer_rebuild_invalidates_cached_codebook(
    spark, emb, tmp_path
):
    """The per-writer codebook cache is keyed on the index's build
    identity (meta n, b): a rebuild by ANOTHER writer handle over the
    grown store changes that key, so the first writer's next admit
    re-collects the FRESH centroids instead of assigning cells with
    the stale cached codebook (stale cells would park appended rows in
    buckets the probe path never visits — silent re-admission)."""
    import warnings

    from kinesis_iterator_spark.queries.similarity import _read_ann_meta

    small = emb.filter(F.col("vec_id") < 200)
    mid = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))
    rest = emb.filter(F.col("vec_id") >= 300)

    w_a = _writer(spark, tmp_path)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        w_a.admit(small)  # bootstrap: no cache yet
        w_a.admit(mid)  # append: cache warms against the small-build key
    assert w_a._crows_key is not None
    stale_key = w_a._crows_key

    # A SECOND handle on the same state rebuilds (fresh codebook over
    # the grown store, meta n reset) — w_a is never told.
    w_b = EmbeddingWriter(spark, w_a.store_dir, w_a.index_dir)
    w_b.reconcile()
    meta = _read_ann_meta(w_a.index_dir)
    assert (meta["n"], meta["b"]) != stale_key

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = w_a.admit(rest)
    assert s["n_admitted"] > 0
    assert w_a._crows_key == (meta["n"], meta["b"]), (
        "admit after a cross-writer rebuild must re-key the cache"
    )
    # The behavioral stake: rows extended post-rebuild live in cells
    # the CURRENT codebook probes — re-admitting them rejects all.
    admitted = w_a.store().join(rest.select("vec_id"), "vec_id", "leftsemi")
    s2 = w_a.admit(admitted)
    assert s2["n_admitted"] == 0
