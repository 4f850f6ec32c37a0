"""Incremental deduplication: admit a NEW batch of documents against an
already-curated corpus without re-deduplicating the corpus.

At the 100 TB design point a corpus is not rebuilt when data arrives — the
batch (GBs) is checked against a persisted index (digests + LSH band
buckets) built once from the corpus (TBs). Cost scales with the BATCH:

- the corpus is never re-read, re-shingled, or re-banded — only its index
  (≤ ~50 B/doc: one 16-byte digest row + 4 slim band rows) is joined;
- the batch side runs the exact same signature pipeline as the full
  `dedup_minhash_lsh` path (`dedup.minhash_bands` — one shared
  implementation, so batch bands are bit-compatible with stored bands);
- exact-Jaccard verification reads corpus TEXT only for candidate hits (a
  sliver), via an equi-join on doc_id — point lookups, not a scan.

The reference engine's analogue is checkpoint-resume (SURVEY §2.A A8):
state from a previous run bounds the work of the next. Here the "state"
is the dedup index; `extend_index` plays the role of the post-batch
checkpoint save.

Index layout (parquet + meta sidecar, the `write_ann_index` convention):

- ``{index_dir}/digests/``  — (doc_id, digest) md5 of text (exact dup key)
- ``{index_dir}/bands/``    — (doc_id, band_id, band_key) MinHash-LSH band
  rows; buckets larger than `dedup.MAX_BUCKET` are DROPPED at write
  time, mirroring the full path's hot-bucket rule (a mega-bucket is
  boilerplate — its members are better caught by exact dedup)
- ``{index_dir}/meta.json`` — the LSH parameters the index was built with;
  verified against the library's constants at query time so an index
  built under different banding fails loudly instead of silently missing
  near-dups.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries.dedup import (
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    N_BANDS,
    N_HASHES,
    minhash_bands,
    verify_jaccard,
)

def _current_meta() -> dict:
    """The LSH parameters this library would build an index with — the
    single source for both the write-time sidecar and the query-time
    staleness check (one dict, so a future parameter cannot be added to
    one side and slip past the other)."""
    return {
        "n_hashes": N_HASHES,
        "n_bands": N_BANDS,
        "max_bucket": MAX_BUCKET,
        "jaccard_threshold": JACCARD_THRESHOLD,
    }


def _digests(doc: DataFrame) -> DataFrame:
    return doc.select("doc_id", F.md5("text").alias("digest"))


def _capped_bands(doc: DataFrame) -> DataFrame:
    """Band rows with the stored-side hot-bucket rule MIRRORING the full
    path: `minhash_pairs` emits NO pairs from a bucket larger than
    MAX_BUCKET (mega-buckets are boilerplate — exact dedup's job), so
    the stored index DROPS such buckets entirely rather than keeping a
    truncated sample that would reject docs the full recompute admits.
    Deterministic, so rebuild == build. Residual incremental-vs-full
    difference: a bucket can exceed the cap only ACROSS corpus+batch —
    the union-run would then drop it while the incremental check still
    pairs batch docs against the ≤MAX_BUCKET stored members; that errs
    toward rejecting near-dups of boilerplate, never toward admitting."""
    n_in_bucket = F.count("*").over(W.partitionBy("band_id", "band_key"))
    return (
        minhash_bands(doc)
        .withColumn("_n", n_in_bucket)
        .filter(F.col("_n") <= MAX_BUCKET)
        .drop("_n")
    )


def write_index(doc: DataFrame, index_dir: str) -> dict:
    """Build the dedup index for a (doc_id, text) corpus frame. One pass
    for digests, one signature pipeline for bands; nothing wider than
    (doc_id, band_key) is shuffled. Returns the meta dict."""
    _digests(doc).write.mode("overwrite").parquet(f"{index_dir}/digests")
    _capped_bands(doc).write.mode("overwrite").parquet(f"{index_dir}/bands")
    meta = _current_meta()
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/meta.json", "w") as fh:
        json.dump(meta, fh)
    return meta


def _check_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/meta.json") as fh:
        meta = json.load(fh)
    current = _current_meta()
    stale = {k: (meta.get(k), current[k]) for k in current if meta.get(k) != current[k]}
    if stale:
        raise ValueError(
            f"dedup index at {index_dir} was built with different LSH "
            f"parameters than this library: {stale} (stored, current). "
            "Rebuild the index with write_index."
        )
    return meta


def dedup_against_index(
    spark: SparkSession,
    new_doc: DataFrame,
    index_dir: str,
    corpus_doc: DataFrame,
) -> DataFrame:
    """Classify each NEW document against the indexed corpus.

    Returns one row per new document:
    (doc_id, verdict, dup_of, jaccard) where verdict ∈
    ``exact_dup`` (byte-identical to a corpus doc; dup_of = smallest
    matching corpus id, jaccard = 1.0), ``near_dup`` (an LSH candidate
    whose exact 3-shingle Jaccard against a corpus doc ≥ the library
    threshold; dup_of = the corpus doc with the highest jaccard,
    smallest-id tiebreak), or ``novel``.

    ``corpus_doc`` is the corpus (doc_id, text) frame — consulted ONLY
    for candidate hits' text via an equi-join (the curated corpus parquet
    or its sharded output; at scale these are point lookups against a
    sliver of doc_ids, not a corpus scan). Exact dups are excluded from
    the near-dup check (they are already fully accounted). Batch-internal
    duplicates are deliberately out of scope — run the batch through
    `pipeline.curate_frame` first; this function answers only
    "is it new RELATIVE TO the corpus".
    """
    _check_meta(index_dir)
    stored_digests = spark.read.parquet(f"{index_dir}/digests")
    stored_bands = spark.read.parquet(f"{index_dir}/bands")

    # Exact: smallest corpus doc sharing the digest. AQE broadcasts the
    # batch-side digest frame (small by construction) under the join.
    exact = (
        _digests(new_doc)
        .join(
            stored_digests.select(
                F.col("doc_id").alias("dup_of"), "digest"
            ),
            "digest",
        )
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .withColumn("verdict", F.lit("exact_dup"))
        .withColumn("jaccard", F.lit(1.0))
    )

    # Near: band the non-exact remainder of the batch (the only shingle/
    # signature work this function does), join band rows against the
    # stored buckets, verify candidates' exact Jaccard against corpus
    # text, keep the best corpus match per new doc.
    remainder = new_doc.join(exact.select("doc_id"), "doc_id", "left_anti")
    cand = (
        minhash_bands(remainder)
        .select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            stored_bands.select(
                F.col("doc_id").alias("doc_b"), "band_id", "band_key"
            ),
            ["band_id", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    best = W.partitionBy("doc_a").orderBy(F.desc("jaccard"), F.asc("doc_b"))
    near = (
        verify_jaccard(cand, remainder, corpus_doc)
        .withColumn("_rk", F.row_number().over(best))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("dup_of"),
            F.lit("near_dup").alias("verdict"),
            "jaccard",
        )
    )

    flagged = exact.select("doc_id", "verdict", "dup_of", "jaccard").unionByName(
        near.select("doc_id", "verdict", "dup_of", "jaccard")
    )
    return (
        new_doc.select("doc_id")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("verdict", F.lit("novel")).alias("verdict"),
            "dup_of",
            "jaccard",
        )
    )


def extend_index(accepted_doc: DataFrame, index_dir: str) -> None:
    """Append the ACCEPTED (novel) documents' digest and band rows to the
    index — the post-batch "checkpoint save". Append-mode parquet: no
    rewrite of existing index files. The write-time mega-bucket drop
    cannot be re-applied across appends without reading the stored
    bands; an append-heavy index should be compacted periodically by
    re-running write_index over the full corpus (documented operational
    tradeoff — query cost stays bounded regardless because
    dedup_against_index joins, it never re-groups stored buckets)."""
    _check_meta(index_dir)
    _digests(accepted_doc).write.mode("append").parquet(f"{index_dir}/digests")
    _capped_bands(accepted_doc).write.mode("append").parquet(
        f"{index_dir}/bands"
    )


def embedding_dedup_against_index(
    spark: SparkSession,
    new_emb: DataFrame,
    index_dir: str,
    sf_dir: str,
    tau: float | None = None,
) -> DataFrame:
    """The embedding-side analogue of :func:`dedup_against_index`:
    classify NEW vectors (vec_id, embedding) against a corpus whose ANN
    index was persisted with `similarity.write_ann_index`.

    Returns one row per new vector: (vec_id, verdict, dup_of, cosine)
    with verdict ``near_dup`` (best stored match at cosine ≥ ``tau``,
    default `dedup.COSINE_TAU`) or ``novel``.

    Cost scales with the batch: the batch is signed by the SAME
    `lsh_signatures` kernel the index writer ran (bit-identical buckets,
    parameters read back from the index meta; signature-geometry drift —
    n_tables/dim/b_cap — fails loudly), candidates come from one
    co-partitioned bucket join against the stored signature parquet
    (multi-probe + hot-bucket cap, shared `_lsh_candidate_pairs` with
    the batch as the probe frame — id-equal cross pairs are KEPT, id
    namespaces are the caller's), and scoring is the shared
    `_score_pairs_topk` join-gather tail — the corpus embedding table
    contributes the neighbor side of an equi-join, never a scan-wide
    payload. A zero-norm batch vector (failed encode) has NaN cosine to
    everything and is classified novel, never near_dup. Batch vec_ids
    must fit in uint32 (the scorer's packed-pair dedup contract;
    corpus ids are ordinal by construction) — validated, loud."""
    from .queries.dedup import COSINE_TAU
    from .queries.similarity import (
        _check_ann_compat,
        _lsh_candidate_pairs,
        _read_ann_meta,
        _score_pairs_topk,
        lsh_signatures,
    )
    from .tables import load_table

    meta = _read_ann_meta(index_dir)
    _check_ann_compat(index_dir, meta)
    bounds = new_emb.agg(
        F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
    ).collect()[0]
    if bounds["lo"] is not None and (
        bounds["lo"] < 0 or bounds["hi"] >= (1 << 32)
    ):
        raise ValueError(
            f"batch vec_ids must be in [0, 2^32) (got {bounds['lo']}.."
            f"{bounds['hi']}): the pair scorer packs (query_id, "
            "neighbor_id) into one uint64 — renumber the batch."
        )
    tau = COSINE_TAU if tau is None else tau
    par = spark.sparkContext.defaultParallelism
    stored_sig = spark.read.parquet(f"{index_dir}/lsh_signatures")
    new_sig = lsh_signatures(
        new_emb.select("vec_id", "embedding"), meta["b"], par
    )
    cand = _lsh_candidate_pairs(
        stored_sig, meta["b"], meta["cap"], probe_sig=new_sig
    )
    scored = _score_pairs_topk(
        cand,
        load_table(spark, sf_dir, "embeddings"),
        par,
        sf_dir,
        meta["n"],
        query_emb=new_emb,
    )
    best = scored.filter(
        (F.col("rnk") == 1)
        & (F.col("cosine") >= tau)
        & ~F.isnan("cosine")
    )
    return (
        new_emb.select("vec_id")
        .join(
            best.select(
                F.col("query_id").alias("vec_id"),
                F.col("neighbor_id").alias("dup_of"),
                "cosine",
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.when(F.col("dup_of").isNotNull(), "near_dup")
            .otherwise("novel")
            .alias("verdict"),
            "dup_of",
            "cosine",
        )
    )
