"""Behavioral tests for the LLM-pipeline operators: dedup finds planted
duplicates, LSH recall vs brute force, multimodal decode shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_iterator_spark.queries import QUERIES, load_all
from kinesis_iterator_spark.queries.dedup import _shingles, _with_minhash_signature
from kinesis_iterator_spark.queries.multimodal import decode_media, media_table

load_all()


def test_exact_dedup_is_idempotent(spark, sf_dir):
    out = QUERIES["dedup_exact"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.select("text").distinct().count()
    # survivors are unique
    assert out.select("keep_doc_id").distinct().count() == out.count()


def test_minhash_lsh_finds_planted_near_duplicates(spark):
    """Plant pairs with known overlap; LSH must find the high-jaccard pair
    and exact verification must reject the low-jaccard one."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # ~1 shingle different
    far = "completely different words about spark shuffles and parquet files"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "doc_id long, text string",
    )
    sig = _with_minhash_signature(docs)
    rows = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert rows[1] == rows[4], "identical docs must have identical signatures"
    overlap_12 = sum(a == b for a, b in zip(rows[1], rows[2]))
    overlap_13 = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert overlap_12 > overlap_13, "minhash must reflect jaccard ordering"


def test_minhash_hot_bucket_cap(spark):
    """A degenerate bucket (here: MAX_BUCKET+8 identical docs, which share
    every band key) must be dropped by the hot-bucket cap, while a normal
    near-dup pair in a small bucket is still found."""
    from kinesis_iterator_spark.queries.dedup import MAX_BUCKET, minhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    rows = [(i, "common boilerplate text repeated verbatim in every document here")
            for i in range(MAX_BUCKET + 8)]
    rows += [(1000, base), (1001, near)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_pairs(docs).collect()}
    assert (1000, 1001) in pairs, "near-dup pair in a small bucket must survive"
    assert not any(a < 900 and b < 900 for a, b in pairs), (
        "pairs from the degenerate bucket must be dropped by the cap"
    )


def test_shingles_shape(spark):
    # _shingles takes the column NAME since r17 (one F.expr SQL string
    # instead of ~12 Column-operator py4j round trips per call site).
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "id long, text string")
    out = df.select(_shingles("text").alias("s")).collect()
    assert sorted(out[0]["s"]) == ["a b c", "b c d"]
    assert out[1]["s"] == []  # shorter than one shingle


def test_simhash_close_for_similar_docs(spark, sf_dir):
    from kinesis_iterator_spark.queries.dedup import dedup_simhash

    out = dedup_simhash(spark, sf_dir)
    assert out.count() == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # 48-bit range
    mx = out.agg(F.max("simhash")).collect()[0][0]
    assert 0 <= mx < (1 << 48)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["similarity_bruteforce_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["similarity_lsh_topk"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall collapsed: {recall}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["similarity_bruteforce_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["similarity_ivf_topk"](spark, sf_dir).collect()
    }
    # IVF probes 2 of 10 cells; the fixture's labels do NOT cluster the
    # vectors (intra≈inter cosine), so the information-theoretic recall
    # ceiling here is low — the assertion pins the plumbing, not the
    # codebook quality (which on clustered real embeddings is the win).
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_cosine_self_similarity_is_one(spark, sf_dir):
    from kinesis_iterator_spark.queries.similarity import _dot

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    rows = emb.select(
        (
            _dot(F.col("embedding"), F.col("embedding"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
            )
        ).alias("c")
    ).collect()
    for r in rows:
        assert abs(r["c"] - 1.0) < 1e-12


def test_multimodal_blob_and_decode(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes)["blob"] == "binary"
    feats = decode_media(m)
    rows = feats.collect()
    assert all(0.0 <= r["fake_luma"] <= 255.0 for r in rows)
    assert all(1 <= r["sampled_frames"] <= 4 for r in rows)
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    # Image rows carry real container headers and the worker must have
    # parsed dimensions out of the BYTES (codec identified per format);
    # audio/video payloads fall back to metadata.
    codecs = {r["doc_id"] % 6: r["codec"] for r in rows}
    assert codecs[0] == "png" and codecs[3] == "jpeg"
    assert {codecs[k] for k in (1, 2, 4, 5)} == {"raw"}


def test_parse_header_dims_real_formats_and_strict_rejection():
    """The magic-byte parser against hand-built spec-conformant headers,
    and strictness: a payload that merely starts with the JPEG SOI bytes
    (the sf0.1 fixture contains one) must NOT parse."""
    from kinesis_iterator_spark.queries.multimodal import parse_header_dims

    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + (640).to_bytes(4, "big")
        + (480).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    assert parse_header_dims(png) == ("png", 640, 480)
    # JPEG with an APP0 segment BEFORE the SOF0 — the walk must skip it.
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (4).to_bytes(2, "big") + b"\x00\x00"
        + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x01\x01\x11\x00"
    )
    assert parse_header_dims(jpeg) == ("jpeg", 640, 480)
    # Strict rejection: SOI followed by a non-0xFF byte is not a JPEG.
    assert parse_header_dims(b"\xff\xd8\xab\xde" + b"\x00" * 28) is None
    assert parse_header_dims(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 24) is None
    assert parse_header_dims(b"") is None


def test_pandas_grouped_agg_udaf(spark, sf_dir):
    """The UDAF surface: a vectorized grouped-aggregate pandas_udf
    (Arrow-batched per group) — here a value-weighted mean per event_type
    — must equal the exact built-in formulation. This is the blessed
    escape hatch for aggregations Catalyst can't express."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # two-argument grouped-agg UDFs need the explicit functionType (the
    # annotation-based inference only handles single-Series signatures)
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    from kinesis_iterator_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("v"), (F.col("user_id") % 5 + 1).alias("w")
    )
    got = {
        r["event_type"]: r["wm"]
        for r in ev.groupBy("event_type").agg(
            weighted_mean("v", "w").alias("wm")
        ).collect()
    }
    want = {
        r["event_type"]: r["wm"]
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9 * max(1.0, abs(want[k]))


def test_lang_id_deterministic_and_total(spark, sf_dir):
    # Library-level since round 9 (registry copy rides
    # text_quality_scores); must stay value-identical to the merged
    # registry columns.
    from kinesis_iterator_spark.queries.text import text_lang_id

    out = text_lang_id(spark, sf_dir)
    assert out.filter(F.col("predicted_lang").isNull()).count() == 0
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, text_lang_id(spark, sf_dir).collect()))
    assert a == b
    merged = sorted(
        map(
            tuple,
            QUERIES["text_quality_scores"](spark, sf_dir)
            .select("doc_id", "labeled_lang", "predicted_lang", "marker_hits")
            .collect(),
        )
    )
    assert merged == a


def test_ann_gathered_path_matches_corpus_path(spark, sf_dir, monkeypatch):
    """The scorer's two corpus-free paths are value-identical: the
    small-corpus kernel (executor-side corpus cache, one slim shuffle)
    and the large-corpus join-gather (vectors attached to candidate
    pairs via equi-joins). Forcing SMALL_CORPUS_MAX below the fixture
    size routes every query through the at-scale plan — results must be
    bit-identical since both use the same sequential-fold kernels."""
    from kinesis_iterator_spark.queries import similarity as sim

    for qname in (
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "dedup_embedding_cosine",
    ):
        fn = QUERIES[qname]
        small = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.setattr(sim, "SMALL_CORPUS_MAX", -1)
        gathered = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.undo()
        assert small == gathered, qname


def test_lsh_external_query_set_equals_restricted_self_knn(spark, sf_dir):
    """similarity_lsh_topk_for_queries must equal the self-kNN result
    restricted to the same query ids — the probe-side filter prunes
    cost, never changes answers (same signatures, caps, probes, and
    exact tie-broken scoring)."""
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.similarity import (
        similarity_lsh_topk,
        similarity_lsh_topk_for_queries,
    )

    full = similarity_lsh_topk(spark, sf_dir).collect()
    release_persists()
    ids = sorted({r["query_id"] for r in full})[:7]
    sub = similarity_lsh_topk_for_queries(spark, sf_dir, ids).collect()
    release_persists()
    key = lambda r: (r["query_id"], r["rnk"])  # noqa: E731
    want = {
        key(r): (r["neighbor_id"], r["cosine"])
        for r in full
        if r["query_id"] in set(ids)
    }
    got = {key(r): (r["neighbor_id"], r["cosine"]) for r in sub}
    assert got == want and len(got) > 0


def test_ivf_external_query_set_equals_restricted_self_knn(spark, sf_dir):
    """similarity_ivf_topk_for_queries must equal the self-kNN result
    restricted to the same query ids — the probe-side restriction
    happens BEFORE the cell join, so it prunes cost without changing
    any query's candidate cells or scores. Uses >64 ids to drive the
    semi-join branch of _restrict_to_query_ids (the literal-IN branch
    is covered by the LSH test's 7-id set)."""
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.similarity import (
        similarity_ivf_topk,
        similarity_ivf_topk_for_queries,
    )

    full = similarity_ivf_topk(spark, sf_dir).collect()
    release_persists()
    ids = sorted({r["query_id"] for r in full})[:70]
    sub = similarity_ivf_topk_for_queries(spark, sf_dir, ids).collect()
    release_persists()
    key = lambda r: (r["query_id"], r["rnk"])  # noqa: E731
    want = {
        key(r): (r["neighbor_id"], r["cosine"])
        for r in full
        if r["query_id"] in set(ids)
    }
    got = {key(r): (r["neighbor_id"], r["cosine"]) for r in sub}
    assert got == want and len(got) > 0


def test_external_query_set_raises_on_empty_ids(spark, sf_dir):
    """An empty query-id set must fail loudly — an empty DataFrame would
    silently read as 'no neighbors found'."""
    import pytest

    from kinesis_iterator_spark.queries.similarity import (
        similarity_ivf_topk_for_queries,
        similarity_lsh_topk_for_queries,
    )

    with pytest.raises(ValueError):
        similarity_lsh_topk_for_queries(spark, sf_dir, [])
    with pytest.raises(ValueError):
        similarity_ivf_topk_for_queries(spark, sf_dir, [])
