"""End-to-end curation pipeline (kinesis_iterator_spark.pipeline).

The headline check runs the WHOLE pipeline — quality gate, language
gate, exact dedup, near-dup survivor pruning — against a DuckDB oracle
that recomputes the same composition in SQL (recursive min-label CC for
the survivor stage), over the real fixture corpus. Stage semantics that
the fixture can't exercise (it has no exact duplicates) are pinned on a
small hand-computable frame via curate_frame.
"""

from __future__ import annotations

import duckdb
import pytest

from kinesis_iterator_spark.pipeline import (
    CurationConfig,
    curate,
    curate_frame,
)

# Gates chosen so EVERY fixture-exercisable stage drops rows at
# sf0.001: n_words spans 10-99 (min_words=20 bites), lexical diversity
# spans 0.28-1.0 (0.30 bites), zh is excluded, and tau=0.6 yields
# thousands of near-dup edges.
CFG = CurationConfig(
    min_words=20,
    min_lexical_diversity=0.30,
    allowed_langs=("en", "es", "de", "fr"),
    edge_source="ngram",  # the oracle-checkable edge generator
    jaccard_tau=0.6,
    tokens_per_shard=1_000,
)

ORACLE_FINAL_IDS = """
WITH RECURSIVE sig AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) AS awl,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z ]', '', 'g'))
              AS DOUBLE) / LENGTH(text) AS punct,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS lexdiv,
         md5(text) AS digest
  FROM documents
),
gate AS (
  SELECT doc_id, lang, digest FROM sig
  WHERE n_words BETWEEN 20 AND 1000000
    AND awl BETWEEN 1.0 AND 20.0
    AND punct <= 0.9 AND lexdiv >= 0.30
    AND lang IN ('en', 'es', 'de', 'fr')
),
exact AS (
  SELECT g.doc_id FROM gate g
  JOIN (SELECT digest, MIN(doc_id) AS k FROM gate GROUP BY digest) m
    ON g.digest = m.digest AND g.doc_id = m.k
),
sets AS (
  SELECT d.doc_id, d.lang,
         len(string_split(d.text, ' ')) AS n_words,
         list_distinct(string_split(d.text, ' ')) AS wset
  FROM documents d JOIN exact e ON d.doc_id = e.doc_id
),
edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sets a JOIN sets b
    ON a.lang = b.lang AND (a.n_words // 10) = (b.n_words // 10)
   AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
          / len(list_distinct(list_concat(a.wset, b.wset))) >= 0.6
),
sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
walk(node, reach) AS (
  SELECT u AS node, u AS reach FROM sym
  UNION
  SELECT s.u AS node, w.reach FROM sym s JOIN walk w ON w.node = s.v
),
comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
SELECT e.doc_id FROM exact e LEFT JOIN comp c ON e.doc_id = c.node
WHERE e.doc_id = COALESCE(c.component, e.doc_id)
ORDER BY e.doc_id
"""


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    cur = curate(spark, sf_dir, CFG)
    yield cur
    cur.release()


def _oracle_ids(sf_dir: str) -> list[int]:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return [r[0] for r in con.execute(ORACLE_FINAL_IDS).fetchall()]


def test_final_ids_match_duckdb_oracle(curated, sf_dir):
    """The end-to-end pin: every stage composed, both engines agree on
    exactly which documents survive."""
    got = sorted(
        r["doc_id"] for r in curated.final.select("doc_id").collect()
    )
    want = _oracle_ids(sf_dir)
    assert want, "oracle kept nothing — gates misconfigured for fixture"
    assert got == want


def test_stats_monotone_and_consistent(curated):
    s = curated.stats()
    assert s["n_input"] == 500
    # cumulative gates can only shrink
    assert s["n_input"] >= s["n_quality"] >= s["n_gate"] >= s["n_exact"] >= s["n_kept"]
    # every fixture-exercisable stage actually bites under CFG
    assert s["n_quality"] < s["n_input"]
    assert s["n_gate"] < s["n_quality"]  # zh excluded
    assert s["n_kept"] < s["n_exact"]  # near-dup pruning bites
    assert 0 < s["kept_tokens"] <= s["input_tokens"]
    assert s["n_kept"] == curated.final.count()


def test_labels_are_slim(curated):
    """Design invariant: every gating/dedup decision is computed without
    the document body — text must not appear in the label frame."""
    assert "text" not in curated.labels.columns
    assert {
        "doc_id",
        "quality_pass",
        "gate_pass",
        "exact_keep",
        "keep",
        "component",
        "tokens",
    } <= set(curated.labels.columns)


def test_write_shards_roundtrip_and_determinism(curated, spark, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    n_a = curated.write_shards(out_a)
    n_b = curated.write_shards(out_b)
    assert n_a == n_b == curated.n_shards()
    s = curated.stats()
    import math

    assert n_a == max(1, math.ceil(s["kept_tokens"] / CFG.tokens_per_shard))
    assert n_a > 1  # tokens_per_shard chosen so the fixture splits

    back_a = curated.read_shards(spark, out_a)
    back_b = curated.read_shards(spark, out_b)
    rows_a = {
        (r["doc_id"], r["shard"])
        for r in back_a.select("doc_id", "shard").collect()
    }
    rows_b = {
        (r["doc_id"], r["shard"])
        for r in back_b.select("doc_id", "shard").collect()
    }
    # identical shard MEMBERSHIP across runs (hash of doc_id, not
    # scheduling), and the read-back corpus is exactly the kept set
    assert rows_a == rows_b
    assert {d for d, _ in rows_a} == {
        r["doc_id"] for r in curated.final.select("doc_id").collect()
    }


def test_stage_semantics_hand_computed(spark):
    """curate_frame over a tiny constructed corpus where every stage
    outcome is hand-checkable, including exact dedup (the parquet
    fixture has no exact duplicates)."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "from the noisy busy town toward quiet green hills tonight"
    )  # 22 words, all distinct except 'the' x3
    docs = [
        (1, base, "en", "s"),  # survivor of {1,2,3}: exact dup of 2,
        (2, base, "en", "s"),  # near-dup of 3
        (3, base + " extra", "en", "s"),
        (10, "too short text here", "en", "s"),  # fails min_words
        (20, base.replace("the", "le"), "xx", "s"),  # lang gate
        (30, " ".join(["word"] * 25), "en", "s"),  # lexical diversity
    ]
    doc = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"])
    cfg = CurationConfig(
        min_words=10,
        min_lexical_diversity=0.5,
        allowed_langs=("en",),
        edge_source="ngram",
        jaccard_tau=0.6,
    )
    cur = curate_frame(doc, cfg)
    try:
        by_id = {r["doc_id"]: r.asDict() for r in cur.labels.collect()}
        assert not by_id[10]["quality_pass"]
        assert by_id[20]["quality_pass"] and not by_id[20]["gate_pass"]
        assert not by_id[30]["quality_pass"]  # 1/25 distinct
        # exact dedup: 1 and 2 share a digest; 1 wins
        assert by_id[1]["exact_keep"] and not by_id[2]["exact_keep"]
        # near-dup: 3 joins 1's component (jaccard vs base well above
        # 0.6: one extra word on 20 distinct), 1 is min-id survivor
        assert by_id[3]["exact_keep"] and not by_id[3]["keep"]
        assert by_id[3]["component"] == 1
        assert by_id[1]["keep"]
        assert {d for d, r in by_id.items() if r["keep"]} == {1}
    finally:
        cur.release()


def test_minhash_edge_source(spark, sf_dir):
    """The default (scale-path) edge source: MinHash-LSH candidate
    pairs over the exact-surviving docs. Pins the wiring — the keep set
    must equal a hand-assembled label_corpus over the same minhash
    edges — and that the gate/exact stages are identical to the ngram
    run (edge_source only changes the near-dup stage)."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.dedup import minhash_pairs
    from kinesis_iterator_spark.queries.graph import label_corpus
    from kinesis_iterator_spark.tables import load_table

    cfg = CurationConfig(
        min_words=20,
        min_lexical_diversity=0.30,
        allowed_langs=("en", "es", "de", "fr"),
        edge_source="minhash",
        tokens_per_shard=1_000,
    )
    cur = curate(spark, sf_dir, cfg)
    try:
        s = cur.stats()
        # gate/exact stages are edge-source-independent
        ref = curate(spark, sf_dir, CFG)
        try:
            rs = ref.stats()
            assert (s["n_input"], s["n_quality"], s["n_gate"], s["n_exact"]) == (
                rs["n_input"],
                rs["n_quality"],
                rs["n_gate"],
                rs["n_exact"],
            )
        finally:
            ref.release()
        assert 0 < s["n_kept"] <= s["n_exact"]

        doc = load_table(spark, sf_dir, "documents")
        eligible = doc.join(
            cur.labels.filter("exact_keep").select("doc_id"), "doc_id", "leftsemi"
        )
        edges = minhash_pairs(eligible).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        want = {
            r["doc_id"]
            for r in label_corpus(
                eligible.select("doc_id"), edges, "doc_id"
            )
            .filter("is_survivor")
            .collect()
        }
        got = {
            r["doc_id"] for r in cur.labels.filter("keep").collect()
        }
        assert got == want
    finally:
        cur.release()


def test_config_validation():
    with pytest.raises(ValueError):
        CurationConfig(allowed_langs=())
    with pytest.raises(ValueError):
        CurationConfig(jaccard_tau=0.0)
    with pytest.raises(ValueError):
        CurationConfig(min_words=10, max_words=5)
    with pytest.raises(ValueError):
        CurationConfig(tokens_per_shard=0)
    with pytest.raises(ValueError):
        CurationConfig(edge_source="simhash")


def test_curate_failure_releases_exposed_bands(spark, sf_dir, monkeypatch):
    """expose_bands=True materializes an eager checkpoint BEFORE the CC
    rounds; a failure in between must not leave its blocks pinned (a
    retrying ingestion loop would leak one batch's bands per failed
    admit)."""
    from kinesis_iterator_spark import pipeline as P
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.tables import load_table

    release_persists()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )

    def boom(*a, **k):
        raise RuntimeError("planted CC failure")

    monkeypatch.setattr(P, "connected_components", boom)
    with pytest.raises(RuntimeError, match="planted CC failure"):
        P.curate_frame(doc, expose_bands=True)
    release_persists()
    assert jsc.getPersistentRDDs().size() == base


# -- pack_sequences: shard-parallel deterministic sequence packing ------


@pytest.fixture(scope="module")
def token_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.text import quality_signal_columns
    from kinesis_iterator_spark.tables import load_table

    sig = quality_signal_columns()
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", sig["bpe_ish_tokens"].alias("tokens"))
        .persist()
    )
    d.count()
    yield d
    d.unpersist()


def _packed(spark, docs, **kw):
    from kinesis_iterator_spark.pipeline import pack_sequences

    return {
        r["doc_id"]: (r["shard"], r["pack"], r["tokens"])
        for r in pack_sequences(docs, **kw).collect()
    }


def test_pack_next_fit_respects_ctx_and_matches_python(spark, token_docs):
    """Exact next-fit per shard: pack sums never exceed ctx_len except
    oversized singletons; assignment equals a pure-Python next-fit over
    the same seeded order (order recomputed via Spark's own xxhash64);
    pack ids dense from 0 per shard."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import pack_sequences

    ctx, seed = 256, 3
    out = pack_sequences(token_docs, ctx_len=ctx, n_shards=8, seed=seed)
    rows = out.withColumn("_ord", F.xxhash64("doc_id", F.lit(seed))).collect()
    assert len(rows) == token_docs.count()

    sums = defaultdict(int)
    members = defaultdict(list)
    by_shard = defaultdict(list)
    for r in rows:
        key = (r["shard"], r["pack"])
        sums[key] += r["tokens"]
        members[key].append((r["doc_id"], r["tokens"]))
        by_shard[r["shard"]].append(r)
    for key, s in sums.items():
        if s > ctx:
            assert len(members[key]) == 1, (
                f"pack {key} exceeds ctx with {len(members[key])} docs"
            )
            assert members[key][0][1] > ctx  # genuinely oversized doc
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["_ord"], r["doc_id"]))
        pack_id, used = 0, 0
        for r in rs:
            t = r["tokens"]
            if used > 0 and used + t > ctx:
                pack_id += 1
                used = 0
            assert r["pack"] == pack_id, (shard, r["doc_id"])
            used += t
        assert {x["pack"] for x in rs} == set(range(pack_id + 1))  # dense


def test_pack_is_deterministic_across_partitioning(spark, token_docs):
    """Identical assignment regardless of input partitioning — shard and
    order are pure functions of doc_id, the packing pass is sequential
    within a shard."""
    a = _packed(spark, token_docs.repartition(1), ctx_len=512, n_shards=4)
    b = _packed(spark, token_docs.repartition(32), ctx_len=512, n_shards=4)
    assert a == b


def test_pack_straddle_is_running_sum_chunking(spark, token_docs):
    """straddle=True: pack = floor(tokens_before / ctx_len) within the
    shard's seeded order — verified by recomputing the running sum from
    the op's own shard/order output."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import pack_sequences

    ctx = 300
    out = pack_sequences(
        token_docs, ctx_len=ctx, n_shards=4, seed=7, straddle=True
    )
    rows = out.withColumn(
        "_ord", F.xxhash64("doc_id", F.lit(7))
    ).collect()
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["_ord"], r["doc_id"]))
        before = 0
        for r in rs:
            assert r["pack"] == before // ctx, (shard, r["doc_id"])
            before += r["tokens"]


def test_pack_rejects_bad_ctx(spark, token_docs):
    from kinesis_iterator_spark.pipeline import pack_sequences

    with pytest.raises(ValueError, match="ctx_len"):
        pack_sequences(token_docs, ctx_len=0)


# -- mixture building: per-source token-weighted sampling ---------------


@pytest.fixture(scope="module")
def source_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.text import quality_signal_columns
    from kinesis_iterator_spark.tables import load_table

    sig = quality_signal_columns()
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", sig["bpe_ish_tokens"].alias("tokens"))
        .persist()
    )
    d.count()
    yield d
    d.unpersist()


def test_mixture_rates_realize_weight_proportions(spark, source_docs):
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import mixture_rates

    totals = {
        r["source"]: r["t"]
        for r in source_docs.groupBy("source")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    }
    weights = {"src0": 3.0, "src1": 1.0}
    rates = mixture_rates(source_docs, weights, token_budget=10_000)
    assert set(rates) == set(weights)
    # rate * available = target, and targets split 3:1.
    t0 = rates["src0"] * totals["src0"]
    t1 = rates["src1"] * totals["src1"]
    assert t0 == pytest.approx(7_500) and t1 == pytest.approx(2_500)


def test_apply_mixture_epoch_bounds_and_determinism(spark, source_docs):
    """rate 2.5: every doc of that source appears 2 or 3 times with
    contiguous 1-based epochs; rate 0.4: 0 or 1; absent source dropped.
    Assignment identical across input partitioning."""
    from collections import Counter

    from kinesis_iterator_spark.pipeline import apply_mixture

    rates = {"src0": 2.5, "src1": 0.4}

    def run(frame):
        out = apply_mixture(frame, rates, seed=11).collect()
        per_doc = Counter(r["doc_id"] for r in out)
        srcs = {r["doc_id"]: r["source"] for r in out}
        epochs = {}
        for r in out:
            epochs.setdefault(r["doc_id"], []).append(r["epoch"])
        return per_doc, srcs, epochs, out

    per_doc, srcs, epochs, out = run(source_docs)
    assert {r["source"] for r in out} == {"src0", "src1"}
    for doc_id, n in per_doc.items():
        if srcs[doc_id] == "src0":
            assert n in (2, 3)
        else:
            assert n == 1  # rate<1 survivors appear exactly once
        assert sorted(epochs[doc_id]) == list(range(1, n + 1))
    # src1 at rate 0.4 drops docs: fewer sampled than the source holds.
    n_src1_in = source_docs.filter("source = 'src1'").count()
    n_src1_out = sum(1 for d, s in srcs.items() if s == "src1")
    assert 0 < n_src1_out < n_src1_in

    a = run(source_docs.repartition(1))[0]
    b = run(source_docs.repartition(32))[0]
    assert a == per_doc and b == per_doc


def test_build_mixture_hits_token_budget_within_bernoulli_bounds(
    spark, source_docs
):
    """Realized per-source tokens must land between the floor-epochs
    bound and the ceil-epochs bound of its exact target — the only
    slack apply_mixture has is one Bernoulli copy per document."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import build_mixture, mixture_rates

    weights = {"src2": 1.0, "src3": 1.0, "src4": 2.0}
    budget = 40_000
    rates = mixture_rates(source_docs, weights, budget)
    out = (
        build_mixture(source_docs, weights, budget, seed=5)
        .groupBy("source")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    )
    realized = {r["source"]: r["t"] for r in out}
    totals = {
        r["source"]: r["t"]
        for r in source_docs.groupBy("source")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    }
    import math

    for s, rate in rates.items():
        lo = math.floor(rate) * totals[s]
        hi = math.ceil(rate) * totals[s]
        assert lo <= realized.get(s, 0) <= hi, (s, rate)


def test_mixture_guards(spark, source_docs):
    from kinesis_iterator_spark.pipeline import apply_mixture, mixture_rates

    with pytest.raises(ValueError, match="not in the corpus"):
        mixture_rates(source_docs, {"nope": 1.0}, 1000)
    with pytest.raises(ValueError, match="token_budget"):
        mixture_rates(source_docs, {"src0": 1.0}, 0)
    with pytest.raises(ValueError, match="non-negative"):
        apply_mixture(source_docs, {"src0": -0.1})


def test_recipe_composes_mixture_into_packing(spark, source_docs):
    """The full recipe chain: sampled mixture (duplicate doc_ids across
    epochs) feeds packing keyed on (doc_id, epoch) — every sampled row
    packs exactly once, pack sums respect ctx, and a doc's epochs are
    not forced adjacent (independent hash positions)."""
    from collections import defaultdict

    from kinesis_iterator_spark.pipeline import apply_mixture, pack_sequences

    sampled = apply_mixture(source_docs, {"src0": 3.0, "src1": 1.0}, seed=2)
    n_sampled = sampled.count()
    packed = pack_sequences(
        sampled, ctx_len=400, n_shards=4, id_cols=("doc_id", "epoch")
    ).collect()
    assert len(packed) == n_sampled
    assert {(r["doc_id"], r["epoch"]) for r in packed} == {
        (r["doc_id"], r["epoch"]) for r in sampled.collect()
    }
    sums = defaultdict(int)
    sizes = defaultdict(int)
    for r in packed:
        sums[(r["shard"], r["pack"])] += r["tokens"]
        sizes[(r["shard"], r["pack"])] += 1
    for key, s in sums.items():
        assert s <= 400 or sizes[key] == 1
    # epochs of at least one src0 doc land in different shards
    shards_of = defaultdict(set)
    for r in packed:
        shards_of[r["doc_id"]].add(r["shard"])
    assert any(len(v) > 1 for v in shards_of.values())


def test_pack_rejects_unknown_id_cols(spark, token_docs):
    from kinesis_iterator_spark.pipeline import pack_sequences

    with pytest.raises(ValueError, match="id_cols"):
        pack_sequences(token_docs, 128, id_cols=("doc_id", "epoch"))


def test_pack_null_tokens_fail_loudly(spark):
    from kinesis_iterator_spark.pipeline import pack_sequences

    doc = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, tokens long"
    )
    with pytest.raises(Exception, match="NULL tokens"):
        pack_sequences(doc, 64, n_shards=1).collect()
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(doc.filter("tokens is not null"), 64, n_shards=0)


def test_mixture_rejects_degenerate_weights(spark, source_docs):
    from kinesis_iterator_spark.pipeline import mixture_rates

    with pytest.raises(ValueError, match="sum to zero"):
        mixture_rates(source_docs, {"src0": 0.0}, 1000)


def test_pack_split_oversized_caps_packs_and_conserves_tokens(
    spark, token_docs
):
    """split_oversized=True (VERDICT r8 #5): documents longer than
    ctx_len are cut into ctx_len pieces before the shard hash — no pack
    EVER exceeds ctx_len in next-fit mode (the oversized-singleton
    exception disappears), per-document token totals are conserved
    across the split, chunk counts are exactly ceil(tokens/ctx_len),
    and a zero-token document keeps one empty piece."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import pack_sequences

    ctx = 32
    docs = token_docs.withColumn(
        "tokens",
        F.when(F.col("doc_id") == 0, F.lit(0)).otherwise(F.col("tokens")),
    )
    out = pack_sequences(
        docs, ctx_len=ctx, n_shards=8, split_oversized=True
    ).collect()
    assert {r["chunk"] for r in out if r["doc_id"] == 0} == {0}
    # Every piece fits, so every pack fits.
    assert all(r["tokens"] <= ctx for r in out)
    sums = defaultdict(int)
    for r in out:
        sums[(r["shard"], r["pack"])] += r["tokens"]
    assert all(v <= ctx for v in sums.values())
    # Conservation + chunk-count shape vs the input frame.
    want = {r["doc_id"]: r["tokens"] for r in docs.collect()}
    got = defaultdict(int)
    chunks = defaultdict(set)
    for r in out:
        got[r["doc_id"]] += r["tokens"]
        chunks[r["doc_id"]].add(r["chunk"])
    assert dict(got) == want
    for d, t in want.items():
        n = max(-(-t // ctx), 1)
        assert chunks[d] == set(range(n)), (d, t)
    # The fixture actually exercised the split.
    assert any(len(c) > 1 for c in chunks.values())


def test_pack_split_oversized_is_partitioning_invariant(spark, token_docs):
    from kinesis_iterator_spark.pipeline import pack_sequences

    def rows(df):
        return sorted(
            map(
                tuple,
                pack_sequences(
                    df, ctx_len=24, n_shards=8, split_oversized=True
                ).collect(),
            )
        )

    assert rows(token_docs.repartition(1)) == rows(
        token_docs.repartition(13)
    )


def test_split_long_stage_reconstructs_and_bounds_pieces(spark, sf_dir):
    """CurationConfig(split_long=W) (VERDICT r8 stretch): documents
    longer than W words split at paragraph boundaries by greedy
    next-fit — every piece <= W (no derived paragraph exceeds W here),
    piece texts concatenated in piece order reconstruct the original
    exactly, short documents pass through as piece 0, and the re-key is
    doc_id = orig * PIECE_SPACE + piece."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import (
        PIECE_SPACE,
        CurationConfig,
        _pre_stages,
    )
    from kinesis_iterator_spark.tables import load_table

    SEP = "\n\n"
    W = 150
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "lang", "source", "text")
    )
    # 6 long docs of 10 paragraphs each (deterministic order via
    # array_sort over (doc_id, text) structs), plus 3 short ones.
    grouped = (
        base.groupBy((F.col("doc_id") / 10).cast("int").alias("doc_id"))
        .agg(
            F.concat_ws(
                SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text"),
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
        )
        .select("doc_id", "lang", "source", "text")
    )
    shorts = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100).alias("doc_id"), "lang", "source", "text"
    )
    inp = grouped.unionByName(shorts)
    out = _pre_stages(inp, CurationConfig(split_long=W)).collect()

    n_words = lambda t: len(t.split(" "))  # noqa: E731
    orig = {r["doc_id"]: r["text"] for r in inp.collect()}
    # Bound: every piece fits (no single derived paragraph exceeds W).
    assert all(n_words(r["text"]) <= W for r in out)
    # Identity & provenance.
    for r in out:
        assert r["doc_id"] == r["orig_doc_id"] * PIECE_SPACE + r["piece"]
    # Short docs: exactly piece 0, text untouched.
    for r in out:
        if r["orig_doc_id"] >= 100:
            assert r["piece"] == 0 and r["text"] == orig[r["orig_doc_id"]]
    # Long docs: >1 piece, and concatenation in piece order
    # reconstructs the original exactly.
    from collections import defaultdict

    by_orig = defaultdict(dict)
    for r in out:
        if r["orig_doc_id"] < 100:
            by_orig[r["orig_doc_id"]][r["piece"]] = r["text"]
    assert by_orig and all(len(p) > 1 for p in by_orig.values())
    for o, p in by_orig.items():
        assert sorted(p) == list(range(len(p)))
        assert SEP.join(p[i] for i in range(len(p))) == orig[o]


def test_curate_frame_with_split_long_gates_pieces(spark, sf_dir):
    """The composed pipeline: split_long feeds the normal gates — the
    curated corpus contains PIECES (re-keyed ids), all within the word
    gate that would have dropped the originals wholesale."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import (
        CurationConfig,
        curate_frame,
    )
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.tables import load_table

    SEP = "\n\n"
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "lang", "source", "text")
    )
    grouped = (
        base.groupBy((F.col("doc_id") / 10).cast("int").alias("doc_id"))
        .agg(
            F.concat_ws(
                SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text"),
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
        )
        .select("doc_id", "lang", "source", "text")
    )
    cfg_split = CurationConfig(
        min_words=1, max_words=200, split_long=150, paragraph_sep=SEP
    )
    cfg_drop = CurationConfig(min_words=1, max_words=200)
    a = curate_frame(grouped, cfg_split)
    b = curate_frame(grouped, cfg_drop)
    try:
        # Without splitting every grouped doc is over max_words — all
        # dropped; with splitting their pieces survive the gate.
        assert b.stats()["n_kept"] == 0
        assert a.stats()["n_kept"] > 0
        final = a.final.collect()
        assert all(len(r["text"].split(" ")) <= 200 for r in final)
    finally:
        a.release()
        b.release()
        release_persists()


def test_classifier_gate_composes(spark, sf_dir):
    """CurationConfig(classifier_weights=...): the model filter joins
    the gate — gate_pass ⇔ quality ∧ lang ∧ classifier keep, the kept
    set is a subset of the classifier's keep set, and the stage
    actually bites (quality-passing docs fall to the model filter)."""
    from kinesis_iterator_spark.queries.text import (
        quality_classifier_score,
        quality_classifier_weights,
    )
    from kinesis_iterator_spark.tables import load_table

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    w = quality_classifier_weights(spark, seed=0)
    cfg = CurationConfig(
        edge_source="ngram",
        classifier_weights=w,
        classifier_threshold=0.0,
    )
    keep_ids = {
        r["doc_id"]
        for r in quality_classifier_score(
            doc.select("doc_id", "text"), w, threshold=0.0
        )
        .filter("keep")
        .collect()
    }
    cur = curate_frame(doc, cfg)
    try:
        rows = cur.labels.collect()
        assert all(
            r["gate_pass"] == (r["quality_pass"] and r["doc_id"] in keep_ids)
            for r in rows
        )
        assert any(
            r["quality_pass"] and r["doc_id"] not in keep_ids for r in rows
        ), "the model filter never bit — weights/threshold degenerate"
        final_ids = {r["doc_id"] for r in cur.final.select("doc_id").collect()}
        assert final_ids and final_ids <= keep_ids
    finally:
        cur.release()


def test_tokens_col_hook_equals_renamed_column(spark, source_docs):
    """`tokens_col` (VERDICT r9 #8): any integer counter column drops
    into pack_sequences / mixture_rates / build_mixture / dsir_select
    without forking the kernels — results identical to materializing
    the counter under the default name."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import (
        build_mixture,
        mixture_rates,
        pack_sequences,
    )

    # A "real tokenizer" stand-in: a different integer counter than the
    # default column (here: the BPE-ish count + a doc_id-dependent
    # perturbation, renamed so the default name does not exist).
    alt = source_docs.select(
        "doc_id",
        "source",
        (F.col("tokens") + F.pmod("doc_id", F.lit(7))).alias("bpe_count"),
    )
    ref = alt.withColumn("tokens", F.col("bpe_count"))

    got = sorted(
        map(tuple, pack_sequences(alt, 512, n_shards=3, tokens_col="bpe_count")
            .select("doc_id", "tokens", "shard", "pack").collect())
    )
    want = sorted(
        map(tuple, pack_sequences(ref, 512, n_shards=3)
            .select("doc_id", "tokens", "shard", "pack").collect())
    )
    assert got == want and got

    w = {"src0": 2.0, "src1": 1.0}
    assert mixture_rates(alt, w, 50_000, tokens_col="bpe_count") == \
        mixture_rates(ref, w, 50_000)
    got_mix = sorted(
        map(tuple, build_mixture(alt, w, 50_000, tokens_col="bpe_count")
            .select("doc_id", "epoch").collect())
    )
    want_mix = sorted(
        map(tuple, build_mixture(ref, w, 50_000)
            .select("doc_id", "epoch").collect())
    )
    assert got_mix == want_mix and got_mix


def test_dsir_select_tokens_col_reports_caller_counts(spark, sf_dir):
    """dsir_select(tokens_col=...) swaps only the n_tokens ACCOUNTING
    column; selection (doc set, ranks, keys) is unchanged — the
    importance weights are defined over hashed unigrams."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.queries.text import dsir_select
    from kinesis_iterator_spark.tables import load_table

    pool = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("bpe_count", F.lit(1000) + F.col("doc_id"))
    )
    target = pool.filter(F.col("doc_id") % 3 == 0).select("text")
    base = dsir_select(pool, target, keep=20)
    alt = dsir_select(pool, target, keep=20, tokens_col="bpe_count")
    brows = {r["doc_id"]: r for r in base.collect()}
    arows = {r["doc_id"]: r for r in alt.collect()}
    assert set(brows) == set(arows) and len(brows) == 20
    for did, r in arows.items():
        assert r["n_tokens"] == 1000 + did  # caller's accounting
        assert r["sel_rank"] == brows[did]["sel_rank"]
        assert r["sample_key"] == brows[did]["sample_key"]


def test_corpus_writer_split_long_applies_once(spark, sf_dir, tmp_path):
    """A writer with BOTH a stored pre-stage and split_long must split
    exactly once (r14 fix): admit's pre-apply runs the full
    `_pre_stages` chain, so the inner curate's config must clear
    split_long too — the old behavior re-keyed every doc_id a SECOND
    time (orig·2^40 for small ids: silent provenance corruption)."""
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import (
        PIECE_SPACE,
        CorpusWriter,
        CurationConfig,
    )
    from kinesis_iterator_spark.tables import load_table

    SEP = "\n\n"
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "lang", "source", "text")
    )
    # 4 long docs of 10 paragraphs each — all exceed split_long=150.
    batch = (
        base.groupBy((F.col("doc_id") / 10).cast("long").alias("doc_id"))
        .agg(
            F.concat_ws(
                SEP,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text"),
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
        )
        .select("doc_id", "lang", "source", "text")
    )
    w = CorpusWriter(
        spark,
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        CurationConfig(
            dedup_paragraphs=True,
            split_long=150,
            min_words=1,
            max_words=200,
            paragraph_sep=SEP,
        ),
    )
    s = w.admit(batch)
    assert s["n_admitted"] > 0
    ids = [r["doc_id"] for r in w.corpus().select("doc_id").collect()]
    origs = {0, 1, 2, 3}
    # Single re-key: id // PIECE_SPACE recovers an original batch id and
    # at least one doc actually split (piece >= 1). A double split
    # would leave id // PIECE_SPACE = orig*PIECE_SPACE + piece ∉ origs.
    assert ids and all(i // PIECE_SPACE in origs for i in ids)
    assert any(i % PIECE_SPACE >= 1 for i in ids)
