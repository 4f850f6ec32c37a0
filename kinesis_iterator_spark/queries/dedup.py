"""Deduplication operators over ``documents`` (`[EXT]`, SURVEY.md §2.C /
§7 phase 5) — exact, MinHash-LSH, SimHash, and blocked n-gram Jaccard.

Cross-engine determinism: every hash in this module is derived from md5
(identical in Spark and DuckDB), mapped to a 60-bit integer via
``conv(substring(md5(x),1,15), 16, 10)``. Engine-native hashes
(murmur3/xxhash) would be faster at 100 TB — swap ``_h60`` for
``F.xxhash64`` in production; md5 is chosen here so the LSH pipelines are
bit-checkable against the SQL oracle.

Everything is built-in Catalyst expressions (split/transform/aggregate/
explode) — no Python UDFs, so the whole pipeline stays in whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import managed_persist, query

# MinHash-LSH parameters: 16 permutations, 4 bands × 4 rows.
# P(candidate | jaccard=s) = 1-(1-s^4)^4 → s50% ≈ 0.56. Tune bands/rows for
# the target similarity threshold at scale.
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.4

# SimHash: 48 bits taken from the 60-bit md5-derived word hash.
SIMHASH_BITS = 48

# Hot-bucket cap for LSH candidate generation: a band bucket with d docs
# emits d² /2 pairs, so one degenerate bucket (boilerplate/templated text,
# adversarial data) can dominate the whole job. Buckets above the cap are
# dropped — at 100 TB this bounds the worst case at cap²/2 pairs per
# bucket; near-dup recall inside a dropped mega-bucket is sacrificed
# deliberately (such docs are better handled by exact dedup on the
# boilerplate key). Mirrored in the oracle SQL.
MAX_BUCKET = 64


def _h60(c: Column) -> Column:
    """60-bit integer hash from md5 — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


_H60_SQL = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"


def _shingles(col: str) -> Column:
    """Distinct 3-word shingles of a single-space-tokenized text column
    (referenced by NAME). Built as ONE F.expr SQL string: the ~12
    Column-operator py4j round trips of the builder form are a real
    per-call-site driver cost at batch scale (the r9 minhash_bands
    lesson); the resolved expression is identical. The name is
    backtick-quoted so identifiers that need quoting parse (ADVICE
    r17); backticks inside a name are escaped by doubling, per SQL."""
    w = f"split(`{col.replace('`', '``')}`, ' ')"
    return F.expr(
        "array_distinct(transform("
        f"CASE WHEN size({w}) >= 3 THEN sequence(1, size({w}) - 2) "
        "ELSE CAST(array() AS array<int>) END, "
        f"i -> concat_ws(' ', element_at({w}, i), "
        f"element_at({w}, i + 1), element_at({w}, i + 2))))"
    )


_SHINGLES_SQL = """
    list_distinct(
      list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
        i -> string_split(text, ' ')[i] || ' ' ||
             string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2]))
"""


_MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime


def _with_minhash_signature(doc: DataFrame) -> DataFrame:
    """documents → (doc_id, shingles, sig: array<long>[N_HASHES]).

    Carter-Wegman family over ONE md5 per shingle: split the 60-bit digest
    into two 30-bit halves (h1, h2); hash_j = (h1 + (j+1)·h2) mod (2^31-1).
    One crypto hash instead of N_HASHES per shingle (16× cheaper — md5
    dominates this pipeline's map side), products stay < 2^35 (no
    overflow), and the arithmetic is integer-exact in both engines."""
    sigs = F.transform(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("h60s"),
                lambda h: (
                    (h % F.lit(1 << 30)) + (j + 1) * F.shiftright(h, 30)
                )
                % F.lit(_MERSENNE31),
            )
        ),
    )
    return (
        doc.select("doc_id", _shingles("text").alias("shingles"))
        .withColumn("h60s", F.transform(F.col("shingles"), _h60))
        .withColumn("sig", sigs)
        .drop("h60s")
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies,
           md5(text) AS content_key
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = hash-groupBy on content digest; keep the smallest doc_id
    (deterministic survivor policy). At 100 TB the shuffle carries the
    16-byte digest, never the full text."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy(F.md5("text").alias("content_key")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    ).select("keep_doc_id", "n_copies", "content_key")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
    ),
    hashed AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {_H60_SQL.format(x="s")}) AS h60s
      FROM sh
      WHERE len(shingles) > 0
    ),
    sig AS (
      SELECT doc_id, shingles,
             list_transform(range(0, {N_HASHES}),
               j -> list_min(list_transform(h60s,
                      h -> ((h % (1::BIGINT << 30)) + (j + 1) * (h >> 30))
                           % {_MERSENNE31}))) AS sig
      FROM hashed
    ),
    bands AS (
      SELECT doc_id, shingles, b.band_id,
             md5(array_to_string(list_slice(sig, b.band_id * {ROWS_PER_BAND} + 1,
                                            (b.band_id + 1) * {ROWS_PER_BAND}), ',')) AS band_key
      FROM sig, (SELECT UNNEST(range(0, {N_BANDS})) AS band_id) b
    ),
    sizes AS (
      SELECT band_id, band_key, COUNT(*) AS bsz
      FROM bands GROUP BY band_id, band_key
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, z.doc_id AS doc_b,
             a.shingles AS sa, z.shingles AS sb
      FROM bands a
      JOIN sizes s ON a.band_id = s.band_id AND a.band_key = s.band_key
      JOIN bands z
        ON a.band_id = z.band_id AND a.band_key = z.band_key
       AND a.doc_id < z.doc_id
      WHERE s.bsz <= {MAX_BUCKET}
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa, sb)) AS DOUBLE)
             / len(list_distinct(list_concat(sa, sb))) AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
            / len(list_distinct(list_concat(sa, sb))) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified by exact Jaccard.

    Fully relational formulation — measured ~6× faster than the
    nested-higher-order-function version (HOF lambdas run interpreted;
    explode → window → hash-agg stays in whole-stage codegen):

    1. posexplode words → 3-word shingle rows via window ``lead`` (one
       narrow shuffle keyed by doc_id);
    2. one md5 per shingle row → 16 Carter-Wegman minima as a columnar
       hash-agg (map-side partial min, tiny shuffle);
    3. 4 band keys per doc → group docs per (band, key) bucket, DROP
       buckets larger than MAX_BUCKET (hot-bucket cap — bounds the n²-
       in-bucket worst case), emit pairs within surviving buckets —
       candidates only, never the n² cross product;
    4. exact-Jaccard verification of candidate pairs against collect_set
       shingle sets.
    """
    return minhash_pairs(load_table(spark, sf_dir, "documents"))


def kgram_rows(doc: DataFrame, k: int) -> DataFrame:
    """Every k-word shingle of every document as tall (doc_id, s) rows
    (non-distinct), via one posexplode → window-`lead` pass.

    Window-`lead` shingles, kept after a measured A/B against the
    "obvious" improvement: index arithmetic over the carried words
    array (ws[i+1]/ws[i+2] after posexplode) is 1.6× faster AS A
    STAGE (0.25 s vs 0.39 s — no exchange, no sort) but 1.6× SLOWER
    END-TO-END (1.76 s vs 1.07 s min-of-4 interleaved at sf0.1):
    without the exchange boundary, whole-stage fusion drags the wide
    `ws` array and the un-materialized shingle expression into the
    md5/signature stage, re-evaluating them per downstream use. The
    window's shuffle materializes slim (doc_id, s) rows exactly where
    downstream wants them — and the in-row array-HOF form is far worse
    (interpreted lambdas have no CSE: `split` re-evaluates per element,
    O(words²)/doc, measured 13 s vs 2 s at sf0.1 for k=4)."""
    w = W.partitionBy("doc_id").orderBy("i")
    leads = [F.lead("w0", j).over(w) for j in range(1, k)]
    return (
        doc.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w0")
        )
        .select(
            "doc_id",
            F.concat_ws(" ", "w0", *leads).alias("s"),
            leads[-1].alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("doc_id", "s")
    )


def minhash_bands(doc: DataFrame) -> DataFrame:
    """documents → (doc_id, band_id, band_key) LSH band rows — the
    signature/banding subtree of :func:`minhash_pairs`, factored so the
    incremental path (`kinesis_iterator_spark.incremental`) can band a
    NEW batch and join it against stored bands instead of re-banding the
    whole corpus."""
    sh_rows = kgram_rows(doc, 3)
    # sh_rows now has exactly ONE consumer (the signature aggregation);
    # the exact-Jaccard verify re-shingles candidate rows per-pair
    # instead of re-reading this lineage (see verify_jaccard).
    # Persisting it was measured slower anyway (1.86 s vs 0.97 s at
    # sf0.1: every doc × every shingle is the pipeline's widest set).
    # Expressions are built as SQL strings (one py4j round trip per
    # F.expr) instead of Column-operator chains (~100 round trips for
    # the 16 aggs + 4 band structs — measured ~0.4 s of pure plan
    # construction PER CALL, paid on every admit). Semantically
    # identical: the resolved plans match the old builder node for
    # node.
    h = sh_rows.select(
        "doc_id",
        (_h60(F.col("s")) % F.lit(1 << 30)).alias("h1"),
        F.shiftright(_h60(F.col("s")), 30).alias("h2"),
    )
    sig = h.groupBy("doc_id").agg(
        *[
            F.expr(f"min((h1 + {j + 1} * h2) % {_MERSENNE31}) AS m{j}")
            for j in range(N_HASHES)
        ]
    )
    band_structs = ", ".join(
        "struct(CAST({b} AS BIGINT) AS band_id, md5(concat_ws(',', {ms}))"
        " AS band_key)".format(
            b=b,
            ms=", ".join(
                f"CAST(m{b * ROWS_PER_BAND + r} AS STRING)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    bands = sig.select(
        "doc_id",
        F.expr(f"explode(array({band_structs}))").alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    return bands


def minhash_pairs(
    doc: DataFrame,
    bands: DataFrame | None = None,
    text_source: DataFrame | None = None,
) -> DataFrame:
    """The MinHash-LSH pipeline over any (doc_id, text) DataFrame — split
    out so tests can plant degenerate buckets (see
    tests/test_llm_ops.py).

    ``bands``: optional precomputed ``minhash_bands(doc)`` rows (e.g. a
    checkpointed frame a caller also reuses elsewhere — band rows are a
    pure per-document function, so substitution is exact).

    ``text_source`` (r18): optional SUPERSET (doc_id, text) frame to
    attach the verify texts from. Every candidate id comes from ``doc``,
    and the verify attach is an inner equi-join on unique doc_ids, so a
    superset yields identical rows — while a ``doc`` that is itself a
    filter/semijoin over the superset (curate's eligible set) would be
    re-derived TWICE by the two attach sides (one AQE stage-job each,
    measured in pipeline_curate_minhash)."""
    if bands is None:
        bands = minhash_bands(doc)
    bucket = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_list("doc_id").alias("ds"))
        # candidate buckets: ≥2 docs, ≤ MAX_BUCKET (hot-bucket cap)
        .filter(F.size("ds").between(2, MAX_BUCKET))
    )
    pairs = (
        bucket.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    # pairs is persisted even though the verify chain below is its only
    # consumer: A/B at sf0.1 (min-of-4 interleaved) measured 1.24 s
    # persisted vs 1.69 s not — AQE plans the tiny broadcast build from
    # the materialized relation instead of re-optimizing the whole
    # shingle→sig→band subtree per query stage. Registered with
    # managed_persist so the harness releases it post-materialization.
    pairs = managed_persist(pairs)
    tsrc = doc if text_source is None else text_source
    return verify_jaccard(pairs, tsrc, tsrc)


def dedup_replay_oracle_sql(
    gen: int, probe_where: str, rekey: int = 1_000_000
) -> str:
    """DuckDB derivation of `incremental.dedup_against_index(...,
    as_of=gen)` over a dedup index built as successive appends of the
    cumulative ``documents`` slices ``doc_id % 10 == a-1`` for append
    ``a`` (the `asof_serving_suite` build shape), classifying the probe
    ``SELECT doc_id + rekey, text FROM documents WHERE {probe_where}``.

    Replicates the stored state at generation ``gen`` exactly:
    digests = md5(text) of slices 1..gen; band rows = the slices'
    LSH bands minus every bucket that exceeded MAX_BUCKET *within its
    own append* (the `_write_band_files` per-append cap — tombstones
    recorded per append, honored at read via the anti-join); and the
    classification: exact digest match (min stored id, jaccard 1.0)
    short-circuits banding, the remainder's candidates come from the
    band-bucket join, exact 3-shingle Jaccard >= JACCARD_THRESHOLD
    verifies, best match per probe doc (desc jaccard, asc id). The
    minhash/band fragments are the `dedup_minhash_lsh` oracle's,
    verbatim."""
    sig_expr = (
        f"list_transform(range(0, {N_HASHES}), "
        "j -> list_min(list_transform(h60s, "
        "h -> ((h % (1::BIGINT << 30)) + (j + 1) * (h >> 30)) "
        f"% {_MERSENNE31})))"
    )
    band_key = (
        f"md5(array_to_string(list_slice(sig, b.band_id * {ROWS_PER_BAND}"
        f" + 1, (b.band_id + 1) * {ROWS_PER_BAND}), ','))"
    )
    bdom = f"(SELECT UNNEST(range(0, {N_BANDS})) AS band_id) b"
    h60 = _H60_SQL.format(x="s")
    return f"""
WITH probe AS (
  SELECT doc_id + {rekey} AS doc_id, text FROM documents
  WHERE {probe_where}
),
corp AS (
  SELECT doc_id, text, 1 + (doc_id % 10) AS app FROM documents
  WHERE doc_id % 10 < {gen}
),
ex AS (
  SELECT p.doc_id, MIN(c.doc_id) AS dup_of
  FROM probe p JOIN corp c ON md5(p.text) = md5(c.text)
  GROUP BY p.doc_id
),
rem AS (
  SELECT doc_id, text FROM probe
  WHERE doc_id NOT IN (SELECT doc_id FROM ex)
),
csh AS (SELECT doc_id, app, {_SHINGLES_SQL} AS shingles FROM corp),
chash AS (
  SELECT doc_id, app, shingles,
         list_transform(shingles, s -> {h60}) AS h60s
  FROM csh WHERE len(shingles) > 0
),
csig AS (SELECT doc_id, app, shingles, {sig_expr} AS sig FROM chash),
cbands AS (
  SELECT doc_id, app, shingles, b.band_id, {band_key} AS band_key
  FROM csig, {bdom}
),
dropped AS (
  SELECT DISTINCT band_id, band_key FROM (
    SELECT app, band_id, band_key, COUNT(*) AS bsz
    FROM cbands GROUP BY 1, 2, 3
  ) WHERE bsz > {MAX_BUCKET}
),
visible AS (
  SELECT cb.* FROM cbands cb
  ANTI JOIN dropped d ON cb.band_id = d.band_id
                     AND cb.band_key = d.band_key
),
psh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM rem),
phash AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {h60}) AS h60s
  FROM psh WHERE len(shingles) > 0
),
psig AS (SELECT doc_id, shingles, {sig_expr} AS sig FROM phash),
pbands AS (
  SELECT doc_id, shingles, b.band_id, {band_key} AS band_key
  FROM psig, {bdom}
),
cand AS (
  SELECT DISTINCT pb.doc_id AS doc_a, vb.doc_id AS doc_b,
         pb.shingles AS sa, vb.shingles AS sb
  FROM pbands pb
  JOIN visible vb ON pb.band_id = vb.band_id
                 AND pb.band_key = vb.band_key
),
ver AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sa, sb)) AS DOUBLE)
           / len(list_distinct(list_concat(sa, sb))) AS jaccard
  FROM cand
),
near AS (
  SELECT doc_a AS doc_id, doc_b AS dup_of, jaccard FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_a ORDER BY jaccard DESC, doc_b) AS rk
    FROM ver WHERE jaccard >= {JACCARD_THRESHOLD}
  ) WHERE rk = 1
)
SELECT p.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS verdict,
       COALESCE(e.dup_of, n.dup_of) AS dup_of,
       CASE WHEN e.doc_id IS NOT NULL THEN CAST(1 AS DOUBLE)
            ELSE n.jaccard END AS jaccard
FROM probe p
LEFT JOIN ex e ON p.doc_id = e.doc_id
LEFT JOIN near n ON p.doc_id = n.doc_id"""


def verify_jaccard(
    pairs: DataFrame, doc_a: DataFrame, doc_b: DataFrame
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs:
    attach each side's TEXT via equi-join (AQE broadcasts the tiny capped
    pair set on its own), then re-shingle ONLY the joined rows with the
    per-row HOF form. The HOF is interpreted (~µs/element) but runs on
    |pairs|·2 rows — hundreds — while the previous collect_set form
    semi-joined and re-aggregated the full posexplode→window shingle
    lineage (the whole corpus' word rows) just to build a few hundred
    sets: ~0.5 s of the verify tail at sf0.1. withColumn AFTER the joins
    keeps Catalyst from computing shingles for non-candidate docs; at
    100 TB the shingle set is a write-time stored column and both forms
    degenerate to a column read (SCALING.md). ``doc_a``/``doc_b`` are the
    (doc_id, text) frames holding each side's text — the same frame for
    self-dedup, batch vs corpus for the incremental path."""
    ta = doc_a.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    tb = doc_b.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    jaccard = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("sa", _shingles("ta"))
        .withColumn("sb", _shingles("tb"))
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (word-frequency weighted).

    Shape: one codegen'd (doc, word) count + hash (map-side partial agg,
    one shuffle keyed by doc_id), then the 48-way bit loop runs fused in
    an Arrow kernel — (rows × 48) sign-weighted sums as one vectorized
    integer matrix op instead of a 48× row explosion through two more
    shuffles (the round-1 relational form). All arithmetic is integer ⇒
    exact ⇒ oracle-identical; the kernel accumulates its partition's
    batches because one doc's words may span Arrow chunks."""
    import numpy as np
    import pandas as pd

    doc = load_table(spark, sf_dir, "documents")
    wcount = (
        doc.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", _h60(F.col("word")))
        .select("doc_id", "cnt", "h")
    )

    def simhash_part(batches):
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        h = pdf["h"].to_numpy(dtype=np.int64)
        cnt = pdf["cnt"].to_numpy(dtype=np.int64)
        js = np.arange(SIMHASH_BITS, dtype=np.int64)
        signs = (((h[:, None] >> js[None, :]) & 1) * 2 - 1) * cnt[:, None]
        scores = pd.DataFrame(signs).groupby(pdf["doc_id"].to_numpy()).sum()
        bits = (scores.to_numpy() > 0).astype(np.int64)
        sim = (bits << js[None, :]).sum(axis=1)
        yield pd.DataFrame(
            {"doc_id": scores.index.to_numpy(dtype=np.int64), "simhash": sim}
        )

    par = spark.sparkContext.defaultParallelism
    return wcount.repartition(par, "doc_id").mapInPandas(
        simhash_part, schema="doc_id long, simhash long"
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact-Jaccard near-dup on unigram sets: block by (lang,
    length-decile) so the self-join is an equi-join on the block key, not a
    cross product — the blocking discipline that keeps this possible at
    scale (candidates within a block only)."""
    return ngram_jaccard_edges(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_hash_suite",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    wcount AS (
      SELECT doc_id, word, COUNT(*) AS cnt,
             {_H60_SQL.format(x="word")} AS h
      FROM words GROUP BY doc_id, word
    ),
    bits AS (
      SELECT doc_id, b.j,
             SUM(CASE WHEN (h >> b.j) & 1 = 1 THEN cnt ELSE -cnt END) AS score
      FROM wcount, (SELECT UNNEST(range(0, {SIMHASH_BITS})) AS j) b
      GROUP BY doc_id, b.j
    ),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN score > 0 THEN (1::BIGINT << j) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ),
    sets AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             list_distinct(string_split(text, ' ')) AS wset
      FROM documents
    ),
    ng AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
               / len(list_distinct(list_concat(a.wset, b.wset))) AS jaccard
      FROM sets a JOIN sets b
        ON a.lang = b.lang
       AND (a.n_words // 10) = (b.n_words // 10)
       AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
              / len(list_distinct(list_concat(a.wset, b.wset))) >= 0.6
    )
    SELECT 'simhash' AS part, doc_id, CAST(NULL AS BIGINT) AS doc_b,
           simhash, CAST(NULL AS DOUBLE) AS jaccard
    FROM sim
    UNION ALL
    SELECT 'ngram_jaccard' AS part, doc_id, doc_b,
           CAST(NULL AS BIGINT) AS simhash, jaccard
    FROM ng
    """,
)
def dedup_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One registry entry (since r10) for the two hash-sketch dedup
    passes — SimHash fingerprints (`dedup_simhash`) and blocked exact
    n-gram Jaccard edges (`dedup_ngram_jaccard`) — union-tagged by
    ``part`` over a NULL-padded common schema (the `analytic_suite`
    discipline; both leg builders stay the library surface). Merged to
    free a registry slot for `corpus_drift_stats` under the driver's
    50-entry cap; both legs keep full value-hash coverage."""
    sim = dedup_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("part"),
        "doc_id",
        F.lit(None).cast("long").alias("doc_b"),
        "simhash",
        F.lit(None).cast("double").alias("jaccard"),
    )
    ng = dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("ngram_jaccard").alias("part"),
        F.col("doc_a").alias("doc_id"),
        "doc_b",
        F.lit(None).cast("long").alias("simhash"),
        "jaccard",
    )
    return sim.unionByName(ng)


def ngram_jaccard_edges(doc: DataFrame, tau: float = 0.6) -> DataFrame:
    """The edge generator behind ``dedup_ngram_jaccard``, over an
    arbitrary document DataFrame (``doc_id``, ``lang``, ``text``) so the
    curation pipeline can run it on an already-filtered corpus —
    filter-before-dedup matters at scale because candidate volume grows
    quadratically in block occupancy. Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b and jaccard ≥ ``tau``."""
    words = F.split(F.col("text"), " ")
    sets = doc.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        F.array_distinct(words).alias("wset"),
    ).withColumn("len_block", F.floor(F.col("n_words") / 10).cast("long"))
    a, b = sets.alias("a"), sets.alias("b")
    jaccard = F.size(F.array_intersect("a.wset", "b.wset")).cast("double") / F.size(
        F.array_union("a.wset", "b.wset")
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_block") == F.col("b.len_block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (the vector-space member of the dedup family)
# ---------------------------------------------------------------------------

# Near-dup threshold. The synthetic fixture's vectors are near-random
# (max pairwise cosine ≈ 0.5), so the demonstration threshold sits inside
# the fixture's actual similarity range; production near-dup runs the same
# pipeline at τ ≈ 0.9 — τ is a parameter, the plan does not change.
COSINE_TAU = 0.35


def _emb_cosine_oracle() -> str:
    from .similarity import B_CAP, N_TABLES, _DOT_SQL, _planes_sql

    return f"""
    WITH params AS (
      SELECT n,
             LEAST({B_CAP}, GREATEST(4,
               CAST(CEIL(LOG2(GREATEST(n, 64) / 32.0)) AS BIGINT))) AS b
      FROM (SELECT COUNT(*) AS n FROM embeddings)
    ),
    normed AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT_SQL.format(a="embedding", b="embedding")}) AS nrm
      FROM embeddings
    ),
    sig AS (
      SELECT n.vec_id, p.table_id,
             CAST(SUM(CASE WHEN {_DOT_SQL.format(a="n.embedding", b="p.plane")} >= 0
                      THEN (1::BIGINT << p.bit_id) ELSE 0 END) AS BIGINT) AS bucket
      FROM normed n, {_planes_sql(N_TABLES)}, params
      WHERE p.bit_id < params.b
      GROUP BY n.vec_id, p.table_id
    ),
    sizes AS (SELECT table_id, bucket, COUNT(*) AS bsz FROM sig GROUP BY 1, 2),
    capped AS (
      SELECT s.vec_id, s.table_id, s.bucket
      FROM sig s JOIN sizes z ON s.table_id = z.table_id AND s.bucket = z.bucket,
           params
      WHERE z.bsz <= 32 + 8 * params.n // (1::BIGINT << params.b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
      FROM capped a JOIN capped c
        ON a.table_id = c.table_id AND a.bucket = c.bucket
      WHERE a.vec_id < c.vec_id
    ),
    dup AS (
      SELECT cand.vec_a, cand.vec_b
      FROM cand
      JOIN normed x ON x.vec_id = cand.vec_a
      JOIN normed y ON y.vec_id = cand.vec_b
      WHERE {_DOT_SQL.format(a="x.embedding", b="y.embedding")}
              / (x.nrm * y.nrm) >= {COSINE_TAU!r}
    ),
    removed AS (SELECT vec_b, COUNT(*) AS n_pairs FROM dup GROUP BY vec_b)
    SELECT e.label,
           COUNT(*) AS n_vectors,
           COUNT(r.vec_b) AS n_removed,
           COUNT(*) - COUNT(r.vec_b) AS n_survivors,
           CAST(COALESCE(SUM(r.n_pairs), 0) AS BIGINT) AS n_dup_pairs
    FROM embeddings e LEFT JOIN removed r ON e.vec_id = r.vec_b
    GROUP BY e.label
    """


@query("dedup_embedding_cosine", oracle=_emb_cosine_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: LSH-blocked candidate pairs, exact
    left-fold cosine verify at τ, greedy keep-smallest-id survivor policy,
    reported as per-label dedup stats.

    Pipeline (the vector analogue of dedup_minhash_lsh's shingle path):
    1. sign-LSH signatures — ONE Arrow kernel pass, bits scale with
       log₂ n, shared with similarity_lsh_topk (`lsh_signatures`);
    2. hot-bucket cap (the window count rides the same (table_id, bucket)
       exchange the self-join shuffles on);
    3. candidates = same-bucket pairs with vec_a < vec_b — an equi-join,
       never all-pairs;
    4. exact cosine in an Arrow kernel (`_fold_dot_rows` sequential
       fold ≡ the oracle's `list_reduce`), pairs globally deduped by
       hash-repartitioning on the pair key;
    5. dedup policy: drop any vector that has a near-dup with a smaller
       id (single-pass approximation of connected components). The full
       iterative union-find is implemented in ``queries/graph.py``
       (alternating large-star/small-star, O(log n) rounds), pinned in
       tests/test_graph.py AND value-oracle-checked by the registered
       ``dedup_survivors`` entry (full-corpus labeling over the
       ngram-Jaccard edges vs a DuckDB ``WITH RECURSIVE`` min-label
       closure) — it swaps in for this step only; the candidate
       machinery is unchanged.

    Per-label output: n_vectors / n_removed / n_survivors / n_dup_pairs —
    scalars, so the result is value-hash-checkable at any scale factor."""
    from .similarity import _bits_for, _corpus_size, lsh_signatures

    emb = load_table(spark, sf_dir, "embeddings")
    # Parameterization reads the parquet footer — no corpus collect, no
    # count job (r2's closure-shipped matrix is gone).
    n = _corpus_size(sf_dir)
    b = _bits_for(n)
    cap = 32 + 8 * n // (1 << b)
    par = spark.sparkContext.defaultParallelism
    # Deliberately NOT persisted, unlike similarity_lsh_topk's sig: the
    # self-join's two signature lineages run CONCURRENTLY inside one job
    # (A/B at sf0.1, min-of-4 interleaved: 0.99 s unpersisted vs 1.38 s
    # persisted — the persist adds a serial materialization job + cache
    # write that costs more than the duplicated cheap kernel). The LSH
    # top-k query is different: its sig feeds THREE consumers including
    # a broadcast build, where the recompute loses.
    sig = lsh_signatures(emb, b, par)
    capped = (
        sig.withColumn(
            "bsz", F.count("*").over(W.partitionBy("table_id", "bucket"))
        )
        .filter(F.col("bsz") <= cap)
        .drop("bsz")
    )
    a = capped.select(F.col("vec_id").alias("vec_a"), "table_id", "bucket")
    c = capped.select(F.col("vec_id").alias("vec_b"), "table_id", "bucket")
    cand = (
        a.join(c, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )

    from .similarity import SMALL_CORPUS_MAX, _executor_corpus

    if n <= SMALL_CORPUS_MAX:
        # Small-corpus fast path: ONE slim repartition on the pair key
        # (co-locating multi-table collisions for an exact per-partition
        # dedupe), vectors from the per-process executor-side corpus
        # cache — no driver collect, no wide shuffle.
        def score_small(batches):
            import numpy as np
            import pandas as pd

            from .similarity import _fold_dot_pairs, _unique_pairs

            ids, _labels, _M, nrm, MT = _executor_corpus(sf_dir)
            chunks = [pdf for pdf in batches if len(pdf)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            va, vb, _ = _unique_pairs(
                pdf["vec_a"].to_numpy(), pdf["vec_b"].to_numpy()
            )
            ai = np.searchsorted(ids, va)
            bi = np.searchsorted(ids, vb)
            # Gather-fold against the transposed corpus (contiguous
            # component rows) — see similarity._fold_dot_pairs.
            cos = _fold_dot_pairs(MT, ai, bi) / (nrm[ai] * nrm[bi])
            kept_b, n_pairs = np.unique(vb[cos >= COSINE_TAU], return_counts=True)
            yield pd.DataFrame(
                {
                    "vec_b": kept_b.astype(np.int64),
                    "n_pairs": n_pairs.astype(np.int64),
                }
            )

        partials = cand.repartition(par, "vec_a", "vec_b").mapInPandas(
            score_small, "vec_b long, n_pairs long"
        )
    else:
        # Large corpus: vectors gathered SHUFFLE-side — slim-pair
        # dropDuplicates kills multi-table collisions while rows are 16
        # bytes, then two equi-joins attach the vectors (broadcast or
        # sort-merge, Catalyst's call; the corpus never touches the
        # driver). Scoring is then NARROW: each Arrow batch scores
        # independently since pairs are already globally distinct. Per-
        # vec_b partial counts may split across batches/partitions; the
        # final groupBy sums them and count_distinct absorbs the split.
        def score_gathered(batches):
            import numpy as np
            import pandas as pd

            from .similarity import _fold_dot_rows_T

            for pdf in batches:
                if not len(pdf):
                    continue
                # One explicit transpose each, then contiguous-row folds
                # (see similarity._fold_dot_pairs' traffic note).
                AT = np.ascontiguousarray(
                    np.stack(pdf["a_emb"].to_numpy()).astype(np.float64).T
                )
                BT = np.ascontiguousarray(
                    np.stack(pdf["b_emb"].to_numpy()).astype(np.float64).T
                )
                cos = _fold_dot_rows_T(AT, BT) / (
                    np.sqrt(_fold_dot_rows_T(AT, AT))
                    * np.sqrt(_fold_dot_rows_T(BT, BT))
                )
                vb = pdf["vec_b"].to_numpy().astype(np.int64)
                kept_b, n_pairs = np.unique(
                    vb[cos >= COSINE_TAU], return_counts=True
                )
                yield pd.DataFrame(
                    {
                        "vec_b": kept_b.astype(np.int64),
                        "n_pairs": n_pairs.astype(np.int64),
                    }
                )

        ea = emb.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb")
        )
        eb = emb.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb")
        )
        wide = (
            cand.dropDuplicates(["vec_a", "vec_b"]).join(eb, "vec_b").join(ea, "vec_a")
        )
        partials = wide.mapInPandas(score_gathered, "vec_b long, n_pairs long")
    e = emb.select("vec_id", "label")
    return (
        e.join(partials, e.vec_id == partials.vec_b, "left")
        .groupBy("label")
        .agg(
            F.count_distinct("vec_id").alias("n_vectors"),
            F.count_distinct("vec_b").alias("n_removed"),
            (F.count_distinct("vec_id") - F.count_distinct("vec_b")).alias(
                "n_survivors"
            ),
            F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("long").alias("n_dup_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup) — cluster-then-prune over embeddings
# ---------------------------------------------------------------------------


def semantic_dedup_oracle(
    tau: float = COSINE_TAU, cent_ctes: str | None = None
) -> str:
    """DuckDB oracle for :func:`semantic_dedup` — the identical
    derivation in SQL: decimal-exact per-label centroids (the shared
    ``_IVF_CENT_SQL``), nearest-cell assignment by the same left-fold
    dot, within-cell pairwise cosine edges at ``tau``, min-label
    transitive closure (``WITH RECURSIVE`` — oracle scale only), and
    the keep-least-central election.

    ``cent_ctes``: alternative CTE fragment ending in ``cent(cell,
    centroid)`` — e.g. `clustering.kmeans_cent_ctes(...)` to pin
    SemDeDup over TRAINED k-means cells
    (`semantic_dedup_frame(clusters=...)`) end-to-end."""
    from .similarity import _DOT_SQL, _IVF_CENT_SQL

    if cent_ctes is None:
        cent_ctes = _IVF_CENT_SQL
    return f"""
    WITH RECURSIVE {cent_ctes},
    assigned AS (
      SELECT vec_id, embedding, cell, centroid FROM (
        SELECT e.vec_id, e.embedding, c.cell, c.centroid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_DOT_SQL.format(a="e.embedding", b="c.centroid")} DESC, c.cell
               ) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ),
    cosed AS (
      SELECT vec_id, cell,
             {_DOT_SQL.format(a="embedding", b="centroid")}
               / (SQRT({_DOT_SQL.format(a="embedding", b="embedding")})
                  * SQRT({_DOT_SQL.format(a="centroid", b="centroid")})) AS cos_cent
      FROM assigned
    ),
    edges AS (
      SELECT x.vec_id AS u, y.vec_id AS v
      FROM assigned x JOIN assigned y
        ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {_DOT_SQL.format(a="x.embedding", b="y.embedding")}
              / (SQRT({_DOT_SQL.format(a="x.embedding", b="x.embedding")})
                 * SQRT({_DOT_SQL.format(a="y.embedding", b="y.embedding")})) >= {tau!r}
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    walk(node, reach) AS (
      SELECT u AS node, u AS reach FROM sym
      UNION
      SELECT s.u AS node, w.reach FROM sym s JOIN walk w ON w.node = s.v
    ),
    ccomp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
    SELECT vec_id, cell, component, cos_cent, is_kept FROM (
      SELECT co.vec_id, co.cell, co.cos_cent,
             COALESCE(cm.component, co.vec_id) AS component,
             (ROW_NUMBER() OVER (
                PARTITION BY COALESCE(cm.component, co.vec_id)
                ORDER BY co.cos_cent ASC, co.vec_id ASC) = 1) AS is_kept
      FROM cosed co LEFT JOIN ccomp cm ON cm.node = co.vec_id
    )
    """


@query("semantic_dedup", oracle=semantic_dedup_oracle())
def semantic_dedup(
    spark: SparkSession, sf_dir: str, tau: float = COSINE_TAU
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public method, implemented from its description):
    cluster the embedding space, compare pairs ONLY within a cluster,
    and keep per duplicate-group the example LEAST similar to its
    cluster centroid (the diversity-preserving election — the member
    closest to the centroid is the one its cluster-mates already
    represent).

    Spark-first derivation, reusing the repo's existing kernels:

    1. cluster = the IVF coarse codebook (`_ivf_centroids`, decimal-
       exact per-label mean ⇒ bit-identical across engines) + nearest-
       cell assignment (`_ivf_ranked_assignment` rk==1 — ONE Arrow
       kernel pass, same left-fold dot as the oracle's list_reduce);
    2. candidates = within-cell pairs (vec_a < vec_b) — an equi-join on
       cell, never all-pairs: the cluster count is the scale lever
       (SemDeDup runs k ≈ 10⁵ clusters at web scale, bounding each
       cell's pairwise block), exactly the IVF partition-pruning story;
    3. exact cosine at ``tau`` → near-dup edges (dual-path scorer:
       executor-side corpus cache + transposed gather-folds below
       SMALL_CORPUS_MAX, shuffle-side join-gather above — the
       dedup_embedding_cosine machinery);
    4. components over the edges (`graph.label_corpus`: large/small-star
       rounds, or the bounded driver fast path) — NOT the greedy
       smallest-id rule, so chains collapse to one group;
    5. keeper per component = min (cos_to_centroid, vec_id): the least
       central member survives; singletons keep themselves.

    Output (one row per vector, scalars only): vec_id, cell, component,
    cos_cent, is_kept. Value-oracle-pinned against
    :func:`semantic_dedup_oracle` in tests/test_semantic_dedup.py."""
    from .similarity import _corpus_size

    emb = load_table(spark, sf_dir, "embeddings")
    return _semantic_dedup_impl(
        spark, emb, tau, sf_dir=sf_dir, n=_corpus_size(sf_dir)
    )


def semantic_dedup_frame(
    spark: SparkSession,
    emb: DataFrame,
    tau: float = COSINE_TAU,
    clusters=None,
) -> DataFrame:
    """Frame-level :func:`semantic_dedup` over any (vec_id, label,
    embedding) DataFrame — same derivation and output, always the
    shuffle-side join-gather scorer (no fixture-file executor cache to
    lean on). Hand-crafted cluster semantics pinned in
    tests/test_semantic_dedup.py.

    ``clusters``: a TRAINED cluster structure — a
    `clustering.KMeansResult` or explicit ``{"cell", "centroid"}`` rows
    — replacing the default label-mean codebook (SemDeDup as published
    runs over k-means cells; Abbas et al. 2023 §3). The blocking,
    cos-to-centroid election, and oracle derivation are unchanged —
    only the ``cent`` relation differs (oracle: splice the k-means CTE
    chain via `semantic_dedup_oracle(cent_ctes=...)`)."""
    return _semantic_dedup_impl(
        spark, emb, tau, sf_dir=None, n=None, clusters=clusters
    )


def _semantic_dedup_impl(
    spark: SparkSession,
    emb: DataFrame,
    tau: float,
    sf_dir: str | None,
    n: int | None,
    clusters=None,
) -> DataFrame:
    from .graph import label_corpus
    from .similarity import (
        SMALL_CORPUS_MAX,
        _fold_dot_rows_T,
        _ivf_centroids,
        _ivf_ranked_assignment,
    )

    par = spark.sparkContext.defaultParallelism

    # ONE tiny codebook collect feeds both the cell assignment and the
    # cos-to-centroid kernel (codebook size is n_cells, never corpus).
    from .similarity import _resolve_codebook

    crows = _resolve_codebook(clusters) or sorted(
        _ivf_centroids(emb).collect(), key=lambda r: r["cell"]
    )
    ranked = managed_persist(_ivf_ranked_assignment(spark, emb, crows=crows))
    assigned = ranked.filter(F.col("rk") == 1).select("vec_id", "cell")

    import numpy as np

    cells_np = np.array([r["cell"] for r in crows], dtype=np.int64)
    C = np.array([r["centroid"] for r in crows], dtype=np.float64)
    CT = np.ascontiguousarray(C.T)
    cnrm = np.sqrt(_fold_dot_rows_T(CT, CT))

    def cos_cent_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ET = np.ascontiguousarray(E.T)
            enrm = np.sqrt(_fold_dot_rows_T(ET, ET))
            idx = np.searchsorted(cells_np, pdf["cell"].to_numpy())
            GT = np.ascontiguousarray(C[idx].T)
            cos = _fold_dot_rows_T(ET, GT) / (enrm * cnrm[idx])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().astype(np.int64),
                    "cell": pdf["cell"].to_numpy().astype(np.int64),
                    "cos_cent": cos,
                }
            )

    cosed = (
        assigned.join(emb.select("vec_id", "embedding"), "vec_id")
        .repartition(par)
        .mapInPandas(cos_cent_kernel, "vec_id long, cell long, cos_cent double")
    )

    a = assigned.select(F.col("vec_id").alias("vec_a"), "cell")
    b = assigned.select(F.col("vec_id").alias("vec_b"), "cell")
    # Each vector sits in exactly ONE cell (rk==1), so the cell join
    # emits every unordered pair at most once — no multi-table dedup
    # pass (unlike the LSH-blocked candidates).
    cand = (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )

    if sf_dir is not None and n is not None and n <= SMALL_CORPUS_MAX:

        def edge_small(batches):
            import numpy as np
            import pandas as pd

            from .similarity import _executor_corpus, _fold_dot_pairs

            ids, _labels, _M, nrm, MT = _executor_corpus(sf_dir)
            for pdf in batches:
                if not len(pdf):
                    continue
                va = pdf["vec_a"].to_numpy().astype(np.int64)
                vb = pdf["vec_b"].to_numpy().astype(np.int64)
                ai = np.searchsorted(ids, va)
                bi = np.searchsorted(ids, vb)
                cos = _fold_dot_pairs(MT, ai, bi) / (nrm[ai] * nrm[bi])
                m = cos >= tau
                yield pd.DataFrame({"vec_a": va[m], "vec_b": vb[m]})

        edges = cand.repartition(par).mapInPandas(
            edge_small, "vec_a long, vec_b long"
        )
    else:
        ea = emb.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb")
        )
        eb = emb.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb")
        )

        def edge_gathered(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                AT = np.ascontiguousarray(
                    np.stack(pdf["a_emb"].to_numpy()).astype(np.float64).T
                )
                BT = np.ascontiguousarray(
                    np.stack(pdf["b_emb"].to_numpy()).astype(np.float64).T
                )
                cos = _fold_dot_rows_T(AT, BT) / (
                    np.sqrt(_fold_dot_rows_T(AT, AT))
                    * np.sqrt(_fold_dot_rows_T(BT, BT))
                )
                m = cos >= tau
                yield pd.DataFrame(
                    {
                        "vec_a": pdf["vec_a"].to_numpy().astype(np.int64)[m],
                        "vec_b": pdf["vec_b"].to_numpy().astype(np.int64)[m],
                    }
                )

        edges = (
            cand.join(eb, "vec_b")
            .join(ea, "vec_a")
            .mapInPandas(edge_gathered, "vec_a long, vec_b long")
        )

    # Each vector sits in exactly one cell and cand enforces
    # vec_a < vec_b, so the verified edges are distinct with no self
    # edges by construction — skip CC's defensive distinct (r18).
    labeled = label_corpus(
        cosed, edges, "vec_id", src="vec_a", dst="vec_b",
        edges_distinct=True,
    ).drop("is_survivor")
    win = W.partitionBy("component").orderBy(
        F.col("cos_cent").asc(), F.col("vec_id").asc()
    )
    return (
        labeled.withColumn("rn", F.row_number().over(win))
        .select(
            "vec_id",
            "cell",
            "component",
            "cos_cent",
            (F.col("rn") == 1).alias("is_kept"),
        )
    )


def _para_rows(doc: DataFrame, sep: str) -> DataFrame:
    """(doc_id, pos, para) — one row per paragraph occurrence. ``sep``
    is a LITERAL separator (escaped for split's regex arg): the same
    string must both split the input and rejoin kept paragraphs, and
    the DuckDB oracle's string_split is literal."""
    import re

    return doc.select(
        "doc_id",
        F.posexplode(F.split("text", re.escape(sep))).alias("pos", "para"),
    )


def paragraph_digests(doc: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Single-column (``h``) md5 digest of every paragraph of ``doc`` —
    the kernel behind `CorpusWriter`'s stored paragraph layer (write =
    these rows of the admitted docs; query = `dedup_paragraphs`'s
    ``seen`` anti-join). 16-byte rows; text never shuffles."""
    return _para_rows(doc, sep).select(F.md5("para").alias("h"))


def dedup_paragraphs(
    doc: DataFrame, sep: str = "\n\n", seen: DataFrame | None = None
) -> DataFrame:
    """Paragraph-level exact dedup (Lee et al. 2022 / Dolma's paragraph
    pass): every paragraph that has appeared EARLIER in the corpus —
    in a previous document, or earlier in the same document — is
    removed, and each document is reassembled from its kept paragraphs
    in original order. "Earlier" is the deterministic global order
    (doc_id, position), so the output is a pure function of the corpus,
    identical at any partitioning or cluster size.

    Input: (doc_id, text, ...). Output: one row per input document —
    every input column with ``text`` rewritten, plus (n_paras, n_kept);
    a document whose every paragraph was seen before keeps its row
    with empty text and n_kept = 0. Pass-through columns (lang,
    source, ...) survive so the pass composes into the curation
    pipeline (`CurationConfig(dedup_paragraphs=True)`).

    ``seen``: optional single-column (``h``) frame of md5 paragraph
    digests already used by an EXISTING corpus — every batch paragraph
    whose digest appears there is dropped before the in-batch
    first-occurrence election, making this the incremental form
    (`CorpusWriter`'s stored paragraph layer). The anti-join runs on
    the slim digest rows; paragraph text still never rides a digest
    shuffle.

    100 TB posture, stage by stage:
    - the first-occurrence decision shuffles ONLY slim rows (16-byte
      md5 of the paragraph + doc_id + pos), one exchange keyed on the
      digest, as a min-struct HASH AGGREGATE with map-side partials —
      a hot digest (empty/boilerplate paragraphs) costs one shuffle
      row per map partition, never a per-copy sort in one task;
    - paragraph text never rides the digest shuffle: paragraph rows
      are a pure function of the document, so the keep-set (doc_id,
      pos) semi-joins back onto a RE-DERIVED explode of the same scan
      ("persist small, recompute big" — the decision frame is the
      small side);
    - reassembly is the one irreducible wide shuffle (kept text must
      co-locate per document), same cost class as any curation job's
      output write. Per-document work is O(paragraphs log paragraphs)
      (the array_sort); no document is held whole until its own
      groupBy row, matching the other per-doc operators here."""
    paras = _para_rows(doc, sep)
    slim = paras.select("doc_id", "pos", F.md5("para").alias("h"))
    if seen is not None:
        slim = slim.join(seen.select("h"), "h", "left_anti")
    # Global first occurrence as a MIN aggregate, not a row_number
    # window: min(struct(doc_id, pos)) is the lexicographic first and
    # hash-aggregates with a guaranteed map-side partial, so a
    # ubiquitous paragraph (the empty string, boilerplate lines —
    # billions of copies in a crawl corpus) contributes ONE row per map
    # partition to the shuffle and O(partitions) rows to its reduce
    # task. A window form would co-locate and sort every copy of the
    # hot digest in one task; the optimizer's partial WindowGroupLimit
    # can bound the shuffle, but the aggregate form guarantees it.
    first = (
        slim.groupBy("h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
        .select(
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.pos").alias("pos"),
        )
    )
    kept = paras.join(first, ["doc_id", "pos"], "leftsemi")
    assembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    import re

    totals = doc.select(
        "doc_id",
        F.size(F.split("text", re.escape(sep))).cast("long").alias("n_paras"),
    )
    out = (
        totals.join(assembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_paras",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        )
    )
    extra = [c for c in doc.columns if c not in ("doc_id", "text")]
    if not extra:
        return out
    # Re-attach pass-through columns by doc_id (one equi-join on the
    # id — the rewritten text is already the join's wide side; carrying
    # the extras through the reassembly aggregate would widen every
    # shuffle row instead).
    return doc.drop("text").join(out, "doc_id").select(
        *doc.columns, "n_paras", "n_kept"
    )


# ExactSubstr window length (words). Lee et al. 2022 use 50 BPE tokens;
# the fixture documents average ~50 words, so the default here is scaled
# down to exercise the kernel. Production crawls tune w to the tokenizer.
EXACT_SUBSTR_W = 8


def exact_substr_digests(doc: DataFrame, w: int = EXACT_SUBSTR_W) -> DataFrame:
    """Single-column (``h``) md5 digests of every ``w``-word rolling
    window of ``doc`` — the kernel behind `CorpusWriter`'s stored
    ExactSubstr layer (write = these rows of the admitted docs' final
    text; query = :func:`dedup_exact_substr`'s ``seen`` sentinel
    election). Distinct within the frame: the layer is a SET of
    window digests, and surviving text can still repeat a window
    (span removal creates new adjacencies), so dedup here keeps the
    stored rows slim. 16-byte rows; word text rides only the per-doc
    `lead` window, never a digest shuffle."""
    if w < 2:
        raise ValueError(f"exact_substr_digests requires w >= 2, got {w}")
    words = doc.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w0")
    )
    win = W.partitionBy("doc_id").orderBy("i")
    leads = [F.lead("w0", j).over(win) for j in range(1, w)]
    return (
        words.select(
            F.md5(F.concat_ws(" ", "w0", *leads)).alias("h"),
            leads[-1].alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("h")
        .distinct()
    )


def dedup_exact_substr(
    doc: DataFrame, w: int = EXACT_SUBSTR_W, seen: DataFrame | None = None
) -> DataFrame:
    """ExactSubstr duplicated-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at word
    granularity: any ``w``-word window whose text appears EARLIER in the
    corpus — in a previous document, or earlier in the same document —
    has all ``w`` of its word positions removed, and each document is
    reassembled from its surviving words in original order. The paper
    builds a suffix array over the concatenated corpus and strips
    duplicated spans of >= 50 tokens from all but one occurrence; the
    relational reformulation here marks every non-first occurrence of a
    fixed-width rolling window and takes the UNION of the marks, which
    removes exactly the maximal duplicated span for any duplicate run of
    length >= w (overlapping duplicated windows merge by construction).
    "First" is the deterministic global order (doc_id, position), so the
    output is a pure function of the corpus, identical at any
    partitioning or cluster size.

    Like the paper's sequential algorithm, the pass is NOT idempotent:
    removing a span creates new word adjacencies that a second pass may
    again find duplicated. Documents shorter than ``w`` words carry no
    windows and pass through untouched.

    Input: (doc_id, text, ...). Output: one row per input document —
    every input column with ``text`` rewritten, plus (n_words, n_kept);
    a document whose every word was covered by duplicated windows keeps
    its row with empty text and n_kept = 0.

    ``seen``: optional single-column (``h``) frame of window digests
    already present in an EXISTING corpus (`exact_substr_digests` of
    the stored text — `CorpusWriter`'s stored ExactSubstr layer).
    Stored windows precede every batch occurrence, so EVERY batch
    occurrence of a stored digest is removed (no in-batch keeper) and
    the in-batch first-occurrence election runs only among unseen
    digests. Implemented by injecting one sentinel occurrence at
    (doc_id=-1, pos=-1) per stored digest into the min-struct election
    — for a frame whose ids all exceed an existing corpus's, this is
    exactly the full kernel over (corpus ∪ batch) restricted to the
    batch (pinned). Requires nonnegative ``doc_id`` (the sentinel must
    sort first).

    100 TB posture, stage by stage:
    - window digests shuffle SLIM (16-byte md5 + doc_id + pos); word
      text rides only the per-doc `lead` window (one exchange on
      doc_id) and never the digest shuffle;
    - the first-occurrence election is a min-struct HASH AGGREGATE with
      map-side partials — a boilerplate window with a billion copies
      costs one shuffle row per map partition (the dedup_paragraphs
      discipline), never a per-copy sort in one task;
    - the duplicate-detection join keys the slim occurrence rows on the
      digest; a hot digest co-locates its copies in one join task, but
      the build side is exactly ONE row per digest, so AQE's skew-join
      split replicates it freely (and the downstream `distinct` on the
      marked indexes hash-aggregates with partials);
    - removal marks are w rows per duplicated occurrence (bounded
      explode), de-duplicated before touching the word rows;
    - the anti-join + per-doc reassembly mirror dedup_paragraphs: the
      decision frames are the small side, words re-derive from the
      scan, and no document is held whole until its own groupBy row.
    """
    if w < 2:
        raise ValueError(f"dedup_exact_substr requires w >= 2, got {w}")
    words = doc.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w0")
    )
    win = W.partitionBy("doc_id").orderBy("i")
    leads = [F.lead("w0", j).over(win) for j in range(1, w)]
    grams = (
        words.select(
            "doc_id",
            F.col("i").alias("pos"),
            F.md5(F.concat_ws(" ", "w0", *leads)).alias("h"),
            # leads are NULL only past the partition tail, monotonically:
            # the LAST lead being non-NULL implies a full w-word window.
            leads[-1].alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("doc_id", "pos", "h")
    )
    occ = grams
    if seen is not None:
        # One sentinel occurrence per stored digest: (-1, -1) sorts
        # before any real (doc_id >= 0, pos >= 0), so a stored window
        # wins every election it enters and all its batch occurrences
        # land in `dup` (the join below runs on the batch-only grams —
        # sentinels never reach the output).
        occ = grams.unionByName(
            seen.select(
                F.lit(-1).cast("long").alias("doc_id"),
                F.lit(-1).cast("int").alias("pos"),
                "h",
            )
        )
    first = occ.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    dup = (
        grams.join(first, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )
    removed = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))
        ).alias("i"),
    ).distinct()
    kept = words.join(removed, ["doc_id", "i"], "left_anti")
    assembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "w0"))),
                lambda s: s["w0"],
            ),
        ).alias("text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = doc.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_words")
    )
    out = totals.join(assembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        "n_words",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )
    extra = [c for c in doc.columns if c not in ("doc_id", "text")]
    if not extra:
        return out
    return doc.drop("text").join(out, "doc_id").select(
        *doc.columns, "n_words", "n_kept"
    )
