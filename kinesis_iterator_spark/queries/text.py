"""Text analysis over ``documents`` (`[EXT]`, SURVEY.md §2.C / §7 phase 5):
quality scoring, language ID, token counting, fingerprinting, tf / n-grams.

All built-in expressions (codegen'd); the heuristics are deliberately
SQL-expressible so every operator here has a real DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import query

# Tiny stopword-marker lists per language for the n-gram/stopword heuristic
# language ID. Deliberately small + fixed: deterministic, embedded in both
# the Spark plan and the oracle SQL.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def quality_signal_columns() -> dict[str, Column]:
    """The per-document signal expressions over an implicit ``text``
    column, by output name. Factored so the registry query below and the
    curation pipeline (``kinesis_iterator_spark.pipeline``) compute
    bit-identical signals from one definition. All built-in expressions:
    map-side, codegen'd, no Python."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    ).cast("long")
    n_unique = F.size(F.array_distinct(words)).cast("long")
    chars = F.split(F.col("text"), "")
    poly = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(2147483647),
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": n_chars.cast("double") / n_words,
        "punct_ratio": (
            n_chars - F.length(F.regexp_replace("text", "[^a-zA-Z ]", ""))
        ).cast("double")
        / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_words,
        "n_unique": n_unique,
        "lexical_diversity": n_unique.cast("double") / n_words,
        "bpe_ish_tokens": F.size(
            F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)")
        ).cast("long"),
        "byte_estimate_tokens": F.ceil(F.length("text") / 4.0).cast("long"),
        "fingerprint": poly,
        "digest": F.md5("text"),
    }


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
           CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
             / LENGTH(text) AS punct_ratio,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> w IN ({_sql_list(STOPWORDS)}))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS lexical_diversity,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_estimate_tokens,
           CAST(list_reduce(
             list_prepend(0::BIGINT,
               list_transform(range(1, LENGTH(text) + 1),
                              i -> unicode(substring(text, i, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 2147483647) AS BIGINT) AS fingerprint,
           md5(text) AS digest
    FROM documents
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document signal suite: quality scores (length, word stats,
    punctuation ratio, stopword ratio, lexical diversity — the standard
    C4/Gopher-style pre-training corpus filters), token counting
    (whitespace ≡ n_words, BPE-ish regex, bytes/4 rule-of-thumb), and
    document fingerprinting (rolling 31-polynomial hash over the character
    stream mod 2^31-1 — the Rabin-Karp building block — plus md5 digest).
    Pure map-side: zero shuffles."""
    doc = load_table(spark, sf_dir, "documents")
    sig = quality_signal_columns()
    return doc.select(
        "doc_id", *(col.alias(name) for name, col in sig.items())
    )


def _lang_score_sql(lang: str) -> str:
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"w -> w IN ({_sql_list(LANG_MARKERS[lang])})))"
    )


@query(
    "text_lang_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS labeled_lang,
             {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("es")} AS s_es,
             {_lang_score_sql("fr")} AS s_fr,
             {_lang_score_sql("de")} AS s_de,
             {_lang_score_sql("zh")} AS s_zh
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh'
           END AS predicted_lang,
           CAST(s_en + s_es + s_fr + s_de + s_zh AS BIGINT) AS marker_hits
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic family): count stopword
    markers per language, argmax with a fixed priority order for ties.
    Map-side only."""
    doc = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def score(lang: str):
        return F.size(F.filter(words, lambda w: w.isin(*LANG_MARKERS[lang]))).cast(
            "long"
        )

    scored = doc.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score("en").alias("s_en"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
        score("de").alias("s_de"),
        score("zh").alias("s_zh"),
    )
    s = {k: F.col(f"s_{k}") for k in ("en", "es", "fr", "de", "zh")}
    pred = (
        F.when(
            (s["en"] >= s["es"])
            & (s["en"] >= s["fr"])
            & (s["en"] >= s["de"])
            & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        (s["en"] + s["es"] + s["fr"] + s["de"] + s["zh"]).alias("marker_hits"),
    )


# Token counting and document fingerprinting are part of
# text_quality_scores above (same table, same per-doc grain).


@query(
    "text_tf_per_source",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (
      SELECT source, word, COUNT(*) AS tf FROM toks GROUP BY source, word
    )
    SELECT source, word, tf, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY tf DESC, word) AS BIGINT) AS rnk
      FROM counts
    ) WHERE rnk <= 5
    """,
)
def text_tf_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency + top-5 terms per source: explode → two-phase count
    (partial agg before the shuffle) → windowed top-k."""
    doc = load_table(spark, sf_dir, "documents")
    counts = (
        doc.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("tf"))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("source").orderBy(F.desc("tf"), "word")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "text_ngrams",
    oracle="""
    WITH grams AS (
      SELECT UNNEST(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 0) + 1),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
             )) AS bigram
      FROM documents
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    HAVING COUNT(*) >= 5
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram extraction + frequency — built with sequence/transform (no
    UDF, no pyspark.ml featurizer needed)."""
    doc = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )
    return (
        doc.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "text_sample_stratified",
    oracle="""
    WITH s AS (
      SELECT lang, doc_id, n_chars,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 1000 < 100 AS keep
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
           CAST(COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT)
             AS sampled_chars,
           MIN(CASE WHEN keep THEN doc_id END) AS min_sampled_doc,
           MAX(CASE WHEN keep THEN doc_id END) AS max_sampled_doc
    FROM s GROUP BY lang
    """,
)
def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-pipeline primitive
    for reproducible subsets: keep a document iff
    ``hash(doc_id) mod 1000 < 100`` (a 10% rate), accounted per language
    stratum.

    Why hash-mod and not ``df.sample()``: RNG samplers are
    engine/partitioning-dependent and unrepeatable across runs; the
    hash-mod predicate is a pure per-row expression — same sample on any
    engine, any partitioning, any day, and it composes with pushdown (the
    predicate prunes at the scan, so a 10% sample reads ~10% of a
    100 TB table's row groups after filtering). Rate changes are a
    literal edit; per-stratum rates are a CASE over the stratum column.
    The hash is md5-derived (`dedup._h60` convention) so the oracle
    reproduces the exact sample."""
    from .dedup import _h60

    doc = load_table(spark, sf_dir, "documents")
    keep = F.pmod(_h60(F.col("doc_id").cast("string")), 1000) < 100
    return doc.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_sample"),
        F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("sampled_chars"),
        F.min(F.when(keep, F.col("doc_id"))).alias("min_sampled_doc"),
        F.max(F.when(keep, F.col("doc_id"))).alias("max_sampled_doc"),
    )
