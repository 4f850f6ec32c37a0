"""ExactSubstr duplicated-span removal (Lee et al. 2022), pinned
bit-identical against a full DuckDB derivation of the same semantics at
sf0.001 AND sf0.01, plus keeper-survival / short-doc / invariance
properties. The planted-span derivation is the same deterministic
SQL-expressible rule on both sides (no synthesized fixture data)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.dedup import (
    EXACT_SUBSTR_W,
    dedup_exact_substr,
)
from kinesis_iterator_spark.tables import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# 12 words none of which appear in the fixture vocabulary, appended to
# every 5th document: with w=8 every window of the planted span is
# duplicated across those docs, so the LOWEST such doc_id keeps the span
# and every other one loses it wholesale.
SPAN = (
    "omega kappa sigma lambda theta gamma delta epsilon zeta iota nu xi"
)


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _derived(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(SPAN)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _oracle_sql(w: int) -> str:
    lead_cols = ", ".join(
        f"lead(w, {j}) OVER win" for j in range(1, w)
    )
    return f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' ' || '{SPAN}'
                  ELSE text END AS text
      FROM documents
    ),
    t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
    wi AS (SELECT doc_id, unnest(range(len(ws))) AS i, ws FROM t),
    word AS (SELECT doc_id, i, ws[i + 1] AS w FROM wi),
    grams0 AS (
      SELECT doc_id, i AS pos,
             md5(concat_ws(' ', w, {lead_cols})) AS h,
             lead(w, {w - 1}) OVER win AS tail
      FROM word WINDOW win AS (PARTITION BY doc_id ORDER BY i)
    ),
    g AS (SELECT doc_id, pos, h FROM grams0 WHERE tail IS NOT NULL),
    fst AS (
      SELECT h, doc_id, pos FROM (
        SELECT h, doc_id, pos,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                 AS rn
        FROM g
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT g.doc_id, g.pos
      FROM g JOIN fst USING (h)
      WHERE (g.doc_id, g.pos) <> (fst.doc_id, fst.pos)
    ),
    rme AS (
      SELECT doc_id, pos, unnest(range({w})) AS j FROM dup
    ),
    removed AS (SELECT DISTINCT doc_id, pos + j AS i FROM rme),
    kept AS (
      SELECT word.* FROM word ANTI JOIN removed USING (doc_id, i)
    ),
    asm AS (
      SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text,
             COUNT(*)::BIGINT AS n_kept
      FROM kept GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_words
      FROM d
    )
    SELECT tot.doc_id, COALESCE(asm.text, '') AS text, n_words,
           COALESCE(n_kept, 0)::BIGINT AS n_kept
    FROM tot LEFT JOIN asm USING (doc_id)
    """


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_exact_substr_matches_duckdb_oracle(spark, sf_dir2):
    got = _rows(dedup_exact_substr(_derived(spark, sf_dir2)))
    want = sorted(
        tuple(r)
        for r in _con(sf_dir2).execute(_oracle_sql(EXACT_SUBSTR_W)).fetchall()
    )
    assert got == want
    # The pass actually removed something (the planted span guarantees
    # cross-doc duplicates; the tiny fixture vocabulary adds natural
    # ones) AND kept something.
    assert any(r[3] < r[2] for r in got)
    assert any(r[3] == r[2] for r in got)


def test_exact_substr_keeper_survives(spark, sf_dir):
    out = dedup_exact_substr(_derived(spark, sf_dir)).collect()
    planted = sorted(r for r in out if r["doc_id"] % 5 == 0)
    keeper, rest = planted[0], planted[1:]
    # The globally-first occurrence of the planted span keeps it; every
    # later planted doc loses the whole span (all its windows are
    # non-first occurrences and their marks union over the full span).
    assert SPAN in keeper["text"]
    assert all("omega" not in r["text"] for r in rest)
    assert all("xi" not in r["text"].split() for r in rest)


def test_exact_substr_short_docs_untouched(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    # 3-word prefixes: shorter than w, so no windows exist — every doc
    # passes through verbatim even though the tiny vocabulary makes the
    # prefixes heavily duplicated across docs.
    short = doc.select(
        "doc_id",
        F.concat_ws(
            " ", F.slice(F.split("text", " "), 1, 3)
        ).alias("text"),
    )
    out = dedup_exact_substr(short)
    n = short.count()
    same = out.join(
        short.withColumnRenamed("text", "orig"), "doc_id"
    ).filter(
        (F.col("text") == F.col("orig"))
        & (F.col("n_kept") == F.col("n_words"))
    )
    assert same.count() == n


def test_exact_substr_partitioning_invariant(spark, sf_dir):
    base = _derived(spark, sf_dir)
    a = _rows(dedup_exact_substr(base.repartition(7)))
    b = _rows(dedup_exact_substr(base.repartition(2)))
    assert a == b


def test_exact_substr_counts_consistent(spark, sf_dir):
    out = dedup_exact_substr(_derived(spark, sf_dir))
    bad = out.filter(
        (F.col("n_kept") > F.col("n_words"))
        | (
            (F.col("n_kept") > 0)
            & (F.size(F.split("text", " ")) != F.col("n_kept"))
        )
        | ((F.col("n_kept") == 0) & (F.col("text") != ""))
    )
    assert bad.count() == 0


def test_exact_substr_passthrough_columns(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    out = dedup_exact_substr(doc)
    assert out.columns == [
        "doc_id", "text", "lang", "source", "n_chars", "n_words", "n_kept"
    ]
    # Pass-through values survive the rewrite join.
    orig = doc.select("doc_id", "lang", "source", "n_chars")
    back = out.select("doc_id", "lang", "source", "n_chars")
    assert _rows(orig) == _rows(back)


# -- pipeline composition: CurationConfig(dedup_exact_substr=True) ------


def test_curation_exact_substr_stage_equals_pre_pass_composition(
    spark, sf_dir
):
    """CurationConfig(dedup_exact_substr=True) ≡ running the span pass
    first and curating the rewritten frame (the paragraph-stage pin's
    shape) — stats and kept text identical."""
    from kinesis_iterator_spark.pipeline import CurationConfig, curate_frame
    from kinesis_iterator_spark.queries import release_persists

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(SPAN)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    a = curate_frame(doc, CurationConfig(dedup_exact_substr=True))
    pre = dedup_exact_substr(doc, w=EXACT_SUBSTR_W).drop("n_words", "n_kept")
    b = curate_frame(pre, CurationConfig())
    try:
        assert a.stats() == b.stats()
        assert _rows(a.final.select("doc_id", "text")) == _rows(
            b.final.select("doc_id", "text")
        )
    finally:
        a.release()
        b.release()
        release_persists()


def test_curation_all_rewrite_stages_order(spark, sf_dir):
    """With scrub + paragraphs + exact-substr all on, the pipeline
    equals the manual scrub → dedup_paragraphs → dedup_exact_substr →
    curate(default) chain — pinning the documented _pre_stages order."""
    from kinesis_iterator_spark.pipeline import CurationConfig, curate_frame
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.dedup import dedup_paragraphs
    from kinesis_iterator_spark.queries.text import PII_PATTERNS, scrub_pii

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    a = curate_frame(
        doc,
        CurationConfig(
            scrub_pii=True, dedup_paragraphs=True, dedup_exact_substr=True
        ),
    )
    pre = scrub_pii(doc).drop(
        "n_redacted", *[f"n_{name}" for name, _, _ in PII_PATTERNS]
    )
    pre = dedup_paragraphs(pre).drop("n_paras", "n_kept")
    pre = dedup_exact_substr(pre, w=EXACT_SUBSTR_W).drop("n_words", "n_kept")
    b = curate_frame(pre, CurationConfig())
    try:
        assert a.stats() == b.stats()
        assert _rows(a.final.select("doc_id", "text")) == _rows(
            b.final.select("doc_id", "text")
        )
    finally:
        a.release()
        b.release()
        release_persists()


def test_curation_exact_substr_w_guard():
    from kinesis_iterator_spark.pipeline import CurationConfig

    with pytest.raises(ValueError, match="exact_substr_w"):
        CurationConfig(exact_substr_w=1)

# -- incremental form: `seen` + CorpusWriter's stored window layer ------


@pytest.mark.parametrize("sf_dir2", SF_DIRS)
def test_exact_substr_seen_equals_union_oracle(spark, sf_dir2):
    """The incremental form is EXACTLY the full kernel over
    (store ∪ batch) restricted to the batch when every store doc_id
    precedes every batch doc_id: seen-form(batch,
    exact_substr_digests(store)) ≡ the DuckDB union-form oracle
    filtered to batch ids — bit-identical at both scales."""
    from kinesis_iterator_spark.queries.dedup import exact_substr_digests

    derived = _derived(spark, sf_dir2)
    ids = sorted(r[0] for r in derived.select("doc_id").collect())
    split = ids[len(ids) // 2]
    store = derived.filter(F.col("doc_id") < split)
    batch = derived.filter(F.col("doc_id") >= split)
    got = _rows(
        dedup_exact_substr(batch, seen=exact_substr_digests(store))
    )
    want = sorted(
        tuple(r)
        for r in _con(sf_dir2)
        .execute(
            f"SELECT * FROM ({_oracle_sql(EXACT_SUBSTR_W)}) "
            f"WHERE doc_id >= {split}"
        )
        .fetchall()
    )
    assert got == want
    # The pure-Spark union form agrees too (same restriction).
    union = _rows(
        dedup_exact_substr(derived).filter(F.col("doc_id") >= split)
    )
    assert got == union
    # Stored spans actually bit: some batch doc lost words the
    # batch-scoped pass would have kept.
    batch_only = {
        r[0]: r[3] for r in _rows(dedup_exact_substr(batch))
    }
    assert any(r[3] < batch_only[r[0]] for r in got)


def test_corpus_writer_substr_layer_strips_cross_batch_spans(
    spark, sf_dir, tmp_path
):
    """A span admitted in batch 1 must be stripped from every batch-2
    document that repeats it — the stored window-digest layer at work
    (pre-layer, the pass was batch-scoped and batch 2 would have kept
    its own first occurrence)."""
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
    from kinesis_iterator_spark.queries import release_persists

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )

    def planted(lo, hi, id_off):
        return base.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(
            (F.col("doc_id") + id_off).alias("doc_id"),
            "lang",
            "source",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat_ws(" ", F.col("text"), F.lit(SPAN)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )

    w = CorpusWriter(
        spark,
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        CurationConfig(dedup_exact_substr=True),
    )
    try:
        w.admit(planted(0, 60, 0))
        corpus1 = [r["text"] for r in w.corpus().collect()]
        # Exactly one batch-1 doc keeps the planted span (the in-batch
        # keeper) and it was admitted — so the layer holds its windows.
        assert sum(SPAN in t for t in corpus1) == 1
        w.admit(planted(60, 120, 10_000))
        got2 = [
            r["text"]
            for r in w.corpus().filter(F.col("doc_id") >= 10_000).collect()
        ]
        # Batch 2 re-plants the span on its %5 docs; every occurrence
        # is stored now, so NO batch-2 doc keeps any of its words.
        assert got2 and all("omega" not in t.split() for t in got2)
        assert all("xi" not in t.split() for t in got2)
    finally:
        release_persists()


def test_substr_layer_missing_raises_and_reconcile_builds(
    spark, sf_dir, tmp_path
):
    """A corpus bootstrapped WITHOUT the window layer must fail loudly
    when an exact-substr writer admits against it (an empty-layer
    fallback would silently re-admit every stored span); reconcile()
    builds the layer from the corpus and admission proceeds with
    cross-batch removal active."""
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
    from kinesis_iterator_spark.queries import release_persists

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    span_on = lambda df, id_off: df.select(  # noqa: E731
        (F.col("doc_id") + id_off).alias("doc_id"),
        "lang",
        "source",
        F.concat_ws(" ", F.col("text"), F.lit(SPAN)).alias("text"),
    )
    cdir, idir = str(tmp_path / "corpus"), str(tmp_path / "index")
    try:
        CorpusWriter(spark, cdir, idir, CurationConfig()).admit(
            span_on(base.filter(F.col("doc_id") == 0), 0)
        )
        w = CorpusWriter(
            spark, cdir, idir, CurationConfig(dedup_exact_substr=True)
        )
        batch2 = span_on(base.filter(F.col("doc_id").isin(7, 11)), 5_000)
        with pytest.raises(ValueError, match="exact-substr layer"):
            w.admit(batch2)
        w.reconcile()
        w.admit(batch2)
        got = [
            r["text"]
            for r in w.corpus().filter(F.col("doc_id") >= 5_000).collect()
        ]
        assert got and all("omega" not in t.split() for t in got)
    finally:
        release_persists()
