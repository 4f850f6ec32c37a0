"""scrub_pii + dedup_paragraphs: the C4/Dolma-style scrub pass and the
Lee-et-al. paragraph-level exact dedup, both pinned against DuckDB
oracles over frames derived IDENTICALLY in both engines from the fixture
(the fixture text carries no PII and no paragraph breaks, so each test
derives its input with the same deterministic SQL-expressible rule on
both sides — no synthesized fixture data)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.queries.dedup import dedup_paragraphs
from kinesis_iterator_spark.queries.text import PII_PATTERNS, scrub_pii
from kinesis_iterator_spark.tables import load_table

PII_SNIPPET = (
    " contact bob.smith+x@ex-ample.org now 10.0.0.255 "
    "call +44 20-7946 0958 end"
)
# Digit runs that must SURVIVE scrubbing (the phone pattern requires
# the "+" prefix precisely so dates/timestamps/IDs don't get mangled).
NON_PII_SNIPPET = " released 2026-08-14 1200 units id 123-456-789-012"


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# -- scrub_pii ----------------------------------------------------------


def test_scrub_pii_matches_duckdb_oracle(spark, sf_dir):
    doc = load_table(spark, sf_dir, "documents")
    derived = doc.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(PII_SNIPPET)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    got = _rows(scrub_pii(derived))

    (_, email, _), (_, ipv4, _), (_, phone, _) = PII_PATTERNS
    sql = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || '{PII_SNIPPET}'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text, '{email}', '<EMAIL>', 'g'),
             '{ipv4}', '<IP>', 'g'),
             '{phone}', '<PHONE>', 'g') AS text,
           len(regexp_extract_all(text, '{email}')) AS n_email,
           len(regexp_extract_all(text, '{ipv4}')) AS n_ipv4,
           len(regexp_extract_all(text, '{phone}')) AS n_phone,
           len(regexp_extract_all(text, '{email}'))
             + len(regexp_extract_all(text, '{ipv4}'))
             + len(regexp_extract_all(text, '{phone}')) AS n_redacted
    FROM d
    """
    want = sorted(tuple(r) for r in _con(sf_dir).execute(sql).fetchall())
    assert got == want
    # The derivation actually exercised every pattern type.
    hit = [r for r in got if r[0] % 7 == 0]
    assert hit and all(
        r[2] >= 1 and r[3] >= 1 and r[4] >= 1 for r in hit
    ), "PII snippet rows must count every pattern type"


def test_scrub_pii_leaves_dates_and_ids_alone(spark, sf_dir):
    """Digit runs without the '+' phone prefix — ISO dates, timestamps,
    dashed IDs — must pass through untouched (the precision-over-recall
    contract documented on PII_PATTERNS)."""
    doc = load_table(spark, sf_dir, "documents").limit(20)
    derived = doc.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(NON_PII_SNIPPET)).alias("text"),
    )
    out = scrub_pii(derived)
    assert out.filter(F.col("n_redacted") != 0).count() == 0
    assert _rows(out.select("doc_id", "text")) == _rows(derived)


def test_scrub_pii_is_idempotent(spark, sf_dir):
    """Markers contain no digits or @-runs, so scrubbed text is a fixed
    point: a second pass counts zero and changes nothing."""
    doc = load_table(spark, sf_dir, "documents")
    derived = doc.select(
        "doc_id", F.concat(F.col("text"), F.lit(PII_SNIPPET)).alias("text")
    )
    once = scrub_pii(derived).select("doc_id", "text")
    twice = scrub_pii(once)
    assert twice.filter(F.col("n_redacted") != 0).count() == 0
    assert _rows(twice.select("doc_id", "text")) == _rows(once)


def test_curation_scrub_stage_equals_pre_scrub_composition(spark, sf_dir):
    """CurationConfig(scrub_pii=True) must equal scrubbing first and
    curating the result — the in-pipeline stage is the same operator,
    fused, not a variant."""
    from kinesis_iterator_spark.pipeline import CurationConfig, curate_frame
    from kinesis_iterator_spark.queries import release_persists

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(PII_SNIPPET)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    a = curate_frame(doc, CurationConfig(scrub_pii=True))
    pre = scrub_pii(doc).drop("n_email", "n_ipv4", "n_phone", "n_redacted")
    b = curate_frame(pre, CurationConfig())
    try:
        assert a.stats() == b.stats()
        got = _rows(a.final.select("doc_id", "text"))
        assert got == _rows(b.final.select("doc_id", "text"))
        # Kept text is actually scrubbed: markers in, raw PII out.
        kept7 = [t for d, t in got if d % 7 == 0]
        assert kept7 and all(
            "<EMAIL>" in t and "ex-ample.org" not in t for t in kept7
        )
    finally:
        a.release()
        b.release()
        release_persists()


def test_scrub_turns_pii_only_variants_into_exact_dups(spark, sf_dir):
    """Two documents differing ONLY in their PII must collapse in the
    exact-dedup stage once scrubbing runs first — the reason the scrub
    stage precedes every digest."""
    from kinesis_iterator_spark.pipeline import CurationConfig, curate_frame
    from kinesis_iterator_spark.queries import release_persists

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    seed = base.filter(F.col("doc_id") == 0)
    variants = seed.select(
        F.lit(1_000_000).alias("doc_id"),
        "lang",
        "source",
        F.concat("text", F.lit(" mail alice@example.com")).alias("text"),
    ).unionByName(
        seed.select(
            F.lit(1_000_001).alias("doc_id"),
            "lang",
            "source",
            F.concat("text", F.lit(" mail bob@example.org")).alias("text"),
        )
    )
    # Curate the two variants alone: anything fixture-side would be a
    # near-dup of BOTH (they share the seed text), stealing the
    # component election and hiding the exact-dup collapse under test.
    cur = curate_frame(variants, CurationConfig(scrub_pii=True))
    try:
        assert cur.stats()["n_input"] == 2
        kept = {r["doc_id"] for r in cur.final.select("doc_id").collect()}
        assert kept == {1_000_000}, kept
    finally:
        cur.release()
        release_persists()


# -- dedup_paragraphs ---------------------------------------------------

SEP = "\n\n"
# Each derived doc = own text ¶ next doc's text ¶ own text again: every
# document repeats a paragraph internally AND shares one with its
# neighbor — both removal modes exercised, same rule on both engines.
_DERIVE_SQL = f"""
      SELECT a.doc_id,
             a.text || '{SEP}' || b.text || '{SEP}' || a.text AS text
      FROM (SELECT * FROM documents WHERE doc_id < 100) a
      JOIN (SELECT * FROM documents WHERE doc_id < 100) b
        ON b.doc_id = (a.doc_id + 1) % 100
"""


@pytest.fixture(scope="module")
def para_doc(spark, sf_dir):
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    nbr = base.select(
        F.col("doc_id").alias("b_id"), F.col("text").alias("next_text")
    )
    return (
        base.join(nbr, F.col("b_id") == (F.col("doc_id") + 1) % 100)
        .select(
            "doc_id",
            F.concat_ws(SEP, "text", "next_text", "text").alias("text"),
        )
    )


def test_dedup_paragraphs_matches_duckdb_oracle(spark, sf_dir, para_doc):
    got = _rows(dedup_paragraphs(para_doc, sep=SEP))
    sql = f"""
    WITH derived AS ({_DERIVE_SQL}),
    split AS (
      SELECT doc_id, string_split(text, '{SEP}') AS parts FROM derived
    ),
    paras AS (
      SELECT doc_id,
             UNNEST(range(1, len(parts) + 1)) AS pos,
             UNNEST(parts) AS para
      FROM split
    ),
    firsts AS (
      SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY para
                                ORDER BY doc_id, pos) AS rn
      FROM paras
    ),
    assembled AS (
      SELECT doc_id,
             string_agg(para, '{SEP}' ORDER BY pos) AS text,
             COUNT(*) AS n_kept
      FROM firsts WHERE rn = 1 GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(a.text, '') AS text,
           CAST(len(s.parts) AS BIGINT) AS n_paras,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
    FROM split s LEFT JOIN assembled a USING (doc_id)
    """
    want = sorted(tuple(r) for r in _con(sf_dir).execute(sql).fetchall())
    assert got == want
    # The derivation produced real removals (internal repeat at least).
    assert any(r[3] < r[2] for r in got)


def test_dedup_paragraphs_keeps_each_paragraph_globally_once(
    spark, para_doc
):
    out = dedup_paragraphs(para_doc, sep=SEP)
    kept = out.filter(F.col("text") != "").select(
        F.explode(F.split("text", SEP)).alias("para")
    )
    assert kept.count() == kept.distinct().count()
    # Union of kept paragraphs == union of input paragraphs (nothing
    # vanishes — only repeats do).
    inp = para_doc.select(F.explode(F.split("text", SEP)).alias("para"))
    assert _rows(kept.distinct()) == _rows(inp.distinct())


def test_curation_paragraph_stage_equals_pre_dedup_composition(
    spark, sf_dir
):
    """CurationConfig(dedup_paragraphs=True) must equal running the
    paragraph pass first and curating the rewritten frame — and the
    kept corpus must contain every paragraph at most once."""
    from kinesis_iterator_spark.pipeline import CurationConfig, curate_frame
    from kinesis_iterator_spark.queries import release_persists

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "lang", "source", "text")
    )
    nbr = base.select(
        F.col("doc_id").alias("b_id"), F.col("text").alias("next_text")
    )
    doc = base.join(nbr, F.col("b_id") == (F.col("doc_id") + 1) % 100).select(
        "doc_id",
        "lang",
        "source",
        F.concat_ws(SEP, "text", "next_text", "text").alias("text"),
    )
    a = curate_frame(doc, CurationConfig(dedup_paragraphs=True))
    pre = dedup_paragraphs(doc, sep=SEP).drop("n_paras", "n_kept")
    b = curate_frame(pre, CurationConfig())
    try:
        assert a.stats() == b.stats()
        got = _rows(a.final.select("doc_id", "text"))
        assert got == _rows(b.final.select("doc_id", "text"))
        kept = (
            a.final.filter(F.col("text") != "")
            .select(F.explode(F.split("text", SEP)).alias("para"))
        )
        assert kept.count() == kept.distinct().count()
    finally:
        a.release()
        b.release()
        release_persists()


# -- CorpusWriter's stored paragraph layer (incremental form) -----------


def _texts(spark, sf_dir):
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "lang", "source", "text")
    )
    return base


def _two_para_batch(base, ids, left_off, right_off, id_off):
    """doc (id_off + i) for i in ids: text = t_{i+left_off} ¶
    t_{i+right_off}, lang/source carried from the left doc."""
    left = base.select(
        F.col("doc_id").alias("l_id"),
        "lang",
        "source",
        F.col("text").alias("l_text"),
    )
    right = base.select(
        F.col("doc_id").alias("r_id"), F.col("text").alias("r_text")
    )
    ids_df = left.sparkSession.createDataFrame([(i,) for i in ids], ["i"])
    return (
        ids_df.join(left, F.col("l_id") == F.col("i") + left_off)
        .join(right, F.col("r_id") == F.col("i") + right_off)
        .select(
            (F.col("i") + id_off).alias("doc_id"),
            "lang",
            "source",
            F.concat_ws(SEP, "l_text", "r_text").alias("text"),
        )
    )


@pytest.mark.slow
def test_corpus_writer_paragraph_layer_dedups_across_batches(
    spark, sf_dir, tmp_path
):
    """Paragraphs admitted in batch 1 must be dropped from batch 2's
    documents (the stored digest layer), and the whole corpus must stay
    paragraph-unique across admits."""
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
    from kinesis_iterator_spark.queries import release_persists

    base = _texts(spark, sf_dir)
    batch1 = _two_para_batch(base, range(50), 0, 50, 0)
    # batch 2 re-uses t_i (stored) and brings t_{i+200} (fresh).
    batch2 = _two_para_batch(base, range(50), 0, 200, 1000)
    w = CorpusWriter(
        spark,
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        CurationConfig(dedup_paragraphs=True),
    )
    try:
        w.admit(batch1)
        w.admit(batch2)
        corpus = w.corpus()
        paras = corpus.filter(F.col("text") != "").select(
            F.explode(F.split("text", SEP)).alias("para")
        )
        assert paras.count() == paras.distinct().count()
        # A batch-2 doc whose left paragraph made it into the batch-1
        # corpus keeps ONLY its fresh right paragraph. (all() would be
        # wrong: a batch-1 doc rejected by doc-level dedup contributes
        # no paragraphs to the layer, so its text may legitimately
        # survive inside a batch-2 doc — uniqueness above is the
        # global invariant.)
        fresh = {
            r["text"]
            for r in base.filter(
                (F.col("doc_id") >= 200) & (F.col("doc_id") < 250)
            ).collect()
        }
        got2 = [
            r["text"]
            for r in corpus.filter(F.col("doc_id") >= 1000).collect()
        ]
        assert got2 and any(t in fresh for t in got2)
    finally:
        release_persists()


def test_paragraph_layer_missing_raises_and_reconcile_builds(
    spark, sf_dir, tmp_path
):
    """A corpus bootstrapped WITHOUT the paragraph layer must fail
    loudly when a paragraph-deduping writer admits against it (silent
    empty-layer fallback would re-admit every stored paragraph);
    reconcile() builds the layer and admission proceeds."""
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
    from kinesis_iterator_spark.queries import release_persists

    base = _texts(spark, sf_dir)
    batch1 = base.filter(F.col("doc_id") < 50)
    batch2 = _two_para_batch(base, range(20), 0, 100, 2000)
    cdir, idir = str(tmp_path / "corpus"), str(tmp_path / "index")
    try:
        CorpusWriter(spark, cdir, idir, CurationConfig()).admit(batch1)
        w = CorpusWriter(
            spark, cdir, idir, CurationConfig(dedup_paragraphs=True)
        )
        with pytest.raises(ValueError, match="paragraph layer"):
            w.admit(batch2)
        w.reconcile()
        w.admit(batch2)
        # After reconcile the stored batch-1 texts are in the layer, so
        # batch-2 docs re-using one as their left paragraph keep only
        # the fresh right (any(), not all() — batch-1 docs that lost
        # doc-level dedup never entered the corpus or the layer), and
        # the corpus stays globally paragraph-unique.
        got = [
            r["text"]
            for r in w.corpus().filter(F.col("doc_id") >= 2000).collect()
        ]
        fresh = {
            r["text"]
            for r in base.filter(
                (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
            ).collect()
        }
        assert got and any(t in fresh for t in got)
        paras = (
            w.corpus()
            .filter(F.col("text") != "")
            .select(F.explode(F.split("text", SEP)).alias("para"))
        )
        assert paras.count() == paras.distinct().count()
    finally:
        release_persists()


def test_dedup_paragraphs_partitioning_invariant(spark, para_doc):
    """Pure function of the corpus: same output at any input
    partitioning (the first-occurrence window is keyed on global
    (doc_id, pos), never on physical order)."""
    a = _rows(dedup_paragraphs(para_doc, sep=SEP))
    b = _rows(dedup_paragraphs(para_doc.repartition(13), sep=SEP))
    assert a == b


def test_paragraph_layer_commits_before_index_extend(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Commit-order pin: a crash between the corpus append and the index
    extend must leave the paragraph layer ALREADY covering the admitted
    docs. The reverse order (layer after extend) would open a window no
    meta check can see — admitted documents whose paragraph digests were
    never recorded, silently re-admitting those paragraphs in every
    later batch. With the pinned order, the crash sits inside the
    documented append-then-extend window (doc index stale, reconcile
    rebuilds) and the paragraph layer is conservative-correct."""
    from kinesis_iterator_spark import incremental
    from kinesis_iterator_spark.pipeline import CorpusWriter, CurationConfig
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries.dedup import paragraph_digests

    base = _texts(spark, sf_dir)
    batch1 = _two_para_batch(base, range(30), 0, 50, 0)
    batch2 = _two_para_batch(base, range(30), 100, 150, 1000)
    cdir, idir = str(tmp_path / "corpus"), str(tmp_path / "index")
    w = CorpusWriter(
        spark, cdir, idir, CurationConfig(dedup_paragraphs=True)
    )
    try:
        w.admit(batch1)
        real_extend = incremental.extend_index
        monkeypatch.setattr(
            incremental,
            "extend_index",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("simulated crash before index extend")
            ),
        )
        with pytest.raises(RuntimeError, match="before index extend"):
            w.admit(batch2)
        monkeypatch.setattr(incremental, "extend_index", real_extend)

        # Corpus append and paragraph append both committed; every
        # admitted batch-2 doc's paragraphs are in the layer.
        admitted = spark.read.parquet(cdir).filter(F.col("doc_id") >= 1000)
        n_admitted = admitted.count()
        assert n_admitted > 0
        layer = spark.read.parquet(f"{idir}/paragraphs")
        missing = (
            paragraph_digests(admitted.select("doc_id", "text"), sep=SEP)
            .join(layer, "h", "left_anti")
            .count()
        )
        assert missing == 0

        # WITHOUT any reconcile: clones of the admitted batch-2 docs
        # (new ids, same text) admit nothing — their paragraphs empty
        # out against the layer even though the doc index never heard
        # of them. Under the reverse commit order this re-admits them.
        adm_ids = [r["doc_id"] for r in admitted.select("doc_id").collect()]
        batch3 = batch2.filter(F.col("doc_id").isin(adm_ids)).select(
            (F.col("doc_id") + 4000).alias("doc_id"),
            "lang",
            "source",
            "text",
        )
        stats3 = w.admit(batch3)
        assert stats3["n_admitted"] == 0
    finally:
        release_persists()
