"""The end-to-end curation pipeline under the driver's value-oracle gate.

`pipeline.curate_frame` composes gates → exact dedup → near-dup survivor
pruning → token accounting; its stage counts are THE number a training-data
job reports, so this entry puts the whole composition — including the
iterative union-find CC — behind the DuckDB oracle (recursive min-label
closure), not just each stage in isolation. Gate thresholds are pinned
module constants chosen so every stage drops rows on the fixtures
(`tests/test_pipeline.py` uses the same values); the edge source is the
exact blocked n-gram generator because it is SQL-expressible — the MinHash
scale path's candidate set is probabilistic-but-verified and has its own
value-checked entry (`dedup_minhash_lsh`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table
from . import query

# Pinned so each stage bites at every fixture SF (see tests/test_pipeline.py):
# n_words spans ~10-99 (min_words=20 drops rows), lexical diversity spans
# ~0.28-1.0 (0.30 drops rows), zh is excluded, tau=0.6 yields real edges.
MIN_WORDS, MAX_WORDS = 20, 1_000_000
MIN_AWL, MAX_AWL = 1.0, 20.0
MAX_PUNCT = 0.9
MIN_LEXDIV = 0.30
LANGS = ("en", "es", "de", "fr")
TAU = 0.6

_LANGS_SQL = ", ".join(f"'{l}'" for l in LANGS)

_CURATE_STATS_SQL = f"""
WITH RECURSIVE sig AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         CAST(LENGTH(text) AS DOUBLE) / len(string_split(text, ' ')) AS awl,
         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z ]', '', 'g'))
              AS DOUBLE) / LENGTH(text) AS punct,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS lexdiv,
         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS tokens,
         md5(text) AS digest
  FROM documents
),
flags AS (
  SELECT *,
         (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
          AND awl BETWEEN {MIN_AWL} AND {MAX_AWL}
          AND punct <= {MAX_PUNCT} AND lexdiv >= {MIN_LEXDIV}) AS quality_pass,
         (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
          AND awl BETWEEN {MIN_AWL} AND {MAX_AWL}
          AND punct <= {MAX_PUNCT} AND lexdiv >= {MIN_LEXDIV}
          AND lang IN ({_LANGS_SQL})) AS gate_pass
  FROM sig
),
exact AS (
  SELECT f.doc_id FROM flags f
  JOIN (SELECT digest, MIN(doc_id) AS k FROM flags WHERE gate_pass
        GROUP BY digest) m
    ON f.digest = m.digest AND f.doc_id = m.k
  WHERE f.gate_pass
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
          / len(list_distinct(list_concat(a.wset, b.wset))) >= {TAU}
),
sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
walk(node, reach) AS (
  SELECT u AS node, u AS reach FROM sym
  UNION
  SELECT s.u AS node, w.reach FROM sym s JOIN walk w ON w.node = s.v
),
comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node),
kept AS (
  SELECT e.doc_id FROM exact e LEFT JOIN comp c ON e.doc_id = c.node
  WHERE e.doc_id = COALESCE(c.component, e.doc_id)
)
SELECT CAST((SELECT COUNT(*) FROM flags) AS BIGINT) AS n_input,
       CAST((SELECT COUNT(*) FROM flags WHERE quality_pass) AS BIGINT) AS n_quality,
       CAST((SELECT COUNT(*) FROM flags WHERE gate_pass) AS BIGINT) AS n_gate,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_kept,
       CAST((SELECT COALESCE(SUM(tokens), 0) FROM flags) AS BIGINT) AS input_tokens,
       CAST((SELECT COALESCE(SUM(f.tokens), 0) FROM flags f
             JOIN kept k ON f.doc_id = k.doc_id) AS BIGINT) AS kept_tokens
"""


@query("pipeline_curate_stats", oracle=_CURATE_STATS_SQL)
def pipeline_curate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of end-to-end curation stage counts: inputs, quality
    survivors, gate survivors, exact-dedup keepers, near-dup component
    survivors, and token totals — the label frame's single aggregate
    (the pipeline's ONE-job stats contract), with the iterative
    alternating-star CC inside the lineage. The oracle recomputes the
    identical composition in SQL, closing the survivor fixpoint with
    recursive min-label reachability."""
    from ..pipeline import CurationConfig, curate_frame

    cfg = CurationConfig(
        min_words=MIN_WORDS,
        max_words=MAX_WORDS,
        min_avg_word_len=MIN_AWL,
        max_avg_word_len=MAX_AWL,
        max_punct_ratio=MAX_PUNCT,
        min_lexical_diversity=MIN_LEXDIV,
        allowed_langs=LANGS,
        edge_source="ngram",
        jaccard_tau=TAU,
    )
    cur = curate_frame(
        load_table(spark, sf_dir, "documents"), cfg, persist_labels=False
    )
    return cur.stats_frame()


def leakage_safe_split_oracle(
    doc_sql: str,
    val_permille: int = 100,
    seed: int = 0,
    tau: float = 0.6,
) -> str:
    """DuckDB derivation of `pipeline.leakage_safe_split` (default edge
    source): blocked exact-Jaccard edges, recursive min-label closure,
    per-cluster hash split. ``doc_sql`` must yield (doc_id, lang,
    text)."""
    from .dedup import _H60_SQL

    mod = 1 << 20
    h = _H60_SQL.format(
        x=f"CAST(cluster AS VARCHAR) || ':split:{seed}'"
    )
    return f"""
WITH RECURSIVE docs AS ({doc_sql}),
sets AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words,
         list_distinct(string_split(text, ' ')) AS wset
  FROM docs
),
edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sets a JOIN sets b
    ON a.lang = b.lang AND (a.n_words // 10) = (b.n_words // 10)
   AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
          / len(list_distinct(list_concat(a.wset, b.wset))) >= {tau}
),
sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
walk(node, reach) AS (
  SELECT u AS node, u AS reach FROM sym
  UNION
  SELECT s.u AS node, w.reach FROM sym s JOIN walk w ON w.node = s.v
),
comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node),
clustered AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster
  FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, cluster,
       CASE WHEN ({h} % {mod}) * 1000 < {val_permille} * {mod}
            THEN 'val' ELSE 'train' END AS split
FROM clustered
"""
