"""Deterministic fixed-point k-means over the ``embeddings`` table —
the codebook-training counterpart of the stored-ANN surface (FAISS's
train-once contract: `write_ann_index` freezes a codebook; this is the
operator that would TRAIN it) and the cluster stage SemDeDup-style
semantic dedup builds on (Abbas et al. 2023 run k-means at k ≈ 10⁵ and
prune within cells).

Classic Lloyd's iteration (Lloyd 1982 / MacQueen 1967) with the repo's
fixed-point discipline (see `text.dsir_weights`): embedding components
quantize to integers at 1e-6 resolution the moment they leave float
space, every reduction after that is EXACT integer arithmetic —
order-independent, hence bit-identical between Spark's parallel
aggregation, the in-kernel numpy int64 sums, and DuckDB's sequential
one — and centroid updates round half-away-from-zero with an
all-integer formula, so no step of the iteration ever depends on float
summation order. The result is a pure function of the corpus: identical
at any partitioning, any cluster size, and against the unrolled-CTE
DuckDB oracle (`tests/test_clustering.py`).

Determinism choices (documented, not hidden): initial centroids are the
``k`` vectors with the smallest vec_id (production swaps in k-means‖
seeding; the contract here is oracle checkability), ties in the
nearest-centroid argmin break toward the smallest cluster id, and a
cluster that loses every member is DROPPED (the standard Lloyd's
variant that neither re-seeds nor carries ghosts — both engines drop by
construction, the empty group simply vanishes from the update join).

100 TB posture: each iteration is ONE pass over the corpus — an Arrow
kernel computes per-partition per-cluster integer component sums
(≤ k·d slim rows per partition leave the map side), one hash
aggregation reduces them, and the ≤ k·d summed rows collect to the
driver (codebook-sized, never corpus-sized) where the integer update
runs. Centroids travel executor-ward inside the kernel closure
(k·d int64s). Jobs per iteration: exactly one; lineage does not grow
with rounds (every round re-reads the scan against a NEW constant
codebook, so no checkpoint discipline is needed). The final assignment
is the same kernel emitting (vec_id, cluster) — at scale, a write-time
stored column, exactly like the IVF cell assignment it would feed.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import managed_persist

# Fixed-point resolution: 1e-6 of a component. |x_fix| ≤ ~2·10⁶ for
# unit-scale embeddings, so a squared distance over d=64 dims is
# ≤ ~10¹⁵ and an int64 component sum overflows only past ~9·10¹² rows
# per cluster — beyond that, widen to decimal in the reducer.
FIX = 1_000_000


def _quantize(E32: np.ndarray) -> np.ndarray:
    """float32 components → int64 fixed-point, identically to the
    oracle's CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT):
    float32→float64 is exact, the double multiply is the same
    correctly-rounded IEEE op in numpy and both engines, floor has no
    tie semantics (unlike round) — so the quantization is a pure
    function of the stored bits."""
    return np.floor(E32.astype(np.float64) * FIX).astype(np.int64)


def _round_div(s: int, n: int) -> int:
    """round-half-away-from-zero of s/n in pure integer arithmetic —
    (2|s| + n) // (2n) on non-negative operands (where truncating and
    floor division coincide in Python, Spark `div`, and DuckDB `//`),
    sign restored after."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((2 * -s + n) // (2 * n))


class KMeansResult(NamedTuple):
    assignment: DataFrame  # (vec_id, cluster) — nearest FINAL centroid
    clusters: list[int]  # surviving cluster ids, ascending
    centroids: np.ndarray  # (len(clusters), d) int64 fixed-point


def _dists_int(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) exact int64 squared distances, one cluster at a time so
    the working set stays (n, d) instead of (n, k, d)."""
    D = np.empty((X.shape[0], C.shape[0]), dtype=np.int64)
    for j in range(C.shape[0]):
        diff = X - C[j]
        D[:, j] = np.sum(diff * diff, axis=1)
    return D


# Deterministic k-means‖ seeding (Bahmani et al. 2012, "Scalable
# k-means++") with the randomness replaced by the repo's md5 h60 hash:
# the per-round sampling predicate  u < ℓ·d²(x,C)/φ(C)  becomes the
# EXACT integer comparison  (h60(vec_id:salt) mod P)·φ < ℓ·P·d²(x) —
# a pure function of the corpus, identical in Spark and DuckDB, so the
# seeded iteration stays fully oracle-checkable. φ rides DECIMAL(38,0)
# / HUGEINT (Σ d² exceeds int64 past ~35k fixture-scale vectors).
KMPAR_P = 1 << 20


def _kmpar_pred_sql(phi: int, ell: int, seed: int, r: int) -> str:
    h = (
        "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), "
        f"':kmpar:{seed}:{r}')), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        f"CAST(pmod({h}, {KMPAR_P}) AS DECIMAL(38,0))"
        f" * CAST('{int(phi)}' AS DECIMAL(38,0))"
        f" < CAST('{ell * KMPAR_P}' AS DECIMAL(38,0))"
        f" * CAST(d2 AS DECIMAL(38,0))"
    )


def _kmeans_par_C(
    spark: SparkSession,
    src: DataFrame,
    k: int,
    oversample: int,
    rounds: int,
    seed: int,
) -> np.ndarray:
    """(k, d) int64 init centroids by deterministic k-means‖ over the
    persisted (vec_id, embedding) frame: fixed ``rounds`` of hashed
    oversampling at ℓ = oversample·k, then weight every candidate by
    the corpus points nearest to it and keep the top-k by
    (weight DESC, vec_id) — the classic recluster-the-candidates step
    collapsed to its deterministic top-k form. Per round: one Arrow
    distance pass over the corpus emitting a SLIM (vec_id, d2) frame
    (checkpointed), a 1-row φ aggregate, and a bounded candidate
    collect (expected ℓ rows — candidate vectors travel driver-side,
    like the Lloyd codebook). Candidates themselves have d² = 0 and can
    never re-select."""
    from . import release_local_checkpoint

    first = src.orderBy("vec_id").limit(1).collect()
    if not first:
        raise ValueError("kmeans over an empty frame")
    cand: dict[int, np.ndarray] = {
        int(first[0]["vec_id"]): _quantize(
            np.array([first[0]["embedding"]], dtype=np.float32)
        )[0]
    }
    ell = oversample * k
    for r in range(1, rounds + 1):
        ids = np.array(sorted(cand), dtype=np.int64)
        CAND = np.stack([cand[i] for i in ids])

        def dist_fn(batches, CAND=CAND):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                X = _quantize(
                    np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
                )
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(np.int64),
                        "d2": _dists_int(X, CAND).min(axis=1),
                    }
                )

        d2f = src.mapInPandas(dist_fn, "vec_id long, d2 long").localCheckpoint(
            eager=True
        )
        try:
            phi = (
                d2f.agg(
                    F.sum(F.col("d2").cast("decimal(38,0)")).alias("phi")
                ).collect()[0]["phi"]
            )
            if phi is None or int(phi) == 0:
                break  # every point coincides with a candidate
            sel = (
                d2f.filter(F.expr(_kmpar_pred_sql(int(phi), ell, seed, r)))
                .join(src, "vec_id")
                .select("vec_id", "embedding")
                .collect()
            )
        finally:
            release_local_checkpoint(d2f)
        for row in sel:
            cand[int(row["vec_id"])] = _quantize(
                np.array([row["embedding"]], dtype=np.float32)
            )[0]
    if len(cand) < k:
        raise ValueError(
            f"k-means|| seeding produced {len(cand)} candidates < k={k}; "
            "raise oversample or rounds"
        )
    ids = np.array(sorted(cand), dtype=np.int64)
    CAND = np.stack([cand[i] for i in ids])

    def near_fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            )
            # first argmin = smallest candidate vec_id (ids ascending)
            yield pd.DataFrame(
                {"cand": ids[np.argmin(_dists_int(X, CAND), axis=1)]}
            )

    w = {
        int(r["cand"]): int(r["n"])
        for r in src.mapInPandas(near_fn, "cand long")
        .groupBy("cand")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    order = sorted(cand, key=lambda v: (-w.get(v, 0), v))[:k]
    return np.stack([cand[v] for v in order])


# Driver-side reduction bound for the Lloyd update's partial sums
# (k·d·n_partitions slim rows, 4 int64 each — 256k rows ≈ 8 MB): below
# it the cross-partition sum runs on the driver (single-stage job per
# iteration, exact arbitrary-precision addition); above it the
# distributed groupBy aggregate. The DRIVER_CC_MAX_EDGES pattern —
# tests can force the distributed path by setting this to -1.
DRIVER_SUM_MAX_ROWS = 262_144


def kmeans_embeddings(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    init: str = "min_id",
    oversample: int = 2,
    rounds: int = 3,
    seed: int = 0,
) -> KMeansResult:
    """Fixed-point Lloyd's k-means over an (vec_id, embedding) frame.

    Runs ``iters`` (assign → update) rounds from the chosen init, then
    one final assignment against the final centroids — so
    ``assignment`` satisfies the invariant "cluster == argmin distance
    to a returned centroid" exactly (pinned).

    ``init``: ``"min_id"`` (the k smallest-vec_id vectors — the
    original oracle-checkability contract, quality-degenerate at scale)
    or ``"kmeans_par"`` (deterministic k-means‖, `_kmeans_par_C` — the
    production seeding; equally oracle-checkable via
    `kmeans_oracle_sqls(init="kmeans_par")`, and pinned to never score
    a worse Lloyd objective than min_id on the fixtures)."""
    n_part = spark.sparkContext.defaultParallelism
    # One materialization feeds iters+1 scan passes (A/B'd at sf0.1:
    # 2.77 s persisted vs 3.26 s recomputed, min-of-3; the caller
    # frees it via queries.release_persists() once `assignment` is
    # consumed — releasing a persist is safe, unlike a checkpoint).
    src = managed_persist(
        emb.select("vec_id", "embedding").repartition(n_part)
    )
    if init == "min_id":
        init_rows = (
            emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(k)
            .collect()
        )
        C = _quantize(
            np.array([r["embedding"] for r in init_rows], dtype=np.float32)
        )
        cls = list(range(len(init_rows)))
    elif init == "kmeans_par":
        C = _kmeans_par_C(spark, src, k, oversample, rounds, seed)
        cls = list(range(C.shape[0]))
    else:
        raise ValueError(f"unknown init {init!r}")

    for _ in range(iters):
        parts = src.mapInPandas(
            _partial_sums_fn(np.asarray(cls), C),
            "cl long, dim long, s long, cnt long",
        )
        # Cross-partition reduction of the per-partition partials
        # (≤ k·d rows each). When the total partial-row volume is
        # driver-bounded, collect them directly and sum in Python —
        # one SINGLE-STAGE job per Lloyd iteration instead of
        # shuffle + AQE final-agg stage (the DRIVER_CC_MAX_EDGES
        # precedent: identical output, bounded driver bytes; exact
        # arbitrary-precision integer addition is bit-identical to
        # the int64 F.sum and immune to its overflow). Above the
        # bound — production k ≈ √n over thousands of partitions —
        # the distributed aggregate stays.
        if len(cls) * C.shape[1] * n_part <= DRIVER_SUM_MAX_ROWS:
            rows = parts.collect()
            acc: dict[tuple[int, int], list] = {}
            for r in rows:
                slot = acc.setdefault((r["cl"], r["dim"]), [0, 0])
                slot[0] += r["s"]
                slot[1] += r["cnt"]
            by_cl: dict[int, list] = {}
            for (cl, dim), (s, cnt) in acc.items():
                by_cl.setdefault(cl, []).append((dim, s, cnt))
        else:
            rows = (
                parts.groupBy("cl", "dim")
                .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
                .collect()
            )
            by_cl = {}
            for r in rows:
                by_cl.setdefault(r["cl"], []).append(
                    (r["dim"], r["s"], r["cnt"])
                )
        cls = sorted(by_cl)  # empty clusters vanish from the agg
        d = C.shape[1]
        C = np.empty((len(cls), d), dtype=np.int64)
        for j, cl in enumerate(cls):
            for dim, s, cnt in by_cl[cl]:
                C[j, dim] = _round_div(int(s), int(cnt))

    assignment = src.mapInPandas(
        _assign_fn(np.asarray(cls), C), "vec_id long, cluster long"
    )
    return KMeansResult(assignment, cls, C)


def _partial_sums_fn(cls_np: np.ndarray, C: np.ndarray):
    def partial_sums(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            )
            idx = np.argmin(_dists_int(X, C), axis=1)  # first min =
            # smallest cluster id (cls_np ascending) — the oracle's
            # ORDER BY dist, cl tie-break.
            out_cl, out_dim, out_s, out_cnt = [], [], [], []
            for j in range(len(cls_np)):
                mask = idx == j
                n = int(mask.sum())
                if not n:
                    continue
                s = X[mask].sum(axis=0)  # exact int64
                d = X.shape[1]
                out_cl += [int(cls_np[j])] * d
                out_dim += list(range(d))
                out_s += [int(v) for v in s]
                out_cnt += [n] * d
            yield pd.DataFrame(
                {
                    "cl": np.array(out_cl, dtype=np.int64),
                    "dim": np.array(out_dim, dtype=np.int64),
                    "s": np.array(out_s, dtype=np.int64),
                    "cnt": np.array(out_cnt, dtype=np.int64),
                }
            )

    return partial_sums


def _assign_fn(cls_np: np.ndarray, C: np.ndarray):
    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            )
            idx = np.argmin(_dists_int(X, C), axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "cluster": cls_np[idx].astype(np.int64),
                }
            )

    return assign


# The published FAISS sizing rule for the coarse quantizer: the cell
# count grows with the corpus (k ≈ √n keeps cell population ≈ √n and,
# under the cell-proportional nprobe default, the probed FRACTION of
# the corpus constant while cells get finer — recall rises instead of
# plateauing at a frozen geometry; RECALL.md round-11 finding #5 showed
# the IVF family cell-coverage-bound at the fixed 10-cell fixture).
TRAIN_K_FLOOR = 8


def proportional_train_k(n: int) -> int:
    """Corpus-proportional coarse-codebook size: ⌈√n⌉ floored at
    TRAIN_K_FLOOR, capped at n (k-means can't fill more cells than
    vectors). `EmbeddingWriter(train_k=None)` resolves this at every
    index BUILD (bootstrap + reconcile) from store parquet footers —
    zero Spark jobs — so a growing corpus grows its cell count at each
    retrain and the probe width scales with it."""
    n = int(n)
    if n < 1:
        raise ValueError("need a non-empty corpus to size a codebook")
    import math

    return max(1, min(n, max(TRAIN_K_FLOOR, math.isqrt(n - 1) + 1)))


def codebook_rows(res: KMeansResult) -> list[dict]:
    """A trained :class:`KMeansResult` as ANN-codebook rows — the
    ``{"cell", "centroid"}`` shape `similarity._ivf_ranked_assignment`,
    `write_ann_index(codebook=...)` and `semantic_dedup_frame
    (clusters=...)` consume — closing the FAISS train-once story: this
    trainer's output now feeds the index it was built to train.

    Fixed-point → float64 is ONE correctly-rounded IEEE division of an
    exactly-representable int64 (|c| ≪ 2⁵³) by 10⁶ — deterministic and
    identical to the oracle's ``CAST(c AS DOUBLE) / 1000000``, so a
    trained codebook stays cross-engine bit-exact without the varchar
    mediation the decimal label-means need."""
    return [
        {"cell": int(cl), "centroid": [float(c) / FIX for c in res.centroids[j]]}
        for j, cl in enumerate(res.clusters)
    ]


def kmeans_sse(emb: DataFrame, cls: list[int], C: np.ndarray) -> int:
    """Exact integer within-cluster sum of squared (fixed-point)
    distances of every vector to its nearest centroid in ``C`` — the
    Lloyd's objective, used by the non-increase pin. One job."""
    cls_np = np.asarray(cls)

    def sse_part(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            )
            D = _dists_int(X, C)
            yield pd.DataFrame(
                {"sse": np.array([int(D.min(axis=1).sum())], dtype=np.int64)}
            )

    _ = cls_np  # centroid ids don't affect the objective
    rows = (
        emb.select("vec_id", "embedding")
        .mapInPandas(sse_part, "sse long")
        .agg(F.sum("sse").alias("sse"))
        .collect()
    )
    return int(rows[0]["sse"])


def kmeans_oracle_sqls(
    k: int,
    iters: int,
    dim: int = 64,
    init: str = "min_id",
    oversample: int = 2,
    rounds: int = 3,
    seed: int = 0,
) -> tuple[str, str]:
    """(assignment_sql, centroid_sql) — the unrolled-CTE DuckDB
    derivation of the identical iteration over the pre-registered
    ``embeddings`` view. Integer quantization, exact integer reductions,
    the same half-away centroid rounding (`//` truncates toward zero in
    DuckDB exactly like Spark's `div`; operands are kept non-negative),
    the same dist-then-id tie-break, and empty clusters dropped by the
    update join — so both queries are bit-comparable to the Spark
    result, not merely close. ``init="kmeans_par"`` splices the
    deterministic k-means‖ seeding chain in place of the min-id init
    (same oversample/rounds/seed as the Spark call)."""
    ctes = _kmeans_ctes(k, iters, dim, init, oversample, rounds, seed)
    with_clause = "WITH " + ",\n".join(ctes)
    assign_sql = (
        f"{with_clause}\n"
        f"SELECT vec_id, cl AS cluster FROM a{iters + 1}"
    )
    cent_sql = (
        f"{with_clause}\n"
        f"SELECT cl AS cluster, dim, CAST(c AS BIGINT) AS c"
        f" FROM cent{iters}"
    )
    return assign_sql, cent_sql


def kmeans_cent_ctes(k: int, iters: int, dim: int = 64) -> str:
    """The k-means iteration as a CTE fragment ending in
    ``cent(cell, centroid)`` — splice point for oracles whose default
    codebook relation is the label-mean ``cent`` (e.g.
    `dedup.semantic_dedup_oracle(cent_ctes=...)`), so SemDeDup over
    TRAINED cells is value-checkable end-to-end. The float centroid is
    ``CAST(c AS DOUBLE) / 1000000`` — the same single correctly-rounded
    division `codebook_rows` performs."""
    ctes = _kmeans_ctes(k, iters, dim)
    ctes.append(
        f"cent AS (SELECT cl AS cell,"
        f" list(CAST(c AS DOUBLE) / 1000000 ORDER BY dim) AS centroid"
        f" FROM cent{iters} GROUP BY cl)"
    )
    return ",\n".join(ctes)


def _kmpar_ctes(k: int, oversample: int, rounds: int, seed: int) -> list[str]:
    """The deterministic k-means‖ seeding as CTEs ending in
    ``init(vec_id, cl)`` — the oracle twin of `_kmeans_par_C`: the same
    hashed-oversampling predicate in HUGEINT, the same
    nearest-candidate weights, the same (w DESC, vec_id) top-k."""
    ell = oversample * k
    ctes = ["kp_c0 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1)"]
    pair = (
        "SELECT a.vec_id AS vec_id, c.vec_id AS cid,"
        " SUM((a.x - b.x) * (a.x - b.x)) AS s"
        " FROM xfix a CROSS JOIN kp_c{prev} c"
        " JOIN xfix b ON b.vec_id = c.vec_id AND b.dim = a.dim"
        " GROUP BY a.vec_id, c.vec_id"
    )
    for r in range(1, rounds + 1):
        p = pair.format(prev=r - 1)
        ctes.append(
            f"kp_d{r} AS (SELECT vec_id, MIN(s) AS d2 FROM ({p})"
            f" GROUP BY vec_id)"
        )
        ctes.append(
            f"kp_phi{r} AS (SELECT SUM(CAST(d2 AS HUGEINT)) AS phi"
            f" FROM kp_d{r})"
        )
        h = (
            "CAST('0x' || substring(md5(CAST(d.vec_id AS VARCHAR)"
            f" || ':kmpar:{seed}:{r}'), 1, 15) AS BIGINT)"
        )
        ctes.append(
            f"kp_s{r} AS (SELECT d.vec_id FROM kp_d{r} d, kp_phi{r} p"
            f" WHERE ({h} % {KMPAR_P}) * p.phi"
            f" < {ell * KMPAR_P} * CAST(d.d2 AS HUGEINT))"
        )
        ctes.append(
            f"kp_c{r} AS (SELECT vec_id FROM kp_c{r - 1}"
            f" UNION SELECT vec_id FROM kp_s{r})"
        )
    near = pair.format(prev=rounds)
    ctes.append(
        "kp_near AS (SELECT vec_id, cid FROM ("
        "SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id"
        f" ORDER BY s, cid) AS rk FROM ({near})) WHERE rk = 1)"
    )
    ctes.append(
        f"kp_w AS (SELECT c.vec_id, COALESCE(n.w, 0) AS w FROM kp_c{rounds} c"
        " LEFT JOIN (SELECT cid, COUNT(*) AS w FROM kp_near GROUP BY cid) n"
        " ON n.cid = c.vec_id)"
    )
    ctes.append(
        "init AS (SELECT vec_id, cl FROM (SELECT vec_id,"
        " ROW_NUMBER() OVER (ORDER BY w DESC, vec_id) - 1 AS cl"
        f" FROM kp_w) WHERE cl < {k})"
    )
    return ctes


def _kmeans_ctes(
    k: int,
    iters: int,
    dim: int,
    init: str = "min_id",
    oversample: int = 2,
    rounds: int = 3,
    seed: int = 0,
) -> list[str]:
    ctes = [
        f"dims AS (SELECT UNNEST(range({dim})) AS dim)",
        "xfix AS (SELECT vec_id, dim, CAST(FLOOR(CAST(embedding[dim + 1]"
        " AS DOUBLE) * 1000000) AS BIGINT) AS x FROM embeddings, dims)",
    ]
    if init == "min_id":
        ctes.append(
            "init AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1"
            f" AS cl FROM (SELECT vec_id FROM embeddings ORDER BY vec_id"
            f" LIMIT {k}))"
        )
    elif init == "kmeans_par":
        ctes.extend(_kmpar_ctes(k, oversample, rounds, seed))
    else:
        raise ValueError(f"unknown init {init!r}")
    ctes.append(
        "cent0 AS (SELECT i.cl, x.dim, x.x AS c FROM init i JOIN xfix x"
        " USING (vec_id))"
    )
    for i in range(1, iters + 2):
        prev = f"cent{i - 1}"
        ctes.append(
            f"a{i} AS (SELECT vec_id, cl FROM ("
            f"SELECT x.vec_id, c.cl, ROW_NUMBER() OVER ("
            f"PARTITION BY x.vec_id "
            f"ORDER BY SUM((x.x - c.c) * (x.x - c.c)), c.cl) AS rk "
            f"FROM xfix x JOIN {prev} c USING (dim) "
            f"GROUP BY x.vec_id, c.cl) WHERE rk = 1)"
        )
        if i <= iters:
            ctes.append(
                f"cent{i} AS (SELECT a.cl, x.dim, "
                f"CASE WHEN SUM(x.x) >= 0 "
                f"THEN (2 * SUM(x.x) + COUNT(*)) // (2 * COUNT(*)) "
                f"ELSE -((2 * -SUM(x.x) + COUNT(*)) // (2 * COUNT(*))) "
                f"END AS c "
                f"FROM a{i} a JOIN xfix x USING (vec_id) "
                f"GROUP BY a.cl, x.dim)"
            )
    return ctes
