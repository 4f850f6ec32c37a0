"""Deterministic corpus-scale BPE (VERDICT r10 #5): byte-pair-encoding
merges are a pure function of the corpus, so the trainer needs no
randomness — and therefore pins exactly against a pure-Python reference
(the union-find precedent). This makes the repo's token accounting REAL:
`bpe_token_counts` produces the integer column the `tokens_col` hooks
(`pack_sequences` / `mixture_rates` / `build_mixture` / `dsir_select`)
were built to receive, replacing whitespace word counts with actual
subword counts.

Algorithm (Sennrich, Haddow, Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units"): pre-tokenize on the house whitespace
convention, represent each word as its characters plus an end-of-word
sentinel, then greedily merge the most frequent adjacent symbol pair
``n_merges`` times. Ties break deterministically by (count DESC, left
symbol ASC, right symbol ASC). Encoding applies the learned merges by
rank (lowest-rank pair first, all its occurrences at once — the GPT-2
convention); the trainer segments with the SAME function, so train and
encode can never disagree.

100 TB posture: the corpus collapses ONCE to the word-frequency table
(map-side hash aggregate — vocabulary-sized, the standard BPE trainer
input, never one row per token). Vocabularies at or below
`DRIVER_BPE_MAX_WORDS` then train in-process with incremental pair
counts (`bpe_train_driver` — Spark actions CONSTANT in n_merges, the
published trainers' shape); larger vocabularies run the distributed
loop over ONE tagged state frame (materialized symbol sequences +
delta-maintained pair counts: 2 actions per merge, per-round work
proportional to the words the merge touches — never a re-segmentation
of the whole vocabulary under the growing merge list). The encode/count
kernels are single Arrow passes with a per-batch segmentation cache
keyed by distinct word — Zipf makes the cache hit rate high. Nothing
here is a shuffle of corpus text.

Reference parity note: the reference (`kinesis.go`) has no tokenizer;
this extends the driver-mandated text-analysis group (SURVEY §2.C)
along the published training-pipeline path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"
_NOPAIR = (1 << 62)


def _segment(word: str, ranks: dict) -> list[str]:
    """Split ``word`` into BPE pieces under the learned ``ranks``
    (pair → merge rank): repeatedly merge every occurrence of the
    lowest-rank adjacent pair. Pure function — shared verbatim by the
    trainer's per-round re-segmentation, the encoder, and the
    pure-Python test reference."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, bi = _NOPAIR, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]), _NOPAIR)
            if r < best_rank:
                best_rank, bi = r, i
        if bi < 0:
            break
        a, b = syms[bi], syms[bi + 1]
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ranks(merges: list[tuple[str, str]]) -> dict:
    return {pair: r for r, pair in enumerate(merges)}


def word_frequencies(doc: DataFrame) -> DataFrame:
    """(w, freq) over the house whitespace pre-tokenization — the
    corpus's one reduction to trainer state. Empty words (from doubled
    separators) are dropped: they carry no symbols."""
    return (
        doc.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Replace every adjacent (a, b) with a+b — left-to-right passes to
    a fixpoint, exactly the replacement `_segment` performs for its
    chosen pair (shared by the trainer's incremental state maintenance
    and the pure-Python reference twin). During TRAINING the
    incremental invariant holds: the new merge is the HIGHEST rank, so
    no earlier merge can become newly applicable (a multi-char symbol's
    creation merge always precedes merges referencing it) — applying
    each chosen merge to the maintained state reproduces a from-scratch
    `_segment` under the full rank table (pinned, plus a property test
    over adversarial overlapping-pair corpora)."""
    while True:
        out: list[str] = []
        i, hit = 0, False
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
                hit = True
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if not hit:
            return syms


# Vocabularies at or below this collect to the driver and train
# in-process with incremental pair counts (the `graph.DRIVER_CC_MAX_EDGES`
# precedent): TOTAL Spark actions ≈ 2 for ANY n_merges — the
# word-frequency aggregation + one bounded collect — versus 2 actions
# PER MERGE on the distributed path. The published trainers are exactly
# this shape (the corpus collapses to word counts; the merge loop is
# control-flow-heavy and vocabulary-sized). Above the gate, the
# distributed loop below keeps per-round work flat via materialized
# symbol state + delta-maintained pair counts. Tests force the
# distributed path by setting this to -1.
DRIVER_BPE_MAX_WORDS = 200_000

_STATE_SCHEMA = (
    "kind string, w string, freq long, syms array<string>, "
    "a string, b string, c long, s long"
)

# How many ranked pair candidates each distributed round collects for
# disjoint-prefix batching (VERDICT r12 #3). The prefix that survives
# the disjointness filter AND the post-apply faithfulness verifier is
# committed as one round — jobs per merge fall from ~5 to ~(3 + one
# delta collect)/|prefix|.
BPE_BATCH_TOP_K = 64


def bpe_train_driver(
    word_freq: list[tuple[str, int]], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Driver-side trainer with INCREMENTAL pair counts (VERDICT r11
    #4): maintain pair→count and pair→{word ids}; each merge touches
    only the words that contain the merged pair (their old adjacent
    pairs decrement, their post-merge pairs increment). Output is
    bit-identical to :func:`bpe_train_reference` (pinned) at
    O(Σ|affected words|) per round instead of O(vocab · |merges|) —
    the published trainers' shape."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freq:
        words.append(list(w) + [EOW])
        freqs.append(int(f))
    pc: dict = {}
    occ: dict = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            pc[p] = pc.get(p, 0) + f
            occ.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best_key, best_p, best_c = None, None, 0
        for p, c in pc.items():
            k = (-c, p[0], p[1])
            if best_key is None or k < best_key:
                best_key, best_p, best_c = k, p, c
        if best_p is None or best_c < min_freq:
            break
        a, b = best_p
        merges.append((a, b))
        for i in list(occ.get((a, b), ())):
            syms, f = words[i], freqs[i]
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                n = pc[p] - f
                if n:
                    pc[p] = n
                else:
                    del pc[p]
                s = occ.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del occ[p]
            ns = _apply_merge(syms, a, b)
            words[i] = ns
            for j in range(len(ns) - 1):
                p = (ns[j], ns[j + 1])
                pc[p] = pc.get(p, 0) + f
                occ.setdefault(p, set()).add(i)
    return merges


def _word_state(wc: DataFrame) -> DataFrame:
    """word-frequency rows as tagged state rows (kind='w') carrying the
    MATERIALIZED symbol sequence — the distributed trainer's per-round
    work is then an adjacency scan + targeted rewrite, never a
    re-segmentation of every word under the growing merge list (the
    r11 quadratic)."""
    return wc.select(
        F.lit("w").alias("kind"),
        "w",
        "freq",
        F.expr(f"concat(split(w, ''), array('{EOW}'))").alias("syms"),
        F.lit(None).cast("string").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("long").alias("c"),
        F.lit(None).cast("long").alias("s"),
    )


def _pc_state(pc: DataFrame) -> DataFrame:
    """(a, b, c) pair-count rows as tagged state rows (kind='p')."""
    return pc.select(
        F.lit("p").alias("kind"),
        F.lit(None).cast("string").alias("w"),
        F.lit(None).cast("long").alias("freq"),
        F.lit(None).cast("array<string>").alias("syms"),
        "a",
        "b",
        F.col("c").cast("long").alias("c"),
        F.lit(None).cast("long").alias("s"),
    )


def _count_kernel(batches):
    """Initial pair counts over word-state rows (syms already
    materialized) — one Arrow pass."""
    import pandas as pd

    for pdf in batches:
        if not len(pdf):
            continue
        acc: dict = {}
        for f, syms in zip(pdf["freq"], pdf["syms"]):
            f = int(f)
            syms = list(syms)
            for j in range(len(syms) - 1):
                k = (syms[j], syms[j + 1])
                acc[k] = acc.get(k, 0) + f
        if not acc:
            continue
        yield pd.DataFrame(
            {
                "a": [k[0] for k in acc],
                "b": [k[1] for k in acc],
                "c": list(acc.values()),
            }
        )


def _batch_merge_kernel(batch: list[tuple[str, str]]):
    """One round's state transition applying an ORDERED batch of merges
    to every word — each word applies the batch sequentially in rank
    order (exactly what the sequential reference does globally, since
    merges only interact WITHIN a word), so the resulting symbol state
    is bit-identical to |batch| single-merge rounds by construction.
    Pair-count deltas are emitted per STEP (kind='d', ``s`` = 1-based
    batch position) so the driver-side faithfulness verifier can
    reconstruct the count table BETWEEN steps — selection faithfulness
    (would greedy have chosen step i's pair?) is the part batching can
    break, and it is checked, not assumed."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ws, fs, ss = [], [], []
            delta: dict = {}
            for w, f, syms in zip(pdf["w"], pdf["freq"], pdf["syms"]):
                f = int(f)
                syms = list(syms)
                for step, (a, b) in enumerate(batch, start=1):
                    hit = any(
                        syms[j] == a and syms[j + 1] == b
                        for j in range(len(syms) - 1)
                    )
                    if not hit:
                        continue
                    for j in range(len(syms) - 1):
                        k = (syms[j], syms[j + 1], step)
                        delta[k] = delta.get(k, 0) - f
                    syms = _apply_merge(syms, a, b)
                    for j in range(len(syms) - 1):
                        k = (syms[j], syms[j + 1], step)
                        delta[k] = delta.get(k, 0) + f
                ws.append(w)
                fs.append(f)
                ss.append(syms)
            out = pd.DataFrame(
                {
                    "kind": ["w"] * len(ws),
                    "w": ws,
                    "freq": fs,
                    "syms": ss,
                    "a": [None] * len(ws),
                    "b": [None] * len(ws),
                    "c": [None] * len(ws),
                    "s": [None] * len(ws),
                }
            )
            dk = [(k, v) for k, v in delta.items() if v]
            if dk:
                out = pd.concat(
                    [
                        out,
                        pd.DataFrame(
                            {
                                "kind": ["d"] * len(dk),
                                "w": [None] * len(dk),
                                "freq": [None] * len(dk),
                                "syms": [None] * len(dk),
                                "a": [k[0] for k, _ in dk],
                                "b": [k[1] for k, _ in dk],
                                "c": [v for _, v in dk],
                                "s": [k[2] for k, _ in dk],
                            }
                        ),
                    ],
                    ignore_index=True,
                )
            yield out

    return fn


def _disjoint_prefix(
    top: list, min_freq: int
) -> list[tuple[str, str]]:
    """The longest PREFIX of the ranked top pairs that is pairwise
    symbol-disjoint and product-safe: no symbol appears in two selected
    pairs, and no selected pair's product a+b collides with another
    selected pair's symbol (either direction). Under these conditions
    an earlier batch merge cannot change a later batch pair's COUNT —
    only brand-new pairs (x, a+b) can still outrank it, which the
    post-apply verifier checks from the step-tagged deltas. A PREFIX
    (never a skipping subset) is required for faithfulness: a skipped
    pair with an untouched count would be greedy's true next choice."""
    used: set[str] = set()
    prods: set[str] = set()
    prefix: list[tuple[str, str]] = []
    for r in top:
        a, b, c = r["a"], r["b"], int(r["c"])
        if c < min_freq:
            break
        m = a + b
        if prefix and (
            a in used
            or b in used
            or m in used
            or a in prods
            or b in prods
            or m in prods
        ):
            break
        used.update((a, b))
        prods.add(m)
        prefix.append((a, b))
    return prefix


def _faithful_steps(
    prefix: list[tuple[str, str]],
    top: list,
    touched: list,
) -> int:
    """How many leading steps of the applied batch match what
    sequential greedy would have chosen — the selection check batching
    needs (application is exact by construction). At step i the only
    candidates that can outrank ``prefix[i-1]`` are TOUCHED pairs
    (any delta row): untouched pairs kept their round-start counts and
    every untouched pair ranking above step i's count was itself an
    earlier prefix member. ``touched`` rows carry (a, b, s, d, c0);
    counts between steps are c0 + cumulative deltas of earlier steps.
    Returns len(prefix) when fully faithful."""
    c0_top = {(r["a"], r["b"]): int(r["c"]) for r in top}
    cum: dict = {}
    by_step: dict = {}
    for r in touched:
        by_step.setdefault(int(r["s"]), []).append(r)
        cum[(r["a"], r["b"])] = int(r["c0"] or 0)
    applied: set = set()
    for i, (a, b) in enumerate(prefix, start=1):
        key_i = (-c0_top[(a, b)], a, b)
        for q, c in cum.items():
            if q == (a, b) or q in applied:
                continue
            if (-c, q[0], q[1]) < key_i:
                return i - 1
        applied.add((a, b))
        for r in by_step.get(i, ()):
            cum[(r["a"], r["b"])] += int(r["d"])
    return len(prefix)


def _bpe_train_distributed(
    spark: SparkSession, wc: DataFrame, n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """The above-gate loop, batched (VERDICT r12 #3): each round
    collects the top `BPE_BATCH_TOP_K` ranked pairs, takes the longest
    disjoint PREFIX, applies it in ONE kernel pass (per-word
    sequential, so the state transition is exact by construction), and
    VERIFIES from step-tagged deltas that sequential greedy would have
    selected exactly those pairs — a violated step truncates the batch
    and re-runs the shorter, verified prefix. Output stays
    bit-identical to `bpe_train_reference` (pinned, including an
    adversarial case where a merge's own product pair outranks the
    round's rank-2 pair and forces truncation).

    Actions per ROUND: top-K collect + (multi-step rounds only) one
    delta-aggregate collect + the state checkpoint — so jobs per MERGE
    fall from the r12 ~5 to ~4/|prefix| (tools/bpe_jobs.py measures
    the curve)."""
    from .queries import release_local_checkpoint

    words = _word_state(wc)
    pairs0 = (
        words.mapInPandas(_count_kernel, "a string, b string, c long")
        .groupBy("a", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    state = words.unionByName(_pc_state(pairs0)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < n_merges:
            top = (
                state.filter(F.col("kind") == "p")
                .orderBy(F.col("c").desc(), "a", "b")
                .limit(BPE_BATCH_TOP_K)
                .collect()
            )
            if not top or int(top[0]["c"]) < min_freq:
                break
            prefix = _disjoint_prefix(top, min_freq)[
                : n_merges - len(merges)
            ]

            def _apply(prefix):
                return (
                    state.filter(F.col("kind") == "w")
                    .mapInPandas(_batch_merge_kernel(prefix), _STATE_SCHEMA)
                    .persist()
                )

            ker = _apply(prefix)
            if len(prefix) > 1:
                # The verifier's candidate set is BOUNDED server-side
                # before the collect: a touched pair q can outrank a
                # prefix step only if its maximum possible count —
                # c0(q) + its positive deltas — reaches the SMALLEST
                # prefix count (strictly below ⇒ strictly worse key at
                # every step; sound). Without the bound, a hot merge
                # like ('e', EOW) touches pairs across every word
                # ending in e — a vocabulary-shaped driver collect at
                # scale. With it, candidates are the few pairs near
                # the top of the ranking (Zipf), regardless of corpus.
                min_c0 = min(int(r["c"]) for r in top[: len(prefix)])
                c0_rel = state.filter(F.col("kind") == "p").select(
                    "a", "b", F.col("c").alias("c0")
                )
                # ONE shuffle over the delta rows: per-pair positive-
                # delta total rides the same groupBy as the per-step
                # list (exploded back driver-side).
                d_pairs = (
                    ker.filter(F.col("kind") == "d")
                    .groupBy("a", "b")
                    .agg(
                        F.collect_list(F.struct("s", "c")).alias("_ds"),
                        F.sum(F.greatest(F.col("c"), F.lit(0)))
                        .cast("long")
                        .alias("_pos"),
                    )
                )
                # Driver-known relaxed prefilter: a pair OUTSIDE the
                # collected top-K has c0 <= c0(top[-1]), so it can
                # reach min_c0 only with _pos >= relax; top-K pairs
                # (c0 known driver-side) are kept unconditionally —
                # 2K literals, a broadcast-able isin. When the relaxed
                # threshold cannot bite (flat top region), fall back
                # to the exact c0 join (correct, costlier).
                relax = min_c0 - int(top[-1]["c"])
                key = F.concat_ws("\u0000", "a", "b")
                top_keys = ["\u0000".join((r["a"], r["b"])) for r in top]
                if relax > 0:
                    cand = d_pairs.filter(
                        (F.col("_pos") >= F.lit(relax))
                        | key.isin(top_keys)
                    )
                    # Broadcast-semi: the big count relation is probed
                    # by the tiny candidate key set — no vocab-scale
                    # shuffle rides the verifier.
                    c0_small = c0_rel.join(
                        F.broadcast(cand.select("a", "b")),
                        ["a", "b"],
                        "leftsemi",
                    )
                    joined = cand.join(
                        F.broadcast(c0_small), ["a", "b"], "left"
                    )
                else:
                    joined = d_pairs.join(c0_rel, ["a", "b"], "left")
                rows = joined.filter(
                    F.coalesce(F.col("c0"), F.lit(0)) + F.col("_pos")
                    >= F.lit(min_c0)
                ).collect()
                touched = [
                    {"a": r["a"], "b": r["b"], "s": int(e["s"]),
                     "d": int(e["c"]), "c0": r["c0"]}
                    for r in rows
                    for e in r["_ds"]
                ]
                ok = _faithful_steps(prefix, top, touched)
                if ok < len(prefix):
                    # Greedy would have diverged at step ok+1 (a new
                    # pair born inside the batch outranks it): commit
                    # only the verified prefix — its own check did not
                    # depend on the truncated steps' deltas.
                    ker.unpersist(False)
                    prefix = prefix[:ok]
                    ker = _apply(prefix)
            merges.extend(prefix)
            # The kernel output feeds BOTH state branches inside one
            # checkpoint action — persisted so the Arrow pass runs once.
            pc = (
                state.filter(F.col("kind") == "p")
                .select("a", "b", "c")
                .unionByName(
                    ker.filter(F.col("kind") == "d").select("a", "b", "c")
                )
                .groupBy("a", "b")
                .agg(F.sum("c").cast("long").alias("c"))
                .filter(F.col("c") > 0)
            )
            new_state = (
                ker.filter(F.col("kind") == "w")
                .unionByName(_pc_state(pc))
                .localCheckpoint(eager=True)
            )
            ker.unpersist(False)
            release_local_checkpoint(state)
            state = new_state
        return merges
    finally:
        release_local_checkpoint(state)


def bpe_train(
    spark: SparkSession,
    doc: DataFrame,
    n_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from ``doc`` (text column).
    Deterministic: the pair chosen each round is the (count DESC,
    a ASC, b ASC) maximum — no hash order, no partition order — so the
    result is a pure function of the corpus text (pinned bit-identical
    to a pure-Python reference and across partitionings, on BOTH
    paths). Stops early when no pair reaches ``min_freq`` (merging
    singletons would just memorize the tail).

    Path selection (VERDICT r11 #4): the corpus collapses once to the
    word-frequency table; at or below `DRIVER_BPE_MAX_WORDS` distinct
    words it collects (ONE bounded action — decided by the same
    limit(gate+1) collect, the `connected_components` discipline) and
    trains in-process with incremental pair counts
    (:func:`bpe_train_driver`) — total Spark actions CONSTANT in
    n_merges. Above the gate, `_bpe_train_distributed` keeps the
    merge loop on the cluster with materialized symbol state and
    delta-maintained pair counts — actions stay 2/round but per-round
    work is affected-words only, flat in |merges|."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    from .queries import managed_checkpoint

    wc = managed_checkpoint(
        word_frequencies(doc).localCheckpoint(eager=True)
    )
    gate = DRIVER_BPE_MAX_WORDS
    if gate >= 0:
        probe = wc.limit(gate + 1).collect()
        if len(probe) <= gate:
            return bpe_train_driver(
                [(r["w"], int(r["freq"])) for r in probe],
                n_merges,
                min_freq,
            )
    return _bpe_train_distributed(spark, wc, n_merges, min_freq)


def bpe_train_reference(
    word_freq: list[tuple[str, int]], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Single-process reference trainer over a (word, freq) list — the
    pin `bpe_train` is tested against (same `_segment`, same
    tie-break, zero Spark)."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        ranks = _ranks(merges)
        acc: dict = {}
        for w, f in word_freq:
            syms = _segment(w, ranks)
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                acc[k] = acc.get(k, 0) + f
        if not acc:
            break
        best = min(acc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_freq:
            break
        merges.append(best[0])
    return merges


def bpe_encode_rows(doc: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, pos, piece): the BPE pieces of each document in order —
    pos numbers pieces across the whole document (words contribute
    their pieces in sequence). One Arrow pass; per-batch segmentation
    cache keyed by distinct word."""
    ranks = _ranks(merges)

    def encode(batches):
        import numpy as np
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, poss, pieces = [], [], []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                p = 0
                for w in t.split(" "):
                    if not w:
                        continue
                    segs = cache.get(w)
                    if segs is None:
                        segs = _segment(w, ranks)
                        cache[w] = segs
                    for s in segs:
                        ids.append(int(d))
                        poss.append(p)
                        pieces.append(s)
                        p += 1
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "pos": np.array(poss, dtype=np.int64),
                    "piece": pieces,
                }
            )

    return doc.select("doc_id", "text").mapInPandas(
        encode, "doc_id long, pos long, piece string"
    )


def bpe_token_counts(
    doc: DataFrame, merges: list[tuple[str, str]], out_col: str = "bpe_tokens"
) -> DataFrame:
    """The input frame plus an ``out_col`` long column: the document's
    BPE piece count under ``merges`` — the real token accounting the
    `tokens_col` hooks receive. Slim kernel (doc_id → count) joined
    back, so the pass moves text once and the join moves two longs."""
    ranks = _ranks(merges)

    def count(batches):
        import numpy as np
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, ns = [], []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                n = 0
                for w in t.split(" "):
                    if not w:
                        continue
                    k = cache.get(w)
                    if k is None:
                        k = len(_segment(w, ranks))
                        cache[w] = k
                    n += k
                ids.append(int(d))
                ns.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "n": np.array(ns, dtype=np.int64),
                }
            )

    counts = doc.select("doc_id", "text").mapInPandas(
        count, "doc_id long, n long"
    )
    return doc.join(
        counts.withColumnRenamed("n", out_col), "doc_id"
    )


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The deterministic piece → token-id table induced by ``merges``:
    ids 0..255 are the single-byte/char base alphabet domain the
    trainer saw is NOT enumerable without the corpus, so the vocab is
    defined over what BPE can EMIT — the end-of-word sentinel, every
    merged piece (in merge-rank order, the GPT-2 convention), with
    unmerged single characters resolved at encode time via a stable
    fallback (see `bpe_encode_ids`). Pure function of the merge list,
    so two runs over the same corpus produce identical id spaces.

    Loud guard (ADVICE r12): a corpus whose TEXT literally contains the
    end-of-word sentinel string can train a merge whose piece spells the
    sentinel out of literal characters — e.g. ('</', 'w>') → '</w>'.
    Such a piece would silently alias onto sentinel id 0 here (the
    duplicate skip) and falsely close words in `bpe_decode_ids`,
    breaking the exact-inverse contract. The first such formation is
    detectable structurally: a legitimate word-final merge always has a
    SECOND element that itself ends with the sentinel (the sentinel
    symbol rides at the end of the symbol chain), so a piece ending in
    the sentinel whose second element does not is literal-character
    spelling — refused."""
    vocab: dict[str, int] = {EOW: 0}
    for a, b in merges:
        piece = a + b
        if piece.endswith(EOW) and not b.endswith(EOW):
            raise ValueError(
                f"merge ({a!r}, {b!r}) spells the end-of-word sentinel "
                f"{EOW!r} out of literal characters — the training text "
                "contains the sentinel string, which the id space cannot "
                "represent unambiguously. Pre-escape the sentinel "
                "sequence in the corpus before training/encoding."
            )
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return vocab


def bpe_encode_ids(
    doc: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, pos, token_id): `bpe_encode_rows` with pieces mapped to
    integer ids — merged pieces and EOW through `bpe_vocab`, residual
    single characters (never merged by training) to
    ``len(vocab) + codepoint`` (deterministic, collision-free, no
    corpus-wide character census needed — the 100 TB-friendly
    open-alphabet convention; a serving stack that wants a dense
    alphabet remaps the tail once, driver-side)."""
    vocab = bpe_vocab(merges)
    base = len(vocab)
    ranks = _ranks(merges)

    def encode(batches):
        import numpy as np
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, poss, toks = [], [], []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                p = 0
                for w in t.split(" "):
                    if not w:
                        continue
                    segs = cache.get(w)
                    if segs is None:
                        segs = [
                            vocab[s]
                            if s in vocab
                            else base + ord(s)
                            for s in _segment(w, ranks)
                        ]
                        cache[w] = segs
                    for tid in segs:
                        ids.append(int(d))
                        poss.append(p)
                        toks.append(tid)
                        p += 1
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "pos": np.array(poss, dtype=np.int64),
                    "token_id": np.array(toks, dtype=np.int64),
                }
            )

    return doc.select("doc_id", "text").mapInPandas(
        encode, "doc_id long, pos long, token_id long"
    )


def bpe_decode_ids(
    tok: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, text) from `bpe_encode_ids` rows — the inverse map that
    completes the tokenizer roundtrip: ids < |vocab| resolve through
    the inverted `bpe_vocab`, residual ids to ``chr(id - |vocab|)``
    (the open-alphabet convention), and a piece ending in the
    end-of-word sentinel closes the current word. Exact inverse of the
    encoder on space-normalized, sentinel-free text (a corpus whose text
    literally contains the EOW string can train pieces that spell the
    sentinel and falsely close words — `bpe_vocab` refuses such merge
    lists loudly; encoding drops empty words, so doubled separators
    normalize — pinned); one Arrow pass grouped by
    doc_id, tokens ordered by pos inside the kernel so the result is
    partitioning-invariant."""
    vocab = bpe_vocab(merges)
    inv = {i: p for p, i in vocab.items()}
    base = len(vocab)
    n_eow = len(EOW)

    def decode(pdf):
        import pandas as pd

        pdf = pdf.sort_values("pos")
        words: list[str] = []
        cur: list[str] = []
        for tid in pdf["token_id"]:
            tid = int(tid)
            piece = inv[tid] if tid < base else chr(tid - base)
            if piece.endswith(EOW):
                cur.append(piece[:-n_eow])
                words.append("".join(cur))
                cur = []
            else:
                cur.append(piece)
        if cur:
            raise ValueError(
                f"doc {int(pdf['doc_id'].iloc[0])}: token stream ends "
                "mid-word (no end-of-word sentinel) — truncated or "
                "corrupted ids"
            )
        return pd.DataFrame(
            {
                "doc_id": [int(pdf["doc_id"].iloc[0])],
                "text": [" ".join(words)],
            }
        )

    return tok.groupBy("doc_id").applyInPandas(
        decode, "doc_id long, text string"
    )
