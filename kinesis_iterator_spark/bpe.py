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
input, never one row per token), which is checkpointed and rescanned
once per merge round; each round is ONE job (Arrow pair-count kernel →
vocab-sized hash agg → top-1 collect) and the only driver state is the
merge list itself (≤ n_merges pairs, broadcast in task closures). The
encode/count kernels are single Arrow passes with a per-batch
segmentation cache keyed by distinct word — Zipf makes the cache hit
rate high. Nothing here is a shuffle of corpus text.

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


def _pair_count_fn(merges: list[tuple[str, str]]):
    ranks = _ranks(merges)

    def count_pairs(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            acc: dict = {}
            for w, f in zip(pdf["w"], pdf["freq"]):
                syms = _segment(w, ranks)
                f = int(f)
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
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

    return count_pairs


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
    to a pure-Python reference and across partitionings). Stops early
    when no pair reaches ``min_freq`` (merging singletons would just
    memorize the tail)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    from .queries import managed_checkpoint

    wc = managed_checkpoint(
        word_frequencies(doc).localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            wc.mapInPandas(
                _pair_count_fn(merges), "a string, b string, c long"
            )
            .groupBy("a", "b")
            .agg(F.sum("c").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) < min_freq:
            break
        merges.append((top[0]["a"], top[0]["b"]))
    return merges


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
    so two runs over the same corpus produce identical id spaces."""
    vocab: dict[str, int] = {EOW: 0}
    for a, b in merges:
        piece = a + b
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
