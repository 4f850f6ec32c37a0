"""Property-based spot checks (SURVEY.md §5.2.4): windowed aggregation vs
brute force on tiny random frames, dedup idempotence, top-k kernel vs a
naive exact scan, sessionization gap invariants.

Spark-touching properties keep max_examples small (each example runs real
jobs); the pure-numpy kernel property runs many examples.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

SLOW = settings(max_examples=8, deadline=None)
FAST = settings(max_examples=100, deadline=None)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_running_sum_window_matches_prefix_sums(spark, rows):
    """SUM OVER (ROWS UNBOUNDED PRECEDING) ≡ per-group prefix sums."""
    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)], "g int, i int, v long"
    )
    w = W.partitionBy("g").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    got = {
        (r["g"], r["i"]): r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    acc: dict[int, int] = {}
    for i, (g, v) in enumerate(rows):
        acc[g] = acc.get(g, 0) + v
        assert got[(g, i)] == acc[g]


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=8), min_size=1, max_size=20
    )
)
def test_exact_dedup_is_idempotent_and_minimal(spark, texts):
    """dedup(dedup(X)) == dedup(X); survivors = min doc_id per content."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    dedup1 = df.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    out1 = {(r["text"], r["doc_id"]) for r in dedup1.collect()}
    dedup2 = dedup1.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    out2 = {(r["text"], r["doc_id"]) for r in dedup2.collect()}
    assert out1 == out2
    want = {}
    for i, t in enumerate(texts):
        want.setdefault(t, i)
    assert out1 == {(t, i) for t, i in want.items()}


@FAST
@given(st.data())
def test_pair_topk_kernel_matches_naive_scan(data):
    """The similarity top-k kernel (dedupe + left-fold cosine + tie-broken
    top-k) equals a naive python implementation on random corpora."""
    import numpy as np
    import pandas as pd

    from kinesis_iterator_spark.queries.similarity import (
        TOP_K,
        _pair_topk_scorer,
    )

    n = data.draw(st.integers(2, 12))
    d = 4
    M = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.floats(-1, 1, allow_nan=False, width=32),
                    min_size=d,
                    max_size=d,
                ),
                min_size=n,
                max_size=n,
            )
        ),
        dtype=np.float64,
    )
    # avoid zero-norm vectors (cosine undefined)
    M[np.linalg.norm(M, axis=1) < 1e-6] += 0.5
    nrm = np.sqrt(np.add.accumulate(M * M, axis=1)[:, -1])
    pairs = pd.DataFrame(
        [(q, c) for q in range(n) for c in range(n) if q != c],
        columns=["query_id", "neighbor_id"],
    )
    # duplicate some pairs to exercise the dedupe
    pairs = pd.concat([pairs, pairs.head(3)], ignore_index=True)
    # vectors ride with the pairs (the join-gathered layout the query
    # builds via _score_pairs_topk)
    pairs["neighbor_label"] = 0
    pairs["q_emb"] = [M[q] for q in pairs["query_id"]]
    pairs["n_emb"] = [M[c] for c in pairs["neighbor_id"]]
    out = pd.concat(list(_pair_topk_scorer([pairs])), ignore_index=True)
    for q in range(n):
        cos = {
            c: float(np.add.accumulate(M[q] * M[c])[-1] / (nrm[q] * nrm[c]))
            for c in range(n)
            if c != q
        }
        want = sorted(cos, key=lambda c: (-cos[c], c))[:TOP_K]
        got = out[out["query_id"] == q].sort_values("rnk")["neighbor_id"].tolist()
        assert got == want


def test_pair_topk_kernel_high_ids_survive_pack():
    """Regression (ADVICE r7 medium): ids in [2^31, 2^32) must round-trip
    the scorer's packed-pair dedupe. The old int64 pack put the query
    id's sign bit into the packed high half, so the arithmetic-shift
    unpack returned a NEGATIVE query_id and the caller's join-back
    silently classified those batch vectors as novel."""
    import numpy as np
    import pandas as pd

    from kinesis_iterator_spark.queries.similarity import _pair_topk_scorer

    hi = (1 << 31) + 7  # sign bit set in the packed high half
    v = np.array([1.0, 0.0, 0.0, 0.0])
    pairs = pd.DataFrame(
        {
            "query_id": [hi, hi, 3],
            "neighbor_id": [5, (1 << 32) - 1, hi],
            "neighbor_label": [0, 0, 0],
            "q_emb": [v, v, v],
            "n_emb": [v, v, v],
        }
    )
    out = pd.concat(list(_pair_topk_scorer([pairs])), ignore_index=True)
    assert (out["query_id"] >= 0).all() and (out["neighbor_id"] >= 0).all()
    assert set(map(tuple, out[["query_id", "neighbor_id"]].to_numpy())) == {
        (hi, 5),
        (hi, (1 << 32) - 1),
        (3, hi),
    }
    assert (out["cosine"] == 1.0).all()


def test_unique_pairs_helper_high_ids_and_dedupe():
    """The shared `_unique_pairs` kernel (all three candidate-pair
    scorers, incl. dedup_embedding_cosine's small-corpus path — the site
    the r8 review found still packing in int64): high ids round-trip,
    duplicates collapse, first-occurrence indexes point at the kept
    rows."""
    import numpy as np

    from kinesis_iterator_spark.queries.similarity import _unique_pairs

    hi = (1 << 31) + 7
    a = np.array([hi, hi, 3, hi], dtype=np.int64)
    b = np.array([5, (1 << 32) - 1, hi, 5], dtype=np.int64)
    ua, ub, first = _unique_pairs(a, b, return_index=True)
    got = set(zip(ua.tolist(), ub.tolist()))
    assert got == {(hi, 5), (hi, (1 << 32) - 1), (3, hi)}
    assert ua.dtype == np.int64 and (ua >= 0).all() and (ub >= 0).all()
    assert all(a[i] == x and b[i] == y for i, x, y in zip(first, ua, ub))
    ua2, ub2, none = _unique_pairs(a, b)
    assert none is None
    assert set(zip(ua2.tolist(), ub2.tolist())) == got


@SLOW
@given(
    ts_offsets=st.lists(
        st.integers(0, 6 * 3600), min_size=1, max_size=25
    )
)
def test_sessionize_gap_invariants(spark, ts_offsets):
    """lag+cumsum sessionization: within a session no gap exceeds 30 min;
    consecutive sessions are separated by > 30 min; every event lands in
    exactly one session."""
    base = 1_700_000_000
    rows = [
        (1, i, base + off) for i, off in enumerate(sorted(ts_offsets))
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, epoch long")
    ev = df.withColumn("ts", F.col("epoch").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn(
            "new_session",
            F.when(
                gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select("event_id", "epoch", "session_id")
        .collect()
    )
    assert len(sess) == len(rows)
    by_session: dict[int, list[int]] = {}
    for r in sorted(sess, key=lambda r: r["epoch"]):
        by_session.setdefault(r["session_id"], []).append(r["epoch"])
    sessions = [by_session[k] for k in sorted(by_session)]
    for epochs in sessions:
        for a, b in zip(epochs, epochs[1:]):
            assert b - a <= 30 * 60
    for prev, nxt in zip(sessions, sessions[1:]):
        assert nxt[0] - prev[-1] > 30 * 60


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user_id
            st.integers(min_value=0, max_value=40),  # ts offset (seconds)
            st.booleans(),                           # True = purchase
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_asof_union_window_matches_bruteforce(spark, rows):
    """For ANY event set (duplicate timestamps, users with no purchases,
    same-instant click+purchase), the union+carry-forward-window as-of
    equals the quadratic range-join definition: per click, the purchase
    row with the greatest ts ≤ click ts (ties collapsed by MAX)."""
    import datetime as dt

    from kinesis_iterator_spark.queries.relational import asof_click_purchase

    base = dt.datetime(2024, 1, 1)
    data = [
        (
            i,
            base + dt.timedelta(seconds=off),
            uid,
            "purchase" if is_p else "click",
            float(v),
        )
        for i, (uid, off, is_p, v) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        r["event_id"]: (
            r["purchase_ts"],
            r["purchase_event_id"],
            r["purchase_value"],
        )
        for r in asof_click_purchase(ev).collect()
    }

    # brute-force reference in plain python
    purchases = {}
    for i, ts, uid, kind, v in data:
        if kind == "purchase":
            key = (uid, ts)
            pe, pv = purchases.get(key, (-1, -1.0))
            purchases[key] = (max(pe, i), max(pv, v))
    want = {}
    for i, ts, uid, kind, v in data:
        if kind != "click":
            continue
        prior = [
            (pts, pe, pv)
            for (puid, pts), (pe, pv) in purchases.items()
            if puid == uid and pts <= ts
        ]
        want[i] = max(prior) if prior else (None, None, None)
    assert got == want


@SLOW
@given(
    tokens=st.lists(st.integers(1, 300), min_size=1, max_size=40),
    ctx=st.integers(8, 200),
)
def test_pack_sequences_invariants_random_corpora(spark, tokens, ctx):
    """Random token distributions: every doc packed exactly once, pack
    sums within ctx except oversized singletons, packs dense per shard,
    and the whole assignment equals a pure-Python next-fit over the
    op's own deterministic shard/order."""
    from collections import defaultdict

    from kinesis_iterator_spark.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, tokens long"
    )
    rows = (
        pack_sequences(df, ctx, n_shards=3, seed=9)
        .withColumn("_ord", F.xxhash64("doc_id", F.lit(9)))
        .collect()
    )
    assert len(rows) == len(tokens)
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["_ord"], r["doc_id"]))
        pack_id, used = 0, 0
        for r in rs:
            t = r["tokens"]
            if used > 0 and used + t > ctx:
                pack_id += 1
                used = 0
            assert r["pack"] == pack_id
            used += t
        sums = defaultdict(int)
        for r in rs:
            sums[r["pack"]] += r["tokens"]
        for p, s in sums.items():
            if s > ctx:
                assert sum(1 for r in rs if r["pack"] == p) == 1
        assert set(sums) == set(range(len(sums)))


@given(
    st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=24,
    ),
)
@settings(max_examples=40, deadline=None)
def test_fold_dot_helpers_bit_identical_to_scalar_loop(vecs):
    """Every vectorized dot-fold helper (`_fold_dot_rows`, the
    transposed-layout `_fold_dot_rows_T` / `_fold_dot_pairs`) is the
    SAME sequential d-ascending left fold as a scalar Python loop —
    bit-identical on arbitrary float32 inputs. The whole cross-engine
    vector discipline (Spark ≡ DuckDB list_reduce ≡ SQL `+` chain)
    rests on this identity, so it gets an adversarial pin, not just
    fixture coverage."""
    import numpy as np

    from kinesis_iterator_spark.queries.similarity import (
        _fold_dot_pairs,
        _fold_dot_rows,
        _fold_dot_rows_T,
    )

    # float32 storage, float64 fold — the engine's convention (gathered
    # payloads are cast to f8 before any fold).
    A = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    B = A[::-1].copy()

    def scalar(a, b):
        acc = float(a[0]) * float(b[0])
        for x, y in zip(a[1:], b[1:]):
            acc = acc + float(x) * float(y)
        return acc

    want = np.array([scalar(a, b) for a, b in zip(A, B)])
    got_rows = _fold_dot_rows(A, B)
    assert got_rows.tolist() == want.tolist()
    AT = np.ascontiguousarray(A.T)
    BT = np.ascontiguousarray(B.T)
    assert _fold_dot_rows_T(AT, BT).tolist() == want.tolist()
    # self-pair form: both sides gather from ONE transposed corpus
    M = np.vstack([A, B])
    MT = np.ascontiguousarray(M.T)
    i = np.arange(len(A))
    j = np.arange(len(A)) + len(A)
    assert _fold_dot_pairs(MT, i, j).tolist() == want.tolist()


@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=30, unique=True),
    st.lists(st.integers(1, 200), min_size=1, max_size=30, unique=True),
)
@settings(max_examples=30, deadline=None)
def test_rrf_fixed_point_is_exact_and_order_free(lex_ranks, sem_ranks):
    """The RRF integer arithmetic: RRF_FIX // (k0 + rank) summed over
    legs is exact (no float on the sort key) and symmetric in the
    legs, and ordering by rrf_fix is a total refinement of ordering by
    the true rational RRF score — fusion can never invert two
    documents whose exact scores differ."""
    from fractions import Fraction

    from kinesis_iterator_spark.queries.retrieval import RRF_FIX, RRF_K0

    def fix(lr, sr):
        s = 0
        if lr is not None:
            s += RRF_FIX // (RRF_K0 + lr)
        if sr is not None:
            s += RRF_FIX // (RRF_K0 + sr)
        return s

    def frac(lr, sr):
        s = Fraction(0)
        if lr is not None:
            s += Fraction(1, RRF_K0 + lr)
        if sr is not None:
            s += Fraction(1, RRF_K0 + sr)
        return s

    docs = [(l, s) for l in [*lex_ranks, None] for s in [*sem_ranks, None]]
    for a in docs:
        assert fix(*a) == fix(*reversed(a)) or a[0] == a[1]
        for b in docs:
            # exact-score strict order is never inverted by the fix key
            if frac(*a) > frac(*b):
                assert fix(*a) >= fix(*b)


@given(st.text(alphabet=st.characters(blacklist_characters=" ", min_codepoint=33, max_codepoint=600), min_size=1, max_size=12),
       st.lists(st.tuples(st.text(min_size=1, max_size=3), st.text(min_size=1, max_size=3)), max_size=10))
@settings(max_examples=60, deadline=None)
def test_bpe_segment_invariants(word, merges):
    """`bpe._segment` under ARBITRARY merge lists: the pieces always
    concatenate back to word + the end-of-word sentinel (no characters
    created or lost — the invariant the decode roundtrip rests on),
    and segmenting is idempotent in the ranks (re-segmenting the
    joined pieces of an already-converged word changes nothing)."""
    from kinesis_iterator_spark.bpe import EOW, _ranks, _segment

    ranks = _ranks(merges)
    segs = _segment(word, ranks)
    assert "".join(segs) == word + EOW
    assert all(segs)  # no empty pieces


@given(st.integers(1, 10**12), st.integers(1, 10**12))
@settings(max_examples=100, deadline=None)
def test_proportional_train_k_properties(n, m):
    """The codebook sizing rule: 1 ≤ k ≤ n; k ≥ ⌈√n⌉ (so k² ≥ n —
    cell population ≤ √n on average); monotone in n."""
    from kinesis_iterator_spark.queries.clustering import (
        proportional_train_k,
    )

    k = proportional_train_k(n)
    assert 1 <= k <= n
    assert k * k >= n or k == n  # floor-at-n for tiny corpora
    lo, hi = sorted((n, m))
    assert proportional_train_k(lo) <= proportional_train_k(hi)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            # (op, n_files): record an admission committing n new files
            st.tuples(st.just("admit"), st.integers(0, 3)),
            st.just(("collapse", 0)),
            st.just(("torn", 0)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_snapshot_manifest_model(tmp_path_factory, ops):
    """Model-based pin of the admission-manifest machinery (round 13):
    random interleavings of admissions (0-3 files each), history
    collapses, and torn tail lines, checked against a pure-Python
    model — `snapshot_files(g)` returns exactly the cumulative file
    set of the first g admissions (or raises for collapsed/empty
    generations), `snapshot_gens` tracks the model length, and a torn
    tail never shifts generation numbering. No Spark — the machinery
    is driver-side file metadata by design."""
    import json
    import os

    from kinesis_iterator_spark import incremental

    d = str(tmp_path_factory.mktemp("manifest_model"))
    model: list[dict] = []  # [{"files": set, "collapsed": bool}]
    counter = 0
    for op, n in ops:
        if op == "admit":
            new = []
            for _ in range(n):
                name = f"part-{counter:05d}.parquet"
                counter += 1
                open(os.path.join(d, name), "wb").close()
                new.append(name)
            gen = incremental.record_snapshot(d, n=n)
            model.append({"files": set(new), "collapsed": False})
            assert gen == len(model)
        elif op == "collapse" and model:
            incremental.collapse_snapshots(d, len(model))
            all_files = set().union(*(m["files"] for m in model))
            model = [
                {"files": set(), "collapsed": True}
                for _ in range(len(model) - 1)
            ] + [{"files": all_files, "collapsed": False}]
        elif op == "torn":
            with open(incremental._snapshot_path(d), "a") as fh:
                fh.write('{"files": ["torn')
        assert incremental.snapshot_gens(d) == len(model)
        for g in range(1, len(model) + 1):
            expect = set().union(*(m["files"] for m in model[:g]))
            if model[g - 1]["collapsed"]:
                try:
                    incremental.snapshot_files(d, g)
                    raise AssertionError("collapsed gen must be loud")
                except ValueError as e:
                    assert "collapsed" in str(e)
            elif not expect:
                try:
                    incremental.snapshot_files(d, g)
                    raise AssertionError("empty gen must be loud")
                except ValueError as e:
                    assert "no data files" in str(e)
            else:
                got = {
                    os.path.basename(p)
                    for p in incremental.snapshot_files(d, g)
                }
                assert got == expect, (g, got, expect)


# ---------------------------------------------------------------------------
# Snapshot-manifest lifecycle model (round 14): record / collapse / prune
# against a pure-Python reference. The manifest ops are driver-side file
# metadata — no Spark — so this fuzzes the retention machinery cheaply:
# every reachable interleaving must keep snapshot_gens / snapshot_files /
# snapshot_extra exactly equal to the model, servable-vs-loud included,
# and hidden (_/. prefixed) files must never be attributed.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_manifest_lifecycle_matches_model(tmp_path_factory, data):
    import os

    from kinesis_iterator_spark import incremental

    d = str(tmp_path_factory.mktemp("mani"))
    model: list[dict] = []  # {files: [..], n, extra, compacted}
    counter = [0]

    def new_files(k: int) -> list[str]:
        out = []
        for _ in range(k):
            name = f"part-{counter[0]:05d}.parquet"
            counter[0] += 1
            open(os.path.join(d, name), "wb").close()
            out.append(name)
        return out

    n_ops = data.draw(st.integers(1, 10), label="n_ops")
    for _ in range(n_ops):
        op = data.draw(
            st.sampled_from(["record", "record", "record", "collapse",
                             "prune", "hidden"]),
            label="op",
        )
        if op == "hidden":
            # Junk a crashed write would leave — must stay invisible.
            os.makedirs(os.path.join(d, "_temporary"), exist_ok=True)
            open(
                os.path.join(d, "_temporary", f"x{counter[0]}.parquet"),
                "wb",
            ).close()
            open(os.path.join(d, f".crc{counter[0]}.parquet"), "wb").close()
            counter[0] += 1
            continue
        if op == "record":
            k = data.draw(st.integers(0, 3), label="k")
            with_extra = data.draw(st.booleans(), label="extra?")
            files = new_files(k)
            extra = {"t": counter[0]} if with_extra else None
            n = incremental.record_snapshot(d, n=k, extra=extra)
            model.append(
                {"files": files, "n": k, "extra": extra, "compacted": False}
            )
            assert n == len(model)
            continue
        if op == "collapse":
            if not model:
                continue
            incremental.collapse_snapshots(d, len(model), extra={"c": 1})
            allf = sorted(f for rec in model for f in rec["files"])
            for rec in model[:-1]:
                rec.update(files=[], n=None, extra=None, compacted=True)
            model[-1].update(
                files=allf, n=None, extra={"c": 1}, compacted=False
            )
            continue
        if op == "prune":
            if not model:
                continue
            bg = data.draw(
                st.integers(1, len(model)), label="before_gen"
            )
            changed = incremental.prune_snapshots(d, bg)
            base = model[bg - 1]
            expect_noop = (
                bg == 1
                or base["compacted"]
                or all(r["compacted"] for r in model[: bg - 1])
            )
            assert changed is (not expect_noop)
            if not expect_noop:
                merged = [
                    f for rec in model[:bg] for f in rec["files"]
                ]
                ns = [
                    r["n"] for r in model[:bg] if not r["compacted"]
                ]
                base["files"] = merged
                base["n"] = (
                    sum(ns) if all(x is not None for x in ns) else None
                )
                for rec in model[: bg - 1]:
                    rec.update(
                        files=[], n=None, extra=None, compacted=True
                    )
            continue

    # Invariants vs the model, every generation.
    assert incremental.snapshot_gens(d) == len(model)
    for g in range(1, len(model) + 1):
        cum = sorted(
            os.path.join(d, f)
            for rec in model[:g]
            for f in rec["files"]
        )
        if model[g - 1]["compacted"]:
            import pytest as _pt

            with _pt.raises(ValueError):
                incremental.snapshot_files(d, g)
            with _pt.raises(ValueError):
                incremental.snapshot_extra(d, g)
        elif not cum:
            import pytest as _pt

            with _pt.raises(ValueError, match="no data files"):
                incremental.snapshot_files(d, g)
            assert incremental.snapshot_extra(d, g) == model[g - 1]["extra"]
        else:
            assert sorted(incremental.snapshot_files(d, g)) == cum
            assert incremental.snapshot_extra(d, g) == model[g - 1]["extra"]
            for p in cum:
                assert "_temporary" not in p and "/.crc" not in p


@settings(max_examples=6, deadline=None)
@given(data=st.data())
@pytest.mark.slow
def test_data_dir_maintenance_interleavings_preserve_asof(
    spark, tmp_path_factory, data
):
    """Random interleavings of {record-an-admission, prune(k),
    compact_data_snapshots, vacuum(h), export(g)} on a data-of-record
    dir keep EVERY servable as_of bit-equal to the model's cumulative
    row set, pruned generations stay loud, and every export taken
    along the way still reads its captured row set at the END — i.e.
    export immunity to whatever maintenance followed it (r16 ops
    folded into the r15 property). The Spark twin of the
    manifest-only lifecycle fuzz above (compaction/vacuum rewrite
    real files)."""
    import os

    from kinesis_iterator_spark import incremental

    base_dir = str(tmp_path_factory.mktemp("dmaint"))
    d = base_dir + "/data"
    rows_of: list[set] = []   # model: per-generation row-id sets
    pruned_below = [1]        # first servable generation
    exports: list[tuple[str, set]] = []  # (dest dir, captured rows)

    def record(ids):
        if ids:
            spark.createDataFrame(
                [(i, f"t{i}") for i in ids], "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(d)
        else:
            os.makedirs(d, exist_ok=True)
        incremental.record_snapshot(d, n=len(ids))
        rows_of.append(set(ids))

    next_id = [0]
    record(list(range(3)))
    next_id[0] = 3
    n_ops = data.draw(st.integers(1, 6), label="n_ops")
    for _ in range(n_ops):
        op = data.draw(
            st.sampled_from(
                ["record", "record", "prune", "compact", "vacuum",
                 "export"]
            ),
            label="op",
        )
        if op == "record":
            k = data.draw(st.integers(0, 4), label="k")
            ids = list(range(next_id[0], next_id[0] + k))
            next_id[0] += k
            record(ids)
        elif op == "prune":
            bg = data.draw(st.integers(1, len(rows_of)), label="bg")
            incremental.prune_snapshots(d, bg)
            pruned_below[0] = max(pruned_below[0], bg)
        elif op == "vacuum":
            h = data.draw(
                st.integers(pruned_below[0], len(rows_of)), label="h"
            )
            v = incremental.vacuum_data_snapshots(
                spark, d, h, ("doc_id",)
            )
            assert v["files_after"] <= v["files_before"]
            pruned_below[0] = max(pruned_below[0], h)
        elif op == "export":
            g = data.draw(
                st.integers(pruned_below[0], len(rows_of)), label="g"
            )
            dest = os.path.join(base_dir, f"export{len(exports)}")
            incremental.export_snapshot(d, g, dest)
            exports.append((dest, set().union(*rows_of[:g])))
        else:
            incremental.compact_data_snapshots(spark, d, ("doc_id",))

    assert incremental.snapshot_gens(d) == len(rows_of)
    for g in range(1, len(rows_of) + 1):
        cum = set().union(*rows_of[:g])
        if g < pruned_below[0]:
            import pytest as _pt

            with _pt.raises(ValueError):
                incremental.snapshot_files(d, g)
        elif not cum:
            import pytest as _pt

            with _pt.raises(ValueError, match="no data files"):
                incremental.snapshot_files(d, g)
        else:
            got = {
                r["doc_id"]
                for r in incremental.snapshot_read(spark, d, g).collect()
            }
            assert got == cum, (g, pruned_below[0])
    # Every export published along the way still serves its captured
    # rows, whatever prune/compact/vacuum followed it on the source.
    for dest, want in exports:
        got = {
            r["doc_id"]
            for r in incremental.snapshot_read(spark, dest, 1).collect()
        }
        assert got == want, dest
