"""Jobs-per-admit instrumentation (VERDICT r8 #3): count the Spark jobs
one `CorpusWriter.admit` / `EmbeddingWriter.admit` costs, phase by
phase, via `statusTracker` job-id deltas — no listener, no JVM callback
server (the r7 bench-channel failure class).

Usage:
    python tools/admit_jobs.py [sf_dir]          # default sf0.1

Bootstraps each writer from the even half (untimed), then admits the
odd half once with phase-level counters patched around the library
calls. Prints a per-phase table and totals. The admit loops are
job-count-dominated at batch scale (measured: sf0.001 and sf0.1 admit
within ~15% of each other), so this count IS the latency budget.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from kinesis_iterator_spark import incremental
    from kinesis_iterator_spark import pipeline as pl
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.session import get_spark
    from kinesis_iterator_spark.tables import load_table

    spark = get_spark("admit_jobs")
    tracker = spark.sparkContext.statusTracker()

    phases: list[tuple[str, int, float]] = []

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    class probe:
        def __init__(self, name: str):
            self.name = name

        def __enter__(self):
            self.j0, self.t0 = njobs(), time.perf_counter()

        def __exit__(self, *exc):
            phases.append(
                (self.name, njobs() - self.j0, time.perf_counter() - self.t0)
            )

    def patch(obj, attr: str, label: str):
        real = getattr(obj, attr)

        def wrapped(*a, **k):
            with probe(label):
                return real(*a, **k)

        setattr(obj, attr, wrapped)
        return real, obj, attr

    def report(title: str, total_t: float) -> None:
        print(f"\n== {title}: {njobs()} cumulative jobs, {total_t:.2f} s")
        print(f"{'phase':40s} {'jobs':>5s} {'sec':>7s}")
        for name, j, t in phases:
            print(f"{name:40s} {j:5d} {t:7.2f}")
        inst = sum(j for _, j, _ in phases)
        print(f"{'(instrumented)':40s} {inst:5d}")
        phases.clear()

    # ---- text side ------------------------------------------------------
    doc = load_table(spark, sf_dir, "documents")
    even = doc.filter(F.col("doc_id") % 2 == 0)
    odd = doc.filter(F.col("doc_id") % 2 == 1)
    tpl = tempfile.mkdtemp(prefix="admitjobs_t_")
    pl.CorpusWriter(spark, f"{tpl}/corpus", f"{tpl}/index").admit(even)
    release_persists()

    from kinesis_iterator_spark.queries import dedup as _dd
    from kinesis_iterator_spark.queries import graph as _gr
    import kinesis_iterator_spark.pipeline as _plm

    patches = [
        patch(pl, "curate_frame", "curate_frame (gates+in-batch dedup)"),
        patch(_dd, "minhash_bands", "  minhash_bands(+ckpt)"),
        patch(_plm, "minhash_pairs", "  minhash_pairs"),
        patch(_plm, "connected_components", "  connected_components"),
        patch(_plm.CuratedCorpus, "stats", "cur.stats()"),
        patch(incremental, "dedup_against_index", "dedup_against_index build+ckpt"),
        patch(incremental, "extend_index", "extend_index (digests+bands)"),
        patch(incremental, "_write_band_files", "  _write_band_files"),
    ]
    # order matters: _write_band_files is nested inside extend_index —
    # count it separately but note the overlap in the report.

    work = tempfile.mkdtemp(prefix="admitjobs_tw_")
    shutil.copytree(f"{tpl}/corpus", f"{work}/corpus")
    shutil.copytree(f"{tpl}/index", f"{work}/index")
    w = pl.CorpusWriter(spark, f"{work}/corpus", f"{work}/index")
    j0, t0 = njobs(), time.perf_counter()
    with probe("TOTAL admit"):
        w.admit(odd)
    total_t = time.perf_counter() - t0
    print(f"text admit: {njobs() - j0} jobs")
    report("CorpusWriter.admit(odd) @ " + sf_dir, total_t)
    for real, obj, attr in patches:
        setattr(obj, attr, real)
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(tpl, ignore_errors=True)
    release_persists()

    # ---- vector side ----------------------------------------------------
    emb = load_table(spark, sf_dir, "embeddings")
    even_e = emb.filter(F.col("vec_id") % 2 == 0)
    odd_e = emb.filter(F.col("vec_id") % 2 == 1)
    tpl = tempfile.mkdtemp(prefix="admitjobs_e_")
    pl.EmbeddingWriter(spark, f"{tpl}/store", f"{tpl}/ann").admit(even_e)
    release_persists()

    from kinesis_iterator_spark.queries import similarity as sim

    patches = [
        patch(incremental, "embedding_dedup_against_index", "embedding_dedup_against_index"),
        patch(sim, "extend_ann_index", "extend_ann_index"),
        patch(incremental, "_check_vec_ids", "_check_vec_ids"),
    ]
    work = tempfile.mkdtemp(prefix="admitjobs_ew_")
    shutil.copytree(f"{tpl}/store", f"{work}/store")
    shutil.copytree(f"{tpl}/ann", f"{work}/ann")
    we = pl.EmbeddingWriter(spark, f"{work}/store", f"{work}/ann")
    j0, t0 = njobs(), time.perf_counter()
    with probe("TOTAL admit"):
        we.admit(odd_e)
    total_t = time.perf_counter() - t0
    print(f"embedding admit: {njobs() - j0} jobs")
    report("EmbeddingWriter.admit(odd) @ " + sf_dir, total_t)
    for real, obj, attr in patches:
        setattr(obj, attr, real)
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(tpl, ignore_errors=True)
    release_persists()
    spark.stop()


if __name__ == "__main__":
    main()
