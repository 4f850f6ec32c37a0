"""Min-of-N interleaved timing for the two admit loops only (the
VERDICT r8 #3 targets). Usage:

    python tools/time_admits.py [sf_dir] [rounds]

Template state is bootstrapped once; each timed pass admits the odd
half against a fresh copy (setup outside the timer) — the bench.py
blocks, extracted so an A/B doesn't pay the full bench sweep."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from kinesis_iterator_spark.pipeline import CorpusWriter, EmbeddingWriter
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.session import get_spark
    from kinesis_iterator_spark.tables import load_table

    spark = get_spark("time_admits")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm IO

    doc = load_table(spark, sf_dir, "documents")
    even, odd = (
        doc.filter(F.col("doc_id") % 2 == 0),
        doc.filter(F.col("doc_id") % 2 == 1),
    )
    tpl_t = tempfile.mkdtemp(prefix="ta_t_")
    CorpusWriter(spark, f"{tpl_t}/corpus", f"{tpl_t}/index").admit(even)
    release_persists()

    def admit_text() -> float:
        work = tempfile.mkdtemp(prefix="ta_tw_")
        shutil.copytree(f"{tpl_t}/corpus", f"{work}/corpus")
        shutil.copytree(f"{tpl_t}/index", f"{work}/index")
        w = CorpusWriter(spark, f"{work}/corpus", f"{work}/index")
        t0 = time.perf_counter()
        w.admit(odd)
        dt = time.perf_counter() - t0
        release_persists()
        shutil.rmtree(work, ignore_errors=True)
        return dt

    emb = load_table(spark, sf_dir, "embeddings")
    even_e, odd_e = (
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )
    tpl_e = tempfile.mkdtemp(prefix="ta_e_")
    EmbeddingWriter(spark, f"{tpl_e}/store", f"{tpl_e}/ann").admit(even_e)
    release_persists()

    def admit_emb() -> float:
        work = tempfile.mkdtemp(prefix="ta_ew_")
        shutil.copytree(f"{tpl_e}/store", f"{work}/store")
        shutil.copytree(f"{tpl_e}/ann", f"{work}/ann")
        w = EmbeddingWriter(spark, f"{work}/store", f"{work}/ann")
        t0 = time.perf_counter()
        w.admit(odd_e)
        dt = time.perf_counter() - t0
        release_persists()
        shutil.rmtree(work, ignore_errors=True)
        return dt

    admit_text()  # warm
    admit_emb()  # warm
    best_t, best_e = float("inf"), float("inf")
    for i in range(rounds):
        t = admit_text()
        e = admit_emb()
        best_t, best_e = min(best_t, t), min(best_e, e)
        print(f"pass {i}: text {t:.2f} emb {e:.2f}")
    print(f"MIN: incremental_admit {best_t:.3f}  embedding_admit {best_e:.3f}")
    for d in (tpl_t, tpl_e):
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
