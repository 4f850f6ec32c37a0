"""Measure what `vacuum` actually reclaims (VERDICT r14 #1's 'measured
byte shrink', as a recorded number rather than a test inequality):
drive a CorpusWriter through N slice admits at a scale factor, prune +
vacuum at a mid-history horizon, and report per-dir bytes/files
before/after plus masked band rows dropped.

Usage: python tools/vacuum_bytes.py [sf_dir] [n_admits] [horizon]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from kinesis_iterator_spark import incremental
    from kinesis_iterator_spark.pipeline import CorpusWriter
    from kinesis_iterator_spark.session import get_spark
    from kinesis_iterator_spark.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_admits = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    horizon = int(sys.argv[3]) if len(sys.argv) > 3 else None
    root = tempfile.mkdtemp(prefix="ki_vacuum_bytes_")
    try:
        spark = get_spark()
        doc = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        )
        w = CorpusWriter(
            spark, f"{root}/corpus", f"{root}/index", bm25_index=True
        )
        for m in range(n_admits):
            w.admit(doc.filter(F.col("doc_id") % n_admits == m))
        h = horizon or (n_admits // 2 + 1)
        dirs = {
            "corpus": f"{root}/corpus",
            "digests": f"{root}/index/digests",
            "bands": f"{root}/index/bands",
            "postings": f"{root}/index/bm25/postings",
        }
        before = {
            k: {
                "bytes": incremental._dir_bytes(d),
                "files": len(incremental._data_files(d)),
            }
            for k, d in dirs.items()
        }
        out = w.vacuum(h)
        after = {
            k: {
                "bytes": incremental._dir_bytes(d),
                "files": len(incremental._data_files(d)),
            }
            for k, d in dirs.items()
        }
        report = {
            "sf_dir": sf_dir,
            "n_admits": n_admits,
            "horizon": h,
            "dirs": {
                k: {
                    "bytes_before": before[k]["bytes"],
                    "bytes_after": after[k]["bytes"],
                    "files_before": before[k]["files"],
                    "files_after": after[k]["files"],
                }
                for k in dirs
            },
            "band_rows_dropped": out.get("bands", {}).get(
                "rows_dropped", 0
            ),
            "total_bytes_before": sum(v["bytes"] for v in before.values()),
            "total_bytes_after": sum(v["bytes"] for v in after.values()),
        }
        print(json.dumps(report), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
