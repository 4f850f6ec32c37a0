"""BPE trainer cost curve (VERDICT r11 #4's done-criterion): Spark
job count + wall time vs n_merges, on both paths — the driver fast
path (actions constant in n_merges) and the forced distributed loop
(2 actions/merge, per-round work flat). statusTracker job-id deltas,
the `admit_jobs.py` method.

Usage: python tools/bpe_jobs.py [sf_dir] [n_merges ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ns = [int(a) for a in args[1:]] or [8, 32, 128]

    import kinesis_iterator_spark.bpe as bpe_mod
    from kinesis_iterator_spark.session import get_spark
    from kinesis_iterator_spark.tables import load_table

    spark = get_spark("bpe_jobs")
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doc.count()  # warm the scan

    gate = bpe_mod.DRIVER_BPE_MAX_WORDS
    for path_name, gate_val in (("driver", gate), ("distributed", -1)):
        bpe_mod.DRIVER_BPE_MAX_WORDS = gate_val
        for n in ns:
            j0, t0 = njobs(), time.perf_counter()
            merges = bpe_mod.bpe_train(spark, doc, n)
            dt, dj = time.perf_counter() - t0, njobs() - j0
            print(
                json.dumps(
                    {
                        "path": path_name,
                        "sf_dir": sf_dir,
                        "n_merges": n,
                        "learned": len(merges),
                        "jobs": dj,
                        "jobs_per_merge": round(dj / max(1, len(merges)), 3),
                        "sec": round(dt, 3),
                    }
                ),
                flush=True,
            )
    bpe_mod.DRIVER_BPE_MAX_WORDS = gate


if __name__ == "__main__":
    main()
