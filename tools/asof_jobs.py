"""Jobs-per-phase instrumentation for `asof_serving_suite` (VERDICT r17
#3): statusTracker job-id deltas around each phase of the suite's build
+ serve + checkpoint + vacuum flow, same method as tools/admit_jobs.py.
The suite is job-count-dominated at fixture scale, so this count IS the
latency budget.

Usage:
    python tools/asof_jobs.py [sf_dir]    # default sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.queries import retrieval as R
    from kinesis_iterator_spark.session import get_spark

    spark = get_spark("asof_jobs")
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None))

    # Warm pass: JIT/codegen/worker spinup out of the measurement.
    R.asof_serving_suite(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persists()

    phases: list[tuple[str, int, float]] = []

    def probe(name, fn, *a, **k):
        j0, t0 = njobs(), time.perf_counter()
        out = fn(*a, **k)
        phases.append((name, njobs() - j0, time.perf_counter() - t0))
        return out

    # Instrument the suite's internals by patching the module fns.
    reals = {}

    def patch(mod, attr, label=None):
        real = getattr(mod, attr)
        reals[(mod, attr)] = real

        def wrapped(*a, **k):
            return probe(label or attr, real, *a, **k)

        setattr(mod, attr, wrapped)

    from kinesis_iterator_spark import incremental as I

    # Serialize _concurrently so per-phase job deltas don't interleave
    # (job COUNTS are invariant to the overlap; wall times here are NOT
    # the production times — use bench.py for those).
    def _serial(*thunks):
        return [t() for t in thunks]

    I._concurrently = _serial

    patch(R, "_asof_suite_index")
    patch(R, "_asof_dedup_index")
    patch(R, "_asof_drift_layer")
    patch(R, "bm25_topk_from_index")
    patch(I, "dedup_against_index")
    patch(I, "prune_snapshots")
    patch(I, "vacuum_data_snapshots")

    j0, t0 = njobs(), time.perf_counter()
    df = R.asof_serving_suite(spark, sf_dir)
    j_build = njobs() - j0
    t_build = time.perf_counter() - t0
    j1 = njobs()
    df.write.format("noop").mode("overwrite").save()
    j_final = njobs() - j1
    t_total = time.perf_counter() - t0
    release_persists()

    print(f"{'phase':<28}{'jobs':>6}{'sec':>9}")
    for name, j, dt in phases:
        print(f"{name:<28}{j:>6}{dt:>9.2f}")
    print(f"{'BUILD total (entry call)':<28}{j_build:>6}{t_build:>9.2f}")
    print(f"{'final noop action':<28}{j_final:>6}")
    print(f"END-TO-END jobs={j_build + j_final} sec={t_total:.2f}")


if __name__ == "__main__":
    main()
