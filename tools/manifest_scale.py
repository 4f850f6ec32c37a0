"""Measure the snapshot-manifest machinery at the generation horizon
SCALING.md budgets (VERDICT r14 #4): drive a synthetic N-generation
data dir (one tiny parquet file + one manifest line per generation,
written driver-side — no Spark needed to create history) through

  - record_snapshot       (one more admit at depth N)
  - snapshot_files(N)     (as-of resolution: manifest parse + file list)
  - prune_snapshots(N/2)  (retention: atomic manifest rewrite)
  - compact_data_snapshots (the single-pass rewrite + its JOB COUNT)

at N = 100 / 1000 / 10000 and print one JSON line per scale. Every
driver-side op must scale ~linearly in manifest bytes (a superlinear
jump flags an O(n^2) parse); compaction must stay O(few) Spark jobs at
every N (the r14 pin, re-pinned at 10^4 here and in
tests/test_compaction.py).

Usage: python tools/manifest_scale.py [N ...]   (default: 100 1000 10000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from kinesis_iterator_spark import incremental


def build_history(d: str, n_gens: int) -> float:
    """N generations, one 2-row file each, manifest appended directly
    (the writer's record_snapshot is measured separately — building
    through it would be O(n^2) by construction and measure nothing)."""
    os.makedirs(d)
    t0 = time.perf_counter()
    lines = []
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    for g in range(n_gens):
        name = f"part-{g:06d}-{uuid.uuid4().hex[:8]}.parquet"
        tbl = pa.table(
            {"doc_id": [2 * g, 2 * g + 1], "text": [f"a{g}", f"b{g}"]},
            schema=schema,
        )
        pq.write_table(tbl, os.path.join(d, name))
        lines.append(json.dumps({"files": [name], "n": 2}))
    with open(incremental._snapshot_path(d), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return time.perf_counter() - t0


def measure(spark, n_gens: int) -> dict:
    root = tempfile.mkdtemp(prefix="ki_manifest_scale_")
    d = os.path.join(root, "data")
    out: dict = {"n_gens": n_gens}
    try:
        out["build_s"] = round(build_history(d, n_gens), 3)

        # One more admit at depth N (manifest read + dir walk + append).
        name = f"part-extra-{uuid.uuid4().hex[:8]}.parquet"
        pq.write_table(
            pa.table({"doc_id": [10**9], "text": ["x"]}), os.path.join(d, name)
        )
        t0 = time.perf_counter()
        g = incremental.record_snapshot(d, n=1)
        out["record_snapshot_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        assert g == n_gens + 1

        t0 = time.perf_counter()
        files = incremental.snapshot_files(d, n_gens)
        out["snapshot_files_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        assert len(files) == n_gens

        t0 = time.perf_counter()
        assert incremental.prune_snapshots(d, n_gens // 2)
        out["prune_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        assert len(incremental.snapshot_files(d, n_gens)) == n_gens

        tracker = spark.sparkContext.statusTracker()
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        stats = incremental.compact_data_snapshots(spark, d, ("doc_id",))
        out["compact_s"] = round(time.perf_counter() - t0, 2)
        out["compact_jobs"] = len(tracker.getJobIdsForGroup(None)) - j0
        out["files_before"] = stats["files_before"]
        out["files_after"] = stats["files_after"]

        # Post-compaction resolution cost (same manifest depth).
        t0 = time.perf_counter()
        incremental.snapshot_files(d, n_gens)
        out["snapshot_files_after_compact_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1
        )

        # Vacuum at depth (VERDICT r15 #2): fresh N-generation history,
        # byte reclamation at horizon N/2 — the post-horizon half is the
        # hardlink carry-over (the rename-bound op), the pre-horizon
        # half collapses into the rewritten base.
        d2 = os.path.join(root, "data_vac")
        build_history(d2, n_gens)
        t0 = time.perf_counter()
        v = incremental.vacuum_data_snapshots(
            spark, d2, n_gens // 2, ("doc_id",)
        )
        out["vacuum_s"] = round(time.perf_counter() - t0, 2)
        out["vacuum_files_before"] = v["files_before"]
        out["vacuum_files_after"] = v["files_after"]
        out["vacuum_bytes_pct"] = round(
            100.0 * v["bytes_after"] / max(1, v["bytes_before"]), 1
        )
        # Repeat at the same horizon: the no-op path must stay cheap.
        t0 = time.perf_counter()
        again = incremental.vacuum_data_snapshots(
            spark, d2, n_gens // 2, ("doc_id",)
        )
        assert again["vacuumed"] is False
        out["vacuum_noop_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

        # Export at depth (r16): publish the head generation of the
        # full-history dir — the carry is one hardlink per file
        # (`_carry_map`, threaded), zero Spark jobs.
        t0 = time.perf_counter()
        ex = incremental.export_snapshot(
            d, n_gens + 1, os.path.join(root, "export")
        )
        out["export_s"] = round(time.perf_counter() - t0, 2)
        out["export_files"] = ex["files"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [100, 1000, 10000]
    from kinesis_iterator_spark.session import get_spark

    spark = get_spark()
    for n in scales:
        print(json.dumps(measure(spark, n)), flush=True)


if __name__ == "__main__":
    main()
