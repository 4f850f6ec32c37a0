"""True multi-process fuzz of the manifest/lease/staged-swap contracts
(VERDICT r14 #6): real OS processes — not threads — hammer unlocked
reads (heal + as-of resolution + footer reads + a row-count invariant)
against a writer process interleaving admits, compactions, retention
prunes and a vacuum on one data dir. Pins: no torn reads (every
successful resolution's row count equals the manifest's recorded
deltas), swap races surface only as retriable FileNotFoundError, the
reader's unlocked heal never breaks the writer's in-flight swap (the
r15 roll-forward tolerance), loud LeaseHeld refusals during a held
window, and no lost generations at the end."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import uuid
import pytest

import pyarrow as pa
import pyarrow.parquet as pq

from kinesis_iterator_spark import incremental

ROWS_PER_GEN = 34

_READER = r'''
import json, os, sys
sys.path.insert(0, %(repo)r)
import pyarrow.parquet as pq
from kinesis_iterator_spark import incremental

data_dir, stop_path, hold_path, out_path = sys.argv[1:5]
lease_dir = data_dir + ".family"
stats = {"reads": 0, "retries": 0, "lease_held": 0}
err = None
try:
    while not os.path.exists(stop_path):
        try:
            # Unlocked read path: heal (must not destroy a foreign
            # in-flight stage / may roll a mid-swap forward), resolve
            # the latest generation, read footers, check the row-count
            # invariant against the manifest's recorded deltas.
            incremental.recover_data_dir(data_dir)
            recs = incremental._read_snapshots(data_dir)
            if recs:
                g = len(recs)
                paths = incremental.snapshot_files(data_dir, g)
                n = sum(
                    pq.ParquetFile(p).metadata.num_rows for p in paths
                )
                want = sum(r["n"] for r in recs if r["n"] is not None)
                assert n == want, f"torn read: {n} != {want} at gen {g}"
                stats["reads"] += 1
        except FileNotFoundError:
            stats["retries"] += 1  # swap race: stale file list — retry
        except ValueError as e:
            # "records no admission snapshots": the whole dir (manifest
            # included) is renamed away inside the swap window — same
            # retriable race class as a stale file list.
            if "no data files" in str(e) or "no admission snapshots" in str(e):
                stats["retries"] += 1
            else:
                raise
        if os.path.exists(hold_path):
            # The writer is deliberately holding its lease: a second
            # writer arriving now MUST be refused loudly.
            try:
                incremental.acquire_lease(lease_dir, "reader-probe", 30.0)
                err = "acquire_lease succeeded during a held window"
                break
            except incremental.LeaseHeld:
                stats["lease_held"] += 1
except Exception as e:  # noqa: BLE001 - reported to the test
    err = f"{type(e).__name__}: {e}"
with open(out_path, "w") as fh:
    json.dump({"stats": stats, "err": err}, fh)
'''


_WRITER2 = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from kinesis_iterator_spark import incremental

data_dir, stop_path, out_path, vac_marker = sys.argv[1:5]
lease_dir = data_dir + ".family"
stats = {
    "acquired": 0, "pruned": 0, "lease_held": 0,
    "vacuum_runs": 0, "vacuum_refused": 0,
}
err = None
spark = None
try:
    # Own Spark session (VERDICT r15 #7: vacuum is the one lease-held
    # op the cross-process fuzz didn't exercise under contention; it
    # needs a JVM for the base rewrite). Started up-front so the spinup
    # overlaps the main writer's cycles.
    from kinesis_iterator_spark.session import get_spark
    spark = get_spark("fuzz-writer2", cpus=2)
    while not os.path.exists(stop_path):
        try:
            gen = incremental.acquire_lease(lease_dir, "writer2", 30.0)
        except incremental.LeaseHeld:
            stats["lease_held"] += 1
            time.sleep(0.02)
            continue
        try:
            stats["acquired"] += 1
            # Real maintenance ops from a SECOND writer process, under
            # the lease: retention prune (driver-side) and byte
            # reclamation (staged swap + Spark rewrite) while unlocked
            # readers hammer the dir.
            gens = incremental.snapshot_gens(data_dir)
            if gens >= 2:
                # Prune at the HEAD horizon: deterministic -- any turn
                # taken after new admits collapses something, so the
                # "second writer pruned under contention" pin no longer
                # depends on beating the main writer's fixed cycle-3
                # prune to horizon 2 (writer2's cold JVM reliably LOST
                # that race when a warm suite session let the main
                # writer sprint -- order-dependent flake).
                if incremental.prune_snapshots(data_dir, gens):
                    stats["pruned"] += 1
                for h in range(2, gens + 1):
                    try:
                        incremental.vacuum_data_snapshots(
                            spark, data_dir, h, ("doc_id",),
                            fence=(lease_dir, "writer2", gen),
                        )
                        stats["vacuum_runs"] += 1
                        open(vac_marker, "w").close()
                        break
                    except ValueError as e:
                        # A base collapsed below an earlier horizon (or
                        # a racing prune deepened it) refuses loudly --
                        # try the next servable generation.
                        if "collapsed" in str(e) or "out of range" in str(e):
                            stats["vacuum_refused"] += 1
                            continue
                        raise
        finally:
            incremental.release_lease(lease_dir, "writer2")
        time.sleep(0.05)
except Exception as e:  # noqa: BLE001 - reported to the test
    err = f"{type(e).__name__}: {e}"
finally:
    if spark is not None:
        try:
            spark.stop()
        except Exception:
            pass
with open(out_path, "w") as fh:
    json.dump({"stats": stats, "err": err}, fh)
'''


def _append_gen(d: str, gen_no: int) -> None:
    for i in range(2):
        pq.write_table(
            pa.table({"doc_id": list(range(ROWS_PER_GEN // 2))}),
            os.path.join(
                d, f"part-{gen_no:04d}-{i}-{uuid.uuid4().hex[:8]}.parquet"
            ),
        )
    incremental.record_snapshot(d, n=ROWS_PER_GEN)


@pytest.mark.slow
def test_multiprocess_readers_race_maintenance(spark, tmp_path):
    d = str(tmp_path / "data")
    os.makedirs(d)
    lease_dir = d + ".family"
    stop = str(tmp_path / "stop")
    hold = str(tmp_path / "hold")
    script = str(tmp_path / "reader.py")
    with open(script, "w") as fh:
        fh.write(
            _READER
            % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
        )
    w2_script = str(tmp_path / "writer2.py")
    with open(w2_script, "w") as fh:
        fh.write(
            _WRITER2
            % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
        )
    w2_out = str(tmp_path / "writer2.json")
    vac_marker = str(tmp_path / "vacuumed")
    outs = [str(tmp_path / f"reader{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen([sys.executable, script, d, stop, hold, o])
        for o in outs
    ]
    procs.append(
        subprocess.Popen(
            [sys.executable, w2_script, d, stop, w2_out, vac_marker]
        )
    )

    def _acquire_retry() -> int:
        # A SECOND writer process competes for the same lease: the main
        # writer must see clean LeaseHeld refusals and win eventually.
        # (Generous bound: writer2 may hold the lease for a multi-second
        # vacuum rewrite.)
        for _ in range(3000):
            try:
                return incremental.acquire_lease(lease_dir, "writer", 30.0)
            except incremental.LeaseHeld:
                time.sleep(0.02)
        raise AssertionError("main writer starved by writer2")

    try:
        n_cycles = 6
        for cycle in range(n_cycles):
            gen = _acquire_retry()
            try:
                _append_gen(d, cycle + 1)
                if cycle % 2 == 1:
                    incremental.compact_data_snapshots(
                        spark, d, ("doc_id",),
                        fence=(lease_dir, "writer", gen),
                    )
                if cycle == 3:
                    incremental.prune_snapshots(d, 2)
                if cycle == 4:
                    # writer2 may have pruned DEEPER than 3 by now (it
                    # prunes at the head) -- vacuum at the first
                    # servable generation, exactly as the refusal
                    # message instructs a real operator to.
                    for h in range(3, incremental.snapshot_gens(d) + 1):
                        try:
                            incremental.vacuum_data_snapshots(
                                spark, d, h, ("doc_id",),
                                fence=(lease_dir, "writer", gen),
                            )
                            break
                        except ValueError as e:
                            if "collapsed" not in str(e):
                                raise
            finally:
                incremental.release_lease(lease_dir, "writer")
            # A fair window between cycles so writer2 (polling every
            # 20 ms) actually gets turns — a real ingestion loop has
            # idle gaps; back-to-back reacquire would starve it.
            time.sleep(0.15)
        # Deliberate held window: readers must see LeaseHeld.
        _acquire_retry()
        open(hold, "w").close()
        time.sleep(1.5)
        os.remove(hold)
        incremental.release_lease(lease_dir, "writer")
        # Keep the system live (leases free, readers racing) until the
        # competing writer completes at least one VACUUM under
        # contention — its Spark session spins up concurrently with the
        # cycles above, so this usually costs only a few seconds.
        deadline = time.time() + 120
        while time.time() < deadline and not os.path.exists(vac_marker):
            time.sleep(0.2)
    finally:
        open(stop, "w").close()
        for p in procs:
            p.wait(timeout=60)
    for o in outs:
        with open(o) as fh:
            rep = json.load(fh)
        assert rep["err"] is None, rep
        assert rep["stats"]["reads"] > 0, rep
        assert rep["stats"]["lease_held"] > 0, rep
    with open(w2_out) as fh:
        rep2 = json.load(fh)
    assert rep2["err"] is None, rep2
    assert rep2["stats"]["acquired"] > 0, rep2  # second writer got turns
    assert rep2["stats"]["pruned"] >= 1, rep2
    assert rep2["stats"]["vacuum_runs"] >= 1, rep2  # vacuum under contention
    # No lost generations; final content matches every recorded admit.
    assert incremental.snapshot_gens(d) == 6
    assert (
        incremental.snapshot_read(spark, d, 6).count()
        == 6 * ROWS_PER_GEN
    )
    with __import__("pytest").raises(ValueError, match="horizon"):
        incremental.snapshot_files(d, 1)
