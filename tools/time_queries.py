"""Interleaved min-of-N query timer (CLAUDE.md perf protocol).

The sandbox host has intermittent noisy-neighbor stalls (same query can
run 5-10x slower for minutes), so single-run comparisons are
meaningless. This tool warms every named query once (untimed), then
times R interleaved rounds (q1, q2, ..., q1, q2, ...) and reports the
per-query MINIMUM — the only stable statistic on this host.

Usage:
    python tools/time_queries.py SF_DIR query1 [query2 ...] [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_rounds(value: str) -> int:
    try:
        rounds = int(value)
    except ValueError:
        sys.exit(f"--rounds must be an integer, got {value!r}")
    if rounds < 1:
        sys.exit(f"--rounds must be >= 1, got {rounds}")
    return rounds


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    rounds = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--rounds="):
            rounds = _parse_rounds(a.split("=", 1)[1])
        elif a == "--rounds":
            i += 1
            if i >= len(argv):
                sys.exit("--rounds requires a value")
            rounds = _parse_rounds(argv[i])
        elif a.startswith("--"):
            sys.exit(f"unknown option {a!r}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if len(args) < 2:
        sys.exit(f"need SF_DIR and at least one query name\n{__doc__}")
    sf_dir, names = args[0], args[1:]

    from pyspark.sql import SparkSession

    from kinesis_iterator_spark import queries
    from kinesis_iterator_spark.queries import QUERIES, release_persists

    queries.load_all()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; known: {sorted(QUERIES)}")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_persists()
        return dt

    for name in names:  # warm pass, untimed
        run(name)
    mins: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            dt = run(name)
            mins[name].append(dt)
            print(f"round {r + 1} {name}: {dt:.3f}s", flush=True)
    print("---")
    for name in names:
        print(
            f"{name}: min={min(mins[name]):.3f}s  all="
            f"{[round(x, 3) for x in mins[name]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
