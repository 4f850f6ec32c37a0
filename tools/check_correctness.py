"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given SF, compare
row count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def canon(val):
    """Canonicalize a cell for cross-engine comparison.

    The DuckDB side arrives via ``.df()`` (pandas), mirroring the driver's
    canonicalizer — so numpy scalars / pd.Timestamp show up here and must
    canonicalize exactly like their Python counterparts.  Crucially we do NOT
    unify int and float: a DuckDB HUGEINT that pandas coerces to float64 must
    MISMATCH a Spark bigint, because that is what the driver's hash does
    (VERDICT r2: events_sessionize_30m).
    """
    import datetime
    import decimal

    import numpy as np

    if val is None:
        return "NULL"
    # NaN unifies with NULL: pandas represents NULL-in-float64 as NaN, and
    # the driver's r2 run passed queries whose only difference was Spark
    # None vs oracle-pandas NaN (join_asof, window_lag_lead) — so the
    # driver's canonicalizer unifies them and this replica must too.
    if isinstance(val, float) and math.isnan(val):
        return "NULL"
    try:
        import pandas as pd

        if val is pd.NaT:
            return "NULL"
        if isinstance(val, pd.Timestamp):
            val = val.to_pydatetime()
    except ImportError:
        pass
    if isinstance(val, (bool, np.bool_)):
        return f"b:{bool(val)}"
    if isinstance(val, np.integer):
        return f"i:{int(val)}"
    if isinstance(val, np.floating):
        val = float(val)
        if math.isnan(val):
            return "NULL"
        return f"f:{val!r}"
    if isinstance(val, decimal.Decimal):
        return f"d:{val.normalize()}"
    if isinstance(val, float):
        if math.isnan(val):
            return "f:nan"
        return f"f:{val!r}"
    if isinstance(val, int):
        return f"i:{val}"
    if isinstance(val, datetime.datetime):
        # DATE unifies with midnight TIMESTAMP: DuckDB DATE columns become
        # pandas datetime64 (midnight) while Spark returns datetime.date;
        # the driver's r2 run passed fn_date_suite with exactly that skew,
        # so canonicalize midnight datetimes to their date part.
        if (val.hour, val.minute, val.second, val.microsecond) == (0, 0, 0, 0):
            return f"t:{val.date().isoformat()}"
        return f"t:{val.isoformat()}"
    if isinstance(val, datetime.date):
        return f"t:{val.isoformat()}"
    if isinstance(val, (bytes, bytearray)):
        return f"x:{val.hex()}"
    if isinstance(val, list):
        return "l:[" + ",".join(canon(v) for v in val) + "]"
    return f"s:{val}"


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from kinesis_iterator_spark.queries import release_persists
    from kinesis_iterator_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("correctness-check")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # toPandas(), NOT collect(): the driver canonicalizes BOTH sides
            # via pandas (r2 evidence: join_asof's int-with-NULL column — a
            # float64 under pandas on either engine — was green on the
            # driver, while sessionize's int-vs-HUGEINT, which only skews on
            # the DuckDB side, was red).
            srows = list(sdf.toPandas().itertuples(index=False, name=None))
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        finally:
            # Builders persist multi-consumer intermediates; release them
            # after materialization so a 50-query gate run doesn't pin
            # cached partitions for the whole session.
            release_persists()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            # .df() (pandas), NOT fetchall(): the driver canonicalizes via
            # pandas, so type coercions (HUGEINT->float64, datetime64 units)
            # must be reproduced here or the gate green-lights driver-red
            # queries (this exact gap hid the r2 sessionize failure).
            ddf = con.execute(oracles[name]).df()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            if sm != dm:
                diff = [
                    (a, b) for a, b in zip(sm, dm) if a != b
                ][:3]
                sonly = [r for r in sm if r not in set(dm)][:2]
                donly = [r for r in dm if r not in set(sm)][:2]
                problems.append(f"values diff e.g. {diff or (sonly, donly)}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)[:600]}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(
        f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail"
        + (f": {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
