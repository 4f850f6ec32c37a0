"""Fixture-table access (see FIXTURES.md / TESTDATA.md).

All queries go through :func:`load_table` so that scans stay plain
``spark.read.parquet`` — Catalyst then owns predicate pushdown, column
pruning and partition planning. Never materialize here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are fixed-size; supplier/part/customer grow with SF, so only the
# truly fixed ones are always-broadcast).
ALWAYS_BROADCAST = {"region", "nation"}

# Pinned fixture schemas (r17, guide §1/§5): every bare
# `spark.read.parquet` runs a distributed footer-read job for schema
# inference, and load_table sits inside the timed region of every
# bench entry (1-3 calls per query build). The fixtures are
# deterministic test data with identical schemas at every scale factor
# (verified sf0.001/0.01/0.1; pinned per-SF in
# tests/test_layer_schemas.py), so the read passes the schema and the
# job disappears. `events` is NOT here: its TIMESTAMP(NANOS) column's
# read shape is version-dependent and the loader's normalization must
# see what the reader actually surfaced (the round-5 lesson).
FIXTURE_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": (
        "s_suppkey bigint, s_name string, s_nationkey int, "
        "s_acctbal double"
    ),
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


# (sf_dir, table) pairs whose parquet footer has been checked against
# FIXTURE_SCHEMAS this process — the guard below runs once per pair.
_VERIFIED_FIXTURES: set[tuple[str, str]] = set()


def _arrow_ddl(t) -> str:
    """A pyarrow DataType rendered as the Spark DDL type name used in
    FIXTURE_SCHEMAS (only the types the fixtures actually use)."""
    import pyarrow as pa

    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp_ntz" if t.tz is None else "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_ddl(t.value_type)}>"
    return str(t)


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    """'a int, b array<float>' → [('a','int'), ('b','array<float>')].
    Depth-aware on <> so nested generics never split; pure Python, no
    py4j."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(ddl + ","):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            col, typ = ddl[start:i].strip().split(" ", 1)
            fields.append((col, typ.strip()))
            start = i + 1
    return fields


def _assert_fixture_schema(sf_dir: str, name: str, path: str) -> None:
    """Fail LOUDLY if the fixture file's footer schema drifted from the
    pinned FIXTURE_SCHEMAS entry (r18, VERDICT r17 #3): an explicit
    read schema makes Spark null-fill missing columns silently, so a
    future fixture drop with a renamed/retyped column would otherwise
    read as nulls instead of an error. One driver-side pyarrow footer
    read per (process, sf_dir, table) — zero Spark jobs."""
    key = (sf_dir, name)
    if key in _VERIFIED_FIXTURES:
        return
    import pyarrow.parquet as pq

    actual = [
        (f.name, _arrow_ddl(f.type))
        for f in pq.ParquetFile(path).schema_arrow
    ]
    pinned = _split_ddl(FIXTURE_SCHEMAS[name])
    if actual != pinned:
        raise ValueError(
            f"fixture {path} footer schema {actual} does not match the "
            f"pinned FIXTURE_SCHEMAS[{name!r}] {pinned} — update the pin "
            "(and tests/test_layer_schemas.py) rather than reading "
            "null-filled columns"
        )
    _VERIFIED_FIXTURES.add(key)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces it
        # depends on version: older readers reject it unless
        # nanosAsLong gives us int64 nanos (floor-divide to µs below);
        # pyspark 4.1+ reads it natively as TIMESTAMP_NTZ truncated to µs
        # and ignores the legacy conf. Normalize BOTH shapes to a plain
        # session-tz TIMESTAMP so every downstream query (unix_micros,
        # window, interval arithmetic) sees one type. The fixture carries
        # sub-µs residue — both truncation paths floor to µs exactly as
        # DuckDB does reading TIMESTAMP(NANOS) (oracle-verified), and the
        # NTZ→TIMESTAMP cast is wall-clock-preserving (UTC session tz).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            # Spark raises on SETTING a removed SQL conf. 4.1 already
            # ignores this one (native NANOS→NTZ read); the dtype
            # normalization below handles every read shape, so a future
            # removal must not break the loader (the round-5 lesson:
            # version drift lands here first).
            pass
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    path = os.path.join(sf_dir, f"{name}.parquet")
    _assert_fixture_schema(sf_dir, name, path)
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
