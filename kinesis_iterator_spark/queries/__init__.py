"""Operator/query registry.

Every implemented operator from SURVEY.md §2 registers here via the
:func:`query` decorator with a ``(spark, sf_dir) -> DataFrame`` builder and,
where ANSI-SQL-expressible, the equivalent DuckDB oracle SQL string. The
driver (``__spark_entry__.py``) exposes these dicts verbatim.

Determinism contract with the oracle (order-insensitive value hash):
- Alias EVERY computed column identically in Spark and SQL.
- Multi-row accumulations over doubles (SUM/AVG) are order-dependent in IEEE
  arithmetic, so money-like aggregates are computed over ``decimal`` casts
  (exact, identical in both engines); ratio aggregates are expressed as
  exact-decimal-sum / count so the final double division is bit-identical.
- Per-row double expressions are IEEE-deterministic and need no rounding.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# DataFrames persisted by query builders (multi-consumer intermediates).
# Query fns return LAZY DataFrames, so a builder can't unpersist before
# its caller materializes the result — instead it registers the persist
# here and the harness (bench.py / tools/check_correctness.py / tests)
# calls release_persists() after each materialization. Without this, a
# 50-query gate run accumulates cached partitions for the session
# lifetime (LRU eviction saves correctness but can evict hotter caches).
_PERSISTED: list[DataFrame] = []


def managed_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for post-materialization release."""
    _PERSISTED.append(df.persist())
    return df


def release_persists() -> None:
    """Unpersist (non-blocking) every DataFrame a query builder persisted
    since the last call. Safe to call any time after the consuming action."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=False)


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-storage copy behind an eager ``localCheckpoint``.

    ``df.unpersist()`` / ``df.rdd.unpersist()`` do NOT touch it (measured:
    the persisted RDD is the one captured inside the LogicalRDD leaf, not
    the conversion RDD PySpark exposes) — only the internal
    ``analyzed().rdd()`` handle does. Only call this once ``df`` will
    never be read again: a localCheckpoint's blocks are its ONLY copy
    (the lineage was truncated), so a released checkpoint cannot be
    recomputed."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover — internal accessor, best-effort
        pass


class _LocalCheckpointHandle:
    """Duck-typed `.unpersist()` shim so localCheckpointed DataFrames can
    ride the managed-persist release mechanism."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        release_local_checkpoint(self._df)


def managed_checkpoint(df: DataFrame) -> DataFrame:
    """Register an eagerly-localCheckpointed ``df``'s block storage for
    post-materialization release — the checkpoint analogue of
    :func:`managed_persist` (same harness contract: released by
    ``release_persists()`` after the consuming action)."""
    _PERSISTED.append(_LocalCheckpointHandle(df))
    return df

# NOTE: registration order is not exactly this tuple — `dedup` imports
# `similarity` at module top, so similarity's queries register first when
# dedup loads (and `text` imports `dedup`). Harmless while the registry
# holds exactly 50 entries (the driver checks the first 50); do not rely
# on _MODULES order for the checked window.
_MODULES = (
    "relational",
    "functions",
    "analytic",
    "stream_batch",
    "dedup",
    "graph",
    "similarity",
    "quantization",
    "retrieval",
    "text",
    "multimodal",
    "stream_parity",
    "curation",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible ops (driver then does a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run (idempotent)."""
    for mod in _MODULES:
        import_module(f"{__name__}.{mod}")
