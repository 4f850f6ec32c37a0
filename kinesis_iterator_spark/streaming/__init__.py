"""Reference-parity stream consumption (SURVEY.md §2.A, §7 phase 3).

The reference (`luanruisong/kinesis_iterator`) is a checkpointed,
reshard-aware, at-least-once Kinesis consumer. This package re-expresses
those semantics Spark-first:

- ``records``  — the Kinesis record model as a DataFrame schema
  (mirrors ``types.Record`` used at kinesis.go:34,193).
- ``source``   — a simulated sharded stream over the ``events`` fixture
  (shard discovery A1, cursor init A2, bounded fetch A3, cursor advance A4,
  closed-shard detection A9, reshard A13).
- ``sequence`` — the ``SequenceSaver`` offset store (sequence.go:20-24)
  with the reference's semantics minus its bugs (SURVEY.md §7).
- ``iterator`` — the user-facing ``Iterator`` API (Handle/Run/Shutdown,
  kinesis.go:34,143-154,221-236) with batch-granular post-handler
  checkpointing (at-least-once, kinesis.go:198-202) and the
  log-and-continue per-record error policy (kinesis.go:193-197).
- ``datasource`` — the same stream as a REAL PySpark streaming
  DataSource (``sim_kinesis``): Structured Streaming owns the trigger,
  offset WAL (= the checkpoint) and recovery; exactly-once offset
  tracking via the query's checkpointLocation.
"""

from .datasource import SimKinesisDataSource  # noqa: F401
from .datasource import register as register_sim_kinesis  # noqa: F401
from .datasource import remove_under_drain_guard  # noqa: F401
from .iterator import Iterator, Logger  # noqa: F401
from .option import Option, new_iterator  # noqa: F401
from .sequence import InMemorySaver, JsonFileSaver, Sequence  # noqa: F401
from .sink import ParquetEpochSink  # noqa: F401
from .source import SimulatedShardedSource  # noqa: F401
