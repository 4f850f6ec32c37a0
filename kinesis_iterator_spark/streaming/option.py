"""Config surface — parity with the reference's ``Option`` builder
(option.go:10-43, A17).

The reference collects region / STS-profile / stream-name through a fluent
builder and turns them into an ``aws.Config`` (``GetConfig``,
option.go:27-43, with the shared-profile "sts" branch at :39-41). This
sandbox has no AWS, so the same surface configures the simulated sharded
source instead: ``region`` and ``sts`` are carried verbatim (a real
deployment would hand them to a Kinesis DSv2 connector's options map),
``stream_name`` / shard count / fixture dir parameterize the source, and
``get_config`` returns the flat options dict — exactly what a Spark
source's ``.options(**cfg)`` consumes.

Usage (mirrors option.go + kinesis.go:54-56)::

    opt = (Option()
           .with_region("us-east-1")
           .with_sts()                  # shared-profile "sts" branch
           .with_stream_name("events")
           .with_shards(8)
           .with_sf_dir("/root/testdata/sf0.001"))
    it = new_iterator(spark, opt)       # ≙ NewIterator(opt)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .iterator import Iterator
from .source import SimulatedShardedSource


class Option:
    """Fluent config builder (option.go:10-25)."""

    def __init__(self) -> None:
        self.region: str | None = None
        self.sts: bool = False
        self.stream_name: str = "events"
        self.n_shards: int = 8
        self.sf_dir: str | None = None

    def with_region(self, region: str) -> "Option":
        """option.go:15-18 ``WithRegion``."""
        self.region = region
        return self

    def with_sts(self, enabled: bool = True) -> "Option":
        """option.go:20-23 ``WithSts`` — credentials come from the shared
        profile named "sts" in the reference (option.go:39-41); recorded
        here for connector-option parity."""
        self.sts = enabled
        return self

    def with_stream_name(self, name: str) -> "Option":
        """option.go:25-28 ``WithStreamName``."""
        self.stream_name = name
        return self

    def with_shards(self, n: int) -> "Option":
        """Sandbox extension: shard count of the simulated stream."""
        self.n_shards = n
        return self

    def with_sf_dir(self, sf_dir: str) -> "Option":
        """Sandbox extension: fixture directory backing the stream."""
        self.sf_dir = sf_dir
        return self

    def get_config(self) -> dict[str, str]:
        """``GetConfig`` (option.go:27-43): the flat connector options map
        a real Kinesis source would receive."""
        cfg = {"streamName": self.stream_name}
        if self.region:
            cfg["region"] = self.region
        if self.sts:
            cfg["credentialsProfile"] = "sts"
        return cfg

    def build_source(self, spark: SparkSession) -> SimulatedShardedSource:
        if self.sf_dir is None:
            raise ValueError("Option.with_sf_dir(...) is required (no AWS here)")
        return SimulatedShardedSource(
            spark,
            self.sf_dir,
            stream_name=self.stream_name,
            n_shards=self.n_shards,
        )

    def read_stream(self, spark: SparkSession, limit: int = 0, available_now: bool = False):
        """The same options as a Structured Streaming reader: registers
        the ``sim_kinesis`` DataSource and returns the configured
        streaming DataFrame (offsets in the query's checkpoint WAL).
        ``limit`` > 0 bounds per-trigger admission (GetRecords page
        bound). A real deployment would swap the format name for a
        Kinesis connector and pass ``get_config()`` verbatim.

        TRIGGER / LIMIT INTERACTION: Spark's ``Trigger.AvailableNow``
        cannot drive Python DataSources — it falls back to ONE unbounded
        batch, which with ``limit`` > 0 would stop after a single page and
        silently under-drain. For a bounded complete drain pass
        ``available_now=True`` here, use a ``processingTime`` trigger, and
        stop via ``datasource.await_drained(query, sf_dir, n_shards)``;
        use Spark's availableNow trigger only with ``limit=0``."""
        if self.sf_dir is None:
            raise ValueError("Option.with_sf_dir(...) is required (no AWS here)")
        from .datasource import FORMAT_NAME, register

        register(spark)
        reader = (
            spark.readStream.format(FORMAT_NAME)
            .option("path", self.sf_dir)
            .option("n_shards", self.n_shards)
            .option("stream_name", self.stream_name)
        )
        if limit > 0:
            reader = reader.option("limit", limit)
        if available_now:
            reader = reader.option("available_now", "true")
        return reader.load()


def new_iterator(spark: SparkSession, opt: Option) -> Iterator:
    """``NewIterator`` (kinesis.go:54-56): build the consumer from options."""
    return Iterator(opt.build_source(spark))
