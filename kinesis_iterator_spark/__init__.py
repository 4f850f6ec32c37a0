"""kinesis_iterator_spark — a PySpark-native engine with the capabilities of
``luanruisong/kinesis_iterator`` (a checkpointed, reshard-aware AWS Kinesis
consumer; see /root/reference and SURVEY.md), extended with the relational /
LLM-data-pipeline operator surface mandated by the build contract.

Layout
------
- ``session``   : SparkSession construction (AQE, UTC, arrow).
- ``tables``    : fixture-table loading / view registration.
- ``streaming`` : reference-parity stream consumption — simulated sharded
  source, ``SequenceSaver``-style offset store, ``Iterator`` handler API
  (mirrors kinesis.go / sequence.go semantics, Spark-first).
- ``queries``   : the registered operator library — every entry has a
  ``(spark, sf_dir) -> DataFrame`` builder and (where SQL-expressible) a
  DuckDB oracle SQL string.
- ``pipeline``  : end-to-end corpus curation (optional PII scrub +
  paragraph dedup → gates → dedup → survivor pruning → sharded write),
  ``CorpusWriter`` batch admission, ``EmbeddingWriter`` vector
  admission over the stored ANN index, and the data-recipe tail
  (``build_mixture`` / ``pack_sequences``).
- ``incremental``: persisted dedup index (digests + LSH bands +
  paragraph digests) for admitting new batches at batch-bounded cost,
  plus the embedding-side ``embedding_dedup_against_index``.
"""

__version__ = "0.2.0"

from .streaming import (  # noqa: F401,E402
    InMemorySaver,
    Iterator,
    JsonFileSaver,
    Logger,
    Option,
    Sequence,
    SimulatedShardedSource,
    new_iterator,
)
