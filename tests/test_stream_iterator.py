"""Reference-parity semantics tests (SURVEY.md §5.2.2) — each test pins a
cited behavior of the reference (file:line in the docstrings)."""

from __future__ import annotations

import pytest

from kinesis_iterator_spark.streaming import (
    InMemorySaver,
    Iterator,
    Sequence,
    SimulatedShardedSource,
)
from kinesis_iterator_spark.streaming.sequence import (
    AFTER_SEQUENCE_NUMBER,
    TRIM_HORIZON,
    FlakySaver,
)

N_EVENTS = 1000  # sf0.001 events rows


def make_source(spark, sf_dir, n_shards=4):
    return SimulatedShardedSource(spark, sf_dir, n_shards=n_shards)


def collect_batches(it: Iterator):
    """Attach a foreach_batch that records (shard, seq) pairs."""
    seen: list[tuple[str, str]] = []

    def fn(df, epoch):
        for r in df.select("shardId", "sequenceNumber").collect():
            seen.append((r["shardId"], r["sequenceNumber"]))

    it.foreach_batch(fn)
    return seen


def test_consume_all_exactly_once_happy_path(spark, sf_dir):
    """Happy path: every record delivered once, none lost (A1-A6)."""
    it = Iterator(make_source(spark, sf_dir)).set_saver(InMemorySaver())
    seen = collect_batches(it)
    total = it.run_until_drained()
    assert total == N_EVENTS
    assert len(seen) == N_EVENTS
    assert len(set(seen)) == N_EVENTS


def test_per_shard_ordering(spark, sf_dir):
    """Records arrive in sequence order within a shard, never across
    (kinesis.go:131-139,193-197; SURVEY §2.A delivery summary)."""
    it = Iterator(make_source(spark, sf_dir)).set_saver(InMemorySaver())
    it.set_fetch_limit(100)
    seen = collect_batches(it)
    it.run_until_drained()
    per_shard: dict[str, list[str]] = {}
    for shard, seq in seen:
        per_shard.setdefault(shard, []).append(seq)
    assert len(per_shard) == 4
    for shard, seqs in per_shard.items():
        assert seqs == sorted(seqs), f"out-of-order delivery in {shard}"


def test_resume_after_checkpoint(spark, sf_dir):
    """A stopped consumer resumes AFTER the saved sequence — no duplicates,
    no gaps (sequence.go:26-36,83-86 / kinesis.go:164-171)."""
    saver = InMemorySaver()
    src = make_source(spark, sf_dir)

    it1 = Iterator(src).set_saver(saver).set_fetch_limit(150)
    seen1 = collect_batches(it1)
    it1._start_shards()
    it1.poll_once()  # one batch of ≤150/shard, checkpointed

    it2 = Iterator(src).set_saver(saver).set_fetch_limit(150)
    seen2 = collect_batches(it2)
    it2.run_until_drained()

    assert len(seen1) + len(seen2) == N_EVENTS
    assert len(set(seen1) | set(seen2)) == N_EVENTS
    assert not (set(seen1) & set(seen2))


def test_at_least_once_crash_mid_batch_replays(spark, sf_dir):
    """Checkpoint is written AFTER handler completion (kinesis.go:198-202):
    a crash between delivery and checkpoint replays the whole batch —
    at-least-once, duplicates allowed, loss not."""
    saver = InMemorySaver()
    src = make_source(spark, sf_dir)

    it1 = Iterator(src).set_saver(saver).set_fetch_limit(100)
    delivered1: list[tuple[str, str]] = []

    boom = RuntimeError("simulated crash before checkpoint")

    def crashing_batch(df, epoch):
        rows = [
            (r["shardId"], r["sequenceNumber"])
            for r in df.select("shardId", "sequenceNumber").collect()
        ]
        delivered1.extend(rows)
        if epoch == 1:  # second trigger: delivered but never checkpointed
            raise boom

    it1.foreach_batch(crashing_batch)
    it1._start_shards()
    with pytest.raises(RuntimeError):
        while True:
            it1.poll_once()

    it2 = Iterator(src).set_saver(saver).set_fetch_limit(100)
    seen2 = collect_batches(it2)
    it2.run_until_drained()

    union = set(delivered1) | set(seen2)
    assert len(union) == N_EVENTS, "at-least-once violated: records lost"
    assert set(delivered1) & set(seen2), "crash batch should be replayed"


def test_handler_error_skips_record_and_continues(spark, sf_dir):
    """Per-record handler error ⇒ log, skip, keep consuming
    (kinesis.go:193-197). The stream is NOT torn down, the checkpoint
    still advances past the failed record, and — unlike the reference —
    the failure lands in the DLQ (executor → driver via the delivery
    action, not a lost closure-side append)."""
    saver = InMemorySaver()
    it = Iterator(make_source(spark, sf_dir)).set_saver(saver)

    def handler(row):
        if row["sequenceNumber"] == "000000000007":
            raise ValueError("poison record")

    it.handle(handler)
    total = it.run_until_drained()
    assert total == N_EVENTS  # all records fetched & offered
    # checkpoints advanced to each shard's tail despite the poison record
    assert len(saver._data) == 4
    assert it.dlq == [("000000000007", "poison record")]


class FlakySource(SimulatedShardedSource):
    """Test double for A11: the first ``fail_n`` fetches raise."""

    def __init__(self, *args, fail_n: int = 0, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.fail_n = fail_n
        self.fetches = 0

    def get_records_all(self, cursors, limit=1000):
        self.fetches += 1
        if self.fetches <= self.fail_n:
            raise OSError(f"simulated GetRecords failure #{self.fetches}")
        return super().get_records_all(cursors, limit)


def test_fetch_error_refreshes_cursor_and_continues(spark, sf_dir):
    """A11 (kinesis.go:184-191): a transient fetch error is logged, the
    shard iterators are re-acquired from the in-memory sequences, and
    consumption continues — nothing lost, the loop does not die."""
    src = FlakySource(spark, sf_dir, n_shards=4, fail_n=2)
    it = Iterator(src).set_saver(InMemorySaver())
    seen = collect_batches(it)
    total = it.run_until_drained()
    assert src.fetches > 2
    assert total == N_EVENTS
    assert len(set(seen)) == N_EVENTS


def test_fetch_error_resumes_after_checkpoint_not_from_scratch(spark, sf_dir):
    """The A11 refresh must resume AFTER the last checkpoint (the
    reference reuses InitQuery with the in-memory sequence): records
    checkpointed before the error are not redelivered."""
    src = FlakySource(spark, sf_dir, n_shards=4, fail_n=0)
    it = Iterator(src).set_saver(InMemorySaver()).set_fetch_limit(100)
    seen = collect_batches(it)
    it._start_shards()
    it.poll_once()  # 400 records checkpointed
    src.fail_n = src.fetches + 1  # next fetch fails once
    it.poll_once()  # error → refresh, no delivery
    before = len(seen)
    assert before == 400
    it.run_until_drained()
    assert len(seen) == N_EVENTS
    assert len(set(seen)) == N_EVENTS, "refresh must not replay checkpointed data"


class ListLogger:
    """A19 test double: 2-method logger capturing messages."""

    def __init__(self) -> None:
        self.infos: list[str] = []
        self.errors: list[str] = []

    def info(self, msg, *args):
        self.infos.append(msg % args if args else msg)

    def error(self, msg, *args):
        self.errors.append(msg % args if args else msg)


def test_pluggable_logger_receives_fetch_and_checkpoint_errors(spark, sf_dir):
    """A19 (kinesis.go:16-19,238-240; sequence.go:91-93): an injected
    2-method logger observes both fetch errors (iterator) and checkpoint
    retry failures (sequence)."""
    src = FlakySource(spark, sf_dir, n_shards=4, fail_n=1)
    lg = ListLogger()
    it = (
        Iterator(src)
        .set_saver(FlakySaver(fail_n=1))
        .set_logger(lg)
    )
    it.run_until_drained()
    assert any("fetch error" in m for m in lg.errors)
    assert any("checkpoint write attempt" in m for m in lg.errors)


def test_run_loop_failure_is_reraised_from_shutdown(spark, sf_dir):
    """A dead consumption loop must not look healthy: an exception escaping
    poll_once (here: exhausted checkpoint retries) is recorded, exposed via
    ``failed``, and re-raised from shutdown()."""
    import time as _t

    it = (
        Iterator(make_source(spark, sf_dir))
        .set_saver(FlakySaver(fail_n=99))
        .set_sleep_limit(0.05)
    )
    collect_batches(it)
    it.run()
    deadline = _t.monotonic() + 120
    while not it.failed and _t.monotonic() < deadline:
        _t.sleep(0.1)
    assert it.failed
    with pytest.raises(RuntimeError, match="consumption loop failed"):
        it.shutdown(timeout=60.0)


def test_checkpoint_retry_then_success(spark, sf_dir):
    """Saver failures are retried up to 3 times (sequence.go:55-72,98)."""
    saver = FlakySaver(fail_n=2)
    it = Iterator(make_source(spark, sf_dir)).set_saver(saver)
    total = it.run_until_drained()
    assert total == N_EVENTS
    assert saver.attempts > 2


def test_checkpoint_failure_is_loud():
    """Exhausted retries RAISE (the reference swallows this —
    sequence.go:62-71 bug — we deliberately do not)."""
    seq = Sequence("s", "shard-0", FlakySaver(fail_n=99), retries=3)
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        seq.store("0001")


def test_init_query_trim_horizon_vs_after_sequence():
    """Cursor init: TRIM_HORIZON by default, AFTER_SEQUENCE_NUMBER iff a
    checkpoint exists (sequence.go:74-89, README.md:5)."""
    saver = InMemorySaver()
    q = Sequence("s", "sh", saver).init().init_query(TRIM_HORIZON)
    assert q == {"iterator_type": TRIM_HORIZON}
    saver.set("s", "sh", "000123")
    q = Sequence("s", "sh", saver).init().init_query(TRIM_HORIZON)
    assert q["iterator_type"] == AFTER_SEQUENCE_NUMBER
    assert q["starting_sequence_number"] == "000123"


def test_reshard_closes_old_shards_and_picks_up_children(spark, sf_dir):
    """Reshard: old shards read closed → checkpoint deleted + reader exits
    (kinesis.go:204-210, sequence.go:51-53); the monitor pass re-lists and
    picks up the children (kinesis.go:84-88)."""
    saver = InMemorySaver()
    src = make_source(spark, sf_dir, n_shards=4)
    it = Iterator(src).set_saver(saver).set_fetch_limit(50)
    seen = collect_batches(it)
    it._start_shards()
    it.poll_once()
    assert len(saver._data) == 4

    src.reshard(8)
    it.poll_once()  # every old cursor reads closed → A9 cleanup
    assert not it._shards
    assert saver._data == {}, "closed-shard checkpoints must be deleted"

    it.reconcile()  # monitor pass (A13) discovers the 8 children
    assert len(it._shards) == 8
    it.run_until_drained()
    # all records delivered at least once (first 50/shard duplicated)
    assert len({s for s in seen}) >= N_EVENTS - 1


def test_stream_not_active_stops_readers(spark, sf_dir):
    """!ACTIVE && readers>0 ⇒ stopAllShard (kinesis.go:89-93)."""
    src = make_source(spark, sf_dir)
    it = Iterator(src).set_saver(InMemorySaver())
    it._start_shards()
    assert it._shards
    src.status = "UPDATING"
    it.reconcile()
    assert not it._shards


def test_parquet_sink_exactly_once_across_crash(spark, sf_dir, tmp_path):
    """ParquetEpochSink: at-least-once redelivery + batch-keyed idempotent
    overwrite = exactly-once output. Crash after delivery but before
    checkpoint, restart with a FRESH Iterator on the same saver + sink
    root: the replayed trigger rewrites the same batch directory and the
    read-back equals the stream exactly once."""
    from kinesis_iterator_spark.streaming import ParquetEpochSink

    saver = InMemorySaver()
    src = make_source(spark, sf_dir)
    sink = ParquetEpochSink(str(tmp_path / "out"))

    crash_after = 2
    calls = {"n": 0}

    def crashing_sink(df, epoch):
        sink(df, epoch)
        calls["n"] += 1
        if calls["n"] == crash_after:
            raise RuntimeError("crash after write, before checkpoint")

    it1 = Iterator(src).set_saver(saver).set_fetch_limit(100)
    it1.foreach_batch(crashing_sink)
    it1._start_shards()
    with pytest.raises(RuntimeError):
        while True:
            it1.poll_once()

    it2 = Iterator(src).set_saver(saver).set_fetch_limit(100)
    it2.foreach_batch(sink)
    it2.run_until_drained()

    out = sink.read(spark)
    assert out.count() == N_EVENTS, "exactly-once violated (dupes or loss)"
    assert out.select("sequenceNumber").distinct().count() == N_EVENTS
    # the crash trigger's batch key was written twice — same directory
    assert len(sink.batches_written) > len(set(sink.batches_written))


def test_option_builder_parity(spark, sf_dir):
    """A17 (option.go:10-43): fluent builder → config map + consumer.
    Region/STS ride through to the connector-options map (the sandbox has
    no AWS, so they configure nothing further — same as SURVEY §2.A17)."""
    from kinesis_iterator_spark.streaming import Option, new_iterator

    opt = (
        Option()
        .with_region("us-east-1")
        .with_sts()
        .with_stream_name("events")
        .with_shards(2)
        .with_sf_dir(sf_dir)
    )
    assert opt.get_config() == {
        "streamName": "events",
        "region": "us-east-1",
        "credentialsProfile": "sts",
    }
    it = new_iterator(spark, opt).set_saver(InMemorySaver())
    collect_batches(it)
    assert it.run_until_drained() == N_EVENTS
    assert len(it.source.list_shards()) == 2


def test_graceful_shutdown(spark, sf_dir):
    """Run non-blocking, then shutdown within timeout (kinesis.go:147-154,
    221-236)."""
    it = Iterator(make_source(spark, sf_dir)).set_saver(InMemorySaver())
    collect_batches(it)
    it.set_sleep_limit(0.1)
    it.run()
    it.shutdown(timeout=120.0)
    assert it._thread is None
