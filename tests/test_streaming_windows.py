"""Genuine Structured Streaming tests: the events fixture staged as
multiple files → readStream with bounded triggers → windowed aggregation
with watermark, streaming dedup — the Spark-native form of the reference's
poll loop (trigger ≙ GetRecords poll, checkpointLocation ≙ SequenceSaver).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kinesis_iterator_spark.tables import load_table


@pytest.fixture(scope="module")
def staged_events_dir(spark, sf_dir):
    """Split events into 4 time-ordered parquet files (≙ 4 GetRecords
    batches arriving in order)."""
    d = tempfile.mkdtemp(prefix="staged_events_")
    ev = load_table(spark, sf_dir, "events")
    qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.01)
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("event_id") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("event_id") <= bounds[i + 1])
        part.coalesce(1).write.mode("overwrite").parquet(f"{d}/slice_{i}")
    flat = f"{d}/flat"
    os.makedirs(flat)
    n = 0
    for i in range(4):
        for f in sorted(os.listdir(f"{d}/slice_{i}")):
            if f.endswith(".parquet"):
                shutil.copy(f"{d}/slice_{i}/{f}", f"{flat}/{i:02d}.parquet")
                n += 1
    assert n == 4
    yield flat
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_tumbling_window_matches_batch(spark, sf_dir, staged_events_dir):
    """Micro-batched stream over 4 files must produce the same tumbling
    1-hour aggregate as the batch query (complete output mode)."""
    ev_batch = load_table(spark, sf_dir, "events")
    schema = spark.read.parquet(staged_events_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_events_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))

    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("select * from tumbling_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev_batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_sliding_window_matches_batch(spark, sf_dir, staged_events_dir):
    """The 30m/15m SLIDING shape (the other leg of the merged
    events_windows entry) under Structured Streaming proper: every event
    lands in exactly two windows, and the complete-mode result equals
    the batch aggregate."""
    ev_batch = load_table(spark, sf_dir, "events")
    schema = spark.read.parquet(staged_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged_events_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))

    def agg(df):
        return (
            df.groupBy(
                F.window("ts", "30 minutes", "15 minutes").alias("w"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
        )

    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("select * from sliding_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"] for r in agg(ev_batch).collect()
    }
    assert got == want
    assert sum(got.values()) == 2 * ev_batch.count()
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_dedup_with_watermark(spark, staged_events_dir):
    """dropDuplicates on a stream keeps first arrival per key."""
    schema = spark.read.parquet(staged_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_events_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    dedup = stream.withWatermark("ts", "10 days").dropDuplicates(
        ["user_id", "event_type"]
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_dd_")
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "select user_id, event_type, count(*) c from dedup_out "
        "group by 1,2 having count(*) > 1"
    ).collect()
    assert out == [], "streaming dedup emitted duplicate keys"
    n_keys = spark.sql("select count(*) c from dedup_out").collect()[0]["c"]
    batch_keys = (
        spark.read.parquet(staged_events_dir)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n_keys == batch_keys
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_session_window_matches_batch(spark, sf_dir, staged_events_dir):
    """Native session_window on a stream (complete mode) equals the batch
    session_window aggregate — the engine-native form of
    events_sessionize_30m's lag+cumsum batch formulation."""
    schema = spark.read.parquet(staged_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_events_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    agg = (
        # watermark far beyond the fixture's whole time span so no session
        # is finalized early (files are event_id-sliced, not ts-sliced, so
        # later micro-batches carry "late" events)
        stream.withWatermark("ts", "3650 days")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "user_id", "n")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_sess_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["ws"], r["we"], r["user_id"]): r["n"]
        for r in spark.sql("select * from session_out").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["ws"], r["we"], r["user_id"]): r["n"]
        for r in ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "user_id", "n"
        )
        .collect()
    }
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)


def test_custom_stateful_operator_apply_in_pandas_with_state(
    spark, staged_events_dir
):
    """Custom stateful streaming operator (applyInPandasWithState): a
    running per-event-type count whose GroupState survives across
    micro-batches — the escape hatch for operators Spark lacks natively.
    The final state must equal the batch count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(staged_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_events_dir)
    )

    def running_count(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"event_type": [key[0]], "n": [total]})

    out = stream.groupBy("event_type").applyInPandasWithState(
        running_count,
        outputStructType="event_type string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink accumulates one row per (key, batch); the max
    # per key is the final running count.
    got = {
        r["event_type"]: r["mx"]
        for r in spark.sql(
            "select event_type, max(n) mx from state_out group by 1"
        ).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(staged_events_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_watermark_drops_late_data(spark):
    """The actual watermark DROP: stage two files where the second contains
    an event far older than (max event time − watermark); in append mode
    the late event must not reopen its finalized window."""
    import pandas as pd

    d = tempfile.mkdtemp(prefix="late_")
    on_time = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 10:05", "2024-01-01 12:05", "2024-01-01 14:05"]
            ),
        }
    )
    # Spark applies the LATE-EVENT filter with the watermark of the
    # PREVIOUS batch (eviction watermark lags one batch behind the data
    # that advanced it), so the late record must arrive two batches after
    # the watermark-advancing events — hence the filler file in between.
    filler = pd.DataFrame(
        {"user_id": [1], "ts": pd.to_datetime(["2024-01-01 14:06"])}
    )
    late = pd.DataFrame(
        {
            "user_id": [1],
            # 4 h older than the max event time seen in file 0; watermark
            # is 1 h, so the 10:00 window is already finalized.
            "ts": pd.to_datetime(["2024-01-01 10:10"]),
        }
    )
    import glob, shutil as sh
    import time as _t

    flat = f"{d}/flat"
    os.makedirs(flat)
    now = _t.time()
    for i, pdf in enumerate((on_time, filler, late)):
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/tmp_{i}"
        )
        dst = f"{flat}/{i:02d}.parquet"
        sh.copy(glob.glob(f"{d}/tmp_{i}/*.parquet")[0], dst)
        # FileStreamSource orders micro-batches by modification time — pin
        # it so file i forms batch i.
        os.utime(dst, (now - 300 + 100 * i, now - 300 + 100 * i))

    schema = spark.read.parquet(flat).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_late_")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["ws"].isoformat(): r["n"]
        for r in spark.sql("select * from late_out").collect()
    }
    # The 10:00 window was finalized with n=1 when the watermark passed
    # 11:05; the late 10:10 event must NOT appear as an extra count.
    assert got.get("2024-01-01T10:00:00") == 1, got
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_resume_from_checkpoint(spark, staged_events_dir):
    """Stop after partial progress, restart with the same checkpointLocation
    → the query resumes (offset log ≙ SequenceSaver, SURVEY §1.1) and ends
    with the complete result."""
    schema = spark.read.parquet(staged_events_dir).schema
    ckpt = tempfile.mkdtemp(prefix="ckpt_resume_")
    totals: list[int] = []

    def sink(df, epoch_id):
        totals.append(df.collect()[0]["n"])

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged_events_dir)
        )
        counted = stream.groupBy().agg(F.count("*").alias("n"))
        return (
            counted.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    # let at least one micro-batch commit, then stop mid-stream
    import time

    while not totals:
        time.sleep(0.2)
    q1.stop()
    n_after_stop = max(totals)

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    all_rows = spark.read.parquet(staged_events_dir).count()
    assert max(totals) == all_rows
    # the restart recovered aggregation state rather than starting at zero
    assert n_after_stop <= all_rows
    shutil.rmtree(ckpt, ignore_errors=True)
