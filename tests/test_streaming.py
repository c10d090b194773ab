"""Streaming semantics: stream ≡ batch equivalence, watermark
late-data handling, stateful dedup, stream-static join, custom state,
idempotent sinks. Micro-batch boundaries are controlled by dropping
parquet files into a watched directory between processAllAvailable()
calls (the file source admits new files per trigger)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flume_source_spark.streaming.engine import (
    EVENTS_SCHEMA,
    IdempotentBatchSink,
    dedup_within_watermark,
    running_user_totals,
    stream_static_enrich,
    tumbling_agg,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def write_batch(d, name, rows):
    """rows: (event_id, minutes_offset, user_id, event_type, value)"""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [T0 + timedelta(minutes=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}" for _ in rows],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, f"{name}.parquet"))


def events_stream(spark, d):
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(d)


def run_to_memory(df, name, mode):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    return q


def test_stream_tumbling_equals_batch(spark, tmp_path):
    """The same tumbling agg over the same rows: streaming (complete
    mode, two micro-batches) == batch — Structured Streaming's core
    contract."""
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 5, 1, "click", 10), (2, 20, 1, "view", 5), (3, 70, 2, "click", 7)])
    q = run_to_memory(tumbling_agg(events_stream(spark, d), watermark=None), "tumb", "complete")
    try:
        q.processAllAvailable()
        write_batch(d, "b2", [(4, 80, 2, "click", 3), (5, 130, 1, "view", 1)])
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n, r.total_value)
            for r in spark.sql("select * from tumb").collect()
        }
    finally:
        q.stop()
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(d)
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in tumbling_agg(batch).collect()
    }
    assert got == want
    assert len(want) == 4  # h0:click, h0:view, h1:click, h2:view


def test_stream_watermark_drops_late_data(spark, tmp_path):
    """Append mode + 10 min watermark: an event arriving after the
    watermark passed its window is dropped; the finalized window's
    count excludes it."""
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 5, 1, "click", 1), (2, 50, 1, "click", 1)])
    q = run_to_memory(tumbling_agg(events_stream(spark, d)), "late", "append")
    try:
        q.processAllAvailable()
        # advance event time far past hour-0 (watermark → 170-10=160min)
        write_batch(d, "b2", [(3, 170, 1, "click", 1)])
        q.processAllAvailable()
        # late arrival INTO hour-0, behind the watermark → dropped
        write_batch(d, "b3", [(4, 7, 1, "click", 99)])
        q.processAllAvailable()
        # one more on-time batch so emission keeps flowing
        write_batch(d, "b4", [(5, 180, 1, "click", 1)])
        q.processAllAvailable()
        rows = {r.window_start: (r.n, r.total_value) for r in spark.sql("select * from late").collect()}
    finally:
        q.stop()
    h0 = rows[T0]
    assert h0 == (2, 2.0), f"late event leaked into finalized window: {rows}"


def test_stream_dedup_within_watermark(spark, tmp_path):
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 1), (2, 1, 1, "view", 2)])
    sink = IdempotentBatchSink()
    q = dedup_within_watermark(events_stream(spark, d)).writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        # duplicate event_id 1 within the watermark horizon + a fresh id
        write_batch(d, "b2", [(1, 2, 1, "click", 1), (3, 3, 2, "click", 4)])
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r.event_id for r in sink.rows)
    assert ids == [1, 2, 3], f"duplicate not suppressed: {ids}"


def test_stream_static_join(spark, tmp_path, sf_dir):
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 5, "click", 1), (2, 1, 999999, "view", 2)])
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sink = IdempotentBatchSink()
    q = stream_static_enrich(events_stream(spark, d), customer).writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    by_id = {r.event_id: r for r in sink.rows}
    assert by_id[1].c_mktsegment is not None  # custkey 5 exists in the dim
    assert by_id[2].c_mktsegment is None  # left join keeps unmatched stream rows


def test_apply_in_pandas_with_state_accumulates(spark, tmp_path):
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 10), (2, 1, 1, "view", 5), (3, 2, 2, "click", 1)])
    sink = IdempotentBatchSink()
    q = running_user_totals(events_stream(spark, d)).writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        write_batch(d, "b2", [(4, 3, 1, "click", 2)])
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per user wins
    latest = {}
    for epoch in sorted(sink.applied):
        for r in sink.applied[epoch]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 17.0)  # state carried across micro-batches
    assert latest[2] == (1, 1.0)


def test_output_mode_update_emits_changed_groups_only(spark, tmp_path):
    """Update mode re-emits only groups changed in each micro-batch
    (append waits for watermark finalization, complete re-emits all) —
    the third output mode from the declared surface."""
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 5, 1, "click", 10), (2, 70, 1, "view", 5)])
    sink = IdempotentBatchSink()
    q = (
        tumbling_agg(events_stream(spark, d), watermark=None)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r.window_start, r.event_type): r.n for rows in sink.applied.values() for r in rows}
        assert len(first) == 2  # both hour-windows emitted initially
        n_epochs_before = len(sink.applied)
        # second batch touches ONLY the hour-0 click window
        write_batch(d, "b2", [(3, 10, 1, "click", 1)])
        q.processAllAvailable()
    finally:
        q.stop()
    new_rows = [r for eid, rows in sink.applied.items() if eid >= n_epochs_before for r in rows]
    assert len(new_rows) == 1, new_rows  # unchanged hour-1 view window NOT re-emitted
    assert new_rows[0].n == 2 and new_rows[0].event_type == "click"


def test_stream_session_window_live(spark, tmp_path):
    """Live session_window stream (complete mode): two activity bursts
    separated by > gap merge into two sessions per the batch twin."""
    d = str(tmp_path / "ev")
    # burst 1: minutes 0-10; burst 2: minutes 60-62 (gap 50 > 30)
    write_batch(d, "b1", [(1, 0, 1, "click", 1), (2, 10, 1, "click", 2), (3, 60, 1, "click", 3), (4, 62, 1, "click", 4)])
    agg = (
        events_stream(spark, d)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n")
    )
    q = run_to_memory(agg, "sess", "complete")
    try:
        q.processAllAvailable()
        rows = sorted(
            ((r.s, r.e, r.n) for r in spark.sql("select * from sess").collect())
        )
    finally:
        q.stop()
    assert len(rows) == 2
    assert rows[0][2] == 2 and rows[1][2] == 2
    # session end = last event + gap
    assert rows[0][1] == T0 + timedelta(minutes=40)
    assert rows[1][1] == T0 + timedelta(minutes=92)


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks + time-range condition:
    each purchase joins clicks by the same user within the preceding
    30 minutes. Both sides buffer state bounded by watermark + interval
    — the streaming as-of/attribution shape."""
    dc = str(tmp_path / "clicks")
    dp = str(tmp_path / "purchases")
    write_batch(dc, "c1", [(1, 0, 7, "click", 1), (2, 5, 7, "click", 2), (3, 100, 7, "click", 3)])
    write_batch(dp, "p1", [(10, 20, 7, "purchase", 9), (11, 200, 7, "purchase", 8)])
    clicks = (
        events_stream(spark, dc)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    )
    purchases = (
        events_stream(spark, dp)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id")
    sink = IdempotentBatchSink()
    q = joined.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = sorted((r.purchase_id, r.click_id) for r in sink.rows)
    # purchase 10 (t=20) attributes to clicks 1 (t=0) and 2 (t=5);
    # purchase 11 (t=200) has no click within its 30-minute lookback
    assert pairs == [(10, 1), (10, 2)], pairs


def test_rate_source_smoke(spark):
    """Built-in rate source drives a windowless streaming pipeline —
    the standard synthetic-load generator for throughput testing."""
    sink = IdempotentBatchSink()
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .withColumn("bucket", F.col("value") % 10)
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        deadline = time.time() + 15
        while time.time() < deadline and not sink.rows:
            time.sleep(0.3)
    finally:
        q.stop()
    assert sink.rows, "rate source produced no rows in 15s"
    assert all(0 <= r.bucket < 10 for r in sink.rows)


def test_foreach_batch_idempotent_on_redelivery(spark, tmp_path):
    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 1), (2, 1, 2, "view", 2)])
    sink = IdempotentBatchSink()
    q = events_stream(spark, d).writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_before = len(sink.rows)
    # simulate Spark redelivering epoch 0 after a recovery
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(d)
    sink(batch, 0)
    assert len(sink.rows) == n_before, "redelivered epoch must be a no-op"


def test_sessions_close_on_processing_time_timeout(spark, tmp_path):
    """ProcessingTimeTimeout tier: user 1's session accumulates, then
    after >gap_ms of inactivity the engine's own timeout sweep (with
    ProcessingTimeTimeout the engine keeps scheduling micro-batches
    while timed-out groups exist — which is also why this test POLLS
    the sink; processAllAvailable() never quiesces under that
    scheduling) fires the handler with hasTimedOut, emitting the
    closed session and removing state."""
    from flume_source_spark.streaming.engine import user_sessions_with_timeout

    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 10), (2, 1, 1, "view", 5)])
    sink = IdempotentBatchSink()
    q = (
        user_sessions_with_timeout(events_stream(spark, d), gap_ms=1500)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not any(r.closed for r in sink.rows):
            assert q.exception() is None, str(q.exception())[:500]
            time.sleep(0.5)
    finally:
        q.stop()

    closed = {r.user_id: (r.n_events, r.total_value) for r in sink.rows if r.closed}
    assert closed.get(1) == (2, 15.0)  # full session emitted when it timed out
    open_updates = [r for r in sink.rows if not r.closed and r.user_id == 1]
    assert open_updates and open_updates[-1].n_events == 2  # in-progress updates preceded the close


def test_sessions_close_on_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout tier: user 1's session closes when a LATER
    batch advances the WATERMARK past (last event + gap) — data-clock
    driven, deterministic, no wall-clock sleeps anywhere."""
    from flume_source_spark.streaming.engine import user_sessions_event_time

    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 10), (2, 5, 1, "view", 5)])
    sink = IdempotentBatchSink()
    q = (
        user_sessions_event_time(events_stream(spark, d), gap_minutes=30)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        assert not any(r.closed for r in sink.rows)  # watermark hasn't passed the gap
        # user 2's event at T0+120min advances the watermark to 120min,
        # far past user 1's (5min + 30min gap) deadline
        write_batch(d, "b2", [(3, 120, 2, "click", 1)])
        q.processAllAvailable()
        # the timeout fires on the batch AFTER the watermark update if
        # the engine evaluates timeouts against the pre-batch watermark
        write_batch(d, "b3", [(4, 125, 2, "view", 2)])
        q.processAllAvailable()
    finally:
        q.stop()

    closed = {r.user_id: r for r in sink.rows if r.closed}
    assert 1 in closed, f"user 1 session never closed: {sink.rows}"
    r = closed[1]
    assert (r.n_events, r.total_value) == (2, 15.0)
    # session_end = last event (T0+5min) + 30min gap, in event time
    expected_end = int(pd.Timestamp(T0 + timedelta(minutes=35)).value // 1_000_000)
    assert r.session_end_ms == expected_end
    assert 2 not in closed  # user 2 still active at shutdown


def test_foreach_batch_parquet_upsert_end_to_end(spark, tmp_path):
    """Streaming MERGE: two micro-batches upsert into a parquet target
    via ParquetUpsertSink — overlapping event_ids take the later value
    (latest-wins by ts), a redelivered epoch is a no-op, and the
    target survives as a readable table between batches."""
    from flume_source_spark.streaming.engine import ParquetUpsertSink

    d = str(tmp_path / "ev")
    tgt = str(tmp_path / "target")
    sink = ParquetUpsertSink(tgt, key="event_id", order_col="ts")

    write_batch(d, "b0", [(1, 0, 100, "view", 1.0), (2, 1, 100, "view", 2.0)])
    q = (
        events_stream(spark, d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        t1 = {r.event_id: r.value for r in sink.read_target(spark).collect()}
        assert t1 == {1: 1.0, 2: 2.0}

        # batch 2: update event 2 (later ts), insert event 3
        write_batch(d, "b1", [(2, 5, 100, "click", 9.0), (3, 6, 200, "view", 3.0)])
        q.processAllAvailable()
        t2 = {r.event_id: (r.value, r.event_type) for r in sink.read_target(spark).collect()}
        assert t2 == {1: (1.0, "view"), 2: (9.0, "click"), 3: (3.0, "view")}

        # redelivery of an already-applied epoch must not change the target
        commit_before = open(f"{tgt}/_commit").read()
        sink(spark.createDataFrame([(2, T0, 100, "stale", -1.0, "{}")],
                                   schema=EVENTS_SCHEMA), 0)
        assert open(f"{tgt}/_commit").read() == commit_before
        t3 = {r.event_id: r.value for r in sink.read_target(spark).collect()}
        assert t3 == {1: 1.0, 2: 9.0, 3: 3.0}
    finally:
        q.stop()


def test_parquet_upsert_sink_crash_retry_recovers(spark, tmp_path):
    """A crash AFTER the generation write but BEFORE the commit replace
    leaves the old commit live; the redelivered epoch must redo the
    merge into a fresh path (never the one it is reading from) and
    commit cleanly. The old two-file design wedged here: the retry's
    gen-{epoch} path was simultaneously the read target and the
    overwrite target."""
    import json

    from flume_source_spark.streaming.engine import ParquetUpsertSink

    tgt = str(tmp_path / "target")
    sink = ParquetUpsertSink(tgt, key="event_id", order_col="ts")
    df0 = spark.createDataFrame([(1, 10, 1.0)], "event_id INT, ts INT, value DOUBLE")
    sink(df0, 0)
    assert {r.event_id: r.value for r in sink.read_target(spark).collect()} == {1: 1.0}

    # Simulate epoch 1's first attempt crashing mid-way: it wrote a
    # generation dir but never replaced the commit file. The commit
    # still names epoch 0's generation.
    df1 = spark.createDataFrame([(1, 20, 5.0), (2, 20, 2.0)],
                                "event_id INT, ts INT, value DOUBLE")
    c0 = json.loads(open(f"{tgt}/_commit").read())
    assert c0["epoch"] == 0
    (tmp_path / "target" / "gen-1-deadbeef").mkdir()  # orphaned partial attempt

    # Redelivery of epoch 1: must merge against epoch 0's generation,
    # write somewhere new, and commit epoch 1.
    sink(df1, 1)
    c1 = json.loads(open(f"{tgt}/_commit").read())
    assert c1["epoch"] == 1 and c1["gen"] != c0["gen"]
    assert c1["gen"] != "gen-1-deadbeef"  # fresh path, not the orphan
    t = {r.event_id: r.value for r in sink.read_target(spark).collect()}
    assert t == {1: 5.0, 2: 2.0}

    # And a second redelivery of epoch 1 is now fenced to a no-op.
    commit_before = open(f"{tgt}/_commit").read()
    sink(spark.createDataFrame([(9, 99, 9.0)], "event_id INT, ts INT, value DOUBLE"), 1)
    assert open(f"{tgt}/_commit").read() == commit_before


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (StatefulProcessor +
    ValueState on the RocksDB store) accumulates the same per-user
    running totals as the applyInPandasWithState implementation —
    old and new stateful APIs agree on the same input.

    The TWS python worker speaks protobuf to the JVM state server
    (pyspark 4.1's sql/streaming/proto); absent/broken protobuf is an
    ENVIRONMENT gap, not an engine gap — skip, don't fail."""
    pytest.importorskip("google.protobuf.descriptor", reason="transformWithStateInPandas state server requires protobuf")
    from flume_source_spark.streaming.engine import running_user_totals_tws

    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 0, 1, "click", 10), (2, 1, 1, "view", 5), (3, 2, 2, "click", 1)])
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    sink = IdempotentBatchSink()
    try:
        q = (
            running_user_totals_tws(events_stream(spark, d))
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .foreachBatch(sink)
            .start()
        )
        try:
            q.processAllAvailable()
            write_batch(d, "b2", [(4, 3, 1, "click", 2)])
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    latest = {}
    for epoch in sorted(sink.applied):
        for r in sink.applied[epoch]:
            latest[r.user_id] = (r.n_events, r.total_value)
    # identical to test_apply_in_pandas_with_state_accumulates' finals
    assert latest[1] == (3, 17.0)
    assert latest[2] == (1, 1.0)


def test_stream_ohlc_equals_batch(spark, tmp_path):
    """Streaming OHLC (min_by/max_by selector aggregates, event-time
    keyed) over two micro-batches — including a second-batch row that
    is event-time EARLIER than batch 1's rows — equals the same
    aggregation run in batch: open/close depend on event time, not
    arrival order."""
    from flume_source_spark.streaming.engine import ohlc_agg

    d = str(tmp_path / "ev")
    write_batch(d, "b1", [(1, 5, 1, "click", 10), (2, 9, 1, "click", 30)])
    q = run_to_memory(ohlc_agg(events_stream(spark, d)), "ohlc_live", "complete")
    try:
        q.processAllAvailable()
        # late-but-in-watermark row, event-time EARLIEST in its bar
        write_batch(d, "b2", [(3, 2, 1, "click", 20), (4, 16, 1, "click", 7)])
        q.processAllAvailable()
        live = {
            (r.bar_start, r.event_type): (r.open, r.high, r.low, r.close, r.n_ticks, r.volume)
            for r in spark.sql("SELECT * FROM ohlc_live").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.bar_start, r.event_type): (r.open, r.high, r.low, r.close, r.n_ticks, r.volume)
        for r in ohlc_agg(spark.read.schema(EVENTS_SCHEMA).parquet(d)).collect()
    }
    assert live == batch
    first_bar = min(live)  # minutes 0-15 bar: events at t+2,5,9
    assert live[first_bar][0] == 20.0  # open = event-time earliest (batch-2 row)
    assert live[first_bar][3] == 30.0  # close = t+9 row


def test_stream_stream_left_outer_emits_null_for_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched left row must be
    emitted with nulls — but only after the watermark proves no match
    can still arrive (outer results are watermark-delayed by design).
    The follow-up batch advances event time far enough to close the
    join state for the unmatched purchase."""
    dc = str(tmp_path / "clicks")
    dp = str(tmp_path / "purchases")
    write_batch(dc, "c1", [(1, 0, 7, "click", 1)])
    write_batch(dp, "p1", [(10, 20, 7, "purchase", 9), (11, 30, 8, "purchase", 8)])
    clicks = (
        events_stream(spark, dc)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    )
    purchases = (
        events_stream(spark, dp)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select("purchase_id", "click_id")
    sink = IdempotentBatchSink()
    q = joined.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        # advance both watermarks far past the unmatched purchase's
        # state horizon so the outer null row can finalize
        write_batch(dc, "c2", [(5, 500, 99, "click", 1)])
        write_batch(dp, "p2", [(12, 500, 99, "purchase", 1)])
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = {(r.purchase_id, r.click_id) for r in sink.rows}
    assert (10, 1) in pairs  # matched within lookback
    assert (11, None) in pairs, pairs  # unmatched → outer null after watermark


def test_parquet_upsert_time_travel_and_vacuum(spark, tmp_path):
    """Each committed epoch is a readable snapshot: read_generation
    (as-of-epoch) returns the PRE-update state, generations() lists
    only committed dirs (crashed orphans excluded), and vacuum
    deletes everything but the last k generations — orphans included
    — while the live read is unaffected."""
    from flume_source_spark.streaming.engine import ParquetUpsertSink

    tgt = str(tmp_path / "target")
    sink = ParquetUpsertSink(tgt, key="event_id", order_col="ts")
    sink(spark.createDataFrame([(1, 10, 1.0)], "event_id INT, ts INT, value DOUBLE"), 0)
    sink(spark.createDataFrame([(1, 20, 5.0), (2, 20, 2.0)], "event_id INT, ts INT, value DOUBLE"), 1)
    sink(spark.createDataFrame([(3, 30, 3.0)], "event_id INT, ts INT, value DOUBLE"), 2)
    (tmp_path / "target" / "gen-9-orphan").mkdir()  # crashed attempt

    assert [e for e, _ in sink.generations()] == [0, 1, 2]
    assert "gen-9-orphan" not in {g for _, g in sink.generations()}

    asof0 = {r.event_id: r.value for r in sink.read_generation(spark, 0).collect()}
    assert asof0 == {1: 1.0}  # time travel: pre-update value visible
    asof1 = {r.event_id: r.value for r in sink.read_generation(spark, 1).collect()}
    assert asof1 == {1: 5.0, 2: 2.0}
    latest = {r.event_id: r.value for r in sink.read_generation(spark).collect()}
    assert latest == {1: 5.0, 2: 2.0, 3: 3.0}

    deleted = sink.vacuum(keep_last=1)
    assert "gen-9-orphan" in deleted and len(deleted) == 3  # two old gens + orphan
    assert [e for e, _ in sink.generations()] == [2]
    assert {r.event_id: r.value for r in sink.read_target(spark).collect()} == {1: 5.0, 2: 2.0, 3: 3.0}
    assert sink.read_generation(spark, 0) is None  # vacuumed history is gone, loudly
