"""Chained stateful operators in one streaming query (Spark 3.5+/4):
two windowed aggregations back-to-back — 15-min tumbling cents per
user, re-aggregated into hourly (n_quarters, total) — using
``window_time()`` to re-window the first aggregation's event-time
column. Pre-3.4 engines force two queries with an intermediate sink;
single-query chaining keeps both states in one checkpoint with one
watermark lineage. Verified against the identical batch plan."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import functions as F

T0 = datetime(2025, 1, 1, 0, 0, 0)
EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def write_batch(d, name, rows):
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [T0 + timedelta(minutes=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["click" for _ in rows],
            "value": [float(r[3]) for r in rows],
            "props": ["{}" for _ in rows],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, f"{name}.parquet"))


def chained_windows(events):
    """15-min tumbling cents per user → hourly rollup per user."""
    quarter = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w15"), "user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("q_cents"))
    )
    return (
        quarter.groupBy(
            F.window(F.window_time("w15"), "1 hour").alias("w60"), "user_id"
        )
        .agg(
            F.count("*").alias("n_quarters"),
            F.sum("q_cents").alias("total_cents"),
        )
        .select(
            F.date_format(F.col("w60.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "user_id",
            "n_quarters",
            "total_cents",
        )
    )


def test_chained_windowed_aggs_stream_equals_batch(spark, tmp_path):
    d = str(tmp_path / "ev")
    # user 1: events in three different quarters of hour 0 + one in hour 1;
    # user 2: two events in the same quarter (n_quarters must be 1)
    write_batch(
        d,
        "b1",
        [
            (1, 0, 1, 10),
            (2, 16, 1, 20),
            (3, 31, 1, 30),
            (4, 65, 1, 40),
            (5, 2, 2, 5),
            (6, 7, 2, 7),
        ],
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    q = (
        chained_windows(stream)
        .writeStream.format("memory")
        .queryName("chained_q")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits only watermark-closed windows; push the
        # watermark far forward with a late batch so everything closes
        write_batch(d, "b2", [(99, 10_000, 9, 1)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["hour"], r["user_id"]): (r["n_quarters"], r["total_cents"])
        for r in spark.sql("SELECT * FROM chained_q").collect()
        if r["user_id"] != 9
    }
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(d)
    expected = {
        (r["hour"], r["user_id"]): (r["n_quarters"], r["total_cents"])
        for r in chained_windows(batch).collect()
        if r["user_id"] != 9
    }
    assert got == expected
    assert got[("2025-01-01 00:00:00", 1)] == (3, 6000)
    assert got[("2025-01-01 01:00:00", 1)] == (1, 4000)
    assert got[("2025-01-01 00:00:00", 2)] == (1, 1200)


def test_stream_stream_full_outer_both_sides_null(spark, tmp_path):
    """FULL OUTER stream-stream join (both sides watermarked, time-
    bounded condition): matched pair joins; an unmatched left row AND
    an unmatched right row each finalize with nulls once the
    watermark closes their state — completing the stream-stream
    matrix (inner + left-outer live tests in test_streaming.py)."""
    import os as _os

    dc = str(tmp_path / "clicks")
    dp = str(tmp_path / "purchases")

    def wb(d, name, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [T0 + timedelta(minutes=r[1]) for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["x" for _ in rows],
                "value": [1.0 for _ in rows],
                "props": ["{}" for _ in rows],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        _os.makedirs(d, exist_ok=True)
        pdf.to_parquet(_os.path.join(d, f"{name}.parquet"))

    ev = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    # user 7: click+purchase within 30 min (match); user 8: purchase
    # only (right-null left row); user 6: click only (left-null right row)
    wb(dc, "c1", [(1, 0, 7), (2, 0, 6)])
    wb(dp, "p1", [(10, 20, 7), (11, 30, 8)])
    clicks = (
        spark.readStream.schema(ev).parquet(dc)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
                F.col("ts").alias("click_ts"))
    )
    purchases = (
        spark.readStream.schema(ev).parquet(dp)
        .withWatermark("ts", "10 minutes")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"))
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "fullOuter",
    ).select("purchase_id", "click_id")
    got = []

    def sink(batch_df, epoch_id):
        got.extend((r["purchase_id"], r["click_id"]) for r in batch_df.collect())

    q = joined.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        wb(dc, "c2", [(5, 500, 99)])
        wb(dp, "p2", [(12, 500, 99)])
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = {p for p in got if p not in {(12, 5)}}  # drop the watermark-pusher pair
    assert (10, 1) in pairs                         # matched
    assert (11, None) in pairs, pairs               # right side unmatched purchase
    assert (None, 2) in pairs, pairs                # left side unmatched click


def test_foreach_row_writer_delivers_all_rows(spark, tmp_path):
    """writeStream.foreach(f): the ROW-level sink tier (foreachBatch
    covers the batch tier; textspool covers the DataSource tier).
    Each row lands exactly once in the side-effect file under normal
    (no-retry) processing."""
    import os as _os

    d = str(tmp_path / "ev")
    out = str(tmp_path / "rows.txt")
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [T0, T0, T0],
            "user_id": [1, 2, 3],
            "event_type": ["a", "b", "c"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}"] * 3,
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    _os.makedirs(d, exist_ok=True)
    pdf.to_parquet(_os.path.join(d, "b1.parquet"))

    def write_row(row):
        with open(out, "a") as f:
            f.write(f"{row['event_id']}:{row['event_type']}\n")

    ev = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    q = (
        spark.readStream.schema(ev).parquet(d)
        .writeStream.foreach(write_row)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(out) as f:
        lines = sorted(f.read().splitlines())
    assert lines == ["1:a", "2:b", "3:c"]


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: processes everything present in bounded
    micro-batches, then terminates ON ITS OWN — the batch-like run
    mode for periodic catch-up jobs (vs processingTime's perpetual
    polling). maxFilesPerTrigger bounds each batch, so the drain runs
    as multiple rate-limited batches before self-stopping."""
    import os as _os

    d = str(tmp_path / "ev")
    for i in range(3):
        pdf = pd.DataFrame(
            {
                "event_id": [i],
                "ts": [T0],
                "user_id": [i],
                "event_type": ["x"],
                "value": [1.0],
                "props": ["{}"],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        _os.makedirs(d, exist_ok=True)
        pdf.to_parquet(_os.path.join(d, f"b{i}.parquet"))
    seen = []

    def sink(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    ev = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    q = (
        spark.readStream.schema(ev).option("maxFilesPerTrigger", 1).parquet(d)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query must self-terminate"
    assert sum(n for _, n in seen) == 3
    assert len(seen) >= 3  # rate limit respected: one file per batch
