"""Batch twins of the streaming windowed aggregations.

Structured Streaming's windowed aggregates are defined to equal the
same aggregation run in batch over the complete input (watermarking
only bounds state/lateness — it never changes the final answer for
on-time data). These registry entries pin that batch semantics against
DuckDB; tests/test_streaming.py then runs the SAME aggregations as
real streams (readStream → memory sink) and asserts they produce these
results, closing the loop stream ≡ batch ≡ oracle.

Window alignment: Spark's window() buckets are epoch-aligned, exactly
DuckDB's time_bucket; session windows are gap-based (gaps-and-islands
in the oracle). Event time is micro-truncated on both sides (the
parquet carries nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "streaming_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window"),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type — the canonical streaming
    aggregation, batch semantics. In a live stream this runs with
    withWatermark + append mode and identical results (pinned by
    tests/test_streaming.py::test_stream_tumbling_equals_batch)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(dec("value"), "total_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "streaming_sliding_window",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                 - k * (INTERVAL '15 minutes') AS window_start,
               CAST(ts AS TIMESTAMP) AS ts, value
        FROM events, unnest([0, 1, 2, 3]) AS t(k)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM expanded
    WHERE ts < window_start + INTERVAL '1 hour'
    GROUP BY window_start
    ORDER BY window_start
    """,
    tags=("streaming", "window"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide): each event lands in 4
    windows — Spark expands internally; the oracle expands explicitly.
    The 4× row expansion is the scale cost of sliding windows, which is
    why slide granularity is the knob to watch at 100 TB."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum(dec("value"), "total_value"))
        .select(F.date_format(F.col("w.start"), TS_FMT).alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


@query(
    "streaming_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id % 50 = 3
    ),
    sessioned AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
    FROM sessioned
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min): Spark's session_window
    merges events whose gaps are under the timeout; window end = last
    event + gap. Oracle = gaps-and-islands. User subset keeps the
    output review-sized; the operator itself is per-key linear."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") % 50 == 3)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(dec("value"), "session_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT).alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "streaming_dedup_batch",
    oracle="""
    WITH ranked AS (
        SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    )
    SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stateful stream dedup (dropDuplicates on key):
    keep the earliest event per (user, type). Expressed as min-by
    window so the kept row is deterministic — streaming keeps the
    first *arriving*, which for an ordered replay is the same row."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.date_format("ts", TS_FMT).alias("first_ts"))
        .orderBy("user_id", "event_type")
    )


@query(
    "streaming_interval_join_batch",
    oracle="""
    WITH e AS (SELECT * FROM events),
    pairs AS (
        SELECT v.user_id,
               date_diff('second', v.ts, c.ts) AS delay_s
        FROM e v JOIN e c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR
    )
    SELECT user_id,
           count(*) AS n_conversions,
           min(delay_s) AS min_delay_s,
           CAST(round(avg(delay_s), 4) AS DOUBLE) AS avg_delay_s
    FROM pairs
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "join", "interval"),
)
def streaming_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (view→click within
    4 h per user), the query shape whose live form is pinned by
    tests/test_streaming.py's interval-join test. In streaming, the
    time-bound condition is what lets Spark expire state: each side's
    watermark plus the interval bounds how long a view must be buffered
    awaiting clicks. The batch form is the same join; per-user rollup
    keeps the output bounded (≤ |users| rows) however dense the event
    history gets. Delays are integer epoch-second diffs on both
    engines (floor(epoch) each side), so the avg is an
    engine-identical IEEE double division."""
    e = load_tables(spark, sf_dir)["events"]
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    pairs = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 4 HOURS")),
    ).select(
        "user_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")).alias("delay_s"),
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count("*").alias("n_conversions"),
            F.min("delay_s").alias("min_delay_s"),
            F.round(F.avg("delay_s"), 4).cast("double").alias("avg_delay_s"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_static_enrich",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'UNMATCHED') AS segment,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("streaming", "join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/engine.py::stream_static_enrich, live-tested by
    tests/test_streaming.py::test_stream_static_join): every event is
    enriched against the static customer dim and rolled up per market
    segment. In streaming, each micro-batch broadcast-hash-joins
    against the dim with NO stream-side shuffle — the same plan Spark
    picks here for the batch form; unmatched stream rows survive (left
    join), pinned by the live test's sentinel user."""
    t = load_tables(spark, sf_dir)
    e, c = t["events"], t["customer"]
    dim = c.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        e.join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.coalesce("c_mktsegment", F.lit("UNMATCHED")).alias("segment")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(dec("value"), "total_value"),
        )
        .orderBy("segment")
    )
