"""Batch time-series operators over the ``events`` stream table:
calendar gap-fill with forward-fill, and gaps-and-islands
sessionization.

These complement the streaming surface (``streaming/batch_equiv.py``):
``session_window``/``window()`` are the *streaming-native* forms;
these are the classic batch/SQL formulations every analytics engine
ships (TimescaleDB ``time_bucket_gapfill``/``locf``, Flink
``MATCH_RECOGNIZE``-style sessionization via lag+cumsum).

Scale notes:
- gap-fill densifies per-entity: the calendar is generated per user
  from that user's own [min, max] hour span (``sequence`` + explode),
  so row blow-up is Σ_user span_hours, not |users| × global span. All
  three steps (hourly agg, span agg, forward-fill window) partition on
  user_id — one shuffle, reused by AQE across the window and the
  join.
- sessionization is lag + running-sum over (user_id, ts) — a single
  window partition spec, no join. The 30-min gap test compares
  integer microseconds (``unix_micros``) so engine timestamp
  precision (Spark µs vs DuckDB ns) cannot flip a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

TS_FMT = "yyyy-MM-dd HH:mm:ss"
SESSION_GAP_MICROS = 30 * 60 * 1_000_000

_GAP_FILL_ORACLE = """
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               sum(value) AS hour_value, count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id,
               date_trunc('hour', CAST(min(ts) AS TIMESTAMP)) AS lo,
               date_trunc('hour', CAST(max(ts) AS TIMESTAMP)) AS hi
        FROM events GROUP BY 1
    ),
    cal AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM span
    )
    SELECT c.user_id,
           strftime(c.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           coalesce(h.n_events, 0) AS n_events,
           CAST(round(h.hour_value, 4) AS DOUBLE) AS hour_value,
           CAST(round(
               last_value(h.hour_value IGNORE NULLS) OVER (
                   PARTITION BY c.user_id ORDER BY c.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE
           ) AS filled_value
    FROM cal c
    LEFT JOIN hourly h ON c.user_id = h.user_id AND c.bucket = h.bucket
    ORDER BY 1, 2
"""


@query("ts_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("timeseries",))
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-user hourly aggregates onto a gap-free calendar and
    forward-fill missing hours (TimescaleDB gapfill+locf shape):
    sequence() generates each user's hour range, explode densifies,
    last(ignorenulls) carries the previous observation forward."""
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum("value").alias("hour_value"), F.count("*").alias("n_events"))
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.date_format("bucket", TS_FMT).alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round("hour_value", 4).cast("double").alias("hour_value"),
            F.round(F.last("hour_value", ignorenulls=True).over(w), 4)
            .cast("double")
            .alias("filled_value"),
        )
        .orderBy("user_id", "bucket")
    )


_SESSIONIZE_ORACLE = """
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond',
                                      CAST(lag(ts) OVER w AS TIMESTAMP),
                                      CAST(ts AS TIMESTAMP)) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked
    )
    SELECT user_id, session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           CAST(round(sum(value), 4) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
"""


@query("ts_sessionize_gaps", oracle=_SESSIONIZE_ORACLE, tags=("timeseries",))
def ts_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event exceeds 30 minutes; session id = running
    sum of session-start markers. One window partition spec
    (user_id, ts) shared by lag and the cumulative sum — a single
    shuffle, no join. The gap compare is integer microseconds on both
    engines, immune to float/precision drift."""
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                > SESSION_GAP_MICROS
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("session_seq", F.sum("is_new").over(wsum))
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )
