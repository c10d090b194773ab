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
               sum(CAST(value AS DECIMAL(27,6))) AS hour_value, count(*) AS n_events
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
    forward-fill missing hours (TimescaleDB gapfill+locf shape).

    JOIN-FREE plan: instead of generating a calendar and left-joining
    it back (two exchanges: hash-join on (user, bucket) + re-sort for
    the fill window), each OBSERVED hour emits itself plus the gap
    hours up to the next observation (``lead`` + ``sequence`` +
    ``explode``) and carries its own value into them — the forward
    fill falls out of the expansion. One window shuffle on user_id
    total; gap expansion is executor-local and proportional to each
    row's own gap, which is the shape that survives 100 TB."""
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        # exact DECIMAL sum on both sides: double accumulation order
        # differs between engines, and a per-(user,hour) sum landing on
        # a .xxxx5 boundary would flip the rounded 4th digit (the same
        # bridging ts_rolling_anomaly uses).
        F.sum(F.col("value").cast("decimal(27,6)")).alias("hour_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    h2 = hourly.withColumn("next_bucket", F.lead("bucket").over(w))
    fill_end = F.coalesce(
        F.col("next_bucket") - F.expr("INTERVAL 1 HOUR"), F.col("bucket")
    )
    expanded = h2.select(
        "user_id",
        "hour_value",
        "n_events",
        F.col("bucket").alias("obs_bucket"),
        F.explode(F.sequence("bucket", fill_end, F.expr("INTERVAL 1 HOUR"))).alias(
            "bucket"
        ),
    )
    observed = F.col("bucket") == F.col("obs_bucket")
    return expanded.select(
        "user_id",
        F.date_format("bucket", TS_FMT).alias("bucket"),
        F.when(observed, F.col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        F.when(observed, F.round("hour_value", 4)).cast("double").alias("hour_value"),
        F.round("hour_value", 4).cast("double").alias("filled_value"),
    ).orderBy("user_id", "bucket")


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
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM marked
    )
    SELECT user_id, session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE) AS total_value
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
            F.round(F.sum(F.col("value").cast("decimal(27,6)")), 4).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


_FUNNEL_ORACLE = """
    WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    t2 AS (SELECT e.user_id, min(e.ts) AS ts2
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'signup' AND e.ts > t1.ts1
             AND e.ts <= t1.ts1 + INTERVAL 24 HOURS GROUP BY 1),
    t3 AS (SELECT e.user_id, min(e.ts) AS ts3
           FROM events e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
             AND e.ts <= t2.ts2 + INTERVAL 24 HOURS GROUP BY 1),
    stages AS (
        SELECT t1.user_id,
               1 + (t2.user_id IS NOT NULL)::INT + (t3.user_id IS NOT NULL)::INT AS stage,
               date_diff('second', t1.ts1, coalesce(t3.ts3, t2.ts2, t1.ts1)) AS secs_to_last
        FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                LEFT JOIN t3 ON t2.user_id = t3.user_id
    )
    SELECT stage, count(*) AS n_users,
           CAST(round(avg(secs_to_last), 4) AS DOUBLE) AS avg_secs_to_last
    FROM stages GROUP BY stage ORDER BY stage
"""


@query("ts_funnel", oracle=_FUNNEL_ORACLE, tags=("timeseries", "analytics"))
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → signup → purchase): a user
    reaches stage k when the k-th step's FIRST qualifying occurrence
    is strictly after the previous stage's timestamp and within a 24 h
    conversion window of it (the window is what makes funnels
    discriminating — without it every long-lived user converges to the
    final stage). Implemented as
    one conditional-min aggregation per step, each a broadcast-joined
    filter on the previous stage — the per-stage frames are |users|
    rows, so every join after the first is broadcast at any corpus
    size, and the events table is scanned once per step with the
    event-type filter pushed to the scan. Time-to-convert compares
    integer seconds (date_diff ↔ unix seconds) across engines."""
    e = load_tables(spark, sf_dir)["events"]
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        e.filter(F.col("event_type") == "signup")
        .join(F.broadcast(t1), "user_id")
        .filter(
            (F.col("ts") > F.col("ts1"))
            & (F.col("ts") <= F.col("ts1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(t2), "user_id")
        .filter(
            (F.col("ts") > F.col("ts2"))
            & (F.col("ts") <= F.col("ts2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    stages = (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("ts2").isNotNull().cast("int")
                + F.col("ts3").isNotNull().cast("int")
            ).alias("stage"),
            (
                F.unix_timestamp(F.coalesce("ts3", "ts2", "ts1"))
                - F.unix_timestamp("ts1")
            ).alias("secs_to_last"),
        )
    )
    return (
        stages.groupBy("stage")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("secs_to_last"), 4).cast("double").alias("avg_secs_to_last"),
        )
        .orderBy("stage")
    )


_RETENTION_ORACLE = """
    WITH first AS (
        SELECT user_id,
               date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort_week
        FROM events GROUP BY 1
    ),
    sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS activity_week
        FROM events e JOIN first f USING (user_id)
    )
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
           date_diff('day', a.cohort_week, a.activity_week) // 7 AS week_offset,
           count(*) AS n_active,
           any_value(s.cohort_size) AS cohort_size,
           CAST(round(count(*) * 1.0 / any_value(s.cohort_size), 4) AS DOUBLE)
               AS retention_rate
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, week_offset
    ORDER BY 1, 2
"""


@query("ts_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("timeseries", "analytics"))
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users are assigned to the ISO
    week of their FIRST event (both engines truncate weeks to Monday);
    each later active week counts them into (cohort_week, week_offset).

    Scale shape: the per-user first-event frame is |users| rows, so it
    broadcasts at any event volume; the distinct-(user, week) pass is
    the only event-scale shuffle and it partitions on user_id, the
    same key the source aggregation used. The cohort-size frame is
    |weeks| rows — broadcast trivially. week_offset divides an exact
    multiple of 7 days (both weeks are Monday-truncated), so integer
    truncation is exact on both engines."""
    e = load_tables(spark, sf_dir)["events"]
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    activity = (
        e.join(F.broadcast(first), "user_id")
        .select(
            "user_id", "cohort_week", F.date_trunc("week", F.col("ts")).alias("activity_week")
        )
        .distinct()
    )
    return (
        activity.withColumn(
            "week_offset",
            (F.datediff("activity_week", "cohort_week") / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4)
            .cast("double")
            .alias("retention_rate"),
        )
        .orderBy("cohort_week", "week_offset")
    )


_ANOMALY_ORACLE = """
    WITH sums AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CAST(sum(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS s1,
               CAST(sum(CAST(value * value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS s2,
               count(value) OVER w AS n_win
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT *, s1 / n_win AS mu,
               (s2 - s1 * s1 / n_win) / (n_win - 1) AS var
        FROM sums WHERE n_win >= 12
    ),
    z AS (
        SELECT *, (value - mu) / sqrt(var) AS z FROM scored WHERE var > 0
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY round(abs(z), 4) DESC, event_id) AS rn
        FROM z
    )
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(round(value, 4) AS DOUBLE) AS value,
           CAST(round(CAST(mu AS DECIMAL(18,6)), 4) AS DOUBLE) AS rolling_mean,
           CAST(round(z, 4) AS DOUBLE) AS z
    FROM ranked WHERE rn <= 3
    ORDER BY user_id, event_id
"""


@query("ts_rolling_anomaly", oracle=_ANOMALY_ORACLE, tags=("timeseries", "analytics", "window"))
def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event's value is scored
    against the mean/stddev of its user's previous ≤24 events (the
    current row excluded, ≥12 required so early noise can't dominate),
    and each user's top-3 |z| events are reported.

    Top-k-by-rounded-score (with event_id tiebreak) instead of a
    ``|z| > τ`` threshold keeps the selected ROW SET engine-stable:
    window aggregates associate differently across engines (running
    accumulation vs segment tree), so a raw threshold could flip
    membership on a boundary value, while ranking compares 4-dp-rounded
    scores. Mean/variance come from exact DECIMAL window sums (Σx, Σx²)
    so both engines divide bit-identical doubles — native avg/stddev
    over the frame landed on a .xxxx5 rounding boundary at sf0.01. One
    shuffle on user_id serves both window passes."""
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    dec = "decimal(27,6)"
    scored = (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("s1", F.sum(F.col("value").cast(dec)).over(w).cast("double"))
        .withColumn(
            "s2", F.sum((F.col("value") * F.col("value")).cast(dec)).over(w).cast("double")
        )
        .withColumn("n_win", F.count("value").over(w))
        .filter(F.col("n_win") >= 12)
        .withColumn("mu", F.col("s1") / F.col("n_win"))
        .withColumn(
            "var",
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_win"))
            / (F.col("n_win") - 1),
        )
        .filter(F.col("var") > 0)
        .withColumn("z", (F.col("value") - F.col("mu")) / F.sqrt("var"))
    )
    rank_w = Window.partitionBy("user_id").orderBy(
        F.round(F.abs("z"), 4).desc(), "event_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= 3)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", TS_FMT).alias("ts"),
            F.round("value", 4).cast("double").alias("value"),
            F.round(F.col("mu").cast("decimal(18,6)"), 4).cast("double").alias("rolling_mean"),
            F.round("z", 4).cast("double").alias("z"),
        )
        .orderBy("user_id", "event_id")
    )
