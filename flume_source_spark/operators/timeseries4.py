"""Batch time-series wave 4: autocorrelation and linear interpolation.

- ``ts_acf`` — the autocorrelation function: per event_type, the
  Pearson correlation between the hourly value series and itself at
  lags 1..MAX_LAG. The standard seasonality/persistence diagnostic
  (a peak at lag 24 ⇒ daily cycle) feeding ``ts_seasonal_profile``'s
  choice of period. The series is the exact-cents hourly sum
  (deterministic integers), so the only float op is the final
  ``corr`` — a mergeable moment-sum aggregate (same class as
  ``agg_regression_family``) rounded to 4 dp on both engines.
  Lagging is ``lag(k) OVER (ORDER BY bucket)`` per type over the
  AGGREGATED series (#hours rows, not #events), then one grouped
  corr per (type, lag) — the heavy reduction happens first, the
  windows run on the small series.
- ``ts_interp_linear`` — gap filling by LINEAR interpolation (the
  TimescaleDB ``interpolate()`` counterpart of ``ts_gap_fill``'s
  locf): missing hourly buckets get the value linearly interpolated
  between the bracketing observations. Same join-free expansion as
  ``ts_gap_fill``: each observed hour knows the NEXT observation via
  ``lead``, emits its gap hours with ``sequence``+``explode``, and
  computes the interpolated value from (prev, next, position) with
  pure integer arithmetic — interp = (prev·(g-k) + next·k) div g in
  cents, exact and tie-free on both engines (cents ≥ 0, so
  truncating div == floor div). Trailing hours after the last
  observation are not emitted (nothing to interpolate toward).

Scale: both queries aggregate events → per-(key, hour) cents FIRST
(map-side combinable, events-sized shuffle), then do window work on
the series-sized result. Windows partition by event_type here (few
fat series); at 100 TB a low-cardinality series key needs the
day-chunk + boundary-stitch decomposition — or simply a higher-
cardinality key (per user/source), which is ``ts_gap_fill``'s shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

MAX_LAG = 6

_ACF_ORACLE = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    lagged AS (
        SELECT event_type, cents,
               lag(cents, k) OVER (PARTITION BY event_type, k ORDER BY bucket)
                   AS cents_lag,
               k
        FROM hourly CROSS JOIN (SELECT unnest(generate_series(1, {MAX_LAG})) AS k))
    SELECT event_type, CAST(k AS BIGINT) AS lag,
           CAST(count(cents_lag) AS BIGINT) AS n_pairs,
           CAST(round(corr(CAST(cents AS DOUBLE), CAST(cents_lag AS DOUBLE)), 4)
                AS DOUBLE) AS acf
    FROM lagged
    GROUP BY event_type, k
    ORDER BY event_type, lag
"""


@query("ts_acf", oracle=_ACF_ORACLE, tags=("timeseries", "stats"))
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly cents series per event_type at
    lags 1..MAX_LAG (series aggregated first; lag windows + grouped
    corr on the reduced series)."""
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    # Spark's lag() offset must be a literal (DuckDB's may be a
    # column), so the lag axis is MAX_LAG lag columns computed in ONE
    # window pass (all share the partition/order spec → one sort of
    # the reduced series), then stacked to (lag, x, x_lag) rows.
    w = Window.partitionBy("event_type").orderBy("bucket")
    with_lags = hourly.select(
        "event_type",
        F.col("cents").cast("double").alias("x"),
        *[
            F.lag("cents", k).over(w).cast("double").alias(f"lag{k}")
            for k in range(1, MAX_LAG + 1)
        ],
    )
    stack_expr = "stack({n}, {args}) AS (lag, x_lag)".format(
        n=MAX_LAG,
        args=", ".join(f"CAST({k} AS BIGINT), lag{k}" for k in range(1, MAX_LAG + 1)),
    )
    lagged = with_lags.select("event_type", "x", F.expr(stack_expr))
    return (
        lagged.groupBy("event_type", "lag")
        .agg(
            F.count("x_lag").alias("n_pairs"),
            F.round(F.corr("x", "x_lag"), 4).cast("double").alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


_INTERP_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
    nxt AS (
        SELECT event_type, bucket, cents,
               lead(bucket) OVER (PARTITION BY event_type ORDER BY bucket) AS nbucket,
               lead(cents) OVER (PARTITION BY event_type ORDER BY bucket) AS ncents
        FROM hourly),
    expanded AS (
        SELECT event_type, bucket, cents, ncents,
               CAST(date_diff('hour', bucket, nbucket) AS BIGINT) AS g,
               unnest(generate_series(0,
                   CASE WHEN nbucket IS NULL THEN 0
                        ELSE date_diff('hour', bucket, nbucket) - 1 END)) AS k
        FROM nxt)
    SELECT event_type,
           strftime(bucket + to_hours(k), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(CASE WHEN k = 0 THEN cents
                     ELSE (cents * (g - k) + ncents * k) // g END AS BIGINT)
               AS interp_cents,
           (k > 0) AS interpolated
    FROM expanded
    ORDER BY event_type, bucket
"""


@query("ts_interp_linear", oracle=_INTERP_ORACLE, tags=("timeseries", "gapfill"))
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free hourly series per event_type with LINEAR interpolation
    across missing hours — join-free lead+sequence+explode expansion,
    integer-exact interpolation in cents."""
    e = load_tables(spark, sf_dir)["events"]
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    nxt = hourly.select(
        "event_type", "bucket", "cents",
        F.lead("bucket").over(w).alias("nbucket"),
        F.lead("cents").over(w).alias("ncents"),
    )
    g = (F.unix_timestamp("nbucket") - F.unix_timestamp("bucket")) / 3600
    expanded = nxt.select(
        "event_type", "bucket", "cents", "ncents",
        g.cast("long").alias("g"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.when(F.col("nbucket").isNull(), F.lit(0).cast("long")).otherwise(
                    g.cast("long") - 1
                ),
            )
        ).alias("k"),
    )
    interp = F.when(F.col("k") == 0, F.col("cents")).otherwise(
        F.expr("(cents * (g - k) + ncents * k) div g")
    )
    return expanded.select(
        "event_type",
        F.date_format(
            F.col("bucket") + F.make_interval(hours=F.col("k").cast("int")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("bucket"),
        interp.cast("long").alias("interp_cents"),
        (F.col("k") > 0).alias("interpolated"),
    ).orderBy("event_type", "bucket")
