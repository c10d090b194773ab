"""Batch time-series wave 3: changepoint detection and lagged
cross-correlation.

- ``ts_cusum_changepoint`` — single-changepoint estimation per event
  type via CUSUM: S_t = Σ_{u≤t} (x_u − x̄) over the hourly value
  series; the argmax of |S_t| is the classic estimator of where the
  mean shifted (Page 1954 shape, batch form). Pipeline: hourly
  pre-aggregation (map-side combinable — the raw stream never
  reaches a window), per-type mean as a windowed aggregate over the
  SMALL bucketed series, running-sum window ordered by hour, then a
  deterministic argmax (row_number over |S| rounded 6 dp DESC, hour
  ASC — rounding before ranking so float ties break identically on
  both engines).
- ``ts_cross_correlation`` — Pearson correlation between the
  'click' and 'purchase' hourly count series at lags 0–6 hours:
  corr(click(h), purchase(h+L)). The lag dimension is a 7-row
  broadcast (exploded from a literal sequence), the series join is
  an equi-join on the shifted hour, and corr() is one distributed
  aggregate per lag. The leading-indicator report every
  event-funnel owner asks for.

Scale: both queries collapse the raw stream to O(hours × types)
rows in their FIRST aggregation; every window/join after that runs
on the bucketed series. Windows partition by event_type (bounded
cardinality) — no global sort anywhere. Float note: hourly sums are
double; the window running sum is sequential in hour order on both
engines, and all compared values are rounded 4 dp (means differ only
in the last ulp, amplified ≲1e-11 over ≤200 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_CUSUM_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               sum(value) AS x
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, h, x,
               sum(x - m) OVER (PARTITION BY event_type ORDER BY h) AS cusum
        FROM (SELECT *, avg(x) OVER (PARTITION BY event_type) AS m FROM hourly)
    ),
    ranked AS (
        SELECT event_type, h, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(round(cusum, 6)) DESC, h) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_buckets
        FROM c
    )
    SELECT event_type,
           CAST(h AS VARCHAR) AS changepoint_hour,
           CAST(round(cusum, 4) AS DOUBLE) AS cusum_at_peak,
           CAST(n_buckets AS BIGINT) AS n_buckets
    FROM ranked WHERE rn = 1 ORDER BY event_type
"""


@query("ts_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("timeseries", "anomaly"))
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: hourly pre-agg → windowed
    mean → running sum → deterministic |S| argmax."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum("value").alias("x"))
    wtype = Window.partitionBy("event_type")
    wrun = Window.partitionBy("event_type").orderBy("h")
    c = hourly.withColumn("m", F.avg("x").over(wtype)).withColumn(
        "cusum", F.sum(F.col("x") - F.col("m")).over(wrun)
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.round("cusum", 6)).desc(), F.col("h")
    )
    return (
        c.withColumn("rn", F.row_number().over(wrank))
        .withColumn("n_buckets", F.count("*").over(wtype).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").cast("string").alias("changepoint_hour"),
            F.round("cusum", 4).alias("cusum_at_peak"),
            "n_buckets",
        )
        .orderBy("event_type")
    )


_XCORR_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS DOUBLE) AS n
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    ),
    c AS (SELECT h, n FROM hourly WHERE event_type = 'click'),
    p AS (SELECT h, n FROM hourly WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(generate_series(0, 6)) AS lag),
    joined AS (
        SELECT l.lag, c.n AS cn, p.n AS pn
        FROM lags l
        JOIN c ON true
        JOIN p ON p.h = c.h + to_hours(CAST(l.lag AS BIGINT))
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(corr(cn, pn), 4) AS DOUBLE) AS xcorr
    FROM joined GROUP BY lag ORDER BY lag
"""


@query("ts_cross_correlation", oracle=_XCORR_ORACLE, tags=("timeseries", "stats"))
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged Pearson correlation click(h) vs purchase(h+L), L∈0..6:
    bucketed series equi-joined on shifted hour, one corr() per lag."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").cast("double").alias("n"))
    )
    c = hourly.filter(F.col("event_type") == "click").select(
        F.col("h").alias("ch"), F.col("n").alias("cn")
    )
    p = hourly.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("ph"), F.col("n").alias("pn")
    )
    lags = spark.range(0, 7).select(F.col("id").cast("int").alias("lag"))
    joined = (
        c.crossJoin(F.broadcast(lags))
        .join(
            p,
            p["ph"]
            == F.col("ch") + F.col("lag") * F.expr("INTERVAL 1 HOUR"),
        )
    )
    return (
        joined.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.corr("cn", "pn"), 4).alias("xcorr"),
        )
        .orderBy("lag")
    )


_M4_ORACLE = """
    WITH b AS (
        -- explicit epoch arithmetic, not time_bucket(): bucket origin
        -- must match Spark's epoch-aligned floor exactly
        SELECT event_type,
               make_timestamp(CAST(floor(floor(epoch(ts)) / 21600) * 21600
                                   AS BIGINT) * 1000000) AS bucket,
               ts, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM b
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(value), 4) AS DOUBLE) AS v_min,
           CAST(round(max(value), 4) AS DOUBLE) AS v_max,
           CAST(round(max(CASE WHEN rn_first = 1 THEN value END), 4) AS DOUBLE)
               AS v_first,
           CAST(round(max(CASE WHEN rn_last = 1 THEN value END), 4) AS DOUBLE)
               AS v_last
    FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket
"""


@query("ts_m4_downsample", oracle=_M4_ORACLE, tags=("timeseries", "downsample"))
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (min/max/first/last per time bucket — the
    error-free line-chart reduction used by Grafana/M4 paper): one
    hash-agg with min_by/max_by selectors keyed on a (ts, event_id)
    struct so first/last are total-order deterministic, exactly the
    ts_ohlc_bars selector discipline at a different bucket width.
    Map-side combinable — M4 at 100 TB is a pre-aggregation, never a
    window."""
    ev = load_tables(spark, sf_dir)["events"]
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 21600) * 21600
            ).alias("b"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
            F.round(F.min_by("value", ordkey), 4).alias("v_first"),
            F.round(F.max_by("value", ordkey), 4).alias("v_last"),
        )
        .select(
            "event_type",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
        .orderBy("event_type", "bucket")
    )
