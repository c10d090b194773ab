"""Time-series wave 2: bar/downsample aggregation and interval
concurrency — the market-data-shaped operators over the events table.

- ``ts_ohlc_bars`` — 15-minute OHLC bars per event_type: open/close
  are the first/last value in the bar by (ts, event_id) — the
  tie-break is explicit so the result is deterministic even if two
  events share a timestamp. Implemented as one window (row_number
  asc/desc inside the bar) + one aggregate; both engines use the
  identical first/last definition, so the oracle pins the tie-break,
  not just the min/max. This is the canonical downsample: 100 TB of
  ticks → bars is a single bounded-key shuffle (bar × type), with
  partial aggregation map-side for min/max/volume.
- ``ts_concurrency_sweep`` — interval-overlap concurrency: each event
  opens an interval [ts, ts + value minutes); the classic +1/-1
  boundary sweep with a running sum yields the number of concurrently
  open intervals at every boundary; output is each event_type's peak
  concurrency and when it was first reached. The sweep's running sum
  partitions by event_type — the per-key sort is the cost, and the
  key bounds it; a single global sweep would be the unbounded-window
  anti-pattern this repo bans (SCALE.md "Window functions").

Wave-2 additions: ``ts_calendar_features`` (cross-engine-pinned
calendar extraction, weekday Mon=0 ≡ isodow-1), ``ts_seasonal_profile``
(type × weekday × hour cells with deviation from global mean; the 4-dp
rounding is done in INTEGER arithmetic — exact-cents ratios land
exactly on .xxxx5 ties where Spark's BigDecimal HALF_UP and DuckDB's
double-multiply round legally disagree), and ``ts_ewma_bounded``
(EWMA over a bounded trailing frame: truncation error (1-α)^20 sits
below output rounding, avoiding both sequential state and the
numerically-explosive (1-α)^-k closed form).

All are pure JVM expression plans (no UDFs, codegen end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

TS_FMT = "yyyy-MM-dd HH:mm:ss"
BAR = "15 minutes"

_OHLC_ORACLE = """
    WITH t AS (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bar,
               event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)), event_type
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)), event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
           event_type,
           CAST(round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS DOUBLE) AS open,
           CAST(round(max(value), 2) AS DOUBLE) AS high,
           CAST(round(min(value), 2) AS DOUBLE) AS low,
           CAST(round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS DOUBLE) AS close,
           count(*) AS n_ticks,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS volume
    FROM t
    GROUP BY bar, event_type
    ORDER BY bar_start, event_type
"""


@query("ts_ohlc_bars", oracle=_OHLC_ORACLE, tags=("timeseries", "window", "agg"))
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-min OHLC bars per event_type. First/last-in-bar are defined
    by (ts, event_id) — an explicit, hash-stable tie-break — via
    asc/desc row_number; high/low/volume are plain partial-aggregable
    min/max/decimal-sum."""
    e = load_tables(spark, sf_dir)["events"]
    t = e.select(
        F.window("ts", BAR).start.alias("bar"), "event_type", "ts", "event_id", "value"
    )
    wa = Window.partitionBy("bar", "event_type").orderBy("ts", "event_id")
    wd = Window.partitionBy("bar", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    t = t.withColumn("rn_a", F.row_number().over(wa)).withColumn("rn_d", F.row_number().over(wd))
    return (
        t.groupBy("bar", "event_type")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 2).cast("double").alias("open"),
            F.round(F.max("value"), 2).cast("double").alias("high"),
            F.round(F.min("value"), 2).cast("double").alias("low"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 2).cast("double").alias("close"),
            F.count("*").alias("n_ticks"),
            dsum(dec("value"), "volume"),
        )
        .select(F.date_format("bar", TS_FMT).alias("bar_start"), *[c for c in
                ["event_type", "open", "high", "low", "close", "n_ticks", "volume"]])
        .orderBy("bar_start", "event_type")
    )


_CONCURRENCY_ORACLE = """
    WITH pts AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS delta, event_id
        FROM events
        UNION ALL
        SELECT event_type, CAST(ts AS TIMESTAMP) + to_microseconds(CAST(round(value * 60 * 1000000) AS BIGINT)),
               -1, event_id
        FROM events
    ),
    sweep AS (
        SELECT event_type, t, delta, event_id,
               sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
        FROM pts
    ),
    ranked AS (
        SELECT event_type, t, open_now,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY open_now DESC, t, delta, event_id) AS rn
        FROM sweep
    )
    SELECT event_type,
           CAST(open_now AS BIGINT) AS peak_concurrency,
           strftime(t, '%Y-%m-%d %H:%M:%S') AS peak_at
    FROM ranked WHERE rn = 1
    ORDER BY event_type
"""


@query("ts_concurrency_sweep", oracle=_CONCURRENCY_ORACLE, tags=("timeseries", "window"))
def ts_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event_type via the +1/-1 boundary
    sweep: each event is an interval [ts, ts + value minutes); union
    the boundaries, running-sum the deltas ordered by (t, delta,
    event_id) — ends sort before starts at the same instant via
    delta=-1 < +1, making 'concurrency' right-open-interval exact —
    then take each type's first maximum."""
    e = load_tables(spark, sf_dir)["events"]
    starts = e.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id")
    ends = e.select(
        "event_type",
        (F.col("ts") + F.make_interval(secs=F.col("value") * 60)).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    pts = starts.unionByName(ends)
    ws = Window.partitionBy("event_type").orderBy("t", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = pts.withColumn("open_now", F.sum("delta").over(ws))
    wr = Window.partitionBy("event_type").orderBy(F.desc("open_now"), "t", "delta", "event_id")
    return (
        sweep.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("open_now").cast("long").alias("peak_concurrency"),
            F.date_format("t", TS_FMT).alias("peak_at"),
        )
        .orderBy("event_type")
    )


_CALENDAR_ORACLE = """
    SELECT event_id,
           CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS yr,
           CAST(quarter(CAST(ts AS TIMESTAMP)) AS INT) AS qtr,
           CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS mon,
           CAST(week(CAST(ts AS TIMESTAMP)) AS INT) AS iso_week,
           CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS dom,
           CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INT) AS wd,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
           isodow(CAST(ts AS TIMESTAMP)) >= 6 AS is_weekend,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day_str
    FROM events
    ORDER BY event_id
"""


@query("ts_calendar_features", oracle=_CALENDAR_ORACLE, tags=("timeseries", "scalar"))
def ts_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature extraction — the feature-engineering prelude to
    any seasonality model. Weekday convention is pinned cross-engine:
    Spark ``weekday()`` (Mon=0) ≡ DuckDB ``isodow - 1``; ``weekofyear``
    ≡ ``week`` (both ISO-8601). Pure row-local codegen expressions —
    no shuffle at all except the presentation sort."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.select(
            "event_id",
            F.year("ts").alias("yr"),
            F.quarter("ts").alias("qtr"),
            F.month("ts").alias("mon"),
            F.weekofyear("ts").alias("iso_week"),
            F.dayofmonth("ts").alias("dom"),
            F.weekday("ts").alias("wd"),
            F.hour("ts").alias("hr"),
            (F.weekday("ts") >= 5).alias("is_weekend"),
            F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        )
        .orderBy("event_id")
    )


_SEASONAL_ORACLE = """
    WITH g AS (
        SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
               count(*) AS n
        FROM events),
    s AS (
        SELECT event_type,
               CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INT) AS wd,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, wd, hr, s.n AS n,
           CAST(((CAST(s.cents AS HUGEINT) * 200 + s.n) // (2 * s.n)) / 10000.0 AS DOUBLE) AS cell_mean,
           CAST(((200 * (CAST(s.cents AS HUGEINT) * g.n - CAST(g.cents AS HUGEINT) * s.n)
                  + (CASE WHEN CAST(s.cents AS HUGEINT) * g.n >= CAST(g.cents AS HUGEINT) * s.n THEN 1 ELSE -1 END)
                    * CAST(s.n AS HUGEINT) * g.n)
                 // (2 * CAST(s.n AS HUGEINT) * g.n)) / 10000.0 AS DOUBLE) AS seasonal_dev
    FROM s, g
    ORDER BY event_type, wd, hr
"""


@query("ts_seasonal_profile", oracle=_SEASONAL_ORACLE, tags=("timeseries", "agg"))
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: mean value per (event_type, weekday, hour)
    cell and its deviation from the global mean — the feature table a
    seasonal-adjustment or anomaly model trains on. One partial+final
    aggregate over a 3-key bounded group (types × 7 × 24 cells), plus
    a broadcast scalar for the global mean: the output is O(cells),
    independent of input rows — ideal 100 TB shape."""
    e = load_tables(spark, sf_dir)["events"]
    # Means are RATIOS of exact integers (value is exact cents), and a
    # 2-dp sum over an even-sized cell lands EXACTLY on .xxxx5 often —
    # at a tie, Spark's round (BigDecimal HALF_UP) and DuckDB's
    # (double multiply + nearbyint) legally disagree (seen live at
    # sf0.01: 48.3863 vs 48.3862 for 290.3175/6). So the 4-dp
    # rounding itself is done in INTEGER arithmetic, identical by
    # construction on both engines: round_half_away(p/q) =
    # (2p + sign(p)·q) div (2q), with div truncating toward zero in
    # both Spark (`div`) and DuckDB (`//`). The cross products
    # (cents·gn ≈ corpus-cents × row-count) outgrow int64 around
    # sf≈100, so they are computed in DECIMAL(38,0) (Spark) / HUGEINT
    # (DuckDB): scale-0 decimals add/multiply exactly, headroom to
    # ~1e38 (sf ~1e12), and the final quotient (a 4-dp-scaled mean)
    # is long-ranged again.
    cents = F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    g = e.agg(cents, F.count("*").alias("gn")).select(
        F.col("cents").alias("gcents"), F.col("gn")
    )
    s = e.groupBy(
        "event_type", F.weekday("ts").alias("wd"), F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"), cents)
    j = s.crossJoin(F.broadcast(g))
    mean_scaled = F.expr("(CAST(cents AS DECIMAL(38,0)) * 200 + n) div (2 * n)")
    dev_scaled = F.expr(
        "(200 * (CAST(cents AS DECIMAL(38,0)) * gn - CAST(gcents AS DECIMAL(38,0)) * n)"
        " + (CASE WHEN CAST(cents AS DECIMAL(38,0)) * gn >= CAST(gcents AS DECIMAL(38,0)) * n"
        "    THEN 1 ELSE -1 END) * CAST(n AS DECIMAL(38,0)) * gn)"
        " div (2 * CAST(n AS DECIMAL(38,0)) * gn)"
    )
    return (
        j.select(
            "event_type", "wd", "hr", "n",
            (mean_scaled / 10000.0).cast("double").alias("cell_mean"),
            (dev_scaled / 10000.0).cast("double").alias("seasonal_dev"),
        )
        .orderBy("event_type", "wd", "hr")
    )


EWMA_ALPHA = 0.3
EWMA_LOOKBACK = 20  # bounded frame: (1-a)^20 ≈ 8e-4 — truncation error
# below the 4-dp rounding, with no numerically-explosive (1-a)^-k terms

_EWMA_ORACLE = f"""
    WITH w AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING AND CURRENT ROW)
                   AS vals
        FROM events WHERE user_id % 50 = 3
    )
    SELECT user_id, event_id,
           CAST(round(
               list_sum(list_transform(generate_series(1, len(vals)),
                        i -> vals[i] * {EWMA_ALPHA} * power({1 - EWMA_ALPHA}, len(vals) - i)))
               / list_sum(list_transform(generate_series(1, len(vals)),
                        i -> {EWMA_ALPHA} * power({1 - EWMA_ALPHA}, len(vals) - i)))
           , 4) AS DOUBLE) AS ewma
    FROM w ORDER BY user_id, event_id
"""


@query("ts_ewma_bounded", oracle=_EWMA_ORACLE, tags=("timeseries", "window"))
def ts_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over a BOUNDED
    trailing frame (20 events): collect the frame with a window, fold
    it with weight α(1-α)^age, normalize by the truncated weight sum.
    The bounded frame is the deliberate scale choice: the recursive
    EWMA needs sequential state (or (1-α)^-k terms that overflow
    double by k≈700), while the truncated form is one window + one
    HOF fold per row with error (1-α)^20 ≈ 8e-4 — under the output
    rounding. Same subset predicate as streaming_session_window (one
    user in 50) to bound the demo's output."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") % 50 == 3)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_LOOKBACK - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    n = F.size(F.col("vals"))
    idx = F.sequence(F.lit(1), n)
    wgt = lambda i: F.lit(EWMA_ALPHA) * F.pow(F.lit(1 - EWMA_ALPHA), (n - i).cast("double"))
    num = F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + F.element_at(F.col("vals"), i) * wgt(i)
    )
    den = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + wgt(i))
    return (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("vals", vals)
        .select(
            "user_id",
            "event_id",
            F.round(num / den, 4).cast("double").alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )
