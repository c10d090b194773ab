"""Aggregation wave 5: exact high-moment power sums.

``agg_moment_sums_exact`` — the foundation of distribution-shape
monitoring (skewness/kurtosis drift, the DQ signal after mean/stddev):
per-group Σx, Σx², Σx³, Σx⁴ over integer cents, EXACT. Float power
sums are the classic silent-error aggregate (catastrophic cancellation
when the 4th moment is derived from them), and their cross-row
accumulation order makes them unhashable across engines; this twin
keeps every accumulator in bounded-precision DECIMAL so the sums are
bit-exact and order-free.

Precision budget (the PCA-twin-style headroom bound, stated not
assumed): cents x < 10⁸ (fixture max ≈ 1.05×10⁷) ⇒ x is DECIMAL(8,0),
and Spark's multiply widening gives x² : D(17), x³ : D(26), x⁴ :
D(35) — exact at every step; the D(38) sum then holds ≥ 10³ headroom
over x⁴'s ≈ 1.2×10²⁸ fixture bound, i.e. exact through ~10¹⁰ rows per
group. Beyond that (true 100 TB groups) the same plan shape holds but
the accumulator must widen: per-partition partials re-accumulated in
arbitrary precision (a two-level rollup like agg_sketch_merge_exact)
— the bound is the documented contract, not a surprise.

Output: the four sums as VARCHAR (DuckDB's HUGEINT and Spark's
DECIMAL(38,0) serialize to the same digit string; hashing the string
sidesteps the dtype-kind mismatch the oracle harness rejects), plus n
and the exact integer mean. Skewness/kurtosis themselves are
DERIVED-downstream floats and deliberately not emitted — dividing
huge exact integers into doubles is where engines diverge; the sums
are the portable artifact.

Scale: one scan, map-side-combinable sums onto |groups| keys — the
same cost as any grouped sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_MOMENT_ORACLE = """
    WITH x AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS c
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(c) AS HUGEINT) AS VARCHAR) AS s1,
           CAST(CAST(sum(c * c) AS HUGEINT) AS VARCHAR) AS s2,
           CAST(CAST(sum(c * c * c) AS HUGEINT) AS VARCHAR) AS s3,
           CAST(CAST(sum(c * c * c * c) AS HUGEINT) AS VARCHAR) AS s4,
           CAST(sum(c) // count(*) AS BIGINT) AS mean_cents
    FROM x GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("agg_moment_sums_exact", oracle=_MOMENT_ORACLE, tags=("agg", "quality", "exact-twin"))
def agg_moment_sums_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group power sums Σx..Σx⁴ over price cents in
    bounded-precision DECIMAL (widths chosen so every multiply and the
    final sum stay exact — see module docstring for the headroom
    bound), serialized as digit strings for cross-engine hashing."""
    li = load_tables(spark, sf_dir)["lineitem"]
    c = F.round(F.col("l_extendedprice") * 100).cast("decimal(8,0)")
    x = li.select("l_returnflag", c.alias("c"))
    c1 = F.col("c")
    c2 = (c1 * c1)  # decimal(17,0)
    c3 = (c2 * c1)  # decimal(26,0)
    c4 = (c3 * c1)  # decimal(35,0)
    return (
        x.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(c1).cast("decimal(38,0)").alias("s1d"),
            F.sum(c2).cast("decimal(38,0)").alias("s2d"),
            F.sum(c3).cast("decimal(38,0)").alias("s3d"),
            F.sum(c4).cast("decimal(38,0)").alias("s4d"),
        )
        .select(
            "l_returnflag",
            "n",
            F.col("s1d").cast("string").alias("s1"),
            F.col("s2d").cast("string").alias("s2"),
            F.col("s3d").cast("string").alias("s3"),
            F.col("s4d").cast("string").alias("s4"),
            F.expr("CAST(CAST(s1d AS BIGINT) DIV n AS BIGINT)").alias("mean_cents"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Winsorized mean (round 9, session 3): the robust-center companion to
# agg_weighted_median / agg_mode_deterministic. A plain mean of event
# values is wrecked by a single fat-fingered amount; the winsorized
# mean clamps every value to the exact [p5, p95] selection bounds
# before averaging — the standard treatment for heavy-tailed revenue
# series (Tukey). Everything is exact: values are cents (the
# round(value*100) house convention), the percentile bounds are LOWER
# SELECTIONS at rank ceil(p*n) = (n*p + 99) div 100 (no
# interpolation), and the mean is a sign-split integral div, so the
# driver hash pins the whole statistic.
#
# Scale: one rank window per event_type (the dq_roc_auc per-row window
# class), a broadcast-able 1-row-per-type bounds join, then one
# map-side-combinable clamp-sum fold. Output: one row per event_type.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    bounds AS (
        SELECT event_type, max(n) AS n,
               min(CASE WHEN rn = greatest(1, (n * 5 + 99) // 100)
                        THEN cents END) AS lo,
               min(CASE WHEN rn = greatest(1, (n * 95 + 99) // 100)
                        THEN cents END) AS hi
        FROM r GROUP BY event_type
    ),
    clamped AS (
        SELECT v.event_type, b.n, b.lo, b.hi,
               least(greatest(v.cents, b.lo), b.hi) AS c
        FROM v JOIN bounds b ON v.event_type = b.event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(lo AS BIGINT) AS lo_cents,
           CAST(hi AS BIGINT) AS hi_cents,
           CAST(sum(c) AS BIGINT) AS winsorized_sum_cents,
           CAST(CASE WHEN sum(c) >= 0 THEN sum(c) // n
                     ELSE -((-sum(c)) // n) END AS BIGINT) AS winsorized_mean_cents
    FROM clamped GROUP BY event_type, n, lo, hi
    ORDER BY event_type
"""


def winsorized_mean(values: DataFrame, key: str = "event_type") -> DataFrame:
    """Core winsorized-mean fold over a ``(key, cents)`` frame: exact
    p5/p95 lower-selection bounds, clamp, sign-split integral-div
    mean. Factored so planted tests (outlier-immunity: one huge value
    clamps to hi and moves the mean by a bounded amount; symmetric
    data keeps its center) drive the production arithmetic."""
    w = Window.partitionBy(key).orderBy("cents")
    r = values.select(
        key,
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(key)).alias("n"),
    )
    bounds = r.groupBy(key).agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("rn") == F.expr("greatest(1, (n * 5 + 99) div 100)"), F.col("cents"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("greatest(1, (n * 95 + 99) div 100)"), F.col("cents"))
        ).alias("hi"),
    )
    clamped = values.join(F.broadcast(bounds), key).select(
        key,
        "n",
        "lo",
        "hi",
        F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")).alias("c"),
    )
    return (
        clamped.groupBy(key, "n", "lo", "hi")
        .agg(F.sum("c").alias("sc"))
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            F.col("lo").cast("long").alias("lo_cents"),
            F.col("hi").cast("long").alias("hi_cents"),
            F.col("sc").cast("long").alias("winsorized_sum_cents"),
            F.expr(
                "CAST(CASE WHEN sc >= 0 THEN sc div n"
                " ELSE -((-sc) div n) END AS BIGINT)"
            ).alias("winsorized_mean_cents"),
        )
        .orderBy(key)
    )


@query("agg_winsorized_mean", oracle=_WINSOR_ORACLE, tags=("aggregate", "stats", "exact-twin"))
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event value (cents) per event_type: exact
    p5/p95 selection bounds, clamp, integral-div mean — the robust
    center a revenue dashboard should show instead of the raw mean
    whenever the tail is fat (one corrupted amount moves the raw mean
    unboundedly; here it clamps to the p95 bound)."""
    ev = load_tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    return winsorized_mean(v, "event_type")


# ---------------------------------------------------------------------------
# Log2 (HdrHistogram-lite) value histogram (built round 9 session 3,
# registered round 10 per the r9->r10 handoff): per
# event_type, bucket every positive cent amount by its binary length
# (len = floor(log2(x)) + 1 — computed EXACTLY as length(bin(x)),
# identical integer semantics on Spark and DuckDB, no float log2
# whose boundary rounding could diverge), with zero/negative counts
# reported separately. Exponential buckets are the standard shape for
# latency/amount distributions where equi-width bins waste all their
# resolution on the head; the whole histogram is one map-side-
# combinable groupBy.
# ---------------------------------------------------------------------------

_LOG2_HIST_ORACLE = """
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    pos AS (
        SELECT event_type,
               CAST(length(bin(cents)) AS BIGINT) AS bucket
        FROM v WHERE cents > 0
    ),
    hist AS (
        SELECT event_type, bucket,
               CAST(2 AS BIGINT) ** (bucket - 1) AS lo_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM pos GROUP BY event_type, bucket
    ),
    np AS (
        SELECT event_type,
               CAST(0 AS BIGINT) AS bucket,
               CAST(0 AS BIGINT) AS lo_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM v WHERE cents <= 0 GROUP BY event_type
        HAVING count(*) > 0
    )
    SELECT event_type, bucket, CAST(lo_cents AS BIGINT) AS lo_cents, n
    FROM (SELECT * FROM hist UNION ALL SELECT * FROM np)
    ORDER BY event_type, bucket
"""


def log2_histogram(values: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exponential-bucket fold over a ``(key, cents)`` frame:
    bucket = length(bin(cents)) for positive cents (bucket 0 holds
    zero/negative), lo_cents = 2^(bucket-1). Factored so boundary
    model tests (1023 -> bucket 10, 1024 -> bucket 11) drive the
    production expression."""
    pos = values.filter(F.col("cents") > 0).select(
        key, F.length(F.bin(F.col("cents"))).cast("long").alias("bucket")
    )
    hist = pos.groupBy(key, "bucket").agg(F.count("*").cast("long").alias("n")).select(
        key,
        "bucket",
        F.expr("CAST(pow(2, bucket - 1) AS BIGINT)").alias("lo_cents"),
        "n",
    )
    np_ = (
        values.filter(F.col("cents") <= 0)
        .groupBy(key)
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            key,
            F.lit(0).cast("long").alias("bucket"),
            F.lit(0).cast("long").alias("lo_cents"),
            "n",
        )
    )
    return hist.unionByName(np_).orderBy(key, "bucket")


@query(
    "agg_log2_histogram",
    oracle=_LOG2_HIST_ORACLE,
    tags=("aggregate", "histogram", "exact-twin"),
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (power-of-2) histogram of event value cents per
    event_type — exact integer bucketing via binary length, no float
    log2. Cross-engine pinned at all three SFs by
    test_log2_histogram_matches_duckdb_oracle."""
    ev = load_tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    return log2_histogram(v, "event_type")
