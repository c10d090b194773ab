"""Time-series wave 11 (round 12): Hurst exponent via rescaled-range
(R/S) analysis — Hurst (1951), Mandelbrot & Wallis (1969) — the
standard long-range-dependence probe of a traffic series. H ≈ 0.5 is
memoryless; H > 0.5 is persistent (bursts cluster — the common case
for real event streams and the reason naive capacity planning
under-provisions); H < 0.5 anti-persistent.

Series: the hourly event-count sequence (nonempty hours in time
order — the observed-sequence convention, deterministic on both
engines even when hours are missing at small SF). For each block
size n ∈ {8, 16, 32, 64}: split the sequence into ⌊N/n⌋ full
blocks; per block compute the range R of the mean-adjusted
cumulative deviate and the population std S; average R/S over
blocks; H = the log-log slope of mean(R/S) against n.

Cross-engine exactness: inside a block both statistics are integer
arithmetic until the last step —

    n·Z_t = n·P_t − t·S_b          (P_t prefix sum, S_b block sum)
    R_num = max(n·Z_t) − min(n·Z_t)
    V_num = n·ΣX² − S_b²
    R/S   = (R_num/n) / (√V_num/n) = R_num / √V_num

the n cancels, so each block's R/S is ONE IEEE division of an exact
integer by an exact integer's correctly-rounded sqrt — bit-identical
on both engines. Block means are rounded to 4 decimals BEFORE the
log-log regression, so the regression consumes identical doubles on
both engines; the slope itself is the closed-form 4-point least
squares, rounded to 4.

Scale design: the corpus-facing work is ONE map-side-combinable
hourly aggregate (the calendar-bounded collapse every ts_* query
uses — ≤ 8,760 rows/year); the position window, the ×4 block-size
fan-out, the per-block bounded frames (≤ 64 rows), and the 4-row
regression all run on that collapsed frame. Zero-variance blocks
(V_num = 0) are excluded from the mean — R/S is undefined there
(standard practice).

Reference parity note: the reference engine (`CephFsSource.java`)
has no analytics surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, batch time-series family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_BLOCK_SIZES = (8, 16, 32, 64)

_HURST_ORACLE = f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    pos AS (
        SELECT x, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS p,
               CAST(count(*) OVER () AS BIGINT) AS nn
        FROM hourly
    ),
    fan AS (
        SELECT p, x, nn, CAST(u.n AS BIGINT) AS n,
               (p - 1) // u.n AS b,
               (p - 1) % u.n + 1 AS t
        FROM pos, (SELECT unnest([{", ".join(str(n) for n in _BLOCK_SIZES)}]) AS n) u
        WHERE (p - 1) // u.n < nn // u.n
    ),
    pref AS (
        SELECT n, b, t, x,
               sum(x) OVER (PARTITION BY n, b ORDER BY t) AS pt,
               sum(x) OVER (PARTITION BY n, b) AS sb,
               sum(x * x) OVER (PARTITION BY n, b) AS sq
        FROM fan
    ),
    blocks AS (
        SELECT n, b,
               max(n * pt - t * sb) - min(n * pt - t * sb) AS r_num,
               max(n * sq - sb * sb) AS v_num
        FROM pref GROUP BY n, b
    ),
    rs AS (
        SELECT n,
               CAST(count(*) AS BIGINT) AS n_blocks,
               round(avg(r_num / sqrt(v_num)), 4) AS rs_r4
        FROM blocks WHERE v_num > 0 GROUP BY n
    ),
    pts AS (SELECT ln(CAST(n AS DOUBLE)) AS lx, ln(rs_r4) AS ly FROM rs),
    slope AS (
        -- guarded: a series long enough for only ONE block size has
        -- a degenerate regression (zero x-variance) -> no summary row
        SELECT round(
            (sum(lx * ly) - sum(lx) * sum(ly) / count(*))
            / (sum(lx * lx) - sum(lx) * sum(lx) / count(*)), 4) AS hurst_r4
        FROM pts GROUP BY 1 = 1
        HAVING count(*) >= 2
    )
    SELECT CAST(n AS BIGINT) AS block_size, n_blocks,
           CAST(rs_r4 AS DOUBLE) AS rs_r4,
           CAST(NULL AS DOUBLE) AS hurst_r4
    FROM rs
    UNION ALL
    SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(hurst_r4 AS DOUBLE)
    FROM slope
    ORDER BY block_size NULLS LAST
"""


def hurst_rescaled_range(
    series: DataFrame, block_sizes: tuple[int, ...] = _BLOCK_SIZES
) -> DataFrame:
    """Core R/S fold over a (p, x) positional series frame (p =
    1-based position, x = integer value): per-block-size mean R/S
    rows plus the log-log Hurst-slope summary row. Factored so
    closed-form model tests (a constant series has V_num = 0
    everywhere → no rs rows; a strictly alternating series is
    anti-persistent, a monotone ramp persistent → H ordering) drive
    the production stages."""
    from pyspark.sql import Window

    spark_sizes = ", ".join(str(n) for n in block_sizes)
    # nn via count() OVER () — the same bounded post-aggregation
    # frame the position window already runs on (≤ 8,760 rows/year);
    # keeps the plan lazy and single-pass (no driver-side count)
    fan = (
        series.select(
            "p",
            "x",
            # nn BEFORE the block-size explode — in the same select the
            # Window would evaluate on the post-Generate (4x) frame
            F.count("*").over(Window.partitionBy()).cast("long").alias("nn"),
        )
        .select(
            "p",
            "x",
            "nn",
            F.explode(F.expr(f"array({spark_sizes})")).alias("n"),
        )
        .select(
            "p",
            "x",
            "nn",
            F.col("n").cast("long").alias("n"),
            F.expr("(p - 1) div n").alias("b"),
            F.expr("(p - 1) % n + 1").alias("t"),
        )
        .filter(F.expr("(p - 1) div n < nn div n"))
    )
    wb = Window.partitionBy("n", "b")
    pref = fan.select(
        "n",
        "b",
        "t",
        "x",
        F.sum("x").over(wb.orderBy("t")).alias("pt"),
        F.sum("x").over(wb).alias("sb"),
        F.sum(F.expr("x * x")).over(wb).alias("sq"),
    )
    blocks = pref.groupBy("n", "b").agg(
        (
            F.max(F.expr("n * pt - t * sb")) - F.min(F.expr("n * pt - t * sb"))
        ).alias("r_num"),
        F.max(F.expr("n * sq - sb * sb")).alias("v_num"),
    )
    rs = (
        blocks.filter(F.col("v_num") > 0)
        .groupBy("n")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.round(F.avg(F.expr("r_num / sqrt(v_num)")), 4).alias("rs_r4"),
        )
    )
    pts = rs.select(
        F.log(F.col("n").cast("double")).alias("lx"),
        F.log("rs_r4").alias("ly"),
    )
    # guarded like the oracle: one usable block size -> zero
    # x-variance -> no summary row (ANSI Spark would throw
    # DIVIDE_BY_ZERO on the degenerate regression)
    slope = (
        pts.groupBy(F.expr("1 = 1").alias("_g"))
        .agg(
            F.count("*").alias("_k"),
            F.sum(F.expr("lx * ly")).alias("_sxy"),
            F.sum("lx").alias("_sx"),
            F.sum("ly").alias("_sy"),
            F.sum(F.expr("lx * lx")).alias("_sxx"),
        )
        .filter(F.col("_k") >= 2)
        .select(
            F.round(
                (F.col("_sxy") - F.col("_sx") * F.col("_sy") / F.col("_k"))
                / (F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_k")),
                4,
            ).alias("hurst_r4")
        )
    )
    return (
        rs.select(
            F.col("n").cast("long").alias("block_size"),
            "n_blocks",
            F.col("rs_r4").cast("double").alias("rs_r4"),
            F.lit(None).cast("double").alias("hurst_r4"),
        )
        .unionByName(
            slope.select(
                F.lit(None).cast("long").alias("block_size"),
                F.lit(None).cast("long").alias("n_blocks"),
                F.lit(None).cast("double").alias("rs_r4"),
                F.col("hurst_r4").cast("double").alias("hurst_r4"),
            )
        )
        .orderBy(F.col("block_size").asc_nulls_last())
    )


@query(
    "ts_hurst_rs",
    oracle=_HURST_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) analysis of the hourly event-count
    series: mean R/S per block size n ∈ {8, 16, 32, 64} (each block's
    R/S computed as exact-integer R_num / √V_num — see module
    docstring) plus the log-log-slope Hurst-exponent summary row."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("long").alias("x")
    )
    series = hourly.select(
        "x",
        F.row_number()
        .over(Window.orderBy("h"))
        .cast("long")
        .alias("p"),
    )
    return hurst_rescaled_range(series)
