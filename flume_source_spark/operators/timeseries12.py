"""Time-series wave 12 (round 12): seasonal / trend strength — the
two-number summary of the additive decomposition (Hyndman &
Athanasopoulos, FPP3 §4.3; the STL "measure of strength" every
forecast triage dashboard sorts series by):

    F_seasonal = max(0, 1 − Var(R) / Var(S + R))
    F_trend    = max(0, 1 − Var(R) / Var(T + R))

computed per event_type over the EXACT scaled-integer decomposition
already registered as ``ts_seasonal_decompose_exact``
(operators/timeseries8.py — trend = centered 7-day MA, seasonal =
day-of-week means, all in 10⁶-scaled integers via remainder-strip
division).

Cross-engine exactness: with every component an exact integer and
both variances over the SAME n rows, the population-variance ratio
collapses to a pure integer fraction —

    Var(R)/Var(X) = (n·ΣR² − (ΣR)²) / (n·ΣX² − (ΣX)²)

(the n² denominators cancel), so each strength is one floored-ppm
integer division. Squares of 10⁶-scaled values need
DECIMAL(38,0)/HUGEINT (the timeseries9 headroom discipline:
n·Σx² ≤ 10³⁸ holds through ~10¹² daily rows — centuries of days).
Zero-variance denominators (a constant detrended series) publish
NULL strength rather than a fabricated number.

Scale design: inherits the decompose plan (daily collapse → two
bounded window passes → 7-key join); the strength fold is one
map-side-combinable aggregate per event_type over the
calendar-bounded daily frame. Output: one row per event_type.

Reference parity note: the reference engine (`CephFsSource.java`)
has no analytics surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, batch time-series family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.operators.timeseries8 import (
    _strip_div_sql,
    seasonal_decompose_daily,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# the decompose CTE chain (daily → idx → ma → tr → sea → comp),
# identical to _DECOMP_ORACLE's chain with the residual joined in
_DECOMP_CTE = f"""
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                    AS BIGINT) AS t
        FROM daily
    ),
    ma AS (
        SELECT event_type, t, y,
               sum(y) OVER w AS wsum,
               count(*) OVER w AS wn
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    tr AS (
        SELECT event_type, t, y,
               {_strip_div_sql("wsum * 1000000", "7")} AS trend_s,
               y * 1000000 - {_strip_div_sql("wsum * 1000000", "7")} AS detr
        FROM ma WHERE wn = 7
    ),
    sea AS (
        SELECT event_type, t % 7 AS dow,
               {_strip_div_sql("sum(detr)", "count(*)")} AS seasonal_s
        FROM tr GROUP BY event_type, t % 7
    ),
    comp AS (
        SELECT tr.event_type,
               CAST(tr.detr - sea.seasonal_s AS HUGEINT) AS r,
               CAST(tr.detr AS HUGEINT) AS sr,
               CAST(tr.y * 1000000 - sea.seasonal_s AS HUGEINT) AS tr_r
        FROM tr JOIN sea
          ON tr.event_type = sea.event_type AND tr.t % 7 = sea.dow
    )"""


_STRENGTH_ORACLE = f"""
    WITH {_DECOMP_CTE},
    v AS (
        SELECT event_type,
               CAST(count(*) AS HUGEINT) AS n,
               sum(r) AS s_r, sum(r * r) AS q_r,
               sum(sr) AS s_sr, sum(sr * sr) AS q_sr,
               sum(tr_r) AS s_tr, sum(tr_r * tr_r) AS q_tr
        FROM comp GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN n * q_sr - s_sr * s_sr > 0 THEN
                greatest(0, 1000000 - (n * q_r - s_r * s_r) * 1000000
                            // (n * q_sr - s_sr * s_sr))
                END AS BIGINT) AS seasonal_strength_ppm,
           CAST(CASE WHEN n * q_tr - s_tr * s_tr > 0 THEN
                greatest(0, 1000000 - (n * q_r - s_r * s_r) * 1000000
                            // (n * q_tr - s_tr * s_tr))
                END AS BIGINT) AS trend_strength_ppm
    FROM v
    ORDER BY event_type
"""


def seasonal_strength(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core strength fold over a (key, d, y) daily frame: exact
    decomposition → per-key integer variance-ratio strengths in
    floored ppm. Factored so closed-form model tests (a pure
    trend+season series → residual 0 → both strengths exactly 1e6;
    white noise around a constant → both ≈ 0; NULL on zero-variance
    denominators) drive the production stages."""
    comp = seasonal_decompose_daily(daily, key).select(
        key,
        F.expr("CAST(residual_s AS DECIMAL(38,0))").alias("r"),
        F.expr(
            "CAST(seasonal_s + residual_s AS DECIMAL(38,0))"
        ).alias("sr"),
        F.expr(
            "CAST(trend_s + residual_s AS DECIMAL(38,0))"
        ).alias("tr_r"),
    )
    v = comp.groupBy(key).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r").alias("s_r"),
        F.sum(F.expr("r * r")).alias("q_r"),
        F.sum("sr").alias("s_sr"),
        F.sum(F.expr("sr * sr")).alias("q_sr"),
        F.sum("tr_r").alias("s_tr"),
        F.sum(F.expr("tr_r * tr_r")).alias("q_tr"),
    )
    return v.select(
        key,
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN n * q_sr - s_sr * s_sr > 0 THEN"
            " greatest(CAST(0 AS DECIMAL(38,0)),"
            "  1000000 - (n * q_r - s_r * s_r) * 1000000"
            "  div (n * q_sr - s_sr * s_sr))"
            " END AS BIGINT)"
        ).alias("seasonal_strength_ppm"),
        F.expr(
            "CAST(CASE WHEN n * q_tr - s_tr * s_tr > 0 THEN"
            " greatest(CAST(0 AS DECIMAL(38,0)),"
            "  1000000 - (n * q_r - s_r * s_r) * 1000000"
            "  div (n * q_tr - s_tr * s_tr))"
            " END AS BIGINT)"
        ).alias("trend_strength_ppm"),
    ).orderBy(key)


@query(
    "ts_seasonal_strength",
    oracle=_STRENGTH_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend strength per event_type (FPP3's
    variance-ratio measures over the exact scaled-integer
    decomposition) in floored ppm — the two numbers that rank
    thousands of series by "how seasonal / how trended" for forecast
    triage."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return seasonal_strength(daily)
