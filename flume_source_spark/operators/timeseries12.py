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


_MWU_ORACLE = """
    WITH obs AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CAST(event_type = 'click' AS BIGINT) AS g1
        FROM events WHERE event_type IN ('click', 'view')
    ),
    cells AS (
        SELECT v, CAST(sum(g1) AS BIGINT) AS n1_v,
               CAST(count(*) AS BIGINT) AS t_v
        FROM obs GROUP BY v
    ),
    ranked AS (
        SELECT v, n1_v, t_v,
               CAST(2 * coalesce(sum(t_v) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + t_v + 1 AS BIGINT) AS dmr
        FROM cells
    ),
    fold AS (
        SELECT CAST(sum(n1_v) AS BIGINT) AS n1,
               CAST(sum(t_v - n1_v) AS BIGINT) AS n2,
               CAST(sum(t_v) AS BIGINT) AS n,
               CAST(sum(CAST(n1_v AS HUGEINT) * dmr) AS HUGEINT) AS r1_x2,
               CAST(sum(CAST(t_v AS HUGEINT) * t_v * t_v - t_v) AS HUGEINT)
                   AS tie_term
        FROM ranked GROUP BY 1 = 1
    )
    SELECT n1, n2,
           CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(tie_term AS BIGINT) AS tie_term,
           CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN
                (r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) * 1000000
                // (2 * CAST(n1 AS HUGEINT) * n2) END AS BIGINT) AS auc_ppm,
           CAST(CASE WHEN CAST(n1 AS HUGEINT) * n2
                          * ((CAST(n AS HUGEINT) + 1) * n * (n - 1) - tie_term)
                          > 0 THEN
               round(
               CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)
                    - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
               / (2 * sqrt(
                   CAST(CAST(n1 AS HUGEINT) * n2
                        * ((CAST(n AS HUGEINT) + 1) * n * (n - 1) - tie_term)
                        AS DOUBLE)
                   / CAST(12 * CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))),
               4) END AS DOUBLE) AS z_r4
    FROM fold
"""


def mann_whitney_u(obs: DataFrame) -> DataFrame:
    """Core rank-sum fold over a (v, g1) frame — v an integer
    measurement, g1 ∈ {0, 1} group membership: the exact
    tie-midranked Mann-Whitney U (doubled, so it stays integral), the
    AUC equivalent U/(n1·n2) in floored ppm, the tie term Σ(t³−t),
    and the tie-corrected normal z (the ONLY float: one division and
    one sqrt of exact integers, rounded 4). Factored so closed-form
    model tests (complete separation → AUC 1e6; identical groups on
    a shared value → U = n1n2/2, z = 0; a hand-ranked 2×2 case)
    drive the production stages.

    Scale: one map-side-combinable collapse onto the measurement's
    value domain (bounded by the cent grid, not the corpus — the
    dq_roc_auc discipline), a cumulative window over the collapsed
    cells, and a 1-row fold. Wide products (n³) ride
    DECIMAL(38,0)/HUGEINT."""
    from pyspark.sql import Window

    cells = obs.groupBy("v").agg(
        F.sum("g1").cast("long").alias("n1_v"),
        F.count("*").cast("long").alias("t_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "v",
        "n1_v",
        "t_v",
        (
            F.lit(2) * F.coalesce(F.sum("t_v").over(w), F.lit(0))
            + F.col("t_v")
            + 1
        )
        .cast("long")
        .alias("dmr"),
    )
    fold = ranked.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("n1_v").cast("long").alias("n1"),
        F.sum(F.expr("t_v - n1_v")).cast("long").alias("n2"),
        F.sum("t_v").cast("long").alias("n"),
        F.sum(F.expr("CAST(n1_v AS DECIMAL(38,0)) * dmr")).alias("r1_x2"),
        F.sum(
            F.expr("CAST(t_v AS DECIMAL(38,0)) * t_v * t_v - t_v")
        ).alias("tie_term"),
    )
    return fold.select(
        "n1",
        "n2",
        F.expr(
            "CAST(r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS BIGINT)"
        ).alias("u1_x2"),
        F.expr("CAST(tie_term AS BIGINT)").alias("tie_term"),
        F.expr(
            "CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN"
            " (r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) * 1000000"
            " div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) END AS BIGINT)"
        ).alias("auc_ppm"),
        F.expr(
            "CAST(CASE WHEN CAST(n1 AS DECIMAL(38,0)) * n2"
            "     * ((CAST(n AS DECIMAL(38,0)) + 1) * n * (n - 1) - tie_term)"
            "     > 0 THEN round("
            " CAST(r1_x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)"
            "      - CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)"
            " / (2 * sqrt("
            "     CAST(CAST(n1 AS DECIMAL(38,0)) * n2"
            "          * ((CAST(n AS DECIMAL(38,0)) + 1) * n * (n - 1)"
            "             - tie_term) AS DOUBLE)"
            "     / CAST(12 * CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE))),"
            " 4) END AS DOUBLE)"
        ).alias("z_r4"),
    )


@query(
    "ts_mann_whitney_u",
    oracle=_MWU_ORACLE,
    tags=("timeseries", "stats", "test"),
)
def ts_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon/Mann-Whitney rank-sum test of click vs view event
    values: exact tie-midranked U (doubled), its AUC form in floored
    ppm, the tie term, and the tie-corrected z — the nonparametric
    "are these two value distributions the same" test a metrics
    review runs before trusting a mean shift."""
    ev = load_tables(spark, sf_dir)["events"]
    obs = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).cast("long").alias("g1"),
    )
    return mann_whitney_u(obs)


LB_MAX_LAG = 6

_LJUNG_BOX_ORACLE = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM hourly GROUP BY event_type
    ),
    y AS (
        SELECT h.event_type, h.bucket,
               CAST(t.n AS HUGEINT) * h.cents - t.s AS yv, t.n
        FROM hourly h JOIN tot t ON t.event_type = h.event_type
    ),
    lagged AS (
        SELECT event_type, n, yv,
               lag(yv, k) OVER (PARTITION BY event_type, k ORDER BY bucket)
                   AS yl,
               CAST(k AS BIGINT) AS k
        FROM y CROSS JOIN (SELECT unnest(generate_series(1, {LB_MAX_LAG})) AS k)
    ),
    den AS (
        SELECT event_type, CAST(sum(yv * yv) AS HUGEINT) AS den
        FROM y GROUP BY event_type
    ),
    sums AS (
        SELECT l.event_type, l.k, max(l.n) AS n,
               CAST(sum(l.yv * l.yl) AS HUGEINT) AS num,
               max(d.den) AS den
        FROM lagged l JOIN den d ON d.event_type = l.event_type
        WHERE l.yl IS NOT NULL
        GROUP BY l.event_type, l.k
    ),
    r AS (
        SELECT event_type, k, n,
               CAST(num * 1000000 // den AS BIGINT) AS r_ppm
        FROM sums
    )
    SELECT event_type, k AS lag, n AS n_obs, r_ppm,
           CAST(sum((CAST(n AS HUGEINT) * (n + 2)
                     * (CAST(r_ppm AS HUGEINT) * r_ppm))
                    // (CAST(n - k AS HUGEINT) * 1000000))
                OVER (PARTITION BY event_type ORDER BY k) AS BIGINT)
               AS q_cum_ppm
    FROM r
    ORDER BY event_type, lag
"""


def ljung_box(hourly: DataFrame, max_lag: int = LB_MAX_LAG) -> DataFrame:
    """Core portmanteau fold over an (event_type, bucket, cents)
    series frame: exact-integer autocorrelations on the mean-scaled
    series y_t = n·x_t − S (the n² factors cancel in the ratio), each
    r_k published in floored ppm, and the Ljung-Box statistic

        Q(h) = n(n+2) Σ_{k≤h} r_k² / (n−k)

    accumulated on the PPM GRID (each term uses the already-floored
    r_ppm — engine-identical; the den² form would overflow even
    DECIMAL(38) at n ≈ 700 with cent-scaled series). Factored so
    closed-form model tests (an alternating series → r_1 ≈ −1e6 and
    Q explodes; white-noise-free constants → empty) drive the
    production stages.

    Scale: one calendar-bounded hourly collapse; per-type scalar
    totals broadcast back; ONE window pass computes all lags
    (stacked); the cumulative Q runs over ≤ max_lag rows."""
    from pyspark.sql import Window

    r = _acf_ppm_frame(hourly, max_lag)
    wq = Window.partitionBy("event_type").orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return r.select(
        "event_type",
        F.col("k").alias("lag"),
        F.col("n").alias("n_obs"),
        "r_ppm",
        F.sum(
            F.expr(
                "(CAST(n AS DECIMAL(38,0)) * (n + 2)"
                " * (CAST(r_ppm AS DECIMAL(38,0)) * r_ppm))"
                " div (CAST(n - k AS DECIMAL(38,0)) * 1000000)"
            )
        )
        .over(wq)
        .cast("long")
        .alias("q_cum_ppm"),
    ).orderBy("event_type", "lag")


@query(
    "ts_ljung_box",
    oracle=_LJUNG_BOX_ORACLE,
    tags=("timeseries", "stats", "test"),
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test per event_type over
    the hourly cents series: exact-integer r_k in floored ppm at lags
    1..6 and the cumulative Q statistic on the ppm grid — the "is
    this series white noise" gate run before fitting any forecast
    model (compare Q at lag h against χ²_h)."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return ljung_box(hourly)


# shared hourly-ACF CTE for the Ljung-Box and PACF oracles: ends in
# r(event_type, k, n, r_ppm) on the truncating-ppm grid (both engines
# truncate integral division toward zero — verified on negatives)
_ACF_PPM_CTE = f"""
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM hourly GROUP BY event_type
    ),
    y AS (
        SELECT h.event_type, h.bucket,
               CAST(t.n AS HUGEINT) * h.cents - t.s AS yv, t.n
        FROM hourly h JOIN tot t ON t.event_type = h.event_type
    ),
    lagged AS (
        SELECT event_type, n, yv,
               lag(yv, k) OVER (PARTITION BY event_type, k ORDER BY bucket)
                   AS yl,
               CAST(k AS BIGINT) AS k
        FROM y CROSS JOIN (SELECT unnest(generate_series(1, {LB_MAX_LAG})) AS k)
    ),
    den AS (
        SELECT event_type, CAST(sum(yv * yv) AS HUGEINT) AS den
        FROM y GROUP BY event_type
    ),
    sums AS (
        SELECT l.event_type, l.k, max(l.n) AS n,
               CAST(sum(l.yv * l.yl) AS HUGEINT) AS num,
               max(d.den) AS den
        FROM lagged l JOIN den d ON d.event_type = l.event_type
        WHERE l.yl IS NOT NULL
        GROUP BY l.event_type, l.k
    ),
    r AS (
        SELECT event_type, k, n,
               CAST(num * 1000000 // den AS BIGINT) AS r_ppm
        FROM sums
    )"""

_PACF_ORACLE = f"""
    WITH {_ACF_PPM_CTE},
    wide AS (
        SELECT event_type, max(n) AS n_obs,
               max(CASE WHEN k = 1 THEN r_ppm END) AS r1,
               max(CASE WHEN k = 2 THEN r_ppm END) AS r2,
               max(CASE WHEN k = 3 THEN r_ppm END) AS r3
        FROM r GROUP BY event_type
    ),
    dl AS (
        SELECT event_type, n_obs, r1, r2, r3,
               CASE WHEN 1000000000000 - r1 * r1 <> 0 THEN
                   ((r2 * 1000000 - r1 * r1) * 1000000)
                   // (1000000000000 - r1 * r1)
               END AS p2
        FROM wide
    ),
    dl2 AS (
        SELECT event_type, n_obs, r1, r2, r3, p2,
               r1 - (p2 * r1) // 1000000 AS a21
        FROM dl
    ),
    dl3 AS (
        SELECT event_type, n_obs, r1, r2, r3, p2,
               r3 - (a21 * r2) // 1000000 - (p2 * r1) // 1000000 AS n3,
               1000000 - (a21 * r1) // 1000000 - (p2 * r2) // 1000000 AS d3
        FROM dl2
    )
    SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(r1 AS BIGINT) AS r1_ppm,
           CAST(r2 AS BIGINT) AS r2_ppm,
           CAST(r3 AS BIGINT) AS r3_ppm,
           CAST(r1 AS BIGINT) AS pacf1_ppm,
           CAST(p2 AS BIGINT) AS pacf2_ppm,
           CAST(CASE WHEN d3 <> 0 THEN (n3 * 1000000) // d3 END AS BIGINT)
               AS pacf3_ppm
    FROM dl3
    ORDER BY event_type
"""


def pacf_durbin_levinson(hourly: DataFrame) -> DataFrame:
    """Partial autocorrelations at lags 1..3 via the Durbin-Levinson
    recursion, unrolled on the truncating-ppm grid over the exact
    integer ACF (the Ljung-Box fold's r_ppm): pacf₁ = r₁ by
    definition; pacf₂ = (r₂ − r₁²)/(1 − r₁²); pacf₃ from the level-2
    coefficients — every product floored to ppm identically on both
    engines, degenerate denominators (|r₁| = 1, level-3 D = 0)
    publish NULL. Factored so model tests (pacf₁ ≡ r₁; an AR(1)-like
    smooth series has |pacf₂| ≪ |pacf₁|) drive the production
    stages."""
    from pyspark.sql import Window  # noqa: F401 (parity with siblings)

    r = _acf_ppm_frame(hourly)
    wide = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_obs"),
        F.max(F.when(F.col("k") == 1, F.col("r_ppm"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("r_ppm"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("r_ppm"))).alias("r3"),
    )
    dl = wide.withColumn(
        "p2",
        F.expr(
            "CASE WHEN 1000000000000 - r1 * r1 <> 0 THEN"
            " ((r2 * 1000000 - r1 * r1) * 1000000)"
            " div (1000000000000 - r1 * r1) END"
        ),
    ).withColumn("a21", F.expr("r1 - (p2 * r1) div 1000000"))
    dl3 = dl.withColumn(
        "n3", F.expr("r3 - (a21 * r2) div 1000000 - (p2 * r1) div 1000000")
    ).withColumn(
        "d3", F.expr("1000000 - (a21 * r1) div 1000000 - (p2 * r2) div 1000000")
    )
    return dl3.select(
        "event_type",
        "n_obs",
        F.col("r1").cast("long").alias("r1_ppm"),
        F.col("r2").cast("long").alias("r2_ppm"),
        F.col("r3").cast("long").alias("r3_ppm"),
        F.col("r1").cast("long").alias("pacf1_ppm"),
        F.col("p2").cast("long").alias("pacf2_ppm"),
        F.expr(
            "CAST(CASE WHEN d3 <> 0 THEN (n3 * 1000000) div d3 END AS BIGINT)"
        ).alias("pacf3_ppm"),
    ).orderBy("event_type")


def _acf_ppm_frame(hourly: DataFrame, max_lag: int = LB_MAX_LAG) -> DataFrame:
    """The exact-integer ACF fold shared by ljung_box and the PACF:
    (event_type, k, n, r_ppm) on the truncating-ppm grid."""
    from pyspark.sql import Window

    tot = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    y = hourly.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket",
        "n",
        F.expr("CAST(n AS DECIMAL(38,0)) * cents - s").alias("yv"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    with_lags = y.select(
        "event_type",
        "n",
        "yv",
        *[
            F.lag("yv", k).over(w).alias(f"lag{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_expr = "stack({m}, {args}) AS (k, yl)".format(
        m=max_lag,
        args=", ".join(
            f"CAST({k} AS BIGINT), lag{k}" for k in range(1, max_lag + 1)
        ),
    )
    lagged = with_lags.select("event_type", "n", "yv", F.expr(stack_expr))
    den = y.groupBy("event_type").agg(F.sum(F.expr("yv * yv")).alias("den"))
    sums = (
        lagged.filter(F.col("yl").isNotNull())
        .groupBy("event_type", "k")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.expr("yv * yl")).alias("num"),
        )
        .join(F.broadcast(den), "event_type")
    )
    return sums.select(
        "event_type",
        "k",
        "n",
        F.expr("CAST(num * 1000000 div den AS BIGINT)").alias("r_ppm"),
    )


@query(
    "ts_pacf_durbin_levinson",
    oracle=_PACF_ORACLE,
    tags=("timeseries", "stats"),
)
def ts_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations of the hourly cents series per
    event_type at lags 1..3 (Durbin-Levinson on the ppm grid over the
    exact integer ACF) — the AR-order fingerprint read next to the
    ACF when choosing a forecasting model."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    return pacf_durbin_levinson(hourly)


_ENTROPY_RATE_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
    tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
            FROM trans GROUP BY from_type),
    grand AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM trans),
    cond AS (
        SELECT t.from_type, max(o.row_total) AS row_total,
               round(-sum((CAST(t.n AS DOUBLE) / o.row_total)
                          * ln(CAST(t.n AS DOUBLE) / o.row_total)), 4)
                   AS h_cond_r4
        FROM trans t JOIN tot o USING (from_type)
        GROUP BY t.from_type
    )
    SELECT from_type, row_total,
           CAST(h_cond_r4 AS DOUBLE) AS h_cond_r4,
           CAST(NULL AS DOUBLE) AS entropy_rate_r4
    FROM cond
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), g.nn, CAST(NULL AS DOUBLE),
           CAST(round(-sum((CAST(t.n AS DOUBLE) / g.nn)
                           * ln(CAST(t.n AS DOUBLE) / o.row_total)), 4)
                AS DOUBLE)
    FROM trans t JOIN tot o USING (from_type) CROSS JOIN grand g
    GROUP BY g.nn
    ORDER BY from_type NULLS LAST
"""


def markov_entropy_rate(events: DataFrame) -> DataFrame:
    """Plug-in entropy rate of the first-order event-type Markov
    chain: per-state conditional entropy H_i = −Σ_j p_ij ln p_ij
    (nats, rounded 4) and the chain rate H = −Σ_ij (n_ij/N) ln p_ij
    with the empirical from-state weights — the predictability
    number a session-stream anomaly detector baselines against (0 =
    deterministic next event; ln k = uniform). Factored so
    closed-form model tests (a deterministic cycle → 0 everywhere; a
    uniform 2-state coin → ln 2) drive the production stages.

    Scale: the ts_transition_matrix plan — one user_id window, one
    |types|²-cell aggregate; everything after is cell-sized. Floats:
    ln/division doubles over exact counts, rounded on both engines
    (the text_char_entropy precedent)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=True)  # one window pass, three consumers
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    grand = trans.agg(F.sum("n").cast("long").alias("nn"))
    joined = trans.join(F.broadcast(tot), "from_type")
    cond = joined.groupBy("from_type").agg(
        F.max("row_total").cast("long").alias("row_total"),
        F.round(
            -F.sum(
                (F.col("n").cast("double") / F.col("row_total"))
                * F.log(F.col("n").cast("double") / F.col("row_total"))
            ),
            4,
        ).alias("h_cond_r4"),
    )
    rate = (
        joined.crossJoin(F.broadcast(grand))
        .groupBy("nn")
        .agg(
            F.round(
                -F.sum(
                    (F.col("n").cast("double") / F.col("nn"))
                    * F.log(
                        F.col("n").cast("double") / F.col("row_total")
                    )
                ),
                4,
            ).alias("entropy_rate_r4")
        )
    )
    return (
        cond.select(
            "from_type",
            "row_total",
            F.col("h_cond_r4").cast("double").alias("h_cond_r4"),
            F.lit(None).cast("double").alias("entropy_rate_r4"),
        )
        .unionByName(
            rate.select(
                F.lit(None).cast("string").alias("from_type"),
                F.col("nn").cast("long").alias("row_total"),
                F.lit(None).cast("double").alias("h_cond_r4"),
                F.col("entropy_rate_r4").cast("double").alias("entropy_rate_r4"),
            )
        )
        .orderBy(F.col("from_type").asc_nulls_last())
    )


@query(
    "ts_markov_entropy_rate",
    oracle=_ENTROPY_RATE_ORACLE,
    tags=("timeseries", "markov", "stats"),
)
def ts_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type succession chain:
    per-state conditional entropies plus the empirical-weighted chain
    rate in nats (rounded 4) — the predictability summary of
    ts_transition_matrix's census."""
    ev = load_tables(spark, sf_dir)["events"]
    return markov_entropy_rate(ev.select("user_id", "event_type", "ts", "event_id"))


_TURNING_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    ctx AS (
        SELECT event_type, y,
               lag(y) OVER (PARTITION BY event_type ORDER BY d) AS yp,
               lead(y) OVER (PARTITION BY event_type ORDER BY d) AS yn
        FROM daily
    ),
    f AS (
        SELECT event_type,
               CAST(count(*) + 2 AS BIGINT) AS n,
               CAST(sum(CASE WHEN (yp < y AND y > yn)
                             OR (yp > y AND y < yn) THEN 1 ELSE 0 END)
                    AS BIGINT) AS t_count
        FROM ctx WHERE yp IS NOT NULL AND yn IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n, t_count,
           CAST((2 * (n - 2) * 1000000) // 3 AS BIGINT) AS expected_ppm,
           CAST(CASE WHEN 16 * n - 29 > 0 THEN round(
               (CAST(t_count AS DOUBLE) - 2.0 * (n - 2) / 3.0)
               / sqrt((16.0 * n - 29.0) / 90.0), 4) END AS DOUBLE) AS z_r4
    FROM f
    ORDER BY event_type
"""


def turning_points(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Wallis-Moore turning-point test over a (key, d, y) daily
    frame: count strict local extrema (ties break the turning point —
    documented; the classical test assumes a continuous series),
    compare against the i.i.d. expectation 2(n−2)/3 with variance
    (16n−29)/90, publish the exact count, the expectation in floored
    ppm, and the normal z (the only floats: one division + one sqrt
    of exact integers, rounded 4). Too few turning points ⇒ trending
    (z ≪ 0); too many ⇒ oscillating faster than noise (z ≫ 0).
    Factored so closed-form model tests (a monotone ramp → 0 turning
    points; a strict alternation → every interior point turns) drive
    the production stages.

    Scale: the calendar-bounded daily collapse + one lag/lead window
    per key + a per-key fold."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("d")
    ctx = daily.select(
        key,
        "y",
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
    )
    turn = F.when(
        ((F.col("yp") < F.col("y")) & (F.col("y") > F.col("yn")))
        | ((F.col("yp") > F.col("y")) & (F.col("y") < F.col("yn"))),
        1,
    ).otherwise(0)
    f = (
        ctx.filter(F.col("yp").isNotNull() & F.col("yn").isNotNull())
        .groupBy(key)
        .agg(
            (F.count("*") + 2).cast("long").alias("n"),
            F.sum(turn).cast("long").alias("t_count"),
        )
    )
    return f.select(
        key,
        "n",
        "t_count",
        F.expr("CAST((2 * (n - 2) * 1000000) div 3 AS BIGINT)").alias(
            "expected_ppm"
        ),
        F.expr(
            "CAST(CASE WHEN 16 * n - 29 > 0 THEN round("
            " (CAST(t_count AS DOUBLE) - 2.0 * (n - 2) / 3.0)"
            " / sqrt((16.0 * n - 29.0) / 90.0), 4) END AS DOUBLE)"
        ).alias("z_r4"),
    ).orderBy(key)


@query(
    "ts_turning_points",
    oracle=_TURNING_ORACLE,
    tags=("timeseries", "stats", "test"),
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wallis-Moore turning-point randomness test of the daily
    event-count series per event_type: exact local-extrema count vs
    the i.i.d. expectation with the normal z — the quick "is this
    series random noise" triage next to Mann-Kendall and
    Ljung-Box."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return turning_points(daily)


_RUNS_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type,
               CAST(2 * median(y) AS BIGINT) AS med2
        FROM daily GROUP BY event_type
    ),
    signed AS (
        SELECT d.event_type, d.d,
               CASE WHEN 2 * d.y > m.med2 THEN 1
                    WHEN 2 * d.y < m.med2 THEN 0 END AS s
        FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    seq AS (
        SELECT event_type, s,
               lag(s) OVER (PARTITION BY event_type ORDER BY d) AS sp
        FROM signed WHERE s IS NOT NULL
    ),
    f AS (
        SELECT event_type,
               CAST(sum(s) AS BIGINT) AS n1,
               CAST(count(*) - sum(s) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN sp IS NULL OR s <> sp THEN 1 ELSE 0 END)
                    AS BIGINT) AS runs
        FROM seq GROUP BY event_type
    )
    SELECT event_type, n1, n2, runs,
           CAST(CASE WHEN n1 + n2 > 0 THEN
                (2 * n1 * n2 * 1000000) // (n1 + n2) + 1000000
                END AS BIGINT) AS expected_ppm,
           CAST(CASE WHEN n1 > 0 AND n2 > 0
                     AND (2 * n1 * n2 - n1 - n2) > 0 THEN round(
               (CAST(runs AS DOUBLE)
                - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
               / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                      / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                         * (n1 + n2 - 1))), 4) END AS DOUBLE) AS z_r4
    FROM f
    ORDER BY event_type
"""


def runs_test(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Wald-Wolfowitz runs test above/below the per-key median over a
    (key, d, y) daily frame: days AT the median are dropped (the
    standard continuous-series convention, documented — the doubled
    comparison 2y vs 2·median keeps the tie test exact for .5
    medians), runs counted by sign changes, compared against the
    conditional expectation 2n₁n₂/(n₁+n₂) + 1 (published in floored
    ppm) with the classical variance; z is the only float (rounded
    4, NULL-guarded on degenerate one-sided series). Too few runs ⇒
    level shifts / trending; too many ⇒ high-frequency alternation.
    Factored so closed-form model tests (a half-low-half-high series
    → 2 runs, z ≪ 0; strict alternation → n runs, z ≫ 0) drive the
    production stages.

    Scale: the calendar-bounded daily collapse; the median is an
    exact per-key percentile over that bounded frame; one lag window
    + per-key fold."""
    from pyspark.sql import Window

    med = daily.groupBy(key).agg(
        (2 * F.expr("percentile(y, 0.5)")).cast("long").alias("med2")
    )
    signed = (
        daily.join(med, key)
        .select(
            key,
            "d",
            F.when(2 * F.col("y") > F.col("med2"), 1)
            .when(2 * F.col("y") < F.col("med2"), 0)
            .alias("s"),
        )
        .filter(F.col("s").isNotNull())
    )
    w = Window.partitionBy(key).orderBy("d")
    seq = signed.select(key, "s", F.lag("s").over(w).alias("sp"))
    f = seq.groupBy(key).agg(
        F.sum("s").cast("long").alias("n1"),
        (F.count("*") - F.sum("s")).cast("long").alias("n2"),
        F.sum(
            F.when(F.col("sp").isNull() | (F.col("s") != F.col("sp")), 1).otherwise(0)
        )
        .cast("long")
        .alias("runs"),
    )
    return f.select(
        key,
        "n1",
        "n2",
        "runs",
        F.expr(
            "CAST(CASE WHEN n1 + n2 > 0 THEN"
            " (2 * n1 * n2 * 1000000) div (n1 + n2) + 1000000"
            " END AS BIGINT)"
        ).alias("expected_ppm"),
        F.expr(
            "CAST(CASE WHEN n1 > 0 AND n2 > 0"
            " AND (2 * n1 * n2 - n1 - n2) > 0 THEN round("
            " (CAST(runs AS DOUBLE)"
            "  - (2.0 * n1 * n2 / (n1 + n2) + 1.0))"
            " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
            "        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)"
            "           * (n1 + n2 - 1))), 4) END AS DOUBLE)"
        ).alias("z_r4"),
    ).orderBy(key)


@query(
    "ts_runs_test",
    oracle=_RUNS_ORACLE,
    tags=("timeseries", "stats", "test"),
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of the daily event-count series per
    event_type (above/below the median, ties dropped): exact run
    counts vs the conditional expectation with the normal z — the
    level-shift detector next to the turning-point and Mann-Kendall
    tests."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return runs_test(daily)
