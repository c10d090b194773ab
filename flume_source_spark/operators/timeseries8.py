"""Batch time-series wave 8 (round 9, session 3): rank statistics.

``ts_spearman_corr`` — exact Spearman rank correlation between daily
event VOLUME (count) and daily event VALUE (cent sum) per event_type,
with average-rank tie handling, and ``ts_theil_sen`` — the robust
Theil-Sen trend slope (exact median of pairwise day slopes) per
event_type.

Together with ts_mann_kendall (timeseries6.py) these complete the
non-parametric trend/association kit: Mann-Kendall asks "is the
series trending?", Theil-Sen asks "at what rate?" (the estimator
Mann-Kendall's own literature pairs it with — Sen 1968), and Spearman
asks "do two series move together?" without assuming linearity.
Reference parity: the reference engine ships no statistics surface
(Flume file source, CephFsSource.java:29-171); this is [NS] engine
surface under BASELINE.json's north star.

House arithmetic (the round-8/round-9 discipline): daily series stay
BIGINT (counts; value scaled to cents via round(value*100), the
ts_ohlc_bars convention); cross terms widen to DECIMAL(38,0)/HUGEINT
before multiplying; ratios are integer ppm via integral `div` on
NON-NEGATIVE numerators, sign-split where the statistic is signed.
Ranks avoid float averaging by the doubled-rank identity: for a tie
group of size t starting at rank R, 2*avg_rank = 2*R + t - 1 —
integer, engine-agnostic (rank() + per-value count are both ANSI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# ---------------------------------------------------------------------------
# Spearman rank correlation, exact (Pearson on doubled average ranks).
#
# Per event_type, the daily series x = count(*), y = sum(cents). With
# doubled average ranks r, s (see module docstring), Pearson's terms
#   num  = n*sum(rs) - sum(r)*sum(s)
#   den1 = n*sum(r^2) - sum(r)^2,  den2 = n*sum(s^2) - sum(s)^2
# give rho = num / sqrt(den1*den2). sqrt is float, so the published
# statistic is the SIGNED SQUARE in ppm: rho_sq_ppm = sign(num) *
# (num^2 * 1e6) div (den1*den2) — exact, and monotone in |rho| so
# thresholding works the same. num/den1/den2 are also emitted raw.
#
# Exactness/overflow: ranks <= 2n so |num| <= 4n^4 and den_i <= 4n^4;
# num^2*1e6 stays inside DECIMAL(38,0) while n <= ~7000 points per
# series (19 years of daily data). The bound is ENFORCED as an
# explicit `n_days <= SPEARMAN_MAX_DAYS` filter on BOTH engines
# (ADVICE r9 item 2): past it, Spark DECIMAL(38,0) overflow would
# yield NULL while DuckDB HUGEINT errors — an asymmetric failure —
# so over-bound series are excluded identically and visibly instead
# (aggregate weekly first to analyze them). Degenerate (constant)
# series have den = 0 and are filtered identically on both engines.
#
# Scale: one groupBy onto (event_type, day) — map-side combinable —
# two rank-window passes over the collapsed daily frame (30-3650 rows
# per series, NOT per event), one fold per event_type. Output: one row
# per event_type.
# ---------------------------------------------------------------------------

# DECIMAL(38,0) headroom bound for num^2 * 1e6 (see overflow note
# above); shared by the Spark filter and the oracle SQL.
SPEARMAN_MAX_DAYS = 7000

_SPEARMAN_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type,
               2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                 + count(*) OVER (PARTITION BY event_type, x) - 1 AS r,
               2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                 + count(*) OVER (PARTITION BY event_type, y) - 1 AS s
        FROM daily
    ),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               sum(r) AS sr, sum(s) AS ss,
               sum(CAST(r AS HUGEINT) * r) AS srr,
               sum(CAST(s AS HUGEINT) * s) AS sss,
               sum(CAST(r AS HUGEINT) * s) AS srs
        FROM ranked GROUP BY event_type
    ),
    terms AS (
        SELECT event_type, n_days,
               n_days * srs - CAST(sr AS HUGEINT) * ss AS num,
               n_days * srr - CAST(sr AS HUGEINT) * sr AS den1,
               n_days * sss - CAST(ss AS HUGEINT) * ss AS den2
        FROM agg
    )
    SELECT event_type, n_days,
           CAST(num AS BIGINT) AS num,
           CAST(den1 AS BIGINT) AS den1,
           CAST(den2 AS BIGINT) AS den2,
           CAST(CASE WHEN num >= 0
                     THEN num * num * 1000000 // (den1 * den2)
                     ELSE -(num * num * 1000000 // (den1 * den2))
                END AS BIGINT) AS rho_sq_ppm
    FROM terms
    WHERE den1 > 0 AND den2 > 0 AND n_days <= {SPEARMAN_MAX_DAYS}
    ORDER BY event_type
"""


def spearman_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exact-Spearman fold over a ``(key, d, x, y)`` daily frame
    (x, y BIGINT). Factored from the registry query so monotone /
    anti-monotone / tied model tests drive the production arithmetic.
    Returns one row per key: n_days, raw Pearson-on-ranks terms, and
    the signed-square rho in ppm."""
    wx = Window.partitionBy(key).orderBy("x")
    wy = Window.partitionBy(key).orderBy("y")
    ranked = daily.select(
        key,
        (2 * F.rank().over(wx) + F.count("*").over(Window.partitionBy(key, "x")) - 1)
        .cast("long")
        .alias("r"),
        (2 * F.rank().over(wy) + F.count("*").over(Window.partitionBy(key, "y")) - 1)
        .cast("long")
        .alias("s"),
    )
    agg = ranked.groupBy(key).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("r").alias("sr"),
        F.sum("s").alias("ss"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * r")).alias("srr"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s")).alias("sss"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * s")).alias("srs"),
    )
    terms = agg.select(
        key,
        "n_days",
        F.expr("n_days * srs - CAST(sr AS DECIMAL(38,0)) * ss").alias("num"),
        F.expr("n_days * srr - CAST(sr AS DECIMAL(38,0)) * sr").alias("den1"),
        F.expr("n_days * sss - CAST(ss AS DECIMAL(38,0)) * ss").alias("den2"),
    )
    return (
        terms.filter(
            (F.col("den1") > 0)
            & (F.col("den2") > 0)
            & (F.col("n_days") <= SPEARMAN_MAX_DAYS)
        )
        .select(
            key,
            "n_days",
            F.col("num").cast("long").alias("num"),
            F.col("den1").cast("long").alias("den1"),
            F.col("den2").cast("long").alias("den2"),
            F.expr(
                "CAST(CASE WHEN num >= 0"
                " THEN num * num * 1000000 div (den1 * den2)"
                " ELSE -(num * num * 1000000 div (den1 * den2))"
                " END AS BIGINT)"
            ).alias("rho_sq_ppm"),
        )
        .orderBy(key)
    )


@query(
    "ts_spearman_corr",
    oracle=_SPEARMAN_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation per event_type between daily
    volume (event count) and daily value (cent sum): does traffic
    predict revenue, rank-for-rank? Signed-square rho in ppm plus the
    raw integer Pearson-on-ranks terms for downstream tests."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y"),
    )
    return spearman_daily(daily, "event_type")


# ---------------------------------------------------------------------------
# Theil-Sen slope, exact (lower median of pairwise slopes).
#
# Per event_type over the daily count series: every day pair i < j
# contributes slope (y_j - y_i) / (d_j - d_i); the estimator is the
# median. Slopes are published in integer MICRO-counts/day via the
# sign-split integral div; the median is the LOWER median (element at
# position (n_pairs+1) div 2 of the ascending slope order) — a pure
# selection, no averaging, so it is exact and engine-agnostic even
# for even pair counts.
#
# Scale: the day-pair join is per-series O(d^2) with d bounded by the
# CALENDAR, exactly the ts_mann_kendall envelope (10 years -> ~6.7M
# pairs per series, one shuffle + one window pass). The daily collapse
# is the usual map-side-combinable groupBy. Output: one row per
# event_type.
# ---------------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               CASE WHEN b.y - a.y >= 0
                    THEN (b.y - a.y) * 1000000 // (b.d - a.d)
                    ELSE -((a.y - b.y) * 1000000 // (b.d - a.d))
               END AS slope_u
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
        SELECT event_type, slope_u,
               row_number() OVER (PARTITION BY event_type ORDER BY slope_u) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes
    ),
    med AS (
        SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(slope_u AS BIGINT) AS slope_med_u
        FROM ranked WHERE rn = (n_pairs + 1) // 2
    ),
    ext AS (
        SELECT event_type,
               CAST(min(slope_u) AS BIGINT) AS slope_min_u,
               CAST(max(slope_u) AS BIGINT) AS slope_max_u
        FROM slopes GROUP BY event_type
    )
    SELECT m.event_type, m.n_pairs, m.slope_med_u, e.slope_min_u, e.slope_max_u
    FROM med m JOIN ext e ON m.event_type = e.event_type
    ORDER BY m.event_type
"""


def theil_sen_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exact Theil-Sen fold over a ``(key, d, y)`` daily frame
    (d DATE, y BIGINT): per key, the pair count, the lower-median
    pairwise slope in micro-units/day, and the slope extremes.
    Factored so planted-linear-trend model tests (y = c*t -> median
    slope exactly c*1e6) drive the production arithmetic."""
    a = daily.select(key, F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(
        F.col(key).alias("k2"), F.col("d").alias("d2"), F.col("y").alias("y2")
    )
    slopes = (
        a.join(b, (F.col(key) == F.col("k2")) & (F.col("d1") < F.col("d2")))
        .select(
            key,
            F.expr(
                "CASE WHEN y2 - y1 >= 0"
                " THEN (y2 - y1) * 1000000 div datediff(d2, d1)"
                " ELSE -((y1 - y2) * 1000000 div datediff(d2, d1))"
                " END"
            )
            .cast("long")
            .alias("slope_u"),
        )
    )
    w = Window.partitionBy(key).orderBy("slope_u")
    ranked = slopes.select(
        key,
        "slope_u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(key)).alias("n_pairs"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2")).select(
        key,
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_u").alias("slope_med_u"),
    )
    ext = slopes.groupBy(key).agg(
        F.min("slope_u").alias("slope_min_u"), F.max("slope_u").alias("slope_max_u")
    )
    return med.join(ext, key).orderBy(key)


@query(
    "ts_theil_sen",
    oracle=_THEIL_SEN_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event_type over daily counts: the
    exact lower-median pairwise slope in micro-counts/day, with pair
    count and slope extremes. The rate companion to ts_mann_kendall's
    is-it-trending verdict — robust to ~29% outlier days where an OLS
    slope (agg_regression_family) is not."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return theil_sen_daily(daily, "event_type")


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI for the daily-count median (round 9,
# session 3). Point estimates without uncertainty get over-trusted;
# the bootstrap is the standard answer, but naive bootstrap is
# RNG-driven and can never hash-match across engines. This one is
# fully deterministic: resample index r(b, i) = md5int(key:b:i) mod n
# (the house portable md5 hash), medians are LOWER medians (pure
# selection at position (n+1) div 2 — no averaging), and the CI ends
# are themselves lower-percentile selections over the B bootstrap
# medians. Every value is a BIGINT daily count; nothing is random,
# nothing is float, so the driver hash pins the whole procedure.
#
# Scale: everything after the daily collapse is bounded by the
# CALENDAR times B — n*B resample rows per series (30 days x 40
# resamples = 1,200 rows at the fixtures; 10 years x 40 = 146k), one
# join against the n-row indexed daily frame, two window selections.
# The corpus-sized work is the one map-side-combinable daily groupBy.
# ---------------------------------------------------------------------------

BOOT_B = 40  # resamples; 5%/95% lower selections land at ranks 2 / 38
# Per-resample draw count is min(n, BOOT_MAX_DAYS) on BOTH engines:
# the oracle's generate_series must carry a literal bound, so the
# Spark side clamps its F.sequence to the same constant — a series
# longer than ~11 years of daily points resamples a capped draw count
# (still n distinct source ranks via the md5 % n index) instead of
# silently diverging from the oracle (ADVICE r9 item 1).
BOOT_MAX_DAYS = 4000
_BOOT_LO_RANK = max(1, (BOOT_B * 5) // 100)
_BOOT_HI_RANK = max(1, (BOOT_B * 95) // 100)

_BOOTSTRAP_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY y, d) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ),
    grid AS (
        SELECT DISTINCT i.event_type, i.n, b.b, s.i
        FROM idx i,
             (SELECT unnest(generate_series(1, {BOOT_B})) AS b) b,
             (SELECT unnest(generate_series(1, {BOOT_MAX_DAYS})) AS i) s
        WHERE s.i <= i.n
    ),
    resample AS (
        SELECT g.event_type, g.b,
               (CAST('0x' || substr(md5(g.event_type || ':' ||
                      CAST(g.b AS VARCHAR) || ':' || CAST(g.i AS VARCHAR)), 1, 8)
                 AS BIGINT) % g.n) + 1 AS r
        FROM grid g
    ),
    picked AS (
        SELECT r.event_type, r.b, i.y
        FROM resample r
        JOIN idx i ON i.event_type = r.event_type AND i.rn = r.r
    ),
    med AS (
        SELECT event_type, b, y AS med
        FROM (
            SELECT event_type, b, y,
                   row_number() OVER (PARTITION BY event_type, b ORDER BY y) AS mrn,
                   count(*) OVER (PARTITION BY event_type, b) AS mn
            FROM picked
        ) WHERE mrn = (mn + 1) // 2
    ),
    ci AS (
        SELECT event_type,
               min(CASE WHEN crn = {_BOOT_LO_RANK} THEN med END) AS ci_lo,
               min(CASE WHEN crn = {_BOOT_HI_RANK} THEN med END) AS ci_hi
        FROM (
            SELECT event_type, med,
                   row_number() OVER (PARTITION BY event_type ORDER BY med) AS crn
            FROM med
        ) GROUP BY event_type
    ),
    point AS (
        SELECT event_type, n, y AS med_point FROM idx WHERE rn = (n + 1) // 2
    )
    SELECT p.event_type,
           CAST(p.n AS BIGINT) AS n_days,
           CAST({BOOT_B} AS BIGINT) AS n_boot,
           CAST(p.med_point AS BIGINT) AS med_point,
           CAST(c.ci_lo AS BIGINT) AS ci_lo,
           CAST(c.ci_hi AS BIGINT) AS ci_hi
    FROM point p JOIN ci c ON p.event_type = c.event_type
    ORDER BY p.event_type
"""


def bootstrap_ci_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core deterministic-bootstrap fold over a ``(key, d, y)`` daily
    frame: lower-median point estimate plus md5-resampled 5%/95%
    lower-selection CI over BOOT_B resamples. Factored so planted
    tests (constant series -> ci_lo == ci_hi == point; CI brackets
    the point; shifting values shifts all three) drive the production
    resample arithmetic."""
    w = Window.partitionBy(key).orderBy("y", "d")
    idx = daily.select(
        key,
        "y",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(key)).alias("n"),
    ).localCheckpoint(eager=True)
    grid = (
        idx.select(key, "n")
        .distinct()
        .select(key, "n", F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"))
        .select(
            key,
            "n",
            "b",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n"), F.lit(BOOT_MAX_DAYS)))
            ).alias("i"),
        )
    )
    md5i = F.expr(
        f"CAST(conv(substr(md5(concat({key}, ':', CAST(b AS STRING), ':',"
        f" CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    resample = grid.select(key, "b", ((md5i % F.col("n")) + 1).alias("r"))
    picked = resample.join(
        idx.select(key, F.col("rn").alias("r"), "y"), [key, "r"]
    ).select(key, "b", "y")
    wm = Window.partitionBy(key, "b").orderBy("y")
    med = (
        picked.select(
            key,
            "b",
            "y",
            F.row_number().over(wm).alias("mrn"),
            F.count("*").over(Window.partitionBy(key, "b")).alias("mn"),
        )
        .filter(F.col("mrn") == F.expr("(mn + 1) div 2"))
        .select(key, F.col("y").alias("med"))
    )
    wc = Window.partitionBy(key).orderBy("med")
    ci = (
        med.select(key, "med", F.row_number().over(wc).alias("crn"))
        .groupBy(key)
        .agg(
            F.min(F.when(F.col("crn") == _BOOT_LO_RANK, F.col("med"))).alias("ci_lo"),
            F.min(F.when(F.col("crn") == _BOOT_HI_RANK, F.col("med"))).alias("ci_hi"),
        )
    )
    point = idx.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        key, F.col("n").cast("long").alias("n_days"), F.col("y").alias("med_point")
    )
    return (
        point.join(ci, key)
        .select(
            key,
            "n_days",
            F.lit(BOOT_B).cast("long").alias("n_boot"),
            F.col("med_point").cast("long").alias("med_point"),
            F.col("ci_lo").cast("long").alias("ci_lo"),
            F.col("ci_hi").cast("long").alias("ci_hi"),
        )
        .orderBy(key)
    )


@query(
    "ts_bootstrap_ci_median",
    oracle=_BOOTSTRAP_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_bootstrap_ci_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap 90% CI for the daily-count median per
    event_type: md5-indexed resamples (no RNG), lower-median and
    lower-percentile selections only (no averaging), all BIGINT — the
    uncertainty companion to every point statistic in the ts family,
    and fully driver-hashable because nothing in it is random."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return bootstrap_ci_daily(daily, "event_type")


# ---------------------------------------------------------------------------
# Seasonal decomposition (built round 9 session 3, registered round
# 10 per the r9->r10 handoff, the same pattern as
# holt_winters_exact): the classic additive decomposition
#     y_t = trend_t + seasonal_{dow(t)} + residual_t
# over the daily series, exact in scaled integers:
#   trend_t    = centered 7-day moving average (full windows only),
#                x S, exact via remainder-strip division by 7;
#   seasonal_d = mean over t = d (mod 7) of (y_t*S - trend_t), exact
#                via remainder-strip division by the group count;
#   residual_t = y_t*S - trend_t - seasonal_{dow(t)}.
# Seasonal means are NOT re-centered (documented; centering adds one
# more exact division without changing the residual diagnostics).
# On a planted y = a + b*t + s_{t mod 7} series the decomposition is
# EXACT: the 7-term MA of a linear trend is the trend itself and the
# seasonal means recover s, so residual_s == 0 identically — the
# model test below pins that, which no float implementation could.
#
# Execution: two window passes (MA sum+count; nothing else) and one
# 7-key-per-series group join — the pure-windows cost class, no
# recursion, no python. Oracle is plain (non-recursive) SQL.
# ---------------------------------------------------------------------------


def _strip_div_sql(a: str, n: str) -> str:
    """Exact floor division a // n for positive n via remainder-strip
    (identical under Spark's truncating div because the remainder is
    removed first)."""
    return f"((({a}) - ((({a}) % ({n}) + ({n})) % ({n}))) // ({n}))"


_DECOMP_ORACLE = f"""
    WITH daily AS (
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
    )
    SELECT tr.event_type, tr.t, tr.y,
           CAST(tr.trend_s AS BIGINT) AS trend_s,
           CAST(sea.seasonal_s AS BIGINT) AS seasonal_s,
           CAST(tr.detr - sea.seasonal_s AS BIGINT) AS residual_s
    FROM tr JOIN sea
      ON tr.event_type = sea.event_type AND tr.t % 7 = sea.dow
    ORDER BY tr.event_type, tr.t
"""


def seasonal_decompose_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exact decomposition over a ``(key, d, y)`` daily frame.
    Factored so the planted trend+season model test (residual == 0
    identically) drives the production windows."""
    w = Window.partitionBy(key).orderBy("d")
    idx = daily.select(
        key, "y", F.row_number().over(w).cast("long").alias("t")
    )
    wma = (
        Window.partitionBy(key)
        .orderBy("t")
        .rowsBetween(-3, 3)
    )
    ma = idx.select(
        key,
        "t",
        "y",
        F.sum("y").over(wma).alias("wsum"),
        F.count("*").over(wma).alias("wn"),
    )
    tr = ma.filter(F.col("wn") == 7).select(
        key,
        "t",
        "y",
        F.expr(
            "((wsum * 1000000) - (((wsum * 1000000) % 7 + 7) % 7)) div 7"
        ).alias("trend_s"),
    ).withColumn("detr", F.col("y") * 1000000 - F.col("trend_s"))
    sea = (
        tr.groupBy(key, (F.col("t") % 7).alias("dow"))
        .agg(F.sum("detr").alias("sd"), F.count("*").alias("sn"))
        .select(
            key,
            "dow",
            F.expr("((sd) - (((sd) % sn + sn) % sn)) div sn").alias("seasonal_s"),
        )
    )
    return (
        tr.withColumn("dow", F.col("t") % 7)
        .join(sea, [key, "dow"])
        .select(
            key,
            "t",
            "y",
            F.col("trend_s").cast("long").alias("trend_s"),
            F.col("seasonal_s").cast("long").alias("seasonal_s"),
            (F.col("detr") - F.col("seasonal_s")).cast("long").alias("residual_s"),
        )
        .orderBy(key, "t")
    )


@query(
    "ts_seasonal_decompose_exact",
    oracle=_DECOMP_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_seasonal_decompose_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact additive seasonal decomposition of daily event counts —
    trend (centered 7-day MA), day-of-week seasonal means, residual,
    all scaled integers. Cross-engine pinned at all three SFs by
    test_seasonal_decompose_matches_duckdb_oracle."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return seasonal_decompose_daily(daily, "event_type")


# ---------------------------------------------------------------------------
# Deseasonalized outliers (round 10): anomaly detection on the
# DECOMPOSITION RESIDUAL instead of the raw series. ts_outlier_mad
# flags raw-level outliers — on a strongly weekly series every
# weekend is an "outlier" to a raw MAD gate; after removing trend +
# day-of-week season (ts_seasonal_decompose_exact), what remains
# SHOULD be noise, so a residual spike is a genuine anomaly, not a
# calendar effect. Gate: |residual| > 3 · median(|residual|), both
# sides exact integers (the residual is scaled-integer by
# construction; the median is the lower-median selection — the
# ts_outlier_mad convention). Degenerate exact-fit series (median 0)
# flag every nonzero residual, which is correct: on a planted
# trend+season fixture the residual is identically 0 and nothing
# flags.
#
# Scale: the decomposition's pure-windows plan + one per-series
# median selection + one filter. Output: flagged days only.
# ---------------------------------------------------------------------------

_RESID_OUTLIER_ORACLE = f"""
    WITH dec AS ({_DECOMP_ORACLE}),
    med AS (
        SELECT event_type, ar AS med_abs_res FROM (
            SELECT event_type, abs(residual_s) AS ar,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY abs(residual_s)) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dec
        ) WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type, d.t, d.y, d.residual_s, m.med_abs_res
    FROM dec d JOIN med m ON d.event_type = m.event_type
    WHERE abs(d.residual_s) > 3 * m.med_abs_res
    ORDER BY d.event_type, d.t
"""


def seasonal_residual_outliers(dec: DataFrame, key: str = "event_type") -> DataFrame:
    """Core residual-outlier gate over a decomposition frame (the
    seasonal_decompose_daily output shape). Factored so planted tests
    (exact trend+season series flags nothing; one injected spike day
    flags exactly itself) drive the production selection + gate."""
    w = Window.partitionBy(key).orderBy(F.abs("residual_s"))
    med = (
        dec.select(
            key,
            F.abs("residual_s").alias("ar"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy(key)).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(key, F.col("ar").alias("med_abs_res"))
    )
    return (
        dec.join(med, key)
        .filter(F.abs("residual_s") > 3 * F.col("med_abs_res"))
        .select(key, "t", "y", "residual_s", F.col("med_abs_res").cast("long").alias("med_abs_res"))
        .orderBy(key, "t")
    )


@query(
    "ts_seasonal_residual_outliers",
    oracle=_RESID_OUTLIER_ORACLE,
    tags=("timeseries", "anomaly", "exact-twin"),
)
def ts_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose decomposition residual exceeds 3× the series'
    median absolute residual — anomalies AFTER the calendar is
    explained away, the deseasonalized companion to ts_outlier_mad."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return seasonal_residual_outliers(seasonal_decompose_daily(daily, "event_type"))


# ---------------------------------------------------------------------------
# Exact rolling median (round 10): the robust rolling BASELINE —
# ts_rolling_anomaly scores against a rolling mean/stddev, which one
# fat outlier inside the window corrupts (the masking problem);
# the rolling median is the standard robust center for baselines and
# imputation. Exact: the window is materialized as a 7-way OFFSET
# EQUI-join (b.t = a.t + off, off ∈ [−3, 3] — the entity2
# sorted-neighborhood trick, never a non-equi range join that would
# plan as BNL), full windows only (the decompose wn = 7 convention),
# and the median is the LOWER-median selection (rank 4 of 7, pure
# selection, engine-agnostic).
#
# Scale: the daily collapse is the usual map-side groupBy; the offset
# join is 7 equi-joins' worth of rows on the CALENDAR-bounded daily
# frame (d×7 rows per series); one rank window selects the median.
# ---------------------------------------------------------------------------

_ROLLING_MEDIAN_ORACLE = """
    WITH daily AS (
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
    win AS (
        SELECT a.event_type, a.t, a.y, b.y AS yb, b.t AS tb
        FROM idx a
        CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS off) o
        JOIN idx b ON b.event_type = a.event_type AND b.t = a.t + o.off
    ),
    full7 AS (
        SELECT event_type, t, y, yb, tb,
               row_number() OVER (PARTITION BY event_type, t
                                  ORDER BY yb, tb) AS rn,
               count(*) OVER (PARTITION BY event_type, t) AS wn
        FROM win
    )
    SELECT event_type, t, y, CAST(yb AS BIGINT) AS rolling_med7
    FROM full7
    WHERE wn = 7 AND rn = 4
    ORDER BY event_type, t
"""


def rolling_median_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exact 7-day rolling lower-median over a ``(key, d, y)``
    daily frame. Factored so planted tests (one outlier inside the
    window does NOT move the median — the masking contrast with a
    rolling mean; constant series is a fixpoint) drive the production
    offset join + selection."""
    w = Window.partitionBy(key).orderBy("d")
    idx = daily.select(key, "y", F.row_number().over(w).cast("long").alias("t"))
    a = idx.select(key, F.col("t"), F.col("y")).withColumn(
        "off", F.explode(F.array(*[F.lit(o) for o in range(-3, 4)]))
    )
    b = idx.select(
        F.col(key).alias("kb"), F.col("t").alias("tb"), F.col("y").alias("yb")
    )
    win = a.join(
        b,
        (F.col("kb") == F.col(key)) & (F.col("tb") == F.col("t") + F.col("off")),
    ).select(key, "t", "y", "yb", "tb")
    ws = Window.partitionBy(key, "t").orderBy("yb", "tb")
    return (
        win.select(
            key,
            "t",
            "y",
            "yb",
            F.row_number().over(ws).alias("rn"),
            F.count("*").over(Window.partitionBy(key, "t")).alias("wn"),
        )
        .filter((F.col("wn") == 7) & (F.col("rn") == 4))
        .select(key, "t", "y", F.col("yb").cast("long").alias("rolling_med7"))
        .orderBy(key, "t")
    )


@query(
    "ts_rolling_median_exact",
    oracle=_ROLLING_MEDIAN_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_rolling_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact centered 7-day rolling lower median of daily event counts
    per event_type (full windows only) — the robust rolling baseline
    a single in-window outlier cannot corrupt, the companion input to
    anomaly gates that currently score against the rolling mean."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    return rolling_median_daily(daily, "event_type")
