"""Time-series wave 6: exact Holt double-exponential smoothing.

``ts_holt_exact`` — level+trend exponential smoothing (Holt's linear
method, the workhorse short-horizon forecaster) over the daily
event-count series, computed EXACTLY in scaled integers so the driver
can hash it cross-engine. The per-series recurrence
    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
runs in units of 1e-6 with α = 3/10, β = 2/10 as integer rationals;
every division-by-10 is made EXACT before it happens by subtracting
the positive remainder — ``(a − ((a % 10 + 10) % 10)) DIV 10`` — so
Spark's truncating DIV and DuckDB's flooring ``//`` agree even though
the trend term goes NEGATIVE on down-slopes (the trunc-vs-floor trap
the PCA/modularity twins document, solved here by never dividing a
non-multiple).

Execution shape — the one that matters at 100 TB:
1. Daily aggregation: groupBy(event_type, day) count — map-side
   combinable, collapses any corpus to |series| × |days| rows.
2. The recurrence is inherently sequential IN t but embarrassingly
   parallel ACROSS series — the canonical ``applyInPandas`` use: one
   Arrow batch per series, a T-step Python-int loop inside (T = days,
   bounded; arbitrary-precision ints, so the kernel is exact, not
   float). A million series parallelize over executors; no driver
   loop, no cross-series shuffle beyond the one groupBy.
The DuckDB oracle is an independent formulation: a recursive CTE
stepping t → t+1 with the identical exact-division arithmetic.

Init (pinned convention): l_1 = y_1·1e6, b_1 = 0. Forecast column is
the one-step-ahead ŷ_{t+1} = l_t + b_t.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_S = 1_000_000  # fixed-point scale
_A_NUM, _B_NUM, _DEN = 3, 2, 10  # α = 3/10, β = 2/10


def _fdiv10_sql(a: str) -> str:
    """Exact division by 10 after stripping the positive remainder —
    identical under truncating and flooring integer division."""
    return f"(({a}) - ((({a}) % 10 + 10) % 10)) // 10"


_HOLT_ORACLE = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS t
        FROM daily
    ),
    rec AS (
        SELECT event_type, t, y,
               y * {_S} AS l,
               CAST(0 AS BIGINT) AS b
        FROM idx WHERE t = 1
        UNION ALL
        SELECT i.event_type, i.t, i.y,
               {_fdiv10_sql(f"{_A_NUM} * i.y * {_S} + {_DEN - _A_NUM} * (r.l + r.b)")} AS l,
               {_fdiv10_sql(
                   f"{_B_NUM} * ({_fdiv10_sql(f'{_A_NUM} * i.y * {_S} + {_DEN - _A_NUM} * (r.l + r.b)')} - r.l)"
                   f" + {_DEN - _B_NUM} * r.b"
               )} AS b
        FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.t = r.t + 1
    )
    SELECT event_type, t, y,
           CAST(l AS BIGINT) AS level_s,
           CAST(b AS BIGINT) AS trend_s,
           CAST(l + b AS BIGINT) AS forecast_s
    FROM rec
    ORDER BY event_type, t
"""


def _holt_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-series exact Holt recurrence in arbitrary-precision Python
    ints (one Arrow batch per series; T bounded by the day range)."""
    pdf = pdf.sort_values("t")
    out = []
    l = b = 0
    for i, (t, y) in enumerate(zip(pdf["t"], pdf["y"])):
        t, y = int(t), int(y)
        if i == 0:
            l, b = y * _S, 0
        else:
            l_new = (_A_NUM * y * _S + (_DEN - _A_NUM) * (l + b)) // _DEN
            b = (_B_NUM * (l_new - l) + (_DEN - _B_NUM) * b) // _DEN
            l = l_new
        out.append((pdf["event_type"].iloc[0], t, y, l, b, l + b))
    return pd.DataFrame(
        out, columns=["event_type", "t", "y", "level_s", "trend_s", "forecast_s"]
    )


@query("ts_holt_exact", oracle=_HOLT_ORACLE, tags=("timeseries", "forecast", "exact-twin"))
def ts_holt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing over daily event counts, exact in
    scaled integers: sequential in t inside an applyInPandas kernel,
    parallel across series — hash-pinned against a recursive-CTE
    oracle running the identical remainder-stripped arithmetic."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    from pyspark.sql import Window

    idx = daily.withColumn(
        "t",
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).cast("long"),
    ).select("event_type", "t", "y")
    return (
        idx.groupBy("event_type")
        .applyInPandas(
            _holt_kernel,
            schema="event_type string, t long, y long, level_s long, trend_s long, forecast_s long",
        )
        .orderBy("event_type", "t")
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round 9): the standard non-parametric
# monotone-trend detector over a daily series — S = Σ_{i<j}
# sign(y_j − y_i), Kendall's tau = S / (n(n−1)/2), and the exact
# tie-corrected variance numerator 18·Var(S) = n(n−1)(2n+5) −
# Σ_t t(t−1)(2t+5) (Mann 1945 / Kendall 1975; published formula). All
# integer: S is a sign sum, tau is sign-split ppm (|S|·1e6 div pairs,
# negated back — integral div on NON-NEGATIVE operands only, so Spark
# trunc ≡ DuckDB floor; a signed numerator would silently diverge
# between the engines' div conventions, the round-8 lesson).
#
# Scale: the day-pair self-join is per-series O(d²) with d bounded by
# the CALENDAR (days in range), not by N — 10 years is d ≈ 3.6k,
# ~6.7M sign pairs per series, map-side-combinable to one row. The
# daily collapse itself is the usual one-shuffle groupBy.
# ---------------------------------------------------------------------------

_MANN_KENDALL_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type
    ),
    n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY event_type, y)
        GROUP BY event_type
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) // 2 AS BIGINT) AS n_pairs,
           CAST(CASE WHEN s.s_stat >= 0
                     THEN s.s_stat * 1000000 // (n.n_days * (n.n_days - 1) // 2)
                     ELSE -((-s.s_stat) * 1000000 // (n.n_days * (n.n_days - 1) // 2))
                END AS BIGINT) AS tau_ppm,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var18
    FROM n
    JOIN s ON n.event_type = s.event_type
    JOIN ties ON n.event_type = ties.event_type
    WHERE n.n_days >= 2
    ORDER BY n.event_type
"""


@query(
    "ts_mann_kendall",
    oracle=_MANN_KENDALL_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event_type over daily
    counts: exact integer S statistic, day-pair count, sign-split
    Kendall tau in ppm, and the tie-corrected 18·Var(S) — the
    drift-monitoring companion to ts_cusum_changepoint (is this
    series trending at all, before asking where it broke)."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    ).persist()
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("y").alias("y2")
    )
    s = (
        a.join(b, (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2")))
        .groupBy("event_type")
        .agg(F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")).alias("s_stat"))
    )
    n = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias("tie_term"))
    )
    out = (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .filter(F.col("n_days") >= 2)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.expr("CAST(n_days * (n_days - 1) div 2 AS BIGINT)").alias("n_pairs"),
            F.expr(
                "CAST(CASE WHEN s_stat >= 0"
                " THEN s_stat * 1000000 div (n_days * (n_days - 1) div 2)"
                " ELSE -((-s_stat) * 1000000 div (n_days * (n_days - 1) div 2))"
                " END AS BIGINT)"
            ).alias("tau_ppm"),
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var18"),
        )
        .orderBy("event_type")
    )
    out = out.localCheckpoint(eager=True)
    daily.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# Holt-Winters ADDITIVE seasonal smoothing (built round 9 session 3,
# registered round 10 per the r9->r10 handoff). Extends ts_holt_exact
# with the weekly season term (m = 7):
#     l_t = alpha*(y_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
#     b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
#     s_t = gamma*(y_t - l_t) + (1-gamma)*s_{t-m}
# alpha = 3/10, beta = gamma = 2/10, scale 1e-6; every /10 and the
# init /7 are made exact by the remainder-strip (== floor on both
# engines, == python //). Init after the first m points:
# l_m = floor(mean(y_1..y_m))*S via remainder-strip-by-7,
# b_m = 0, s_i = y_i*S - l_m. Output starts at t = m+1.
#
# The oracle carries the rotating season state as a LIST(BIGINT) of
# m slots inside the recursive CTE (slot (t % m)+1 is READ for
# s_{t-m} and then OVERWRITTEN with s_t — the same-congruence trick
# that keeps the state O(m)); the Spark side is the ts_holt_exact
# applyInPandas shape with a python-int list. forecast_s is the
# one-step-ahead l + b + s_{t+1-m}.
# ---------------------------------------------------------------------------

_HW_M = 7
# Smoothing coefficients as numerators over the shared /10 denominator
# (complement = _HW_DEN - num). Used by BOTH the recursive-CTE oracle
# builder and the python kernel so the two sides cannot silently drift
# (ADVICE r9 item 3).
_HW_DEN = 10
_HW_A_NUM = 3  # alpha = 3/10
_HW_B_NUM = 2  # beta  = 2/10
_HW_G_NUM = 2  # gamma = 2/10


def _fdiv7_sql(a: str) -> str:
    return f"(({a}) - ((({a}) % 7 + 7) % 7)) // 7"


def _hw_rec_ctes() -> str:
    """The shared recursive-CTE body (daily → idx → init → seed →
    rec) of the Holt-Winters oracle, factored so the backtest oracle
    below composes the SAME state recurrence instead of a copy that
    could drift."""
    S = _S
    ys = "i.y * {S}".format(S=S)
    s_old = "r.sl[(i.t % 7) + 1]"
    L = _fdiv10_sql(
        f"{_HW_A_NUM} * ({ys} - {s_old})"
        f" + {_HW_DEN - _HW_A_NUM} * (r.l + r.b)"
    )
    B = _fdiv10_sql(f"{_HW_B_NUM} * (({L}) - r.l) + {_HW_DEN - _HW_B_NUM} * r.b")
    SN = _fdiv10_sql(
        f"{_HW_G_NUM} * ({ys} - ({L})) + {_HW_DEN - _HW_G_NUM} * {s_old}"
    )
    return f"""daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS t
        FROM daily
    ),
    init AS (
        SELECT event_type, {_fdiv7_sql(f"sum(y) * {S}")} AS l0
        FROM idx WHERE t <= 7 GROUP BY event_type
        HAVING count(*) = 7
    ),
    seed AS (
        SELECT i.event_type,
               CAST(7 AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS y,
               n.l0 AS l,
               CAST(0 AS BIGINT) AS b,
               list(i.y * {S} - n.l0 ORDER BY (i.t % 7)) AS sl
        FROM idx i JOIN init n ON i.event_type = n.event_type
        WHERE i.t <= 7
        GROUP BY i.event_type, n.l0
    ),
    rec AS (
        SELECT event_type, t, y, l, b, sl FROM seed
        UNION ALL
        SELECT i.event_type, i.t, i.y,
               CAST({L} AS BIGINT) AS l,
               CAST({B} AS BIGINT) AS b,
               r.sl[1:(i.t % 7)]
                 || [CAST({SN} AS BIGINT)]
                 || r.sl[(i.t % 7) + 2:7] AS sl
        FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.t = r.t + 1
    )"""


def _hw_oracle() -> str:
    return f"""
    WITH RECURSIVE {_hw_rec_ctes()}
    SELECT event_type, t, y,
           CAST(l AS BIGINT) AS level_s,
           CAST(b AS BIGINT) AS trend_s,
           CAST(sl[(t % 7) + 1] AS BIGINT) AS season_s,
           CAST(l + b + sl[((t + 1) % 7) + 1] AS BIGINT) AS forecast_s
    FROM rec WHERE t > 7
    ORDER BY event_type, t
"""


_HOLT_WINTERS_ORACLE = _hw_oracle()


def _hw_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-series exact Holt-Winters recurrence in python ints (one
    Arrow batch per series; season state = a 7-slot rotating list).
    Series shorter than 8 points emit nothing (init needs a full
    season + one step)."""
    pdf = pdf.sort_values("t")
    ts = [int(t) for t in pdf["t"]]
    ys = [int(y) for y in pdf["y"]]
    out = []
    if len(ts) <= _HW_M:
        return pd.DataFrame(
            out,
            columns=["event_type", "t", "y", "level_s", "trend_s", "season_s", "forecast_s"],
        )
    tot = sum(ys[: _HW_M]) * _S
    l = (tot - ((tot % _HW_M + _HW_M) % _HW_M)) // _HW_M  # remainder-strip by 7
    b = 0
    sl = [0] * _HW_M
    for i in range(_HW_M):
        sl[ts[i] % _HW_M] = ys[i] * _S - l
    et = pdf["event_type"].iloc[0]
    for t, y in zip(ts[_HW_M:], ys[_HW_M:]):
        y_s = y * _S
        s_old = sl[t % _HW_M]
        l_new = (_HW_A_NUM * (y_s - s_old) + (_HW_DEN - _HW_A_NUM) * (l + b)) // _HW_DEN
        b = (_HW_B_NUM * (l_new - l) + (_HW_DEN - _HW_B_NUM) * b) // _HW_DEN
        s_new = (_HW_G_NUM * (y_s - l_new) + (_HW_DEN - _HW_G_NUM) * s_old) // _HW_DEN
        l = l_new
        sl[t % _HW_M] = s_new
        out.append((et, t, y, l, b, s_new, l + b + sl[(t + 1) % _HW_M]))
    return pd.DataFrame(
        out,
        columns=["event_type", "t", "y", "level_s", "trend_s", "season_s", "forecast_s"],
    )


@query(
    "ts_holt_winters_exact",
    oracle=_HOLT_WINTERS_ORACLE,
    tags=("timeseries", "forecast", "exact-twin"),
)
def holt_winters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive level+trend+weekly-season smoothing over
    daily event counts, exact in scaled integers — the seasonal
    extension of ts_holt_exact, same applyInPandas shape (sequential
    in t, parallel across series). Cross-engine pinned at all three
    SFs by test_holt_winters_matches_duckdb_oracle."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    from pyspark.sql import Window

    idx = daily.withColumn(
        "t",
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).cast("long"),
    ).select("event_type", "t", "y")
    return (
        idx.groupBy("event_type")
        .applyInPandas(
            _hw_kernel,
            schema="event_type string, t long, y long, level_s long, trend_s long,"
            " season_s long, forecast_s long",
        )
        .orderBy("event_type", "t")
    )


# ---------------------------------------------------------------------------
# Forecast-quality backtest (round 10, VERDICT r9 item 6a): the
# *_recall_audit pattern applied to forecasting. holt_winters_exact
# emits a one-step-ahead forecast at every t; this operator scores
# those forecasts against what actually happened at t+1 and against
# the honest naive baseline (trailing-7-day mean), per event_type:
#
#     hw_wape_ppm   = Σ|y_{t+1}·S − hw_forecast_s(t)|   · 1e6 div Σ y_{t+1}·S
#     base_wape_ppm = Σ|y_{t+1}·S − mean7_forecast_s(t)| · 1e6 div Σ y_{t+1}·S
#
# WAPE (weighted absolute percentage error) rather than MAPE: the
# ratio of SUMS needs one integral div on non-negative integers —
# exact and hashable — where per-point MAPE would need a division per
# row. Evaluation points are every t where BOTH models have a
# forecast and t+1 exists (t ≥ 8; the trailing-7 window is full from
# t = 7). The expanding-window structure is honest by construction:
# the HW state at t was computed from y_1..y_t only, so every scored
# forecast is genuinely out-of-sample — the audit that justifies (or
# indicts) shipping the smoother over the naive baseline.
#
# Exactness/overflow: errors and actuals are ≤ y_max·S ≤ ~1e5·1e6 =
# 1e11 per point; calendar-bounded sums (≤ 3650 points) stay ≤ ~4e14,
# and ·1e6 ≤ 4e20 — so the numerator widens to DECIMAL(38,0)/HUGEINT
# before the multiply (house rule), then one integral div.
#
# Scale: the HW kernel's cost class (per-series sequential, parallel
# across series) + two window passes + one 5-row fold. Output: one
# row per event_type.
# ---------------------------------------------------------------------------


def _hw_backtest_oracle() -> str:
    base_f = _fdiv7_sql(f"bsum * {_S}")
    return f"""
    WITH RECURSIVE {_hw_rec_ctes()},
    hw AS (
        SELECT event_type, t,
               l + b + sl[((t + 1) % 7) + 1] AS f
        FROM rec WHERE t > 7
    ),
    base AS (
        SELECT event_type, t, {base_f} AS f
        FROM (
            SELECT event_type, t,
                   sum(y) OVER w AS bsum, count(*) OVER w AS bn
            FROM idx
            WINDOW w AS (PARTITION BY event_type ORDER BY t
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ) WHERE bn = 7
    ),
    ev AS (
        SELECT h.event_type,
               a.y * {_S} AS ys,
               abs(a.y * {_S} - h.f) AS hw_err,
               abs(a.y * {_S} - b.f) AS base_err
        FROM hw h
        JOIN base b ON b.event_type = h.event_type AND b.t = h.t
        JOIN idx a ON a.event_type = h.event_type AND a.t = h.t + 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(CAST(sum(hw_err) AS HUGEINT) * 1000000 // sum(ys)
                AS BIGINT) AS hw_wape_ppm,
           CAST(CAST(sum(base_err) AS HUGEINT) * 1000000 // sum(ys)
                AS BIGINT) AS base_wape_ppm,
           CAST(CASE WHEN CAST(sum(hw_err) AS HUGEINT) * 1000000 // sum(ys)
                        < CAST(sum(base_err) AS HUGEINT) * 1000000 // sum(ys)
                     THEN 1 ELSE 0 END AS BIGINT) AS hw_beats_baseline
    FROM ev GROUP BY event_type
    ORDER BY event_type
"""


_HW_BACKTEST_ORACLE = _hw_backtest_oracle()


def hw_backtest_daily(idx: DataFrame) -> DataFrame:
    """Core backtest fold over an ``(event_type, t, y)`` indexed daily
    frame. Factored so planted tests (strong weekly pattern → HW wins;
    constant series → both WAPE 0, tie scored 0) drive the production
    scoring joins and WAPE arithmetic."""
    from pyspark.sql import Window

    hw = (
        idx.groupBy("event_type")
        .applyInPandas(
            _hw_kernel,
            schema="event_type string, t long, y long, level_s long, trend_s long,"
            " season_s long, forecast_s long",
        )
        .select("event_type", "t", F.col("forecast_s").alias("f"))
    )
    wb = Window.partitionBy("event_type").orderBy("t").rowsBetween(-6, 0)
    base = (
        idx.select(
            "event_type",
            "t",
            F.sum("y").over(wb).alias("bsum"),
            F.count("*").over(wb).alias("bn"),
        )
        .filter(F.col("bn") == 7)
        .select(
            "event_type",
            "t",
            F.expr(
                f"((bsum * {_S}) - (((bsum * {_S}) % 7 + 7) % 7)) div 7"
            ).alias("f"),
        )
    )
    actual = idx.select(
        "event_type", (F.col("t") - 1).alias("t"), (F.col("y") * _S).alias("ys")
    )
    scored = (
        hw.join(base.withColumnRenamed("f", "bf"), ["event_type", "t"])
        .join(actual, ["event_type", "t"])
        .select(
            "event_type",
            "ys",
            F.abs(F.col("ys") - F.col("f")).alias("hw_err"),
            F.abs(F.col("ys") - F.col("bf")).alias("base_err"),
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.sum("hw_err").cast("decimal(38,0)").alias("se"),
            F.sum("base_err").cast("decimal(38,0)").alias("sb"),
            F.sum("ys").cast("decimal(38,0)").alias("sy"),
        )
        .select(
            "event_type",
            "n_eval",
            F.expr("CAST(se * 1000000 div sy AS BIGINT)").alias("hw_wape_ppm"),
            F.expr("CAST(sb * 1000000 div sy AS BIGINT)").alias("base_wape_ppm"),
            F.expr(
                "CAST(CASE WHEN se * 1000000 div sy < sb * 1000000 div sy"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("hw_beats_baseline"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_hw_backtest_wape",
    oracle=_HW_BACKTEST_ORACLE,
    tags=("timeseries", "forecast", "audit", "exact-twin"),
)
def ts_hw_backtest_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window one-step-ahead backtest of the Holt-Winters
    smoother vs the trailing-7-day-mean baseline over daily event
    counts: per event_type, exact integer WAPE in ppm for both models
    on the shared out-of-sample evaluation points, plus the verdict
    bit. The forecast-quality consumer of ts_holt_winters_exact —
    the number that justifies shipping the smoother."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("y"))
    idx = daily.withColumn(
        "t",
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).cast("long"),
    ).select("event_type", "t", "y")
    return hw_backtest_daily(idx)
