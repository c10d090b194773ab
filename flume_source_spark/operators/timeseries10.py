"""Batch time-series wave 10 (round 12): Nelson-Aalen cumulative
hazard + the curation A/B end-to-end report.

``ts_nelson_aalen`` completes the survival family's estimator pair:
Kaplan-Meier (operators/timeseries7.py) estimates the survival
function S(t) as a product; Nelson-Aalen estimates the CUMULATIVE
HAZARD H(t) = Σ_{t_i ≤ t} d_i / n_i as a sum (Nelson 1972, Aalen
1978) — the standard KM companion every survival dashboard shows,
and the quantity the log-rank test's per-time terms integrate.
Because it is a SUM of per-row ratios (not a recursive product), the
exact-ppm form needs no recursion at all: one integral div per
life-table row (h_ppm = 10⁶·d_i div n_i, the dq_cramers per-cell
floor convention; drift vs the real sum < #rows ppm) and one forward
cumulative sum over the calendar-bounded life table — plain windows
on BOTH engines, no applyInPandas kernel, no recursive CTE. The
classical relation S ≈ exp(−H) (with exp(−H) ≥ S_KM pointwise) is
pinned by a model test, not published (exp is float).

``ts_curation_ab_report`` is the product surface a curation review
actually reads: ONE row composing, in a single Catalyst plan, the
deterministic arm split (user_id % 2 — the ds_split_deterministic
identity convention), the Mantel-Cox log-rank verdict between the
arms' re-engagement survival (o1, e1_ppm, v_ppm, chi2_ppm and a
0/1 significance flag at the χ²(1) α = 0.05 critical value), and the
per-arm Kaplan-Meier RMST at the 7-day horizon with the even−odd
RMST delta in ppm-hours — "did the curation change retention, by how
many expected hours, and is it significant". Every number is anchored
to the standalone queries (ts_logrank, ts_km_by_arm, ts_km_rmst) by
model test; the composition reuses their folds verbatim
(``logrank``, ``km_by_group``, ``km_rmst_from``), so the report can
never drift from the components.

Scale: identical cost classes to the components — per-user lag
windows for gaps, calendar-bounded life tables, 1-row folds joined by
broadcast. The corpus never enters an unbounded window or kernel.

Reference parity note: the reference engine (CephFS→Flume source,
`CephFsSource.java`) has no analytics surface; these operators belong
to the declared [NS] engine surface (SURVEY.md §2.2, time-series
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.operators.timeseries9 import (
    LOGRANK_MAX_N,
    km_by_group,
    km_rmst_from,
    logrank,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# χ²(1) critical value at α = 0.05 (3.841458821…), floored-to-ceiling
# at ppm scale; shared verbatim by the Spark fold and the oracle so
# the 0/1 flag is the same convention on both engines.
CHI2_1DF_05_PPM = 3_841_459

_NELSON_AALEN_ORACLE = """
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (SELECT CAST(t AS BIGINT) AS t, 1 AS died
             FROM gaps WHERE t IS NOT NULL),
    cens AS (
        SELECT CAST((epoch_us(gm.g) - epoch_us(max(e.ts))) // 3600000000
                    AS BIGINT) AS t, 0 AS died
        FROM ev e CROSS JOIN gmax gm
        GROUP BY e.user_id, gm.g
    ),
    lt AS (
        SELECT t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM (SELECT * FROM died UNION ALL SELECT * FROM cens)
        GROUP BY t
    ),
    ordered AS (
        SELECT t, d, c,
               CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n
        FROM lt
    )
    SELECT t AS t_hours, n AS n_at_risk, d AS n_events, c AS n_censored,
           CAST(CASE WHEN d > 0 THEN (1000000 * d) // n ELSE 0 END
                AS BIGINT) AS h_ppm,
           CAST(sum(CASE WHEN d > 0 THEN (1000000 * d) // n ELSE 0 END)
                OVER (ORDER BY t) AS BIGINT) AS cumhaz_ppm
    FROM ordered
    ORDER BY t_hours
"""


def nelson_aalen(durations: DataFrame) -> DataFrame:
    """Core Nelson-Aalen fold over a ``(t, died)`` duration frame
    (t BIGINT, died 0/1): the KM life table + per-row hazard increment
    h_ppm = 10⁶·d div n and its forward prefix sum. Factored so
    closed-form model tests (no censoring → H steps = d/n of the
    shrinking risk set; censor-only rows carry H flat; exp(−H) ≥ S_KM
    pointwise) drive the production life table and both windows."""
    from pyspark.sql import Window as W

    lt = durations.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        (F.count("*") - F.sum("died")).cast("long").alias("c"),
    )
    # both windows run over the calendar-bounded life table (distinct
    # whole-hour durations — a few hundred rows), the ts_kaplan_meier
    # bounded-frame precedent
    rev = W.orderBy(F.col("t").desc()).rowsBetween(W.unboundedPreceding, 0)
    fwd = W.orderBy(F.col("t").asc()).rowsBetween(W.unboundedPreceding, 0)
    ordered = lt.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(rev).cast("long").alias("n"),
    )
    h = F.when(
        F.col("d") > 0, F.expr("CAST((1000000 * d) div n AS BIGINT)")
    ).otherwise(F.lit(0).cast("long"))
    return (
        ordered.withColumn("h_ppm", h)
        .select(
            F.col("t").alias("t_hours"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            "h_ppm",
            F.sum("h_ppm").over(fwd).cast("long").alias("cumhaz_ppm"),
        )
        .orderBy("t_hours")
    )


@query(
    "ts_nelson_aalen",
    oracle=_NELSON_AALEN_ORACLE,
    tags=("timeseries", "survival", "exact-twin"),
)
def ts_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative re-engagement hazard over inter-event
    gaps (whole hours; final open gaps right-censored, exactly the
    ts_kaplan_meier durations): per distinct duration, the hazard
    increment d/n and the running cumulative hazard, both in exact
    floored integer ppm."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    from flume_source_spark.operators.timeseries7 import survival_durations

    return nelson_aalen(survival_durations(ev))


# ---------------------------------------------------------------------------
# ts_curation_ab_report — see module doc. RMST horizon shared with
# ts_km_rmst (7 days); arm 0 = even user_ids = ts_logrank's g1 arm.
# ---------------------------------------------------------------------------

_AB_HORIZON_HOURS = 168

_AB_REPORT_ORACLE = f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id, arm,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (SELECT arm, CAST(t AS BIGINT) AS t, 1 AS died
             FROM gaps WHERE t IS NOT NULL),
    cens AS (
        SELECT e.arm,
               CAST((epoch_us(gm.g) - epoch_us(max(e.ts))) // 3600000000
                    AS BIGINT) AS t,
               0 AS died
        FROM ev e CROSS JOIN gmax gm
        GROUP BY e.user_id, e.arm, gm.g
    ),
    dur AS (SELECT * FROM died UNION ALL SELECT * FROM cens),
    -- Mantel-Cox side: g1 = (arm = 0), the ts_logrank convention
    plt AS (
        SELECT t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(sum(died * CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d1,
               CAST(count(*) AS BIGINT) AS a,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a1
        FROM dur GROUP BY t
    ),
    atrisk AS (
        SELECT t, d, d1,
               CAST(sum(a) OVER (ORDER BY t DESC) AS BIGINT) AS n,
               CAST(sum(a1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
        FROM plt
    ),
    terms AS (
        SELECT d, d1, n, n1,
               (CAST(d AS HUGEINT) * n1 * 1000000) // n AS e1_ppm,
               CASE WHEN n > 1 THEN
                   (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
                   // (CAST(n AS HUGEINT) * n * (n - 1))
               ELSE 0 END AS v_ppm
        FROM atrisk WHERE d > 0
    ),
    lr AS (
        SELECT CAST(max(n) AS BIGINT) AS n_total,
               CAST(sum(d) AS BIGINT) AS d_total,
               CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(e1_ppm) AS HUGEINT) AS e1_ppm,
               CAST(sum(v_ppm) AS HUGEINT) AS v_ppm
        FROM terms
        GROUP BY 1 = 1
        HAVING max(n) <= {LOGRANK_MAX_N}
    ),
    -- per-arm KM recursion (the ts_km_by_arm CTE)
    lt AS (
        SELECT arm, t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM dur GROUP BY arm, t
    ),
    ordered AS (
        SELECT arm, t, d, c,
               CAST(row_number() OVER (PARTITION BY arm ORDER BY t)
                    AS BIGINT) AS i,
               CAST(sum(d + c) OVER (PARTITION BY arm ORDER BY t DESC)
                    AS BIGINT) AS n
        FROM lt
    ),
    rec AS (
        SELECT arm, i, t, d, n,
               CAST(CASE WHEN d > 0 THEN (1000000 * (n - d)) // n
                         ELSE 1000000 END AS BIGINT) AS s
        FROM ordered WHERE i = 1
        UNION ALL
        SELECT o.arm, o.i, o.t, o.d, o.n,
               CAST(CASE WHEN o.d > 0 THEN (rec.s * (o.n - o.d)) // o.n
                         ELSE rec.s END AS BIGINT) AS s
        FROM rec JOIN ordered o ON o.arm = rec.arm AND o.i = rec.i + 1
    ),
    steps AS (
        SELECT arm, t, s,
               lead(t) OVER (PARTITION BY arm ORDER BY t) AS t_next
        FROM rec
    ),
    seg AS (
        SELECT arm,
               s * greatest(least(coalesce(t_next, {_AB_HORIZON_HOURS}),
                                  {_AB_HORIZON_HOURS})
                            - least(t, {_AB_HORIZON_HOURS}), 0) AS area,
               CASE WHEN s <= 500000 THEN t END AS med_t
        FROM steps
    ),
    head AS (
        SELECT arm, 1000000 * least(min(t), {_AB_HORIZON_HOURS}) AS area0
        FROM steps GROUP BY arm
    ),
    rmst AS (
        SELECT seg.arm,
               CAST(h.area0 + sum(seg.area) AS BIGINT) AS rmst_ppm_hours,
               CAST(min(seg.med_t) AS BIGINT) AS median_hours
        FROM seg JOIN head h ON h.arm = seg.arm
        GROUP BY seg.arm, h.area0
    )
    SELECT lr.n_total, lr.d_total, lr.o1,
           CAST(lr.e1_ppm AS BIGINT) AS e1_ppm,
           CAST(lr.o1 * 1000000 - lr.e1_ppm AS BIGINT) AS o_minus_e_ppm,
           CAST(lr.v_ppm AS BIGINT) AS v_ppm,
           CAST(CASE WHEN lr.v_ppm > 0 THEN
                ((lr.o1 * 1000000 - lr.e1_ppm) * (lr.o1 * 1000000 - lr.e1_ppm))
                // lr.v_ppm ELSE 0 END AS BIGINT) AS chi2_ppm,
           CAST(CASE WHEN lr.v_ppm > 0 AND
                ((lr.o1 * 1000000 - lr.e1_ppm) * (lr.o1 * 1000000 - lr.e1_ppm))
                // lr.v_ppm >= {CHI2_1DF_05_PPM}
                THEN 1 ELSE 0 END AS BIGINT) AS significant_05,
           CAST({_AB_HORIZON_HOURS} AS BIGINT) AS horizon_hours,
           r0.rmst_ppm_hours AS rmst_even_ppm_hours,
           r1.rmst_ppm_hours AS rmst_odd_ppm_hours,
           CAST(r0.rmst_ppm_hours - r1.rmst_ppm_hours AS BIGINT)
               AS rmst_delta_ppm_hours,
           r0.median_hours AS median_even_hours,
           r1.median_hours AS median_odd_hours
    FROM lr
    CROSS JOIN (SELECT * FROM rmst WHERE arm = 0) r0
    CROSS JOIN (SELECT * FROM rmst WHERE arm = 1) r1
"""


def _arm_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, t, died) durations: consecutive-event whole-hour gaps
    (died = 1) + per-user final open gap to the corpus max (died = 0),
    carrying the deterministic arm = user_id % 2."""
    from flume_source_spark.operators.timeseries7 import survival_durations

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return survival_durations(ev, ("arm",)).select("arm", "t", "died")


def ab_report_from(durations: DataFrame, tau: int) -> DataFrame:
    """Compose the one-row A/B report from a ``(arm, t, died)``
    duration frame: the ``logrank`` fold on g1 = (arm = 0), the
    ``km_by_group`` per-arm curves, and ``km_rmst_from`` per arm —
    all 1-row/bounded frames joined by broadcast into one plan.
    Factored so model tests anchor every column to the standalone
    component folds on the same planted durations."""
    durations = durations.localCheckpoint(eager=True)
    lr = logrank(
        durations.select(
            "t", (F.col("arm") == 0).cast("long").alias("g1"), "died"
        )
    )
    # per-arm RMST re-filters this frame twice and the KM fold embeds
    # a python kernel — materialize the calendar-sized table once
    km2 = km_by_group(durations).localCheckpoint(eager=True)

    def rmst_for(arm: int, suffix: str) -> DataFrame:
        curve = km2.filter(F.col("arm") == arm).select(
            F.col("t_hours").alias("t"), F.col("surv_ppm").alias("s")
        )
        return km_rmst_from(curve, tau).select(
            F.col("rmst_ppm_hours").alias(f"rmst_{suffix}_ppm_hours"),
            F.col("median_hours").alias(f"median_{suffix}_hours"),
        )

    r0, r1 = rmst_for(0, "even"), rmst_for(1, "odd")
    return (
        lr.crossJoin(F.broadcast(r0))
        .crossJoin(F.broadcast(r1))
        .select(
            "n_total",
            "d_total",
            "o1",
            "e1_ppm",
            "o_minus_e_ppm",
            "v_ppm",
            "chi2_ppm",
            (F.col("chi2_ppm") >= CHI2_1DF_05_PPM)
            .cast("long")
            .alias("significant_05"),
            F.lit(tau).cast("long").alias("horizon_hours"),
            "rmst_even_ppm_hours",
            "rmst_odd_ppm_hours",
            (F.col("rmst_even_ppm_hours") - F.col("rmst_odd_ppm_hours"))
            .cast("long")
            .alias("rmst_delta_ppm_hours"),
            "median_even_hours",
            "median_odd_hours",
        )
    )


# ---------------------------------------------------------------------------
# Greenwood's formula (round 12): the KM curve's variance machinery —
# Var(S(t)) = S(t)² · Σ_{t_i ≤ t} d_i / (n_i · (n_i − d_i))
# (Greenwood 1926). The Greenwood SUM (the engine-exact part) is
# published per life-table row in floored integer ppb (ppm is too
# coarse: a single step at n ≈ 9000 contributes ~1.2e-8); the S²
# multiplication and the log-log CI need floats and live in the
# consumer (pinned by a model test against a float recompute, not
# published). Rows where n = d (everyone remaining dies — S hits 0,
# variance of the constant-0 tail undefined) contribute 0 by the
# standard convention, identically on both engines.
# Same execution shape as Nelson-Aalen: one integral div per
# calendar-bounded life-table row + one forward prefix sum.
# ---------------------------------------------------------------------------

_GREENWOOD_ORACLE = """
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (SELECT CAST(t AS BIGINT) AS t, 1 AS died
             FROM gaps WHERE t IS NOT NULL),
    cens AS (
        SELECT CAST((epoch_us(gm.g) - epoch_us(max(e.ts))) // 3600000000
                    AS BIGINT) AS t, 0 AS died
        FROM ev e CROSS JOIN gmax gm
        GROUP BY e.user_id, gm.g
    ),
    lt AS (
        SELECT t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM (SELECT * FROM died UNION ALL SELECT * FROM cens)
        GROUP BY t
    ),
    ordered AS (
        SELECT t, d, c,
               CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n
        FROM lt
    )
    SELECT t AS t_hours, n AS n_at_risk, d AS n_events, c AS n_censored,
           CAST(CASE WHEN d > 0 AND n > d
                     THEN (d * 1000000000) // (n * (n - d))
                     ELSE 0 END AS BIGINT) AS greenwood_ppb,
           CAST(sum(CASE WHEN d > 0 AND n > d
                         THEN (d * 1000000000) // (n * (n - d))
                         ELSE 0 END)
                OVER (ORDER BY t) AS BIGINT) AS greenwood_cum_ppb
    FROM ordered
    ORDER BY t_hours
"""


def greenwood(durations: DataFrame) -> DataFrame:
    """Core Greenwood fold over a ``(t, died)`` duration frame: the KM
    life table + per-row variance increment d/(n(n−d)) in floored ppb
    and its forward prefix sum. Factored so closed-form model tests
    (no censoring → increments 1/(n(n−1)) of the shrinking risk set;
    the n = d terminal row contributes 0; Var(S) via S²·sum matches a
    float recompute) drive the production stages."""
    from pyspark.sql import Window as W

    lt = durations.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        (F.count("*") - F.sum("died")).cast("long").alias("c"),
    )
    rev = W.orderBy(F.col("t").desc()).rowsBetween(W.unboundedPreceding, 0)
    fwd = W.orderBy(F.col("t").asc()).rowsBetween(W.unboundedPreceding, 0)
    ordered = lt.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(rev).cast("long").alias("n"),
    )
    g = F.when(
        (F.col("d") > 0) & (F.col("n") > F.col("d")),
        F.expr("CAST((d * 1000000000) div (n * (n - d)) AS BIGINT)"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        ordered.withColumn("greenwood_ppb", g)
        .select(
            F.col("t").alias("t_hours"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            "greenwood_ppb",
            F.sum("greenwood_ppb").over(fwd).cast("long").alias("greenwood_cum_ppb"),
        )
        .orderBy("t_hours")
    )


@query(
    "ts_km_greenwood",
    oracle=_GREENWOOD_ORACLE,
    tags=("timeseries", "survival", "exact-twin"),
)
def ts_km_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwood variance sum of the re-engagement KM curve: per
    distinct duration, the increment d/(n(n−d)) and its running sum in
    exact floored integer ppb — the quantity Var(Ŝ(t)) = Ŝ(t)²·sum
    and every KM confidence band are built from."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    from flume_source_spark.operators.timeseries7 import survival_durations

    return greenwood(survival_durations(ev))


@query(
    "ts_curation_ab_report",
    oracle=_AB_REPORT_ORACLE,
    tags=("timeseries", "survival", "stats", "report"),
)
def ts_curation_ab_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation A/B verdict as ONE row / ONE Catalyst plan: the
    even-vs-odd arm log-rank test (observed/expected/variance/χ² in
    exact ppm + the α = 0.05 significance flag), the per-arm KM RMST
    at the 7-day horizon, the even−odd RMST delta in ppm-hours, and
    the per-arm median silence durations — the numbers a curation
    review reads before shipping a data change."""
    return ab_report_from(_arm_durations(spark, sf_dir), _AB_HORIZON_HOURS)
