"""Batch time-series wave 9 (round 11): the log-rank test — the
natural consumer of the round-10 Kaplan-Meier surface.

``ts_logrank`` answers the standard "did the curation change
retention" question: do two user arms have the SAME re-engagement
(survival) distribution over inter-event silence gaps? The arms are
the deterministic identity split user_id % 2 (even vs odd — the
reproducible A/B convention of ds_split_deterministic: no RNG, no
seed plumbing, identical membership under any partitioning/engine).

Durations are exactly ts_kaplan_meier's (operators/timeseries7.py):
consecutive-event gaps in whole hours (died = 1) plus each user's
final open gap to the corpus max ts (right-censored, died = 0), here
carrying the user's arm.

Mantel-Cox log-rank over the pooled life table, one row per distinct
duration WITH at least one event (censor-only times contribute to the
at-risk counts, never a term — the textbook statistic):

    e1_i = d_i · n1_i / n_i                 (expected arm-1 events)
    v_i  = d_i · n1_i · n2_i · (n_i − d_i)
           / (n_i² · (n_i − 1))             (hypergeometric variance)
    χ²   = (Σ d1_i − Σ e1_i)² / Σ v_i       ~ χ²(1) under H0

Exact portable arithmetic: e1 and v are published per-row as integer
ppm with ONE integral div each (floor per life-table row, identical
on both engines — the dq_cramers_v_sq per-cell-floor convention;
drift vs the real sums < #rows ppm). With diff_ppm = 10⁶·Σd1 − Σe1_ppm,
the ppm-scaled statistic collapses to chi2_ppm = diff_ppm² div Σv_ppm
(the 10⁶ scale factors cancel exactly). Intermediates run in
DECIMAL(38,0)/HUGEINT; headroom needs n⁴·10⁶ ≤ 10³⁸, ENFORCED on both
engines as `max(n) <= LOGRANK_MAX_N` (the CRAMERS_MAX_N /
SPEARMAN_MAX_DAYS discipline: past the bound both sides return an
EMPTY frame, never Spark overflow-NULL vs DuckDB error).

Scale: gaps = one per-user lag window (user-partitioned); the life
table is a calendar-bounded aggregate (distinct whole-hour gap
lengths), so the two reverse-cumulative at-risk windows run over a
few hundred rows (the KM bounded-frame precedent); the fold is one
row out. The corpus never enters an unbounded window or kernel.

Reference parity note: the reference engine (CephFS→Flume source,
`CephFsSource.java`) has no analytics surface; this operator belongs
to the declared [NS] engine surface (SURVEY.md §2.2, time-series
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# DECIMAL(38,0)/HUGEINT headroom bound on the at-risk count (see
# module doc); shared verbatim by the Spark fold and the oracle.
LOGRANK_MAX_N = 100_000

_LOGRANK_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, CAST(user_id % 2 = 0 AS BIGINT) AS g1,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id, g1,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (
        SELECT CAST(t AS BIGINT) AS t, g1, 1 AS died
        FROM gaps WHERE t IS NOT NULL
    ),
    cens AS (
        SELECT CAST((epoch_us(gm.g) - epoch_us(max(e.ts))) // 3600000000
                    AS BIGINT) AS t,
               e.g1, 0 AS died
        FROM ev e CROSS JOIN gmax gm
        GROUP BY e.user_id, e.g1, gm.g
    ),
    dur AS (SELECT * FROM died UNION ALL SELECT * FROM cens),
    lt AS (
        SELECT t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(sum(died * g1) AS BIGINT) AS d1,
               CAST(count(*) AS BIGINT) AS a,
               CAST(sum(g1) AS BIGINT) AS a1
        FROM dur GROUP BY t
    ),
    atrisk AS (
        SELECT t, d, d1,
               CAST(sum(a) OVER (ORDER BY t DESC) AS BIGINT) AS n,
               CAST(sum(a1) OVER (ORDER BY t DESC) AS BIGINT) AS n1
        FROM lt
    ),
    terms AS (
        SELECT t, d, d1, n, n1,
               (CAST(d AS HUGEINT) * n1 * 1000000) // n AS e1_ppm,
               CASE WHEN n > 1 THEN
                   (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
                   // (CAST(n AS HUGEINT) * n * (n - 1))
               ELSE 0 END AS v_ppm
        FROM atrisk WHERE d > 0
    ),
    folded AS (
        SELECT CAST(count(*) AS BIGINT) AS n_times,
               CAST(max(n) AS BIGINT) AS n_total,
               CAST(max(n1) AS BIGINT) AS n1_total,
               CAST(sum(d) AS BIGINT) AS d_total,
               CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(e1_ppm) AS HUGEINT) AS e1_ppm,
               CAST(sum(v_ppm) AS HUGEINT) AS v_ppm
        FROM terms
        GROUP BY 1 = 1
        HAVING max(n) <= {LOGRANK_MAX_N}
    )
    SELECT n_times, n_total, n1_total, d_total, o1,
           CAST(e1_ppm AS BIGINT) AS e1_ppm,
           CAST(o1 * 1000000 - e1_ppm AS BIGINT) AS o_minus_e_ppm,
           CAST(v_ppm AS BIGINT) AS v_ppm,
           CAST(CASE WHEN v_ppm > 0 THEN
                ((o1 * 1000000 - e1_ppm) * (o1 * 1000000 - e1_ppm)) // v_ppm
                ELSE 0 END AS BIGINT) AS chi2_ppm
    FROM folded
"""


def logrank(durations: DataFrame) -> DataFrame:
    """Core Mantel-Cox fold over a ``(t, g1, died)`` duration frame
    (t BIGINT, g1 0/1 arm flag, died 0/1). Factored so closed-form
    model tests (identical arms → χ² = 0; one arm strictly
    longer-lived → large χ²; censor-only times excluded from terms)
    drive the production life table, at-risk windows, and the exact
    ppm arithmetic."""
    from pyspark.sql import Window as W

    lt = durations.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(F.col("died") * F.col("g1")).cast("long").alias("d1"),
        F.count("*").cast("long").alias("a"),
        F.sum("g1").cast("long").alias("a1"),
    )
    # reverse-cumulative at-risk counts: the life table is
    # calendar-bounded (distinct whole-hour durations), so this
    # unpartitioned window runs over a few hundred rows — the
    # ts_kaplan_meier bounded-frame precedent
    rev = W.orderBy(F.col("t").desc()).rowsBetween(W.unboundedPreceding, 0)
    atrisk = lt.select(
        "t",
        "d",
        "d1",
        F.sum("a").over(rev).cast("long").alias("n"),
        F.sum("a1").over(rev).cast("long").alias("n1"),
    )
    terms = atrisk.filter(F.col("d") > 0).select(
        "d",
        "d1",
        "n",
        "n1",
        F.expr(
            "CAST((CAST(d AS DECIMAL(38,0)) * n1 * 1000000) div n"
            " AS DECIMAL(38,0))"
        ).alias("e1_ppm"),
        F.expr(
            "CAST(CASE WHEN n > 1 THEN"
            " (CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
            " ELSE 0 END AS DECIMAL(38,0))"
        ).alias("v_ppm"),
    )
    folded = (
        terms.groupBy(F.lit(1).alias("_g"))
        .agg(
            F.count("*").cast("long").alias("n_times"),
            F.max("n").cast("long").alias("n_total"),
            F.max("n1").cast("long").alias("n1_total"),
            F.sum("d").cast("long").alias("d_total"),
            F.sum("d1").cast("long").alias("o1"),
            F.sum("e1_ppm").alias("e1_dec"),
            F.sum("v_ppm").alias("v_dec"),
        )
        # identical guard to the oracle's HAVING (headroom bound):
        # past it BOTH engines emit an empty frame
        .filter(F.col("n_total") <= LOGRANK_MAX_N)
    )
    return folded.select(
        "n_times",
        "n_total",
        "n1_total",
        "d_total",
        "o1",
        F.expr("CAST(e1_dec AS BIGINT)").alias("e1_ppm"),
        F.expr(
            "CAST(CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_dec AS BIGINT)"
        ).alias("o_minus_e_ppm"),
        F.expr("CAST(v_dec AS BIGINT)").alias("v_ppm"),
        F.expr(
            "CAST(CASE WHEN v_dec > 0 THEN"
            " ((CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_dec)"
            "  * (CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_dec))"
            " div v_dec ELSE 0 END AS BIGINT)"
        ).alias("chi2_ppm"),
    )


@query(
    "ts_logrank",
    oracle=_LOGRANK_ORACLE,
    tags=("timeseries", "survival", "stats", "exact-twin"),
)
def ts_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test between the even and odd user arms'
    re-engagement survival (the ts_kaplan_meier durations carrying an
    identity-split arm flag): observed vs expected arm-1 events,
    hypergeometric variance, and chi2_ppm ~ χ²(1) under H0 — all in
    exact integer ppm. One row out."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        (F.col("user_id") % 2 == 0).cast("long").alias("g1"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    gmax = ev.agg(F.max("ts").alias("g"))
    gaps = ev.select(
        "user_id",
        "g1",
        F.expr(
            "CAST((unix_micros(lead(ts, 1) OVER"
            " (PARTITION BY user_id ORDER BY ts)) - unix_micros(ts))"
            " div 3600000000 AS BIGINT)"
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    died = gaps.select("t", "g1", F.lit(1).alias("died"))
    cens = (
        ev.groupBy("user_id", "g1")
        .agg(F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr(
                "CAST((unix_micros(g) - unix_micros(last_ts))"
                " div 3600000000 AS BIGINT)"
            ).alias("t"),
            "g1",
            F.lit(0).alias("died"),
        )
    )
    return logrank(died.unionByName(cens))


# ---------------------------------------------------------------------------
# Restricted mean survival time (round 11): the KM curve's headline
# scalar — RMST(τ) = ∫₀^τ S(t) dt, "the expected silence duration
# within the first τ hours" — plus the median survival time (first t
# with S ≤ 1/2). Both read directly off the ts_kaplan_meier life
# table: S is a right-continuous step function (S = 1 before the
# first row; S(t) = surv(t_i) on [t_i, t_{i+1})), so the integral is
# an exact sum of surv_ppm · clamped-interval-width terms — integer
# ppm-hours, no floats, no new estimation machinery.
#
# Execution: the KM fold (bounded applyInPandas kernel over the
# calendar-sized life table) + ONE lead window over that same tiny
# table + a 1-row fold. Oracle: the KM recursive CTE + the identical
# lead/fold — the step-curve arithmetic is engine-independent.
# ---------------------------------------------------------------------------

RMST_HORIZON_HOURS = 168  # 7 days — the re-engagement window

_RMST_ORACLE = f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (SELECT CAST(t AS BIGINT) AS t, 1 AS died FROM gaps WHERE t IS NOT NULL),
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
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i,
               CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n
        FROM lt
    ),
    rec AS (
        SELECT i, t, d, n,
               CAST(CASE WHEN d > 0 THEN (1000000 * (n - d)) // n
                         ELSE 1000000 END AS BIGINT) AS s
        FROM ordered WHERE i = 1
        UNION ALL
        SELECT o.i, o.t, o.d, o.n,
               CAST(CASE WHEN o.d > 0 THEN (rec.s * (o.n - o.d)) // o.n
                         ELSE rec.s END AS BIGINT) AS s
        FROM rec JOIN ordered o ON o.i = rec.i + 1
    ),
    steps AS (
        SELECT t, s,
               lead(t) OVER (ORDER BY t) AS t_next
        FROM rec
    ),
    tau AS (SELECT CAST({RMST_HORIZON_HOURS} AS BIGINT) AS tau),
    seg AS (
        SELECT s * greatest(least(coalesce(t_next, tau.tau), tau.tau)
                            - least(t, tau.tau), 0) AS area,
               CASE WHEN s <= 500000 THEN t END AS med_t,
               t, s, t_next
        FROM steps CROSS JOIN tau
    ),
    head AS (
        -- S = 1 on [0, first_t): the pre-first-event rectangle
        SELECT 1000000 * least(min(t), (SELECT tau FROM tau)) AS area0
        FROM steps
    )
    SELECT CAST((SELECT tau FROM tau) AS BIGINT) AS horizon_hours,
           CAST(h.area0 + sum(seg.area) AS BIGINT) AS rmst_ppm_hours,
           CAST(min(seg.med_t) AS BIGINT) AS median_hours,
           CAST(min(CASE WHEN seg.t_next IS NULL THEN seg.s END) AS BIGINT)
               AS final_surv_ppm
    FROM seg CROSS JOIN head h
    GROUP BY h.area0
"""


@query(
    "ts_km_rmst",
    oracle=_RMST_ORACLE,
    tags=("timeseries", "survival", "exact-twin"),
)
def ts_km_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time of the re-engagement curve at a
    7-day horizon (exact integer ppm-hours under the KM step curve),
    the median silence duration (first t with S ≤ 1/2), and the
    curve's final survival level — the three scalars a retention
    dashboard quotes from the Kaplan-Meier table."""
    from flume_source_spark.operators.timeseries7 import ts_kaplan_meier

    km = ts_kaplan_meier(spark, sf_dir).select(
        F.col("t_hours").alias("t"), F.col("surv_ppm").alias("s")
    )
    return km_rmst_from(km, RMST_HORIZON_HOURS)


def km_rmst_from(km: DataFrame, tau: int) -> DataFrame:
    """Core step-curve fold over a ``(t, s)`` KM table (t BIGINT
    hours, s survival ppm after t). Factored so closed-form model
    tests (hand-built curves → exact rectangle sums, median at the
    first ≤½ step, horizon clamping) drive the production lead window
    and the integral arithmetic."""
    from pyspark.sql import Window as W

    steps = km.select(
        "t", "s", F.lead("t").over(W.orderBy("t")).alias("t_next")
    )
    seg = steps.select(
        "t",
        "s",
        "t_next",
        (
            F.col("s")
            * F.greatest(
                F.least(F.coalesce(F.col("t_next"), F.lit(tau)), F.lit(tau))
                - F.least(F.col("t"), F.lit(tau)),
                F.lit(0),
            )
        ).alias("area"),
        F.when(F.col("s") <= 500000, F.col("t")).alias("med_t"),
    )
    head = steps.agg(
        (F.lit(1000000) * F.least(F.min("t"), F.lit(tau))).alias("area0")
    )
    return (
        seg.crossJoin(F.broadcast(head))
        .groupBy("area0")
        .agg(
            F.sum("area").alias("tail_area"),
            F.min("med_t").cast("long").alias("median_hours"),
            F.min(F.when(F.col("t_next").isNull(), F.col("s")))
            .cast("long")
            .alias("final_surv_ppm"),
        )
        .select(
            F.lit(tau).cast("long").alias("horizon_hours"),
            (F.col("area0") + F.col("tail_area")).cast("long").alias("rmst_ppm_hours"),
            "median_hours",
            "final_surv_ppm",
        )
    )
