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
    from flume_source_spark.operators.timeseries7 import survival_durations

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        (F.col("user_id") % 2 == 0).cast("long").alias("g1"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return logrank(survival_durations(ev, ("g1",)))


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


# ---------------------------------------------------------------------------
# Kendall's tau-b (round 11): the third rank-correlation surface —
# Spearman (ts_spearman_corr) measures monotone association through
# ranks; Kendall measures it through PAIR concordance, is more robust
# to outliers, and its tau-b form corrects for ties on both margins
# (Kendall 1945):
#
#   tau_b = (C − D) / sqrt((n0 − n1)(n0 − n2)),
#   n0 = n(n−1)/2, n1 = Σ_x-tie-groups t(t−1)/2, n2 = same over y.
#
# Published as the SIGNED SQUARE in ppm (the rho_sq_ppm convention —
# sqrt is float; the square is exact and monotone in |tau|):
# tau_sq_ppm = sign(C−D) · ((C−D)² · 10⁶) div ((n0−n1)(n0−n2)),
# with C, D, n0, n1, n2 also emitted raw.
#
# Input is ts_spearman_corr's daily frame (per event_type: day, x =
# event count, y = value cents) — deliberately the SAME series, so
# the two statistics read against each other. Pair counting is the
# exact n² self-join over DAYS (calendar-bounded: the corpus never
# enters the join; ≤ KENDALL_MAX_DAYS² bounded pairs per series,
# ENFORCED on both engines — the SPEARMAN_MAX_DAYS discipline, here
# also the pair-work bound). Headroom: |C−D| ≤ n0 ≤ n²/2, so
# (C−D)²·10⁶ needs DECIMAL(38,0)/HUGEINT past n ≈ 3000 — the same
# bound covers both concerns.
# ---------------------------------------------------------------------------

KENDALL_MAX_DAYS = 3000

_KENDALL_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, 2
    ),
    sized AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
        HAVING count(*) <= {KENDALL_MAX_DAYS}
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(count(CASE WHEN (a.x < b.x AND a.y < b.y)
                               OR (a.x > b.x AND a.y > b.y) THEN 1 END)
                    AS BIGINT) AS c,
               CAST(count(CASE WHEN (a.x < b.x AND a.y > b.y)
                               OR (a.x > b.x AND a.y < b.y) THEN 1 END)
                    AS BIGINT) AS disc
        FROM daily a
        JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
        JOIN sized s ON s.event_type = a.event_type
        GROUP BY a.event_type
    ),
    tx AS (
        SELECT event_type, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1
        FROM (SELECT event_type, x, count(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY event_type
    ),
    ty AS (
        SELECT event_type, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
        FROM (SELECT event_type, y, count(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY event_type
    ),
    terms AS (
        SELECT s.event_type, s.n_days, p.c, p.disc, tx.n1, ty.n2,
               CAST(s.n_days * (s.n_days - 1) // 2 AS BIGINT) AS n0
        FROM sized s
        JOIN pairs p USING (event_type)
        JOIN tx USING (event_type)
        JOIN ty USING (event_type)
    )
    SELECT event_type, n_days, n0, n1, n2, c,
           disc AS d,
           CAST(CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN
                CASE WHEN c >= disc
                     THEN (CAST(c - disc AS HUGEINT) * (c - disc) * 1000000)
                          // (CAST(n0 - n1 AS HUGEINT) * (n0 - n2))
                     ELSE -((CAST(disc - c AS HUGEINT) * (disc - c) * 1000000)
                          // (CAST(n0 - n1 AS HUGEINT) * (n0 - n2)))
                END ELSE 0 END AS BIGINT) AS tau_sq_ppm
    FROM terms
    ORDER BY event_type
"""


def kendall_daily(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Core exact tau-b fold over a ``(key, d, x, y)`` daily frame.
    Factored so monotone (+1e6) / anti-monotone (−1e6) / tied model
    tests drive the pair join and the ppm arithmetic."""
    sized = (
        daily.groupBy(key)
        .agg(F.count("*").cast("long").alias("n_days"))
        .filter(F.col("n_days") <= KENDALL_MAX_DAYS)
    )
    a = daily.select(
        F.col(key).alias("k"), F.col("d").alias("da"),
        F.col("x").alias("xa"), F.col("y").alias("ya"),
    )
    b = daily.select(
        F.col(key).alias("k"), F.col("d").alias("db"),
        F.col("x").alias("xb"), F.col("y").alias("yb"),
    )
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    )
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    )
    pairs = a.join(b, ["k"]).filter(F.col("da") < F.col("db"))
    pairs = (
        pairs.join(
            F.broadcast(sized.select(F.col(key).alias("k"))), "k", "left_semi"
        )
        .groupBy("k")
        .agg(
            F.count(F.when(conc, 1)).cast("long").alias("c"),
            F.count(F.when(disc, 1)).cast("long").alias("disc"),
        )
    )
    tx = (
        daily.groupBy(key, "x")
        .agg(F.count("*").alias("t"))
        .groupBy(key)
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n1"))
    )
    ty = (
        daily.groupBy(key, "y")
        .agg(F.count("*").alias("t"))
        .groupBy(key)
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n2"))
    )
    terms = (
        sized.join(pairs.withColumnRenamed("k", key), key)
        .join(tx, key)
        .join(ty, key)
        .withColumn("n0", F.expr("CAST(n_days * (n_days - 1) div 2 AS BIGINT)"))
    )
    return terms.select(
        key,
        "n_days",
        "n0",
        "n1",
        "n2",
        "c",
        F.col("disc").alias("d"),
        F.expr(
            "CAST(CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN"
            " CASE WHEN c >= disc"
            " THEN (CAST(c - disc AS DECIMAL(38,0)) * (c - disc) * 1000000)"
            "      div (CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n2))"
            " ELSE -((CAST(disc - c AS DECIMAL(38,0)) * (disc - c) * 1000000)"
            "      div (CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n2)))"
            " END ELSE 0 END AS BIGINT)"
        ).alias("tau_sq_ppm"),
    ).orderBy(key)


@query(
    "ts_kendall_tau",
    oracle=_KENDALL_ORACLE,
    tags=("timeseries", "stats", "exact-twin"),
)
def ts_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily event count and daily value cents
    per event_type (exact pair concordance with tie correction on
    both margins, signed-square ppm) — the pair-based companion to
    ts_spearman_corr over the SAME daily series."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    return kendall_daily(daily)


# ---------------------------------------------------------------------------
# Stratified log-rank (round 11): ts_logrank compares the two user
# arms marginally; the stratified Mantel-Cox statistic controls for a
# confounder by building ONE life table PER STRATUM and summing the
# per-stratum (O − E) and V before squaring:
#
#   χ²_strat = (Σ_s Σ_i (d1_si − e1_si))² / Σ_s Σ_i v_si
#
# Stratum = the event_type of the gap's STARTING event ("silence
# after a purchase vs after a click") — each observed gap inherits
# its opening event's type; each user's censored tail inherits the
# user's last event's type. Arms stay the user-parity identity split.
# Output: one row per stratum (its own marginal test) plus the
# '__all__' row carrying the stratified statistic — the row a
# "did the arm change retention, controlling for activity type"
# dashboard quotes.
#
# Arithmetic, guard, and at-risk machinery are ts_logrank's exactly,
# with every window additionally PARTITIONED BY stratum (bounded:
# #event_types × calendar rows). The LOGRANK_MAX_N guard applies to
# the GLOBAL max at-risk count: any over-bound stratum empties the
# whole frame identically on both engines.
# ---------------------------------------------------------------------------

_LOGRANK_STRAT_ORACLE = f"""
    WITH ev AS (
        SELECT event_id, user_id, CAST(user_id % 2 = 0 AS BIGINT) AS g1,
               event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    gmax AS (SELECT max(ts) AS g FROM ev),
    gaps AS (
        SELECT user_id, g1, event_type AS stratum,
               (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
                - epoch_us(ts)) // 3600000000 AS t
        FROM ev
    ),
    died AS (
        SELECT stratum, CAST(t AS BIGINT) AS t, g1, 1 AS died
        FROM gaps WHERE t IS NOT NULL
    ),
    lastev AS (
        -- (ts, event_id) tiebreak matches Spark's max_by struct order
        SELECT user_id, g1, event_type AS stratum, ts AS last_ts
        FROM (SELECT user_id, g1, event_type, ts,
                     row_number() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
              FROM ev)
        WHERE rn = 1
    ),
    cens AS (
        SELECT l.stratum,
               CAST((epoch_us(gm.g) - epoch_us(l.last_ts)) // 3600000000
                    AS BIGINT) AS t,
               l.g1, 0 AS died
        FROM lastev l CROSS JOIN gmax gm
    ),
    dur AS (SELECT * FROM died UNION ALL SELECT * FROM cens),
    lt AS (
        SELECT stratum, t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(sum(died * g1) AS BIGINT) AS d1,
               CAST(count(*) AS BIGINT) AS a,
               CAST(sum(g1) AS BIGINT) AS a1
        FROM dur GROUP BY stratum, t
    ),
    atrisk AS (
        SELECT stratum, t, d, d1,
               CAST(sum(a) OVER (PARTITION BY stratum ORDER BY t DESC)
                    AS BIGINT) AS n,
               CAST(sum(a1) OVER (PARTITION BY stratum ORDER BY t DESC)
                    AS BIGINT) AS n1
        FROM lt
    ),
    terms AS (
        SELECT stratum, t, d, d1, n, n1,
               (CAST(d AS HUGEINT) * n1 * 1000000) // n AS e1_ppm,
               CASE WHEN n > 1 THEN
                   (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
                   // (CAST(n AS HUGEINT) * n * (n - 1))
               ELSE 0 END AS v_ppm
        FROM atrisk WHERE d > 0
    ),
    guard AS (SELECT max(n) AS nmax FROM terms),
    per AS (
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_times,
               CAST(sum(d) AS BIGINT) AS d_total,
               CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(e1_ppm) AS HUGEINT) AS e1_ppm,
               CAST(sum(v_ppm) AS HUGEINT) AS v_ppm
        FROM terms CROSS JOIN guard
        WHERE guard.nmax <= {LOGRANK_MAX_N}
        GROUP BY stratum
    ),
    combined AS (
        SELECT stratum, n_times, d_total, o1, e1_ppm, v_ppm FROM per
        UNION ALL
        SELECT '__all__', CAST(sum(n_times) AS BIGINT),
               CAST(sum(d_total) AS BIGINT), CAST(sum(o1) AS BIGINT),
               CAST(sum(e1_ppm) AS HUGEINT), CAST(sum(v_ppm) AS HUGEINT)
        FROM per
        GROUP BY 1 = 1
    )
    SELECT stratum, n_times, d_total, o1,
           CAST(e1_ppm AS BIGINT) AS e1_ppm,
           CAST(o1 * 1000000 - e1_ppm AS BIGINT) AS o_minus_e_ppm,
           CAST(v_ppm AS BIGINT) AS v_ppm,
           CAST(CASE WHEN v_ppm > 0 THEN
                CASE WHEN o1 * 1000000 >= e1_ppm
                     THEN ((o1 * 1000000 - e1_ppm) * (o1 * 1000000 - e1_ppm))
                          // v_ppm
                     ELSE ((e1_ppm - o1 * 1000000) * (e1_ppm - o1 * 1000000))
                          // v_ppm
                END ELSE 0 END AS BIGINT) AS chi2_ppm
    FROM combined
    ORDER BY stratum
"""


def logrank_stratified(durations: DataFrame) -> DataFrame:
    """Core stratified Mantel-Cox fold over a ``(stratum, t, g1,
    died)`` duration frame: per-stratum marginal rows + the '__all__'
    stratified row. Factored so model tests (one confounded stratum
    pair canceling in the sum; per-stratum rows matching the
    unstratified fold on each slice) drive the partitioned at-risk
    windows and the combining arithmetic."""
    from pyspark.sql import Window as W

    lt = durations.groupBy("stratum", "t").agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(F.col("died") * F.col("g1")).cast("long").alias("d1"),
        F.count("*").cast("long").alias("a"),
        F.sum("g1").cast("long").alias("a1"),
    )
    rev = (
        W.partitionBy("stratum")
        .orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    atrisk = lt.select(
        "stratum",
        "t",
        "d",
        "d1",
        F.sum("a").over(rev).cast("long").alias("n"),
        F.sum("a1").over(rev).cast("long").alias("n1"),
    )
    terms = atrisk.filter(F.col("d") > 0).select(
        "stratum",
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
    guard = terms.agg(F.max("n").alias("nmax"))
    per = (
        terms.crossJoin(F.broadcast(guard))
        .filter(F.col("nmax") <= LOGRANK_MAX_N)
        .groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_times"),
            F.sum("d").cast("long").alias("d_total"),
            F.sum("d1").cast("long").alias("o1"),
            F.sum("e1_ppm").alias("e1_dec"),
            F.sum("v_ppm").alias("v_dec"),
        )
    )
    overall = per.groupBy(F.lit("__all__").alias("stratum")).agg(
        F.sum("n_times").cast("long").alias("n_times"),
        F.sum("d_total").cast("long").alias("d_total"),
        F.sum("o1").cast("long").alias("o1"),
        F.sum("e1_dec").alias("e1_dec"),
        F.sum("v_dec").alias("v_dec"),
    )
    both = per.unionByName(overall)
    return both.select(
        "stratum",
        "n_times",
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
    ).orderBy("stratum")


@query(
    "ts_logrank_stratified",
    oracle=_LOGRANK_STRAT_ORACLE,
    tags=("timeseries", "survival", "stats", "exact-twin"),
)
def ts_logrank_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Mantel-Cox log-rank between the user arms,
    controlling for the gap's opening event type: per-stratum marginal
    tests plus the '__all__' stratified statistic, all in exact
    integer ppm."""
    # the projection feeds three branches (global max, lead window,
    # per-user max_by) and the per-stratum folds re-expand the
    # durations — 12 events scans unmaterialized (round-12 audit);
    # the tie-broken max_by stratum keeps this builder off the shared
    # one-window survival_durations helper (see its docstring)
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id",
        "user_id",
        (F.col("user_id") % 2 == 0).cast("long").alias("g1"),
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    ).localCheckpoint(eager=True)
    from pyspark.sql import Window as W

    gmax = ev.agg(F.max("ts").alias("g"))
    gaps = ev.select(
        "user_id",
        "g1",
        F.col("event_type").alias("stratum"),
        F.expr(
            "CAST((unix_micros(lead(ts, 1) OVER"
            " (PARTITION BY user_id ORDER BY ts)) - unix_micros(ts))"
            " div 3600000000 AS BIGINT)"
        ).alias("t"),
    ).where(F.col("t").isNotNull())
    died = gaps.select("stratum", "t", "g1", F.lit(1).alias("died"))
    lastev = (
        ev.groupBy("user_id", "g1")
        .agg(
            F.max_by("event_type", F.struct("ts", "event_id")).alias("stratum"),
            F.max("ts").alias("last_ts"),
        )
    )
    cens = (
        lastev.crossJoin(F.broadcast(gmax))
        .select(
            "stratum",
            F.expr(
                "CAST((unix_micros(g) - unix_micros(last_ts))"
                " div 3600000000 AS BIGINT)"
            ).alias("t"),
            "g1",
            F.lit(0).alias("died"),
        )
    )
    return logrank_stratified(
        died.unionByName(cens).localCheckpoint(eager=True)
    )


# ---------------------------------------------------------------------------
# Per-arm Kaplan-Meier curves (round 11): ts_logrank answers "are the
# two arms' survival distributions different" with one number; this
# publishes the CURVES the number summarizes — one KM life table per
# arm, side by side, the plot a retention dashboard draws next to the
# test. Same durations, same exact recursive-product arithmetic as
# ts_kaplan_meier, with every stage additionally keyed by the arm:
# the life table groups by (arm, t), the at-risk window partitions by
# arm, and the sequential product runs one bounded applyInPandas
# group PER ARM (2 × calendar-sized — the KM bounded-kernel
# discipline). Oracle: ONE recursive CTE stepping both arms' ordered
# life tables in lockstep (seeded at i = 1 per arm, joined on
# (arm, i+1)).
# ---------------------------------------------------------------------------

_KM_BY_ARM_ORACLE = """
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
    lt AS (
        SELECT arm, t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM (SELECT * FROM died UNION ALL SELECT * FROM cens)
        GROUP BY arm, t
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
        SELECT arm, i, t, d, c, n,
               CAST(CASE WHEN d > 0 THEN (1000000 * (n - d)) // n
                         ELSE 1000000 END AS BIGINT) AS s
        FROM ordered WHERE i = 1
        UNION ALL
        SELECT o.arm, o.i, o.t, o.d, o.c, o.n,
               CAST(CASE WHEN o.d > 0 THEN (rec.s * (o.n - o.d)) // o.n
                         ELSE rec.s END AS BIGINT) AS s
        FROM rec JOIN ordered o ON o.arm = rec.arm AND o.i = rec.i + 1
    )
    SELECT arm, t AS t_hours, n AS n_at_risk, d AS n_events,
           c AS n_censored, s AS surv_ppm
    FROM rec ORDER BY arm, t_hours
"""


def km_by_group(durations: DataFrame, group_col: str = "arm") -> DataFrame:
    """Per-group KM fold over a ``(group, t, died)`` duration frame:
    the ts_kaplan_meier recursion run independently per group (one
    bounded applyInPandas batch per group). Factored so model tests
    (two planted arms → each arm's curve equals the solo KM on its
    slice) drive the grouped kernel."""
    import pandas as pd
    from pyspark.sql import Window as W

    lt = durations.groupBy(group_col, "t").agg(
        F.sum("died").cast("long").alias("d"),
        (F.count("*") - F.sum("died")).cast("long").alias("c"),
    )
    rev = (
        W.partitionBy(group_col)
        .orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ordered = lt.select(
        group_col,
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(rev).cast("long").alias("n"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        g = int(pdf[group_col].iloc[0])
        s = 1_000_000
        out = []
        for t, d, c, n in zip(pdf["t"], pdf["d"], pdf["c"], pdf["n"]):
            t, d, c, n = int(t), int(d), int(c), int(n)
            if d > 0:
                s = (s * (n - d)) // n
            out.append((g, t, n, d, c, s))
        return pd.DataFrame(
            out,
            columns=[
                group_col, "t_hours", "n_at_risk", "n_events",
                "n_censored", "surv_ppm",
            ],
        )

    return (
        ordered.groupBy(group_col)
        .applyInPandas(
            kernel,
            schema=f"{group_col} long, t_hours long, n_at_risk long,"
            " n_events long, n_censored long, surv_ppm long",
        )
        .orderBy(group_col, "t_hours")
    )


@query(
    "ts_km_by_arm",
    oracle=_KM_BY_ARM_ORACLE,
    tags=("timeseries", "survival", "exact-twin"),
)
def ts_km_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two user arms' Kaplan-Meier re-engagement curves side by
    side (exact recursive integer-ppm product per arm) — the curves
    behind ts_logrank's one-number verdict."""
    from flume_source_spark.operators.timeseries7 import survival_durations

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return km_by_group(survival_durations(ev, ("arm",)))
