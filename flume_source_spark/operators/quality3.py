"""Data-quality statistics, wave 3 (round 9, session 3):
``dq_cohens_kappa`` — exact inter-rater agreement between two binary
quality gates, and ``dq_gini_impurity`` — exact label-balance
impurity per source, both over the documents table.

Why these two: a training-data pipeline runs MANY quality gates
(heuristics, classifiers, human audits). Kappa answers "do two gates
agree beyond chance?" — the standard check before replacing an
expensive gate with a cheap proxy. Gini impurity is the log-free
class-balance audit (entropy needs ln, which is float; Gini is a pure
rational), the per-slice counterpart of ds_domain_mix_rebalance's
global mixture view. Reference parity: the reference engine ships no
statistics surface (it is a Flume file source, CephFsSource.java:29-171);
this family is [NS] engine surface mandated by BASELINE.json's north
star.

House arithmetic rules (the round-8 dq_roc_auc_exact discipline):
counts stay BIGINT; cross products are widened to
DECIMAL(38,0)/HUGEINT BEFORE multiplying; every published ratio is an
integer ppm via integral `div` on NON-NEGATIVE numerators — signed
results are sign-split (CASE on the sign, negate after the div), so
Spark's truncate-toward-zero `div` and DuckDB's floor `//` can never
diverge. No doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# ---------------------------------------------------------------------------
# Cohen's kappa, exact.
#
# Raters over documents: A = (lang = 'en'), B = (n_chars >= 300 — the
# fixture median is 305, so the gate splits near 50/50 and the
# contingency table is non-degenerate at every SF). Per source:
#
#          | B=1  B=0          po = (a+d)/T
#   A=1    |  a    b           pe = ((a+b)(a+c) + (c+d)(b+d)) / T^2
#   A=0    |  c    d           kappa = (po - pe) / (1 - pe)
#
# Clearing denominators: kappa = (T*(a+d) - pe_num) / (T^2 - pe_num)
# with pe_num = (a+b)(a+c) + (c+d)(b+d). The numerator is SIGNED
# (negative = systematic disagreement), so the ppm is sign-split; the
# denominator is > 0 unless one rater is constant (pe = 1), which is
# filtered identically on both engines.
#
# Exactness/overflow: pe_num <= T^2 and |num| <= T^2; num*1e6 is
# formed in DECIMAL(38,0)/HUGEINT, exact while T^2*1e6 < 1e38, i.e.
# T < ~3e15 documents per source — unbounded in practice.
#
# Scale: one map-side-combinable groupBy onto 4 counters per source;
# output is one row per source.
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
    WITH t AS (
        SELECT source,
               sum(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN lang = 'en' AND n_chars < 300 THEN 1 ELSE 0 END) AS b,
               sum(CASE WHEN lang <> 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN lang <> 'en' AND n_chars < 300 THEN 1 ELSE 0 END) AS d
        FROM documents GROUP BY source
    ),
    k AS (
        SELECT source, a, b, c, d,
               a + b + c + d AS tt,
               CAST(a + b AS HUGEINT) * (a + c)
                 + CAST(c + d AS HUGEINT) * (b + d) AS pe_num
        FROM t
    )
    SELECT source,
           CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST(CASE WHEN CAST(tt AS HUGEINT) * (a + d) >= pe_num
                     THEN (CAST(tt AS HUGEINT) * (a + d) - pe_num) * 1000000
                          // (CAST(tt AS HUGEINT) * tt - pe_num)
                     ELSE -((pe_num - CAST(tt AS HUGEINT) * (a + d)) * 1000000
                          // (CAST(tt AS HUGEINT) * tt - pe_num))
                END AS BIGINT) AS kappa_ppm
    FROM k
    WHERE CAST(tt AS HUGEINT) * tt > pe_num
    ORDER BY source
"""


def cohens_kappa(docs: DataFrame, group_col: str, a_pred, b_pred) -> DataFrame:
    """Core exact-kappa fold over a documents-like frame: ``a_pred`` /
    ``b_pred`` are boolean Columns (the two raters); one row per
    ``group_col`` with the contingency counts and the sign-split
    kappa_ppm. Factored from the registry query so planted-agreement
    model tests (identical raters -> 1e6, inverted raters -> negative)
    drive the exact production arithmetic."""
    t = docs.groupBy(group_col).agg(
        F.sum(F.when(a_pred & b_pred, 1).otherwise(0)).alias("a"),
        F.sum(F.when(a_pred & ~b_pred, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~a_pred & b_pred, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~a_pred & ~b_pred, 1).otherwise(0)).alias("d"),
    )
    k = t.withColumn("tt", F.col("a") + F.col("b") + F.col("c") + F.col("d")).withColumn(
        "pe_num",
        F.expr(
            "CAST(a + b AS DECIMAL(38,0)) * (a + c)"
            " + CAST(c + d AS DECIMAL(38,0)) * (b + d)"
        ),
    )
    return (
        k.filter(F.expr("CAST(tt AS DECIMAL(38,0)) * tt > pe_num"))
        .select(
            group_col,
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.col("d").cast("long").alias("d"),
            F.expr(
                "CAST(CASE WHEN CAST(tt AS DECIMAL(38,0)) * (a + d) >= pe_num"
                " THEN (CAST(tt AS DECIMAL(38,0)) * (a + d) - pe_num) * 1000000"
                "      div (CAST(tt AS DECIMAL(38,0)) * tt - pe_num)"
                " ELSE -((pe_num - CAST(tt AS DECIMAL(38,0)) * (a + d)) * 1000000"
                "      div (CAST(tt AS DECIMAL(38,0)) * tt - pe_num))"
                " END AS BIGINT)"
            ).alias("kappa_ppm"),
        )
        .orderBy(group_col)
    )


@query("dq_cohens_kappa", oracle=_KAPPA_ORACLE, tags=("quality", "llm", "exact-twin"))
def dq_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Cohen's kappa per source between the language gate
    (lang = 'en') and the length gate (n_chars >= 300): contingency
    counts plus chance-corrected agreement in sign-split integer ppm.
    The gate-replacement audit: kappa near 0 means the cheap gate adds
    information; kappa near 1e6 means it is redundant."""
    d = load_tables(spark, sf_dir)["documents"]
    return cohens_kappa(
        d, "source", F.col("lang") == "en", F.col("n_chars") >= 300
    )


# ---------------------------------------------------------------------------
# Gini impurity, exact.
#
# Per source over the lang label: gini = 1 - sum_i p_i^2
#                                      = (T^2 - sum_i c_i^2) / T^2.
# Non-negative by Cauchy-Schwarz, so a single unsigned integral div
# suffices. c_i^2 is widened to HUGEINT/DECIMAL(38,0) before summing;
# exact while T^2*1e6 < 1e38 (same unbounded-in-practice bound as
# kappa above). Scale: one groupBy onto distinct (source, lang) —
# map-side combinable — then one fold per source; one output row per
# source.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
    WITH c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY source, lang
    ),
    t AS (
        SELECT source,
               sum(c) AS total,
               CAST(count(*) AS BIGINT) AS n_langs,
               sum(CAST(c AS HUGEINT) * c) AS ssq
        FROM c GROUP BY source
    )
    SELECT source,
           CAST(total AS BIGINT) AS total,
           n_langs,
           CAST((CAST(total AS HUGEINT) * total - ssq) * 1000000
                // (CAST(total AS HUGEINT) * total) AS BIGINT) AS gini_ppm
    FROM t
    ORDER BY source
"""


def gini_impurity(df: DataFrame, group_col: str, label_col: str) -> DataFrame:
    """Core exact-Gini fold: per ``group_col``, the label count, total,
    and impurity (1 - sum p^2) in integer ppm. Factored for model
    tests (pure group -> 0, two equal labels -> 500000)."""
    c = df.groupBy(group_col, label_col).agg(F.count("*").cast("long").alias("c"))
    t = c.groupBy(group_col).agg(
        F.sum("c").alias("total"),
        F.count("*").cast("long").alias("n_langs"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
    )
    return t.select(
        group_col,
        F.col("total").cast("long").alias("total"),
        "n_langs",
        F.expr(
            "CAST((CAST(total AS DECIMAL(38,0)) * total - ssq) * 1000000"
            " div (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)"
        ).alias("gini_ppm"),
    ).orderBy(group_col)


@query("dq_gini_impurity", oracle=_GINI_ORACLE, tags=("quality", "llm", "exact-twin"))
def dq_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini impurity of the language mix per source — the
    log-free class-balance audit (entropy would need float ln). 0 ppm
    = single-language source; (1 - 1/k)*1e6 = uniform over k
    languages. Feed to ds_domain_mix_rebalance when a source drifts
    toward monoculture."""
    d = load_tables(spark, sf_dir)["documents"]
    return gini_impurity(d, "source", "lang")


# ---------------------------------------------------------------------------
# Cramér's V (squared, exact ppm) — round 10. dq_chi2_drift_2x2 tests
# WHETHER two categoricals are associated; Cramér's V is the EFFECT
# SIZE that makes chi-square comparable across tables of different
# size and shape: V² = χ² / (t · (min(R, C) − 1)), in [0, 1]. The
# square is the exact portable form (sqrt is float), monotone in V so
# thresholding works the same — the rho_sq_ppm convention.
#
# Exact arithmetic: per cell, the χ²·t term (o·t − r·c)² / (r·c) is
# one integral div on non-negative DECIMAL(38,0)/HUGEINT operands
# (each cell's floor is applied identically on both engines — the
# published statistic is THIS deterministic formulation, documented,
# off from real χ² by < #cells in the t-scaled units, i.e. < 1e-6
# relative at fixture scale); the cell terms sum and one more
# integral div by t²·(min(R,C)−1) lands V² in ppm.
# Headroom: o·t ≤ t², so (o·t − r·c)² ≤ t⁴ and the ppm-scaled
# numerator ≤ t⁴·1e6 — inside DECIMAL(38,0) while t ≤ ~3×10⁶ rows
# per audited table. ENFORCED (round 11, ADVICE r10 item 2 — the
# SPEARMAN_MAX_DAYS pattern): both engines filter the final row on
# t <= CRAMERS_MAX_N, so past the bound BOTH sides return an empty
# frame instead of Spark decimal-overflow NULL vs DuckDB HUGEINT
# error (the asymmetric-failure class the Spearman fix closed). At
# larger scale audit a sampled window (the audit-budget discipline)
# or widen to two-level partials.
#
# Scale: one map-side-combinable groupBy onto R·C cells, two
# broadcast-sized margin joins, one fold. Output: ONE row.
# ---------------------------------------------------------------------------

# DECIMAL(38,0) headroom bound on the contingency total (see block
# comment above); shared verbatim by the Spark fold and the oracle.
CRAMERS_MAX_N = 3_000_000

_CRAMERS_ORACLE = f"""
    WITH cells AS (
        SELECT event_type AS r, CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS c,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rn FROM cells GROUP BY r),
    cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY c),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells),
    dims AS (
        SELECT (SELECT count(*) FROM rm) AS nr, (SELECT count(*) FROM cm) AS nc
    ),
    lattice AS (
        SELECT rm.r, rm.rn, cm.c, cm.cn, coalesce(x.o, 0) AS o
        FROM rm CROSS JOIN cm
        LEFT JOIN cells x ON x.r = rm.r AND x.c = cm.c
    ),
    terms AS (
        -- GROUP BY t.t so an over-bound (filtered-empty) input yields
        -- ZERO rows, matching Spark's grouped aggregate — an
        -- ungrouped sum() would emit one NULL row instead
        SELECT t.t AS tt, CAST(sum(
            ((CAST(o AS HUGEINT) * t.t - CAST(rn AS HUGEINT) * cn)
             * (CAST(o AS HUGEINT) * t.t - CAST(rn AS HUGEINT) * cn)
             * 1000000)
            // (CAST(rn AS HUGEINT) * cn)
        ) AS HUGEINT) AS chi2t_ppm
        FROM lattice CROSS JOIN t
        WHERE t.t <= {CRAMERS_MAX_N}
        GROUP BY t.t
    )
    SELECT CAST(t.t AS BIGINT) AS n,
           CAST(d.nr AS BIGINT) AS n_rows,
           CAST(d.nc AS BIGINT) AS n_cols,
           CAST(terms.chi2t_ppm // t.t AS BIGINT) AS chi2_ppm,
           CAST(terms.chi2t_ppm
                // (CAST(t.t AS HUGEINT) * t.t * (least(d.nr, d.nc) - 1))
                AS BIGINT) AS v_sq_ppm
    FROM terms CROSS JOIN t CROSS JOIN dims d
"""


def cramers_v_sq(cells: DataFrame) -> DataFrame:
    """Core Cramér's V² fold over an ``(r, c, o)`` contingency frame.
    Factored so closed-form model tests (perfect association → 1e6
    ppm; independence → 0) drive the production margin joins and the
    exact per-cell arithmetic."""
    rm = cells.groupBy("r").agg(F.sum("o").cast("long").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").cast("long").alias("cn"))
    t = cells.agg(
        F.sum("o").cast("long").alias("t"),
        F.countDistinct("r").cast("long").alias("nr"),
        F.countDistinct("c").cast("long").alias("nc"),
    )
    # the FULL R×C lattice, zero cells included: absent cells carry
    # the (0 − e)²/e term, and a sparse perfect-association table
    # would otherwise read V² = 1/(min−1) instead of 1 (the planted
    # 3×3 model test catches exactly this)
    lattice = (
        F.broadcast(rm)
        .crossJoin(F.broadcast(cm))
        .join(cells, ["r", "c"], "left")
        .select("r", "c", "rn", "cn", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
    )
    terms = (
        lattice
        .crossJoin(F.broadcast(t))
        # identical guard to the oracle's WHERE (ADVICE r10 item 2):
        # past the DECIMAL(38,0) headroom bound both engines emit an
        # EMPTY frame — never Spark overflow-NULL vs DuckDB error
        .filter(F.col("t") <= CRAMERS_MAX_N)
        .select(
            "t",
            "nr",
            "nc",
            F.expr(
                "(CAST(o AS DECIMAL(38,0)) * t - CAST(rn AS DECIMAL(38,0)) * cn)"
            ).alias("d"),
            F.expr("CAST(rn AS DECIMAL(38,0)) * cn").alias("e"),
        )
        .select(
            "t",
            "nr",
            "nc",
            F.expr("CAST((d * d * 1000000) div e AS DECIMAL(38,0))").alias("cell"),
        )
    )
    return terms.groupBy("t", "nr", "nc").agg(
        F.sum("cell").alias("chi2t_ppm")
    ).select(
        F.col("t").alias("n"),
        F.col("nr").alias("n_rows"),
        F.col("nc").alias("n_cols"),
        F.expr("CAST(chi2t_ppm div t AS BIGINT)").alias("chi2_ppm"),
        F.expr(
            "CAST(chi2t_ppm div (CAST(t AS DECIMAL(38,0)) * t"
            " * (least(nr, nc) - 1)) AS BIGINT)"
        ).alias("v_sq_ppm"),
    )


@query(
    "dq_cramers_v_sq",
    oracle=_CRAMERS_ORACLE,
    tags=("quality", "stats", "exact-twin"),
)
def dq_cramers_v_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V² (exact ppm) between event_type and day-of-week —
    the effect size behind "is traffic mix different on weekends?".
    chi2_ppm is emitted too so the consumer can recover the test
    statistic; one row out."""
    ev = load_tables(spark, sf_dir)["events"]
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        F.expr("CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT)").alias("c"),
    ).agg(F.count("*").cast("long").alias("o"))
    return cramers_v_sq(cells)


# ---------------------------------------------------------------------------
# Data freshness audit (round 10): the first question an on-call asks
# of an ingest pipeline — per event_type, when did data last arrive,
# how stale is it against the freshest stream, and is the last day's
# volume collapsing? A silent upstream outage shows up here hours
# before any distribution-drift test (dq_drift_psi/dq_chi2) can see
# it. Lag is exact integer seconds (epoch arithmetic, no floats);
# last_ts is published as the ISO string per the canonicalization
# contract.
#
# Scale: two map-side-combinable aggregates over one scan (the
# trailing-day count rides the same pass as a conditional sum against
# the broadcast 1-row corpus max). Output: one row per event_type.
# ---------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
    WITH e AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    gm AS (SELECT max(ts) AS g FROM e),
    per AS (
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               max(e.ts) AS last_ts,
               CAST(sum(CASE WHEN e.ts > gm.g - INTERVAL 1 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day
        FROM e CROSS JOIN gm
        GROUP BY e.event_type
    )
    SELECT p.event_type, p.n_events,
           strftime(p.last_ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           -- microsecond diff then integral div: epoch() is a DOUBLE
           -- whose BIGINT cast ROUNDS, and per-side second floors can
           -- differ from the floored difference by 1
           CAST((epoch_us(gm.g) - epoch_us(p.last_ts)) // 1000000
                AS BIGINT) AS lag_seconds,
           p.n_last_day
    FROM per p CROSS JOIN gm
    ORDER BY p.event_type
"""


@query(
    "dq_freshness_lag",
    oracle=_FRESHNESS_ORACLE,
    tags=("quality", "ops", "exact-twin"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness: last arrival, exact staleness in
    seconds behind the freshest stream, and trailing-24h volume — the
    ingest-outage alarm that fires before any distribution test."""
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "ts")
    gm = ev.agg(F.max("ts").alias("g"))
    per = (
        ev.crossJoin(F.broadcast(gm))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("ts").alias("last_ts_t"),
            F.sum(
                F.when(
                    F.col("ts") > F.expr("g - INTERVAL 1 DAY"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_last_day"),
        )
    )
    return (
        per.crossJoin(F.broadcast(gm))
        .select(
            "event_type",
            "n_events",
            F.date_format("last_ts_t", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.expr(
                "CAST((unix_micros(g) - unix_micros(last_ts_t))"
                " div 1000000 AS BIGINT)"
            ).alias("lag_seconds"),
            "n_last_day",
        )
        .orderBy("event_type")
    )
