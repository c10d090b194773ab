"""Distribution-drift statistics, wave 2 (round 9, session 2):
``dq_ks_two_sample_exact`` — the exact two-sample Kolmogorov-Smirnov
distance as an integer rational, and ``dq_chi2_drift_2x2`` — the
closed-form 2x2 chi-square drift test, both per source over the
documents table.

Together with dq_drift_psi / dq_roc_auc_exact / dq_pr_curve_exact /
dq_calibration_bins these complete the drift-monitoring battery a
training-data pipeline runs between crawl snapshots: PSI for binned
continuous drift, KS for the binning-free supremum distance, and the
2x2 chi-square for categorical composition shifts. Reference parity:
the reference engine ships no statistics surface at all (it is a
Flume file source, CephFsSource.java:29-171); this family is [NS]
engine surface mandated by BASELINE.json's north star.

All cross-row arithmetic is exact: counts stay BIGINT, cross products
are widened to DECIMAL(38,0)/HUGEINT BEFORE multiplying (the round-8
dq_roc_auc_exact discipline), and every published ratio is an integer
ppm via integral `div` on non-negative numerators (trunc == floor ==
DuckDB //). No doubles anywhere, so the driver hash cannot drift on
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance, exact.
#
# Per source, compare the n_chars distribution of lang='en' documents
# (sample A, size na) against all other languages (sample B, size nb).
# D = sup_v |F_A(v) - F_B(v)| evaluated at the pooled distinct values;
# with integer counts, D = ks_num / (na*nb) where
#   ks_num = max_v |cumA(v)*nb - cumB(v)*na|.
#
# Exactness/overflow: cumA*nb <= na*nb; the product is formed in
# DECIMAL(38,0) (HUGEINT in DuckDB) so it is exact for any na, nb that
# fit BIGINT; ks_num itself is <= na*nb and is only cast back to
# BIGINT at output (exact through na*nb ~ 9.2e18, i.e. ~3e9 docs per
# source per side — far past any per-source corpus slice). ks_ppm
# multiplies by 1e6 INSIDE the decimal domain before the integral div,
# so it never wraps.
#
# Scale: the grouped frame has one row per DISTINCT (source, n_chars)
# — map-side combinable — and the cumsums are one window pass per
# source over that collapsed frame, the identical shape dq_roc_auc and
# dq_pr_curve already carry. Output is one row per source.
# ---------------------------------------------------------------------------

_KS_ORACLE = """
    WITH g AS (
        SELECT source, n_chars AS v,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS da,
               sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS db
        FROM documents GROUP BY 1, 2
    ),
    c AS (
        SELECT source, v,
               sum(da) OVER (PARTITION BY source ORDER BY v) AS ca,
               sum(db) OVER (PARTITION BY source ORDER BY v) AS cb,
               sum(da) OVER (PARTITION BY source) AS na,
               sum(db) OVER (PARTITION BY source) AS nb
        FROM g
    ),
    d AS (
        SELECT source, v, na, nb,
               abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na) AS diff
        FROM c
        WHERE na > 0 AND nb > 0
    ),
    m AS (
        SELECT source, v, na, nb, diff,
               max(diff) OVER (PARTITION BY source) AS mx
        FROM d
    )
    SELECT source,
           CAST(na AS BIGINT) AS na,
           CAST(nb AS BIGINT) AS nb,
           CAST(mx AS BIGINT) AS ks_num,
           CAST(min(v) AS BIGINT) AS ks_at_value,
           CAST(mx * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_ppm
    FROM m
    WHERE diff = mx
    GROUP BY source, na, nb, mx
    ORDER BY source
"""


@query("dq_ks_two_sample_exact", oracle=_KS_ORACLE, tags=("quality", "llm", "exact-twin"))
def dq_ks_two_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance per source: English vs non-English
    document lengths. Reports the integer numerator (max |ca*nb -
    cb*na|), the smallest length where the supremum is attained, and
    the distance in ppm — the binning-free counterpart of dq_drift_psi
    (PSI needs bin edges; KS does not, so it catches shape drift PSI's
    bins can straddle).

    Plan: one map-side-combinable groupBy onto distinct (source,
    length) keys, one window pass for the cumulative counts, one more
    for the per-source max — no row-per-document window, no python."""
    d = load_tables(spark, sf_dir)["documents"]
    g = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("da"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("db"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    c = g.select(
        "source",
        "v",
        F.sum("da").over(wcum).alias("ca"),
        F.sum("db").over(wcum).alias("cb"),
        F.sum("da").over(wall).alias("na"),
        F.sum("db").over(wall).alias("nb"),
    )
    dd = c.filter((F.col("na") > 0) & (F.col("nb") > 0)).withColumn(
        "diff",
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("nb")
            - F.col("cb").cast("decimal(38,0)") * F.col("na")
        ),
    )
    m = dd.withColumn("mx", F.max("diff").over(wall))
    return (
        m.filter(F.col("diff") == F.col("mx"))
        .groupBy("source", "na", "nb", "mx")
        .agg(F.min("v").cast("long").alias("ks_at_value"))
        .select(
            "source",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.col("mx").cast("long").alias("ks_num"),
            "ks_at_value",
            F.expr(
                "CAST(mx * 1000000 div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("ks_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 2x2 chi-square drift test, closed form.
#
# Per source, split documents into an early and a late half (ntile(2)
# over doc_id — doc_id is unique, so the split is total-ordered and
# identical cross-engine) and test whether the English share shifted:
#
#        |  en   non-en          chi2 = T*(a*d - b*c)^2
#  early |   a     b                    -----------------------------
#  late  |   c     d                    (a+b)*(c+d)*(a+c)*(b+d)
#
# Published as chi2_ppm (chi2 <= T, so chi2*1e6 is int64-safe). The
# numerator T*(ad-bc)^2*1e6 is formed in DECIMAL(38,0): exact while
# T^5*1e6/256 < 1e38, i.e. per-source halves up to ~5e6 documents —
# beyond that, run it on the stratified-sample front-end the other
# audits use (ds_stratified_sample) rather than widening further.
# Degenerate margins (a+c = 0 or b+d = 0: a source that is all-en or
# all-non-en) have chi2 undefined and are filtered identically in both
# engines; the ntile halves are nonempty whenever the source has >= 2
# documents.
#
# Scale: ntile is one window pass per source; everything after is a
# per-source fold onto 4 counters — output is one row per source.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH h AS (
        SELECT source, lang,
               ntile(2) OVER (PARTITION BY source ORDER BY doc_id) AS half
        FROM documents
    ),
    t AS (
        SELECT source,
               sum(CASE WHEN half = 1 AND lang = 'en' THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN half = 1 AND lang <> 'en' THEN 1 ELSE 0 END) AS b,
               sum(CASE WHEN half = 2 AND lang = 'en' THEN 1 ELSE 0 END) AS c,
               sum(CASE WHEN half = 2 AND lang <> 'en' THEN 1 ELSE 0 END) AS d
        FROM h GROUP BY source
    )
    SELECT source,
           CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
           CAST((a + b + c + d)
                * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                * 1000000
                // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
                AS BIGINT) AS chi2_ppm
    FROM t
    WHERE a + c > 0 AND b + d > 0 AND a + b > 0 AND c + d > 0
    ORDER BY source
"""


@query("dq_chi2_drift_2x2", oracle=_CHI2_ORACLE, tags=("quality", "llm", "exact-twin"))
def dq_chi2_drift_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2x2 chi-square: did the English share of a source
    drift between its early and late half? Emits the contingency
    counts and chi2 in exact integer ppm (compare against 3.84e6 for
    the 5% one-degree-of-freedom line). The categorical-composition
    companion to the KS length test above."""
    d = load_tables(spark, sf_dir)["documents"]
    h = d.select(
        "source",
        "lang",
        F.ntile(2).over(Window.partitionBy("source").orderBy("doc_id")).alias("half"),
    )
    t = h.groupBy("source").agg(
        F.sum(F.when((F.col("half") == 1) & (F.col("lang") == "en"), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("half") == 1) & (F.col("lang") != "en"), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("half") == 2) & (F.col("lang") == "en"), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("half") == 2) & (F.col("lang") != "en"), 1).otherwise(0)).alias("d"),
    )
    return (
        t.filter(
            (F.col("a") + F.col("c") > 0)
            & (F.col("b") + F.col("d") > 0)
            & (F.col("a") + F.col("b") > 0)
            & (F.col("c") + F.col("d") > 0)
        )
        .select(
            "source",
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.col("d").cast("long").alias("d"),
            F.expr(
                "CAST((a + b + c + d)"
                " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)"
                " * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)"
                " * 1000000"
                " div (CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d))"
                " AS BIGINT)"
            ).alias("chi2_ppm"),
        )
        .orderBy("source")
    )
