"""Quality wave 5 (round 12): exact Brier score + Murphy (1973)
reliability / resolution / uncertainty decomposition — the scalar
companion of the ``dq_calibration_bins`` reliability diagram and the
proper-scoring-rule summary every forecast-quality dashboard leads
with.

Forecast convention (the ROC/calibration family's score, mapped to a
probability): q = least(n_chars, 1000) thousandths — "document length
as a probability forecast that lang = 'en'" — so the forecast support
is DISCRETE (≤ 1001 values). That matters: Murphy's decomposition

    BS = REL − RES + UNC

is EXACT when the bins are the forecast's native discrete values
(within-bin forecast variance is zero by construction); binning a
continuous forecast leaves two residual terms. With q in integer
thousandths and o ∈ {0, 1}:

    (q/1000 − o)² in ppm  =  (q − 1000·o)²            (exact integer)

so the mean Brier score in ppm is a pure BIGINT fold. REL/RES/UNC
are published as per-term-floored integer ppm (identical flooring on
both engines); the flooring residue vs the exact identity is bounded
by ~2 ppm per bin and is published as ``decomp_gap_ppm`` so the
identity is auditable from the output row itself.

Scale design: one map-side-combinable groupBy onto the ≤ 1001-cell
forecast support (the corpus never shuffles row-wise — the same
collapse dq_roc_auc_exact uses), a 1-row totals aggregate broadcast
back over the cell table, and a ≤ 1001-row final fold. Wide products
like (q·n_k)² ≤ 10⁶·N² overflow int64 past N ≈ 3e6, so every wide
term rides DECIMAL(38,0)/HUGEINT — the timeseries9 log-rank headroom
discipline (10⁶·N² ≤ 10³⁸ holds through N = 10¹⁶ rows).

Reference parity note: the reference engine (`CephFsSource.java`) has
no quality surface; this operator belongs to the declared [NS] engine
surface (SURVEY.md §2.2, data-quality family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_BRIER_ORACLE = """
    WITH obs AS (
        SELECT least(n_chars, 1000) AS q,
               CAST(lang = 'en' AS BIGINT) AS o
        FROM documents
    ),
    cells AS (
        SELECT CAST(q AS BIGINT) AS q,
               CAST(count(*) AS BIGINT) AS n_k,
               CAST(sum(o) AS BIGINT) AS pos_k
        FROM obs GROUP BY q
    ),
    tot AS (
        SELECT CAST(sum(n_k) AS BIGINT) AS n,
               CAST(sum(pos_k) AS BIGINT) AS p
        FROM cells GROUP BY 1 = 1
    ),
    terms AS (
        SELECT
            t.n, t.p,
            CAST(count(*) AS BIGINT) AS n_bins,
            CAST(sum(CAST(pos_k AS HUGEINT) * (1000 - q) * (1000 - q)
                     + CAST(n_k - pos_k AS HUGEINT) * q * q) AS HUGEINT)
                AS brier_num,
            CAST(sum((CAST(q * n_k - 1000 * pos_k AS HUGEINT)
                      * (q * n_k - 1000 * pos_k)) // n_k) AS HUGEINT)
                AS rel_num,
            CAST(sum(CAST(n_k AS HUGEINT)
                     * ((1000000 * pos_k) // n_k - (1000000 * t.p) // t.n)
                     * ((1000000 * pos_k) // n_k - (1000000 * t.p) // t.n))
                AS HUGEINT) AS res_num
        FROM cells CROSS JOIN tot t
        GROUP BY t.n, t.p
    )
    SELECT n, p AS n_pos, n_bins,
           CAST(brier_num // n AS BIGINT) AS brier_ppm,
           CAST(rel_num // n AS BIGINT) AS reliability_ppm,
           CAST(res_num // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
               AS resolution_ppm,
           CAST((CAST(p AS HUGEINT) * (n - p) * 1000000)
                // (CAST(n AS HUGEINT) * n) AS BIGINT) AS uncertainty_ppm,
           CAST(CAST(brier_num // n AS BIGINT)
                - (CAST(rel_num // n AS BIGINT)
                   - CAST(res_num // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
                   + CAST((CAST(p AS HUGEINT) * (n - p) * 1000000)
                          // (CAST(n AS HUGEINT) * n) AS BIGINT))
                AS BIGINT) AS decomp_gap_ppm
    FROM terms
"""


def brier_decomposition(obs: DataFrame) -> DataFrame:
    """Core fold over a (q, o) frame — q = integer forecast in
    thousandths, o ∈ {0, 1} outcome: the exact mean Brier score and
    its Murphy decomposition over the discrete forecast support, all
    in floored integer ppm. Factored so closed-form model tests (a
    perfectly calibrated discrete forecast → REL = 0 and gap = 0; a
    constant forecast → RES = 0; the BS = REL − RES + UNC identity on
    exact-division fixtures) drive the production stages."""
    cells = obs.groupBy(F.col("q").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("n_k"),
        F.sum("o").cast("long").alias("pos_k"),
    )
    tot = cells.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("pos_k").cast("long").alias("p"),
    )
    terms = (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("n", "p")
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum(
                F.expr(
                    "CAST(pos_k AS DECIMAL(38,0)) * (1000 - q) * (1000 - q)"
                    " + CAST(n_k - pos_k AS DECIMAL(38,0)) * q * q"
                )
            ).alias("brier_num"),
            F.sum(
                F.expr(
                    "(CAST(q * n_k - 1000 * pos_k AS DECIMAL(38,0))"
                    " * (q * n_k - 1000 * pos_k)) div n_k"
                )
            ).alias("rel_num"),
            F.sum(
                F.expr(
                    "CAST(n_k AS DECIMAL(38,0))"
                    " * ((1000000 * pos_k) div n_k - (1000000 * p) div n)"
                    " * ((1000000 * pos_k) div n_k - (1000000 * p) div n)"
                )
            ).alias("res_num"),
        )
    )
    return terms.select(
        "n",
        F.col("p").alias("n_pos"),
        "n_bins",
        F.expr("CAST(brier_num div n AS BIGINT)").alias("brier_ppm"),
        F.expr("CAST(rel_num div n AS BIGINT)").alias("reliability_ppm"),
        F.expr(
            "CAST(res_num div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("resolution_ppm"),
        F.expr(
            "CAST((CAST(p AS DECIMAL(38,0)) * (n - p) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("uncertainty_ppm"),
        F.expr(
            "CAST(CAST(brier_num div n AS BIGINT)"
            " - (CAST(rel_num div n AS BIGINT)"
            "    - CAST(res_num div (CAST(n AS DECIMAL(38,0)) * 1000000)"
            "           AS BIGINT)"
            "    + CAST((CAST(p AS DECIMAL(38,0)) * (n - p) * 1000000)"
            "           div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT))"
            " AS BIGINT)"
        ).alias("decomp_gap_ppm"),
    )


@query(
    "dq_brier_decomposition",
    oracle=_BRIER_ORACLE,
    tags=("quality", "llm", "scoring"),
)
def dq_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Brier score of the length-as-probability forecast of
    lang = 'en', with Murphy's exact discrete-support decomposition
    (reliability − resolution + uncertainty) and the published
    flooring residue — one integer-ppm row."""
    d = load_tables(spark, sf_dir)["documents"]
    obs = d.select(
        F.least(F.col("n_chars"), F.lit(1000)).alias("q"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("o"),
    )
    return brier_decomposition(obs)


_LIFT_ORACLE = """
    WITH scored AS (
        SELECT doc_id, n_chars AS score,
               CAST(lang = 'en' AS BIGINT) AS o,
               CAST(ntile(10) OVER (ORDER BY n_chars DESC, doc_id)
                    AS BIGINT) AS decile
        FROM documents
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o) AS BIGINT) AS n_pos
        FROM scored GROUP BY decile
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(n_pos) AS BIGINT) AS p
        FROM per GROUP BY 1 = 1
    ),
    cum AS (
        SELECT decile, n, n_pos,
               CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
               CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
        FROM per
    )
    SELECT c.decile, c.n, c.n_pos,
           CAST(c.n_pos * 1000000 // c.n AS BIGINT) AS pos_rate_ppm,
           c.cum_n, c.cum_pos,
           CAST(c.cum_pos * 1000000 // t.p AS BIGINT) AS capture_ppm,
           CAST((CAST(c.n_pos AS HUGEINT) * t.nn * 1000000)
                // (CAST(c.n AS HUGEINT) * t.p) AS BIGINT) AS lift_ppm,
           CAST((CAST(c.cum_pos AS HUGEINT) * t.nn * 1000000)
                // (CAST(c.cum_n AS HUGEINT) * t.p) AS BIGINT) AS cum_lift_ppm
    FROM cum c CROSS JOIN tot t
    ORDER BY c.decile
"""


def lift_gain_deciles(scored: DataFrame) -> DataFrame:
    """Core gains/lift fold over a (doc_id, score, o) frame: exact
    global score deciles via the DISTRIBUTED ntile helper (score
    descending, doc_id tiebreak — no single-partition sort), then
    per-decile capture and lift in floored ppm. Factored so
    closed-form model tests (a perfect ranker's top decile captures
    everything; a constant-rate corpus has lift = 1e6 everywhere)
    drive the production stages."""
    from pyspark.sql import Window

    from flume_source_spark.global_order import with_global_ntile

    tiles = with_global_ntile(
        scored,
        10,
        [F.col("score").desc(), F.col("doc_id")],
        -F.col("score"),
        tile_col="decile",
    )
    per = tiles.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o").cast("long").alias("n_pos"),
    )
    tot = per.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("n_pos").cast("long").alias("p"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w).cast("long").alias("cum_n"),
        F.sum("n_pos").over(w).cast("long").alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot.drop("_g")))
        .select(
            "decile",
            "n",
            "n_pos",
            F.expr("CAST(n_pos * 1000000 div n AS BIGINT)").alias("pos_rate_ppm"),
            "cum_n",
            "cum_pos",
            F.expr("CAST(cum_pos * 1000000 div p AS BIGINT)").alias("capture_ppm"),
            F.expr(
                "CAST((CAST(n_pos AS DECIMAL(38,0)) * nn * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * p) AS BIGINT)"
            ).alias("lift_ppm"),
            F.expr(
                "CAST((CAST(cum_pos AS DECIMAL(38,0)) * nn * 1000000)"
                " div (CAST(cum_n AS DECIMAL(38,0)) * p) AS BIGINT)"
            ).alias("cum_lift_ppm"),
        )
        .orderBy("decile")
    )


@query(
    "dq_lift_gain_deciles",
    oracle=_LIFT_ORACLE,
    tags=("quality", "llm", "scoring"),
)
def dq_lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for the length-score ranking of
    lang = 'en': exact global deciles by (score DESC, doc_id) via the
    distributed-ntile helper, each decile's positive rate, cumulative
    capture of all positives, and lift vs the base rate — the
    model-free ranking-quality table every targeting/filter review
    reads, sibling to dq_roc_auc_exact and dq_calibration_bins.

    Scale: the decile assignment is the round-11 global-order plan
    (boundary-bucketed two-level rank, broadcast offsets — no
    single-partition sort of the corpus); everything after it is a
    10-row frame. The cumulative window runs on 10 rows."""
    d = load_tables(spark, sf_dir)["documents"]
    return lift_gain_deciles(
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("score"),
            F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("o"),
        )
    )


_IV_ORACLE = """
    WITH scored AS (
        SELECT doc_id,
               CAST(lang = 'en' AS BIGINT) AS o,
               CAST(ntile(10) OVER (ORDER BY n_chars DESC, doc_id)
                    AS BIGINT) AS decile
        FROM documents
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(o) AS BIGINT) AS pos_k,
               CAST(count(*) - sum(o) AS BIGINT) AS neg_k
        FROM scored GROUP BY decile
    ),
    tot AS (
        SELECT CAST(sum(pos_k) AS BIGINT) AS p,
               CAST(sum(neg_k) AS BIGINT) AS nb
        FROM per GROUP BY 1 = 1
    ),
    woe AS (
        SELECT per.decile, per.n, per.pos_k, per.neg_k,
               CASE WHEN per.pos_k > 0 AND per.neg_k > 0 THEN
                   round(ln((CAST(per.pos_k AS DOUBLE) * t.nb)
                            / (CAST(per.neg_k AS DOUBLE) * t.p)), 4)
               END AS woe_r4,
               CASE WHEN per.pos_k > 0 AND per.neg_k > 0 THEN
                   round((CAST(per.pos_k AS DOUBLE) / t.p
                          - CAST(per.neg_k AS DOUBLE) / t.nb)
                         * ln((CAST(per.pos_k AS DOUBLE) * t.nb)
                              / (CAST(per.neg_k AS DOUBLE) * t.p)), 6)
               END AS iv_term
        FROM per CROSS JOIN tot t
    )
    SELECT decile, n, pos_k, neg_k,
           CAST(woe_r4 AS DOUBLE) AS woe_r4,
           CAST(round(sum(coalesce(iv_term, 0)) OVER (), 4) AS DOUBLE)
               AS iv_total_r4
    FROM woe
    ORDER BY decile
"""


def information_value(scored: DataFrame) -> DataFrame:
    """Weight-of-Evidence / Information-Value table over a
    (doc_id, score, o) frame: exact global score deciles (the
    lift_gain_deciles assignment), per-bin WoE = ln(good-share /
    bad-share) rounded 4, and the total IV (Σ share-difference ×
    WoE, per-term rounded 6 before the 10-row sum, total rounded 4)
    — the scorecard predictive-power summary (IV < 0.02 useless,
    0.1–0.3 medium, > 0.5 suspicious). Bins with a zero cell publish
    NULL WoE and contribute 0 to IV (documented; the +0.5 Laplace
    variant changes published numbers and is left to the caller).

    Floats: the ln/division doubles consume exact integers and are
    rounded on both engines (the text_char_entropy precedent); all
    counts are exact BIGINT. Scale: identical to dq_lift_gain_deciles
    — the decile assignment is the distributed global-order plan,
    everything after is a 10-row frame."""
    from pyspark.sql import Window

    from flume_source_spark.global_order import with_global_ntile

    tiles = with_global_ntile(
        scored,
        10,
        [F.col("score").desc(), F.col("doc_id")],
        -F.col("score"),
        tile_col="decile",
    )
    per = tiles.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o").cast("long").alias("pos_k"),
        (F.count("*") - F.sum("o")).cast("long").alias("neg_k"),
    )
    tot = per.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("pos_k").cast("long").alias("p"),
        F.sum("neg_k").cast("long").alias("nb"),
    )
    woe = per.crossJoin(F.broadcast(tot.drop("_g"))).select(
        "decile",
        "n",
        "pos_k",
        "neg_k",
        F.expr(
            "CASE WHEN pos_k > 0 AND neg_k > 0 THEN"
            " round(ln((CAST(pos_k AS DOUBLE) * nb)"
            "          / (CAST(neg_k AS DOUBLE) * p)), 4) END"
        ).alias("woe_r4"),
        F.expr(
            "CASE WHEN pos_k > 0 AND neg_k > 0 THEN"
            " round((CAST(pos_k AS DOUBLE) / p"
            "        - CAST(neg_k AS DOUBLE) / nb)"
            "       * ln((CAST(pos_k AS DOUBLE) * nb)"
            "            / (CAST(neg_k AS DOUBLE) * p)), 6) END"
        ).alias("iv_term"),
    )
    w = Window.partitionBy()
    return (
        woe.select(
            "decile",
            "n",
            "pos_k",
            "neg_k",
            F.col("woe_r4").cast("double").alias("woe_r4"),
            F.round(
                F.sum(F.coalesce(F.col("iv_term"), F.lit(0.0))).over(w), 4
            )
            .cast("double")
            .alias("iv_total_r4"),
        )
        .orderBy("decile")
    )


@query(
    "dq_information_value",
    oracle=_IV_ORACLE,
    tags=("quality", "llm", "scoring"),
)
def dq_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE / Information Value of the length-score ranking for
    lang = 'en' over exact global deciles — the scorecard
    predictive-power table next to dq_lift_gain_deciles and
    dq_roc_auc_exact."""
    d = load_tables(spark, sf_dir)["documents"]
    return information_value(
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("score"),
            F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("o"),
        )
    )


_GINI_ORACLE = """
    WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                    x -> length(x) > 0)) AS BIGINT) AS tok
        FROM documents
    ),
    r AS (
        SELECT tok,
               CAST(row_number() OVER (ORDER BY tok, doc_id) AS BIGINT) AS rk
        FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST((2 * CAST(sum(rk * tok) AS HUGEINT)
                 - (count(*) + 1) * CAST(sum(tok) AS HUGEINT)) * 1000000
                // (CAST(count(*) AS HUGEINT) * sum(tok)) AS BIGINT)
               AS gini_ppm
    FROM r
    GROUP BY 1 = 1
    HAVING sum(tok) > 0
"""


def gini_concentration(sized: DataFrame) -> DataFrame:
    """Exact Gini coefficient of a non-negative (doc_id, tok) size
    distribution via the rank formula

        G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx)

    with ranks from the DISTRIBUTED global-order helper (total order
    (tok, doc_id) — no single-partition sort), published in floored
    ppm. Closed forms pinned by model tests: all-equal → 0;
    one-document-owns-everything → (n−1)/n; the 3-doc [0,0,3] case →
    2/3. Empty or all-zero inputs publish no row (HAVING guard on
    both engines).

    Scale: the rank is the agg_equidepth global-order plan; the fold
    is one 1-row aggregate. The Σ r·x product needs
    DECIMAL(38,0)/HUGEINT (r ≤ n, x ≤ corpus tokens)."""
    from flume_source_spark.global_order import with_global_rank

    ranked = with_global_rank(
        sized,
        [F.col("tok"), F.col("doc_id")],
        F.col("tok"),
        rank_col="rk",
    )
    return (
        ranked.groupBy(F.expr("1 = 1").alias("_g"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.sum(F.expr("CAST(rk AS DECIMAL(38,0)) * tok")).alias("_rx"),
        )
        .filter(F.col("total_tokens") > 0)
        .select(
            "n",
            "total_tokens",
            F.expr(
                "CAST((2 * _rx - (CAST(n AS DECIMAL(38,0)) + 1) * total_tokens)"
                " * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * total_tokens) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


@query(
    "dq_gini_concentration",
    oracle=_GINI_ORACLE,
    tags=("quality", "llm", "stats"),
)
def dq_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-document token distribution — the
    corpus-concentration number ("do a few documents own most of the
    tokens?") a mixture review reads before trusting per-document
    sampling weights. Exact integer rank formula on the distributed
    global order, one floored-ppm row."""
    d = load_tables(spark, sf_dir)["documents"]
    sized = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda x: F.length(x) > 0,
            )
        )
        .cast("long")
        .alias("tok"),
    )
    return gini_concentration(sized)


_HHI_ORACLE = """
    WITH per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS nd,
               CAST(sum(chars) AS BIGINT) AS nc
        FROM per GROUP BY 1 = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           max(t.nd) AS n_docs,
           CAST(sum(CAST(p.n_docs AS HUGEINT) * p.n_docs) * 1000000
                // (CAST(max(t.nd) AS HUGEINT) * max(t.nd)) AS BIGINT)
               AS hhi_docs_ppm,
           CAST(sum(CAST(p.chars AS HUGEINT) * p.chars) * 1000000
                // (CAST(max(t.nc) AS HUGEINT) * max(t.nc)) AS BIGINT)
               AS hhi_chars_ppm
    FROM per p CROSS JOIN tot t
    GROUP BY 1 = 1
    HAVING max(t.nd) > 0 AND max(t.nc) > 0
"""


def herfindahl_index(per: DataFrame) -> DataFrame:
    """Exact Herfindahl-Hirschman concentration over a per-source
    (n_docs, chars) share table: HHI = Σ shareᵢ² in floored ppm for
    both the document-count and character-mass shares (1e6/k =
    perfectly even across k sources; 1e6 = single-source). The
    antitrust thresholds transfer directly to corpus curation: HHI >
    250,000 ppm is the "highly concentrated" regime where one
    source's quirks dominate training. Factored so closed-form model
    tests (k equal sources → 1e6/k floored; one source owns all →
    1e6) drive the production stages.

    Scale: the share table is one map-side-combinable aggregate per
    source; the fold is source-count-sized. Squares of corpus-scale
    char masses ride DECIMAL(38,0)/HUGEINT."""
    tot = per.groupBy(F.expr("1 = 1").alias("_g")).agg(
        F.sum("n_docs").cast("long").alias("nd"),
        F.sum("chars").cast("long").alias("nc"),
    )
    return (
        per.crossJoin(F.broadcast(tot.drop("_g")))
        .groupBy("nd", "nc")
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.sum(F.expr("CAST(n_docs AS DECIMAL(38,0)) * n_docs")).alias("_sd"),
            F.sum(F.expr("CAST(chars AS DECIMAL(38,0)) * chars")).alias("_sc"),
        )
        .filter((F.col("nd") > 0) & (F.col("nc") > 0))
        .select(
            "n_sources",
            F.col("nd").alias("n_docs"),
            F.expr(
                "CAST(_sd * 1000000 div (CAST(nd AS DECIMAL(38,0)) * nd)"
                " AS BIGINT)"
            ).alias("hhi_docs_ppm"),
            F.expr(
                "CAST(_sc * 1000000 div (CAST(nc AS DECIMAL(38,0)) * nc)"
                " AS BIGINT)"
            ).alias("hhi_chars_ppm"),
        )
    )


@query(
    "dq_herfindahl_index",
    oracle=_HHI_ORACLE,
    tags=("quality", "llm", "stats"),
)
def dq_herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of the corpus across
    sources, by document count AND by character mass, in exact
    floored ppm — the one-row "is this corpus really multi-source"
    check next to dq_gini_concentration (which measures per-document
    inequality; HHI measures per-source dominance)."""
    d = load_tables(spark, sf_dir)["documents"]
    per = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    return herfindahl_index(per)
