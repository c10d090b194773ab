"""Window wave 3: equi-depth histograms and DISTINCT-over-window.

- ``agg_equidepth_histogram`` — equi-DEPTH (quantile-bucket)
  statistics: ``ntile(10)`` over a TOTAL order assigns equal-count
  buckets, then per bucket min/max/count — the optimizer-statistics
  histogram shape (equal mass, data-driven edges), complementing
  ``ds_length_histogram``'s fixed-WIDTH form. The total order
  (cents, l_orderkey, l_linenumber) makes ntile deterministic:
  same-valued rows straddling a bucket edge land identically on both
  engines. Exact-rank histograms need a global sort; the 100 TB
  equivalent is approx_percentile edges + one aggregate pass, same
  trade ``sink_zorder_write`` uses for its range buckets.
- ``window_distinct_count_emulation`` — Spark (and DuckDB) reject
  ``count(DISTINCT x) OVER (...)``; the standard rewrite is the
  dense_rank trick: within the partition, ``dense_rank`` ordered by x
  numbers the distinct values 1..N, so ``max(dense_rank) OVER
  (partition)`` IS the distinct count — two window passes over one
  sort order, no quadratic rescans. Emitted per row (running
  analytics shape): each order's line count, its distinct-supplier
  count, and the share of the partition's distinct parts seen so far
  (a cumulative-coverage curve). The oracle uses a correlated
  grouped subquery — an independent formulation of the same
  quantity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_EQUIDEPTH_ORACLE = """
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem),
    t AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS bucket
        FROM c)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM t GROUP BY bucket
    ORDER BY bucket
"""


@query("agg_equidepth_histogram", oracle=_EQUIDEPTH_ORACLE, tags=("agg", "histogram"))
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile histogram of lineitem price cents: exact
    NTILE(10) over a deterministic total order via the DISTRIBUTED
    global-order helper (round 11 — the window form was a
    single-partition sort of all of lineitem; `global_order` replaces
    it with boundary-bucketed two-level rank, bit-identical to the
    unchanged NTILE oracle), then per-bucket count/min/max."""
    from flume_source_spark.global_order import with_global_ntile

    li = load_tables(spark, sf_dir)["lineitem"]
    c = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    return (
        with_global_ntile(
            c,
            10,
            [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")],
            F.col("cents"),
            tile_col="bucket",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_rows", "lo_cents", "hi_cents")
        .orderBy("bucket")
    )


_WDISTINCT_ORACLE = """
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey
        FROM lineitem WHERE l_orderkey % 50 = 0),
    per_order AS (
        SELECT l_orderkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_supp
        FROM base GROUP BY l_orderkey),
    runn AS (
        SELECT b.l_orderkey, b.l_linenumber,
               (SELECT CAST(count(DISTINCT b2.l_partkey) AS BIGINT) FROM base b2
                WHERE b2.l_orderkey = b.l_orderkey
                  AND b2.l_linenumber <= b.l_linenumber) AS parts_seen
        FROM base b)
    SELECT r.l_orderkey, r.l_linenumber, p.n_lines, p.n_distinct_supp, r.parts_seen
    FROM runn r JOIN per_order p USING (l_orderkey)
    ORDER BY r.l_orderkey, r.l_linenumber
"""


@query(
    "window_distinct_count_emulation",
    oracle=_WDISTINCT_ORACLE,
    tags=("window", "distinct"),
)
def window_distinct_count_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) OVER emulation: per lineitem row, the order's
    line count, distinct-supplier count (dense_rank trick: partition
    max of dense_rank-by-supplier == distinct suppliers), and the
    running distinct-part count up to this line (first-occurrence
    trick: flag each part's first line, running sum of flags — the
    frame-capable form of running-distinct, since dense_rank cannot be
    re-framed by a different order)."""
    li = load_tables(spark, sf_dir)["lineitem"].where(
        F.col("l_orderkey") % 50 == 0
    ).select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
    part = Window.partitionBy("l_orderkey")
    dr_supp = F.dense_rank().over(part.orderBy("l_suppkey"))
    supp_cnt = F.max(dr_supp).over(
        part.orderBy("l_suppkey").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    first_occ = (
        F.row_number().over(
            Window.partitionBy("l_orderkey", "l_partkey").orderBy("l_linenumber")
        )
        == 1
    )
    # RANGE (not ROWS) frame: the fixture has duplicate l_linenumber
    # values within an order, and "seen by line L" must include ALL
    # rows at L — peer rows — exactly what the oracle's <= gives.
    runseen = F.sum(F.when(first_occ, 1).otherwise(0)).over(
        part.orderBy("l_linenumber").rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.count("*").over(part).alias("n_lines"),
            supp_cnt.alias("n_distinct_supp"),
            runseen.cast("long").alias("parts_seen"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_WMEDIAN_ORACLE = """
    WITH c AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem),
    agg AS (SELECT flag, cents, CAST(sum(w) AS BIGINT) AS w
            FROM c GROUP BY 1, 2),
    cum AS (
        SELECT flag, cents, w,
               sum(w) OVER (PARTITION BY flag ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY flag) AS tw
        FROM agg)
    SELECT flag,
           CAST(min(CASE WHEN cw * 2 >= tw THEN cents END) AS BIGINT)
               AS weighted_median_cents,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(count(*) AS BIGINT) AS n_distinct_values
    FROM cum GROUP BY flag
    ORDER BY flag
"""


@query("agg_weighted_median", oracle=_WMEDIAN_ORACLE, tags=("agg", "percentile", "weighted"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (weight = quantity) per return flag —
    the aggregate Spark lacks natively (percentile() is unweighted;
    percentile_approx has no weight arg): lower weighted median =
    smallest value whose cumulative weight reaches half the total.
    Plan: pre-aggregate (value → weight sum) FIRST — the cumulative
    window then runs over DISTINCT values per group, not raw rows
    (the same reduce-before-window shape as ts_acf); all arithmetic
    in exact integers (cents × integer weights, cw·2 ≥ tw), so the
    median selection is tie-free cross-engine. At 100 TB the
    distinct-value domain per group is the bound that matters;
    when it is too large, bucket values first (equi-depth or fixed
    width) and the same cumulative selection yields a bounded-error
    weighted quantile."""
    li = load_tables(spark, sf_dir)["lineitem"]
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    agg = c.groupBy("flag", "cents").agg(F.sum("w").alias("w"))
    wc = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("flag")
    cum = agg.select(
        "flag", "cents", "w",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("cents"))).alias(
                "weighted_median_cents"
            ),
            F.max("tw").alias("total_weight"),
            F.count("*").alias("n_distinct_values"),
        )
        .orderBy("flag")
    )


_PARETO_ORACLE = """
    WITH rev AS (
        SELECT p_brand,
               CAST(sum(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                                   * (1 - CAST(l_discount AS DECIMAL(18,4))) * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand),
    ranked AS (
        SELECT p_brand, cents,
               CAST(sum(cents) OVER (ORDER BY cents DESC, p_brand
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(sum(cents) OVER () AS BIGINT) AS total
        FROM rev)
    SELECT p_brand, cents,
           cum * 10000 // total AS cum_share_permyriad,
           CASE WHEN cum * 10 <= total * 8 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY cents DESC, p_brand
"""


@query("window_pareto_abc", oracle=_PARETO_ORACLE, tags=("window", "pareto"))
def window_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: brands ranked by revenue, running
    cumulative share, class A = within the first 80 % of revenue,
    B = to 95 %, C = tail — the classic inventory/contribution
    analysis. Reduce-first (brand revenue aggregate), then ONE global
    cumulative window over the brand-sized frame (dozens of rows —
    the global sort everyone fears is over the REDUCED domain, the
    same reduce-before-window discipline as agg_weighted_median);
    class boundaries compare exact integers (cum·10 vs total·8), so
    a brand landing exactly on 80 % classifies identically on both
    engines."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_extendedprice", "l_discount")
    p = t["part"].select("p_partkey", "p_brand")
    cents = F.round(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        * 100,
        0,
    ).cast("long")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.orderBy(F.desc("cents"), "p_brand").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy()
    ranked = rev.select(
        "p_brand", "cents",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(wt).alias("total"),
    )
    return ranked.select(
        "p_brand", "cents",
        # exact integer floor division (cum, total BIGINT non-negative →
        # `div` == floor), mirroring the oracle's `//`: double division
        # is inexact once cum*10000 exceeds 2^53 and can floor wrong
        F.expr("cum * 10000 div total").alias("cum_share_permyriad"),
        F.when(F.col("cum") * 10 <= F.col("total") * 8, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy(F.desc("cents"), "p_brand")
