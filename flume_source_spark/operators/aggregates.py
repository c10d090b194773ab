"""Aggregation surface: statistical aggs, distinct aggs, collected
lists, rollup/cube/grouping sets, pivot, exact + approximate
percentiles.

All Spark aggregations run partial (map-side) + final automatically;
the only shuffle is on the grouping keys. Statistical aggregates
(stddev/var/corr/covar) merge via numerically-stable formulas whose
double error (~1e-14 relative) sits far below the 4-dp rounding used
for oracle comparison.

Rollup/cube/grouping-sets results are canonicalized with sentinel
strings (coalesce(key, 'ALL')) rather than grouping_id so the oracle
SQL stays engine-portable; the fixture keys are never NULL so the
sentinel is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import davg, dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(DISTINCT l_suppkey) AS n_supp,
           CAST(round(min(l_quantity), 4) AS DOUBLE) AS min_qty,
           CAST(round(max(l_quantity), 4) AS DOUBLE) AS max_qty,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(round(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.round(F.min("l_quantity"), 4).cast("double").alias("min_qty"),
            F.round(F.max("l_quantity"), 4).cast("double").alias("max_qty"),
            dsum(dec("l_quantity"), "sum_qty"),
            davg("l_quantity", "avg_qty"),
            F.round(F.sum_distinct(dec("l_quantity")), 2).cast("double").alias("sum_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           CAST(round(stddev_samp(l_extendedprice), 4) AS DOUBLE) AS sd_price,
           CAST(round(var_samp(l_quantity), 4) AS DOUBLE) AS var_qty,
           CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS corr_qty_price,
           CAST(round(covar_samp(l_quantity, l_discount), 6) AS DOUBLE) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).cast("double").alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).cast("double").alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).cast("double").alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).cast("double").alias("covar_qty_disc"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set sorted for determinism (collection order is not);
    the final array is serialized to a joined string so the comparison
    surface is scalar (list-vs-ndarray pandas rendering differs between
    engines — same reasoning as the to_json struct rule)."""
    n = load_tables(spark, sf_dir)["nation"]
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum(dec("l_quantity"), "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(dec("o_totalprice"), "total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
           count(*) AS n_cust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    ORDER BY segment, nationkey
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL on a temp view (the DataFrame API exposes
    only rollup/cube; Catalyst plans the Expand identically)."""
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nationkey,
               count(*) AS n_cust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY segment, nationkey
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_open,
           CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation; explicit value list so the
    output schema is static (required for a plannable query at scale —
    dynamic pivot values force an extra distinct pass)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec("l_quantity")), 2).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(round(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS median_qty,
           CAST(round(quantile_cont(l_extendedprice, 0.9), 4) AS DOUBLE) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (linear interpolation) — hash-matched. The
    approximate variant is a separate rows-only query."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 4).cast("double").alias("median_qty"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).cast("double").alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx",
    oracle=None,  # approximate by construction: rows-only check; the
    # companion pytest bounds the error against exact values
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) + percentile_approx — the
    scale path for distinct counts/quantiles over 100 TB, where exact
    computation would shuffle the world."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_sketch_mergeable",
    oracle=None,  # estimates are impl-specific (Apache DataSketches);
    # rows-only check + tolerance pytest vs exact counts
    tags=("aggregate", "approx", "sketch"),
)
def agg_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL):
    build one sketch per group with hll_sketch_agg, then union the
    group sketches with hll_union_agg to get the global cardinality
    WITHOUT rescanning the data — the two-level pattern that matters
    at 100 TB: partial sketches merge associatively, so daily/partition
    sketches roll up to any coarser grain for free (unlike
    approx_count_distinct, whose estimate is terminal)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    per_flag = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate("sketch").alias("approx_parts"),
        "exact_parts",
        "sketch",
    )
    total = per_flag.agg(
        F.lit("ALL").alias("l_returnflag"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_parts"),
        F.lit(None).cast("long").alias("exact_parts"),
    )
    return per_flag.drop("sketch").unionByName(total).orderBy("l_returnflag")
