"""Window-function surface: ranking, analytic (lag/lead/first/last/
nth), aggregates over row/range frames, per-group top-k.

Every window ORDER BY carries a unique tiebreak column so row_number
and frame contents are deterministic across engines. Window partitions
here are naturally small (per user, per order, per segment), which is
also the 100 TB design point: a window over an unbounded partition is
a scalability bug, so partition keys are chosen to bound frame size.

Per-group top-k generalizes the reference's min/max-by file selection
(CephFSEventReader.java:135-156) — OLDEST/YOUNGEST are top-1 by mtime
with a name tiebreak, exactly `row_number over (order by ts, name) = 1`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).cast("double").alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).cast("double").alias("cdist"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_analytic",
    oracle="""
    SELECT event_id, user_id,
           CAST(round(value, 4) AS DOUBLE) AS value,
           CAST(round(lag(value) OVER w, 4) AS DOUBLE) AS prev_value,
           CAST(round(lead(value) OVER w, 4) AS DOUBLE) AS next_value,
           CAST(round(first_value(value) OVER w, 4) AS DOUBLE) AS first_val,
           CAST(round(nth_value(value, 2) OVER w, 4) AS DOUBLE) AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window", "analytic"),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.round("value", 4).cast("double").alias("value"),
            F.round(F.lag("value").over(w), 4).cast("double").alias("prev_value"),
            F.round(F.lead("value").over(w), 4).cast("double").alias("next_value"),
            F.round(F.first_value("value").over(w), 4).cast("double").alias("first_val"),
            F.round(F.nth_value("value", 2).over(w), 4).cast("double").alias("second_val"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_frames",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_qty,
           CAST(round(avg(l_extendedprice)
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS DOUBLE) AS sliding_avg_price,
           CAST(round(max(l_extendedprice)
                OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS range_max
    FROM lineitem
    WHERE l_orderkey % 50 = 1
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("window", "frames"),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row frames (running + sliding) and a numeric RANGE frame. The
    running sum goes through decimal so the prefix sums are exact."""
    from flume_source_spark.canon import dec

    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 50 == 1)
    w_run = W.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_slide = W.partitionBy("l_orderkey").orderBy("l_linenumber").rowsBetween(-1, 1)
    w_range = W.partitionBy("l_orderkey").orderBy("l_extendedprice").rangeBetween(-10000, 0)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum(dec("l_quantity")).over(w_run), 2).cast("double").alias("running_qty"),
            F.round(F.avg("l_extendedprice").over(w_slide), 4).cast("double").alias("sliding_avg_price"),
            F.round(F.max("l_extendedprice").over(w_range), 4).cast("double").alias("range_max"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT n_name, c_custkey, CAST(round(c_acctbal, 4) AS DOUBLE) AS c_acctbal, rn
    FROM (
        SELECT n_name, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rn <= 3
    ORDER BY n_name, rn
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — the scalable top-k-per-
    group idiom (single shuffle on the partition key, no global sort)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", F.round("c_acctbal", 4).cast("double").alias("c_acctbal"), "rn")
        .orderBy("n_name", "rn")
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, CAST(round(s_acctbal, 4) AS DOUBLE) AS s_acctbal
    FROM supplier
    ORDER BY s_nationkey DESC, s_acctbal ASC NULLS FIRST, s_suppkey
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (range-partitioned
    total sort in Spark; at scale this is the one operator that truly
    needs a global exchange)."""
    s = load_tables(spark, sf_dir)["supplier"]
    return (
        s.select("s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 4).cast("double").alias("s_acctbal"))
        .orderBy(F.col("s_nationkey").desc(), F.col("s_acctbal").asc_nulls_first(), F.col("s_suppkey"))
    )
