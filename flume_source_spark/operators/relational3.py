"""Third wave of TPC-H-shaped queries, adapted to the fixture schema
(the fixture has no l_shipmode/l_commitdate/c_phone, so each query
keeps its reference plan SHAPE on the columns that exist):

- q04 shape: EXISTS-driven priority count (semi-join feeding an agg).
- q12 shape: conditional CASE-sums over a fact⋈dim join.
- q13 shape: customer order-count distribution — LEFT OUTER join,
  count(child key) (zeros preserved), then a second aggregation over
  the first (two chained shuffles, the classic distribution query).
- q17 shape: small-quantity revenue vs a per-group scalar average —
  the correlated-aggregate join (agg once, join back, filter).
- q22 shape: positive-balance customers with no RECENT orders (none
  since 1999 — the fixture has near-total order coverage, so "never
  ordered" is empty) vs the global average balance — anti-join on a
  date-filtered fact plus an uncorrelated scalar subquery.

Scale notes: every dim side here (nation, the per-part averages, the
scalar average) is broadcast-able and broadcast by Catalyst; the only
fact-fact contact is q04/q13's orders⋈lineitem / customer⋈orders,
which shuffle on their natural keys — the same keys every downstream
agg uses, so AQE reuses the exchange partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "q04_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("flagship", "subquery", "semi"),
)
def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a date window having at least one
    late-shipping lineitem, counted per priority. The EXISTS
    decorrelates to a left-semi join on the order key; the date filter
    pushes to the orders scan before the join."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_conditional_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("flagship", "conditional-agg"),
)
def q12_conditional_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE-sums split one pass over the
    joined fact into priority classes — no second scan, no pivot
    shuffle; the shipdate predicate prunes the lineitem scan."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-06-01") & (F.col("l_shipdate") < "1996-06-01")
    ).select("l_orderkey", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"].select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("flagship", "outer-join", "two-level-agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, for each
    k — LEFT OUTER join so zero-order customers survive, count on the
    CHILD key (count(o_orderkey) skips the nulls an outer join
    manufactures), then aggregate the aggregate."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"].select("c_custkey")
        .join(t["orders"].select("o_custkey", "o_orderkey"), F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH brand_li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
    ),
    avg_qty AS (
        SELECT l_partkey AS ap, avg(l_quantity) AS aq FROM brand_li GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) / 7 AS avg_yearly
    FROM brand_li JOIN avg_qty ON ap = l_partkey
    WHERE l_quantity < 0.5 * aq
    """,
    tags=("flagship", "correlated-agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders relative to
    each part's own average — the correlated scalar aggregate
    decorrelated by hand: filter the fact to the brand's parts FIRST
    (broadcast semi-shaped join against the filtered dim), aggregate
    per part over that small slice, join the brand-sized averages
    back. The averages are per-part, so pre-filtering by part key
    changes nothing semantically — but the broadcast side shrinks
    from all-parts to brand-sized, which is what keeps it a broadcast
    at 100 TB. The /7 happens OUTSIDE the rounded decimal sum, in
    IEEE double, so both engines divide identical inputs identically
    (a decimal quotient on a half-boundary rounds differently in
    Spark's exact decimal vs DuckDB's double division)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    brand_li = (
        t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("ap")).agg(F.avg("l_quantity").alias("aq"))
    joined = brand_li.join(F.broadcast(avg_qty), F.col("ap") == F.col("l_partkey")).filter(
        F.col("l_quantity") < 0.5 * F.col("aq")
    )
    return joined.agg(
        (F.round(F.sum(dec("l_extendedprice")), 2).cast("double") / 7).alias("avg_yearly")
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH pos_avg AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM customer, pos_avg
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("flagship", "anti-join", "scalar-subquery"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    order since 1999 ("dormant" — the fixture's order coverage makes
    literal never-ordered empty at every SF), grouped by nation
    (standing in for the phone country code the fixture lacks). The
    uncorrelated scalar average becomes a broadcast cross-join of one
    row; the NOT EXISTS is a left-anti join on the date-filtered
    order keys — the date predicate pushes into the orders scan
    BEFORE the anti-join, shrinking the build side."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    pos_avg = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            t["orders"].filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_nationkey")
    )
