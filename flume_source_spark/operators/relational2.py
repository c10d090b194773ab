"""Second wave of TPC-H-shaped queries adapted to the fixture schema:
nation-volume trade (Q7), promo revenue share (Q14), large-volume
customers (Q18), disjunctive-predicate revenue (Q19).

These add the remaining classic plan shapes: two-sided dimension
chains meeting at the fact, conditional-aggregate ratios, HAVING-IN
pipelines, and OR-of-ANDs predicates (which Catalyst pushes as a
disjunctive parquet filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "q07_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS ship_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cust_nation, supp_nation, ship_year
    ORDER BY cust_nation, supp_nation, ship_year
    """,
    tags=("join", "flagship"),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by year — the
    nation dim joins the fact twice (customer side + supplier side),
    both broadcast."""
    t = load_tables(spark, sf_dir)
    cn = t["nation"].select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cn, F.col("c_nationkey") == F.col("ck"))
        .join(sn, F.col("s_nationkey") == F.col("sk"))
        .filter(
            F.col("cust_nation").isin("NATION_1", "NATION_2")
            & F.col("supp_nation").isin("NATION_1", "NATION_2")
            & (F.col("cust_nation") != F.col("supp_nation"))
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "volume"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                              ELSE 0 END)
             / sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("aggregate", "conditional"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage — conditional-aggregate
    ratio in one pass (no second scan for the denominator). The decimal
    sums make the ratio identical across partitionings before the
    single final division."""
    t = load_tables(spark, sf_dir)
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round((F.lit(100.0) * F.sum(promo)) / F.sum(rev), 4).cast("double").alias("promo_share")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("subquery", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders — aggregated IN
    subquery (semi-join against a grouped HAVING result) feeding a
    top-k."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"].groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dsum(dec("l_quantity"), "total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("filter", "disjunctive"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides — Catalyst splits
    the single-side conjuncts out of the disjunction for pushdown and
    evaluates the cross-side residual post-join."""
    t = load_tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(15, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
    )
