"""Set operations: UNION ALL / UNION / INTERSECT [ALL] / EXCEPT ALL,
unionByName with missing columns, dropDuplicates.

Spark's set ops are aggregations under the hood (distinct = groupBy
all columns; intersect/except = special joins) — one shuffle each on
the full row. The queries keep projected row width small, which is the
scale rule: never set-op wide rows, project to the key first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "setop_union_all",
    oracle="""
    SELECT src, o_orderkey FROM (
        SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'big' AS src, o_orderkey FROM orders WHERE o_totalprice > 250000
    )
    ORDER BY src, o_orderkey
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.lit("urgent").alias("src"), "o_orderkey")
    big = o.filter(F.col("o_totalprice") > 250000).select(F.lit("big").alias("src"), "o_orderkey")
    return urgent.union(big).orderBy("src", "o_orderkey")


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > 250000
    ORDER BY o_orderkey
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    big = o.filter(F.col("o_totalprice") > 250000).select("o_orderkey")
    return urgent.union(big).distinct().orderBy("o_orderkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who placed both urgent and low-priority orders."""
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    ORDER BY l_suppkey
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware difference)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.exceptAll(a).orderBy("l_suppkey")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_linestatus = 'O'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
    ORDER BY l_partkey
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_linestatus") == "O").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return a.intersectAll(b).orderBy("l_partkey")


@query(
    "setop_union_by_name",
    oracle="""
    SELECT * FROM (
        SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS balance FROM customer
        UNION ALL BY NAME
        SELECT s_suppkey AS entity_key, s_name AS entity_name, NULL AS balance FROM supplier
    )
    ORDER BY entity_name
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns): supplier rows get NULL balance."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        F.col("c_custkey").alias("entity_key"), F.col("c_name").alias("entity_name"), F.col("c_acctbal").alias("balance")
    )
    s = t["supplier"].select(F.col("s_suppkey").alias("entity_key"), F.col("s_name").alias("entity_name"))
    return c.unionByName(s, allowMissingColumns=True).orderBy("entity_name")


@query(
    "setop_drop_duplicates",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("setop", "dedup"),
)
def setop_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on the projected key set (== DISTINCT; projecting
    first keeps the dedup shuffle narrow — the scale idiom)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").dropDuplicates().orderBy("l_returnflag", "l_linestatus")
