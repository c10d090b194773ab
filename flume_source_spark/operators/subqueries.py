"""Subquery surface: correlated EXISTS / NOT EXISTS, IN / NOT IN,
scalar subqueries (both correlated and uncorrelated), HAVING over
aggregated subqueries.

Catalyst decorrelates all of these into joins/aggregations (no
per-row re-execution — a correlated EXISTS becomes a left-semi join),
so they scale exactly like the equivalent explicit-join queries in
operators/joins.py. Expressed in SQL because subqueries are the one
surface where SQL is the natural notation; the plans are identical to
the DataFrame forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flume_source_spark.registry import query
from flume_source_spark.tables import register_views


def _views(spark: SparkSession, sf_dir: str) -> None:
    # Memoized per (session, sf_dir) — repeated subquery builders on the
    # same session pay zero catalog/footer cost after the first.
    register_views(spark, sf_dir)


@query(
    "subquery_exists_correlated",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("subquery",),
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality on the
    outer column — decorrelates to a left-semi join on l_orderkey with
    the l_shipdate > o_orderdate residual."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "subquery_in_uncorrelated",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
    ORDER BY p_partkey
    """,
    tags=("subquery",),
)
def subquery_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN → left-semi join against the subquery result."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
        ORDER BY p_partkey
        """
    )


@query(
    "subquery_scalar_uncorrelated",
    oracle="""
    SELECT c_custkey, CAST(round(c_acctbal, 4) AS DOUBLE) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
    ORDER BY c_custkey
    """,
    tags=("subquery",),
)
def subquery_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a
    literal into the filter (no join at all in the final plan)."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, CAST(round(c_acctbal, 4) AS DOUBLE) AS c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT s_suppkey, count(*) AS n_above_avg
    FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
    WHERE l_quantity > (SELECT avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_suppkey = s_suppkey)
    GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
    tags=("subquery",),
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): per-supplier
    average — decorrelates to an aggregate + join, not a per-row
    re-scan."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, count(*) AS n_above_avg
        FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
        WHERE l_quantity > (SELECT avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_suppkey = s_suppkey)
        GROUP BY s_suppkey
        ORDER BY s_suppkey
        """
    )


@query(
    "subquery_having",
    oracle="""
    SELECT c_nationkey, count(*) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) > (SELECT count(*) * 1.0 / 30 FROM customer)
    ORDER BY c_nationkey
    """,
    tags=("subquery", "having"),
)
def subquery_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING with an uncorrelated scalar subquery threshold."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_cust
        FROM customer
        GROUP BY c_nationkey
        HAVING count(*) > (SELECT count(*) * 1.0 / 30 FROM customer)
        ORDER BY c_nationkey
        """
    )


@query(
    "subquery_not_exists_antijoin",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
                        AND l_quantity > 49.5)
    ORDER BY s_suppkey
    """,
    tags=("subquery",),
)
def subquery_not_exists_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join after decorrelation."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
                            AND l_quantity > 49.5)
        ORDER BY s_suppkey
        """
    )
