"""The SQL entry point: the engine's surface is equally reachable via
``spark.sql`` over the registered fixture views — a user of the
reference who writes SQL (not DataFrames) runs here unchanged.

``sql_interface_cte`` is deliberately authored as ONE SQL string
(CTE + joins + windowed share-of-total) executed by ``spark.sql``;
the DuckDB oracle is the same statement modulo decimal-cast spelling.
Catalyst treats the SQL and DataFrame paths identically (same logical
plan space, same optimizations), which this query exists to
demonstrate — there is no separate "SQL engine" to keep in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flume_source_spark.registry import query
from flume_source_spark.tables import register_views

_SPARK_SQL = """
    WITH rev AS (
        SELECT r_name, n_name,
               round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS nation_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(nation_rev AS DOUBLE) AS nation_rev,
           CAST(round(100 * nation_rev / sum(nation_rev) OVER (PARTITION BY r_name), 2)
                AS DOUBLE) AS region_share_pct
    FROM rev
    ORDER BY r_name, n_name
"""

# identical statement; DuckDB's sum over DECIMAL widens to DECIMAL(38,x)
# so the share division stays exact on both engines until the round
_DUCK_SQL = _SPARK_SQL


@query("sql_interface_cte", oracle=_DUCK_SQL, tags=("sql", "window", "join"))
def sql_interface_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue + share-of-region via one ``spark.sql`` CTE over
    the registered views — the pure-SQL user path (same Catalyst plan
    as the DataFrame API would produce: broadcast dim joins + one
    partial/final agg + one bounded window)."""
    register_views(spark, sf_dir)
    return spark.sql(_SPARK_SQL)


_LATERAL_SQL = """
    SELECT c_custkey, c_name, t.o_orderkey, t.o_totalprice
    FROM customer,
         LATERAL (
             SELECT o_orderkey, CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
             FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2
         ) t
    WHERE c_custkey <= 50
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@query("sql_lateral_topk", oracle=_LATERAL_SQL, tags=("sql", "lateral", "join"))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery —
    the SQL spelling of per-group top-k (identical statement runs on
    DuckDB). Catalyst decorrelates this into the same window/limit
    machinery the DataFrame formulation (`window_topk_per_group`)
    plans to; the point is the SURFACE: LATERAL is how SQL users
    express it."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# parent(k) = k div 2 forms a binary tree rooted at 1: the recursion
# walks each customer key up to the root, counting hops. Identical
# statement on both engines — what's verified is the recursive-CTE
# ENGINE (fixpoint iteration), pinned against a closed form:
# depth(k) = floor(log2(k)).
_RECURSIVE_SQL = """
    WITH RECURSIVE up(start_key, node, hops) AS (
        SELECT c_custkey, c_custkey, 0
        FROM customer WHERE c_custkey <= 200
        UNION ALL
        -- floor(x/2) spelled portably: Spark's / on ints is double
        -- division and DuckDB's integer // is not Spark syntax
        SELECT start_key, CAST(floor(node / 2) AS BIGINT), hops + 1
        FROM up WHERE node > 1
    )
    SELECT start_key, CAST(max(hops) AS BIGINT) AS depth
    FROM up
    GROUP BY start_key
    ORDER BY start_key
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL, tags=("sql", "recursive"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x): walk each customer key up the
    implicit binary tree parent(k)=k div 2 to the root, emit the
    depth. Identical SQL executes on DuckDB; tests additionally pin
    depth == floor(log2(k)) so both engines' recursion is checked
    against a closed form, not just each other."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)
