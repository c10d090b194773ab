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
