"""SQL entry-path wave 2: the Spark 4 SQL-surface features a user
coming from any modern engine expects to keep working.

- ``sql_pipe_syntax`` — SQL pipe operators (``|>``, Spark 4.0+,
  GoogleSQL-style): FROM → WHERE → AGGREGATE → ORDER BY as a linear
  dataflow. Catalyst parses pipes into exactly the same logical plan
  as the nested-SELECT equivalent (the DuckDB oracle here), so every
  optimization (pushdown, partial agg) applies unchanged — verified
  by the hash gate.
- ``sql_group_by_all`` — GROUP BY ALL / ORDER BY ALL resolution
  (grouping keys inferred from the non-aggregate select items); both
  engines implement the same inference rule.
- ``sql_unpivot`` — SQL-syntax UNPIVOT of an aggregated wide row
  into (key, value) pairs; the SQL twin of the DataFrame
  ``unpivot_stack`` query (operators/maintenance.py). Both engines
  share the ``UNPIVOT (v FOR k IN (...))`` grammar.
- ``sql_variables_param`` — session variables (DECLARE OR REPLACE
  VARIABLE / SET VAR), EXECUTE IMMEDIATE with USING binds, and
  python-side named parameter markers (``spark.sql(..., args=...)``)
  composed in one query. Parameters reach Catalyst as literals
  AFTER binding, so constant folding / predicate pushdown see the
  concrete values — same plan as hand-inlined SQL (what the oracle
  runs).
- ``join_null_safe`` — null-safe equality join (``eqNullSafe`` /
  ``<=>`` vs the oracle's IS NOT DISTINCT FROM): NULL keys pair with
  NULL keys instead of vanishing. Planner note: ``<=>`` is an
  equi-join condition for Catalyst (hash/sort-merge capable, NULLs
  hash to one partition — a designed skew hotspot if the null rate
  is high; pre-filter or salt NULLs at 100 TB when they dominate).

Scale: all five compile to ordinary scan→aggregate/join plans — the
surface is syntax, the execution is the same partial-agg/broadcast
machinery every other query uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables, register_views

_PIPE_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 5
    ORDER BY l_returnflag, l_linestatus
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "pipe"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe operators: FROM |> WHERE |> AGGREGATE |>
    WHERE (post-agg HAVING) |> ORDER BY, one linear dataflow."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 10
        |> AGGREGATE
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                  AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 5
        |> SELECT l_returnflag, l_linestatus, n_items, revenue
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


_GBALL_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS avg_price
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@query("sql_group_by_all", oracle=_GBALL_ORACLE, tags=("sql",))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL: grouping keys inferred from the
    non-aggregate select items — same inference in both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_GBALL_ORACLE)


_UNPIVOT_ORACLE = """
    WITH wide AS (
        SELECT l_returnflag,
               CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
               CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
               CAST(round(max(l_extendedprice), 2) AS DOUBLE) AS max_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM wide UNPIVOT (value FOR metric IN (sum_qty, avg_disc, max_price))
    ORDER BY l_returnflag, metric
"""


@query("sql_unpivot", oracle=_UNPIVOT_ORACLE, tags=("sql", "unpivot"))
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-grammar UNPIVOT (shared Spark/DuckDB syntax) of an
    aggregated wide row into (metric, value) long form."""
    register_views(spark, sf_dir)
    return spark.sql(_UNPIVOT_ORACLE)


_VAR_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_big,
           CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS avg_big_price
    FROM orders
    WHERE o_totalprice > 250000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sql_variables_param", oracle=_VAR_ORACLE, tags=("sql", "variables"))
def sql_variables_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variable (DECLARE/SET VAR) bound via EXECUTE IMMEDIATE
    USING, composed with a python-side named parameter marker; the
    oracle inlines both constants — binding must be value-transparent."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE min_price DOUBLE DEFAULT 150000.0")
    spark.sql("SET VAR min_price = 250000.0")
    # Python-side named parameter marker feeds a session variable
    # (one statement may use only ONE parameter style, so the python
    # bind and the EXECUTE IMMEDIATE binds are separate statements).
    spark.sql("DECLARE OR REPLACE VARIABLE want_status STRING DEFAULT 'X'")
    spark.sql("SET VAR want_status = :s", args={"s": "O"})
    inner = (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_big, "
        "CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS avg_big_price "
        "FROM orders WHERE o_totalprice > :minp AND o_orderstatus = :status "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    return spark.sql(
        f"EXECUTE IMMEDIATE '{inner}' USING min_price AS minp, want_status AS status"
    )


_NULLSAFE_ORACLE = """
    WITH c AS (
        SELECT c_custkey, nullif(c_nationkey % 5, 0) AS grp FROM customer
    ),
    s AS (
        SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS grp FROM supplier
    )
    SELECT coalesce(CAST(c.grp AS VARCHAR), 'NULL') AS grp_repr,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    GROUP BY c.grp ORDER BY grp_repr
"""


@query("join_null_safe", oracle=_NULLSAFE_ORACLE, tags=("join", "nullsafe"))
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe (<=>) join: NULL keys match NULL keys (one extra
    group vs a plain equi-join that silently drops them). Still an
    equi-join for Catalyst — hash-partitionable, broadcast-capable."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp")
    )
    s = t["supplier"].select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("grp")
    )
    joined = c.join(s, c["grp"].eqNullSafe(s["grp"]), "inner")
    return (
        joined.groupBy(c["grp"])
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_cust"),
            F.countDistinct("s_suppkey").cast("long").alias("n_supp"),
        )
        .select(
            F.coalesce(c["grp"].cast("string"), F.lit("NULL")).alias("grp_repr"),
            "n_pairs",
            "n_cust",
            "n_supp",
        )
        .orderBy("grp_repr")
    )
