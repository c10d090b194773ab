"""SQL entry-path wave 3: Spark 4 collations, star-modifiers, and
ordered-set string aggregation.

- ``scalar_collation`` — column-level collations (Spark 4.0+):
  ``COLLATE UTF8_LCASE`` makes comparison/grouping/DISTINCT
  case-insensitive at the *type* level, replacing the classic
  ``lower()``-wrapping idiom. The query case-jitters a dimension
  column deterministically (three casing variants per key), then
  groups by the collated value — the group count must equal the
  canonical-case group count while ``count(DISTINCT binary)`` still
  sees every variant. The oracle IS the ``lower()`` idiom, pinning
  that the collation semantics equal the classic rewrite. Planner
  note: grouping on a collated string hashes its collation key —
  still a plain partial-agg hash aggregate, no extra shuffle vs
  ``lower()``.
- ``sql_star_except`` — ``SELECT * EXCEPT (cols)`` (projection
  written as complement; resolved at analysis time, so column
  pruning sees exactly the surviving columns — the pruned scan is
  what matters at 100 TB, not syntax), composed with
  ``IDENTIFIER('lineitem')`` table resolution (parameterizable
  object names without SQL injection) and ``ORDER BY ALL``. DuckDB
  spells EXCEPT as ``EXCLUDE`` and shares ``ORDER BY ALL``.
- ``agg_listagg`` — ANSI ``LISTAGG(expr, sep) WITHIN GROUP
  (ORDER BY ...)`` ordered-set aggregate (Spark 4.0+). The WITHIN
  GROUP order is per-group: execution must sort each group's
  elements — at scale this is the same per-group-sort cost class as
  collect_list + array_sort (which is exactly how Catalyst lowers
  it); keep cardinality per group bounded. The oracle is DuckDB's
  ``string_agg(x, sep ORDER BY x)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flume_source_spark.registry import query
from flume_source_spark.tables import register_views

_COLLATION_ORACLE = """
    WITH jitter AS (
        SELECT CASE c_custkey % 3
                 WHEN 0 THEN upper(c_mktsegment)
                 WHEN 1 THEN lower(c_mktsegment)
                 ELSE upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
               END AS seg_jit
        FROM customer)
    SELECT lower(seg_jit) AS segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT seg_jit) AS BIGINT) AS n_case_variants
    FROM jitter
    GROUP BY lower(seg_jit)
    ORDER BY segment
"""


@query("scalar_collation", oracle=_COLLATION_ORACLE, tags=("sql", "collation"))
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF8_LCASE collation: case-insensitive GROUP BY at the type
    level; per case-folded segment, the row count and how many raw
    casing variants the collation folded together."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH jitter AS (
            SELECT CASE c_custkey % 3
                     WHEN 0 THEN upper(c_mktsegment)
                     WHEN 1 THEN lower(c_mktsegment)
                     ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                                 lower(substr(c_mktsegment, 2)))
                   END AS seg_jit
            FROM customer)
        SELECT lower(seg_coll) AS segment,
               count(*) AS n_rows,
               count(DISTINCT seg_jit) AS n_case_variants
        FROM (SELECT seg_jit, seg_jit COLLATE UTF8_LCASE AS seg_coll FROM jitter)
        GROUP BY seg_coll
        ORDER BY segment
        """
    )


_STAR_EXCEPT_ORACLE = """
    SELECT * EXCLUDE (l_comment, l_shipinstruct, l_shipmode, l_partkey, l_suppkey)
    FROM (
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS net_price,
               l_returnflag, l_linestatus,
               'noise' AS l_comment, 'x' AS l_shipinstruct, 'y' AS l_shipmode
        FROM lineitem WHERE l_quantity >= 49)
    ORDER BY ALL
"""


@query("sql_star_except", oracle=_STAR_EXCEPT_ORACLE, tags=("sql", "star"))
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT (...) complement-projection over an
    IDENTIFIER()-resolved table, ordered by ALL surviving columns.
    The EXCEPT resolves at analysis time: .explain shows a parquet
    ReadSchema of only the surviving columns (column pruning through
    the star)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * EXCEPT (l_comment, l_shipinstruct, l_shipmode, l_partkey, l_suppkey)
        FROM (
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                   CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
                       AS net_price,
                   l_returnflag, l_linestatus,
                   'noise' AS l_comment, 'x' AS l_shipinstruct, 'y' AS l_shipmode
            FROM IDENTIFIER('lineitem') WHERE l_quantity >= 49)
        ORDER BY ALL
        """
    )


_LISTAGG_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_statuses,
           string_agg(st, '|' ORDER BY st) AS statuses,
           string_agg(st, '|' ORDER BY cnt DESC, st) AS statuses_by_freq
    FROM (SELECT o_orderpriority, o_orderstatus AS st,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM orders GROUP BY 1, 2)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("agg_listagg", oracle=_LISTAGG_ORACLE, tags=("agg", "listagg"))
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...): deterministic ordered
    string aggregation, both value-ordered and frequency-ordered
    (multi-key WITHIN GROUP with a unique tiebreak so both engines
    emit the identical concatenation)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_statuses,
               listagg(st, '|') WITHIN GROUP (ORDER BY st) AS statuses,
               listagg(st, '|') WITHIN GROUP (ORDER BY cnt DESC, st)
                   AS statuses_by_freq
        FROM (SELECT o_orderpriority, o_orderstatus AS st, count(*) AS cnt
              FROM orders GROUP BY 1, 2)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
