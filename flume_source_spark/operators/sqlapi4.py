"""SQL entry-path wave 4: SQL scripting (Spark 4 BEGIN/END blocks).

``sql_scripting_threshold`` — Spark 4's SQL scripting (DECLARE /
SET / WHILE / IF inside BEGIN…END, gated by
``spark.sql.scripting.enabled``) runs an imperative driver loop whose
every statement is still a declarative Catalyst query — the right
mental model is "procedural glue around full-engine queries", the
same role as this repo's python-side iterative builders (CC rounds,
Lloyd rounds). The script here does a real iterative task: find the
smallest integer quantity threshold q such that the revenue from
lineitems with quantity > q falls to ≤ 10 % of total revenue — a
classic "where do I cut the tail" calibration loop.

Determinism contract: the loop compares EXACT INTEGER CENTS
(revenue as decimal → cents BIGINT; the 10 % test is
``above·10 ≤ total``), so the stopping threshold is tie-free. The
oracle finds the same q non-iteratively (min q over a generated
series satisfying the predicate) — an independent formulation, which
is precisely what makes the hash check meaningful.

Scale note: each loop iteration is a full filtered aggregate over the
fact table — fine when iterations are few (q converges in ~15 steps
here). The set-based rewrite (ONE pass: group revenue by quantity,
running suffix sum, pick the first q — what the oracle does) is the
100 TB formulation; the scripting query exists to pin the FEATURE,
and its docstring points at the rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flume_source_spark.registry import query
from flume_source_spark.tables import register_views

_SCRIPT_ORACLE = """
    WITH per_q AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               sum(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4))) * 100, 0)
                        AS BIGINT)) AS cents
        FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per_q),
    sweep AS (
        SELECT g.q,
               CAST(COALESCE((SELECT sum(p.cents) FROM per_q p WHERE p.q > g.q), 0)
                    AS BIGINT) AS above
        FROM (SELECT unnest(generate_series(0, 60)) AS q) g)
    SELECT CAST(min(s.q) AS BIGINT) AS threshold_qty,
           CAST(min_by(s.above, s.q) AS BIGINT) AS above_cents,
           t.total AS total_cents
    FROM sweep s CROSS JOIN tot t
    WHERE s.above * 10 <= t.total
    GROUP BY t.total
"""


@query("sql_scripting_threshold", oracle=_SCRIPT_ORACLE, tags=("sql", "scripting"))
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-scripting WHILE loop: raise the quantity cutoff until the
    above-cutoff revenue is ≤ 10 % of total (exact integer cents);
    returns (threshold_qty, above_cents, total_cents)."""
    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT;
          DECLARE above BIGINT;
          DECLARE q BIGINT DEFAULT 0;
          SET total = (SELECT sum(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                                             * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                             * 100, 0) AS BIGINT))
                       FROM lineitem);
          SET above = total;
          WHILE above * 10 > total DO
            SET q = q + 1;
            SET above = (SELECT COALESCE(sum(CAST(round(
                                 CAST(l_extendedprice AS DECIMAL(18,4))
                                 * (1 - CAST(l_discount AS DECIMAL(18,4)))
                                 * 100, 0) AS BIGINT)), 0)
                         FROM lineitem WHERE CAST(l_quantity AS BIGINT) > q);
          END WHILE;
          SELECT q AS threshold_qty, above AS above_cents, total AS total_cents;
        END
        """
    )


_DECLARED_FN_ORACLE = """
    SELECT o.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,4))
                                * (1 - CAST(l.l_discount AS DECIMAL(18,4))) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
"""


@query("sql_declared_functions", oracle=_DECLARED_FN_ORACLE, tags=("sql", "udf", "declared"))
def sql_declared_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared functions (Spark 3.5+/4 `CREATE FUNCTION …
    RETURN`): a SCALAR SQL UDF (exact-cents net price) nested inside
    a TABLE SQL UDF (an order's lines), consumed via correlated
    LATERAL. SQL UDFs are macros to Catalyst — the body INLINES into
    the caller's plan at analysis time, so optimization (pushdown
    through the lateral, join selection, partial aggregation) sees
    one flat query; the oracle IS that hand-inlined query, and the
    hash match is the proof the abstraction costs nothing. The
    engine-user story: reusable business logic (net price) shared
    across queries without Python UDF overhead or copy-paste."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DOUBLE, d DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(CAST(p AS DECIMAL(18,4))
                          * (1 - CAST(d AS DECIMAL(18,4))) * 100, 0) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION order_lines(k BIGINT)
        RETURNS TABLE(ln BIGINT, cents BIGINT)
        RETURN SELECT l_linenumber, net_cents(l_extendedprice, l_discount)
               FROM lineitem WHERE l_orderkey = k
        """
    )
    return spark.sql(
        """
        SELECT o.o_orderkey,
               count(*) AS n_lines,
               sum(t.cents) AS total_cents
        FROM orders o, LATERAL order_lines(o.o_orderkey) t
        WHERE o.o_orderkey % 100 = 0
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# Lateral column aliases (round 7, session 2): referencing a SELECT
# alias later in the SAME select list — the Spark 4 ergonomics feature
# that removes the subquery-per-derivation-step ladder every pricing
# calculation used to need. The chain below is the TPC-H discount
# cascade written as one SELECT: gross → discounted → taxed → margin,
# each step reading the previous alias (exact integer cents, so the
# chain is also hash-oracle-safe). DuckDB supports the same alias
# reuse, making the oracle a literal transcription — QUALIFY, the
# other candidate from this SQL-surface generation, does NOT parse in
# Spark 4.1 (probed) and is therefore explicitly out of the claimed
# surface. Scale: pure projection + one 25-key combine; the lateral
# aliases are inlined by the analyzer (no extra plan nodes).
# ---------------------------------------------------------------------------

_LCA_SQL = """
    SELECT l_suppkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS gross_cents,
           gross_cents - CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
               AS discounted_cents,
           discounted_cents
             + CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)
               AS taxed_cents,
           taxed_cents - gross_cents AS delta_cents
    FROM lineitem
"""

_LCA_ORACLE = f"""
    WITH per_line AS ({_LCA_SQL})
    SELECT l_suppkey,
           CAST(sum(gross_cents) AS BIGINT) AS sum_gross,
           CAST(sum(discounted_cents) AS BIGINT) AS sum_discounted,
           CAST(sum(taxed_cents) AS BIGINT) AS sum_taxed,
           CAST(sum(delta_cents) AS BIGINT) AS sum_delta
    FROM per_line
    WHERE l_suppkey % 10 = 0
    GROUP BY l_suppkey ORDER BY l_suppkey
"""


@query("sql_lateral_column_alias", oracle=_LCA_ORACLE, tags=("sql", "surface"))
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing cascade as ONE select via lateral column aliases
    (each derived column reads the previous alias), rolled up per
    supplier in exact integer cents — identical text runs on both
    engines."""
    register_views(spark, sf_dir)
    # the oracle string IS the query — identical-text parity is
    # structural, not maintained by hand (review finding: the body
    # was a verbatim copy of _LCA_ORACLE)
    return spark.sql(_LCA_ORACLE)


# ---------------------------------------------------------------------------
# ORDER BY ALL (round 9, session 2): the companion of the registered
# GROUP BY ALL — both engines sort by every select-list column left to
# right, which on an aggregate whose group keys lead the select list
# is a deterministic total order without naming a single column.
# Probed: parses and executes on Spark 4.1 (unlike QUALIFY/TABLESAMPLE
# -after-VALUES, the documented non-claims). Identical text runs on
# both engines, so parity is structural. Scale: one combine + one sort
# over |sources|×|langs| rows.
# ---------------------------------------------------------------------------

_OBA_ORACLE = """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY ALL
    ORDER BY ALL
"""


@query("sql_order_by_all", oracle=_OBA_ORACLE, tags=("sql", "surface"))
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL in one statement — the full
    keyword-only aggregate idiom, same text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_OBA_ORACLE)
