"""Table-maintenance patterns without a lakehouse format: MERGE/upsert
emulation (anti-join + union), SCD2 interval versioning, unpivot, and
engine-introspection columns.

MERGE INTO proper needs Delta/Iceberg (not in this image — their jars
would make these one-liners); the emulations below are the plan-level
equivalents and the classic pre-lakehouse recipes. Each is
oracle-checked, so the semantics (not just the shape) are pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "merge_upsert_emulation",
    oracle="""
    WITH updates AS (
        SELECT o_custkey AS c_custkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS new_balance
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name,
           CAST(round(coalesce(u.new_balance, CAST(c.c_acctbal AS DOUBLE)), 2) AS DOUBLE) AS balance,
           (u.c_custkey IS NOT NULL) AS was_updated
    FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    ORDER BY c.c_custkey
    """,
    tags=("merge", "upsert"),
)
def merge_upsert_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (matched → update, else keep) as anti-join + union — the
    exact rewrite Delta executes under the hood; one shuffle on the
    merge key. Updates = urgent-order spend per customer."""
    t = load_tables(spark, sf_dir)
    updates = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("u_custkey"))
        .agg(dsum(dec("o_totalprice"), "new_balance"))
    )
    base = t["customer"].select("c_custkey", "c_name", "c_acctbal")
    matched = (
        base.join(updates, F.col("c_custkey") == F.col("u_custkey"))
        .select("c_custkey", "c_name", F.col("new_balance").alias("balance"), F.lit(True).alias("was_updated"))
    )
    unmatched = (
        base.join(updates, F.col("c_custkey") == F.col("u_custkey"), "left_anti")
        .select("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("balance"), F.lit(False).alias("was_updated"))
    )
    return (
        matched.unionByName(unmatched)
        .select("c_custkey", "c_name", F.round("balance", 2).cast("double").alias("balance"), "was_updated")
        .orderBy("c_custkey")
    )


@query(
    "scd2_interval_versions",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS eff_from,
               CAST(round(o_totalprice, 2) AS DOUBLE) AS attr,
               lead(CAST(o_orderdate AS TIMESTAMP))
                 OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey) AS eff_to
        FROM orders WHERE o_custkey % 100 = 7
    )
    SELECT o_custkey AS custkey,
           strftime(eff_from, '%Y-%m-%d') AS eff_from,
           coalesce(strftime(eff_to, '%Y-%m-%d'), '9999-12-31') AS eff_to,
           attr,
           (eff_to IS NULL) AS is_current
    FROM ordered
    ORDER BY custkey, eff_from, attr
    """,
    tags=("merge", "scd2"),
)
def scd2_interval_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from an event log: each change becomes a version row with
    [eff_from, eff_to) via lead() over the change sequence; open
    interval = current. One shuffle on the entity key."""
    from pyspark.sql import Window as W

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") % 100 == 7)
    v = (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("eff_from_ts"),
            F.col("o_orderkey").alias("ok"),
            F.round("o_totalprice", 2).cast("double").alias("attr"),
        )
        .withColumn(
            "eff_to_ts",
            F.lead("eff_from_ts").over(W.partitionBy("custkey").orderBy("eff_from_ts", "ok")),
        )
    )
    return (
        v.select(
            "custkey",
            F.date_format("eff_from_ts", "yyyy-MM-dd").alias("eff_from"),
            F.coalesce(F.date_format("eff_to_ts", "yyyy-MM-dd"), F.lit("9999-12-31")).alias("eff_to"),
            "attr",
            F.col("eff_to_ts").isNull().alias("is_current"),
        )
        .orderBy("custkey", "eff_from", "attr")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(round(value, 4) AS DOUBLE) AS value
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
        FROM lineitem WHERE l_orderkey % 300 = 5
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem WHERE l_orderkey % 300 = 5
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem WHERE l_orderkey % 300 = 5
    )
    ORDER BY l_orderkey, l_linenumber, metric
    """,
    tags=("unpivot",),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack() — the inverse of pivot; a
    zero-shuffle row expansion."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 300 == 5)
    return (
        li.selectExpr(
            "l_orderkey",
            "l_linenumber",
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount) AS (metric, value)",
        )
        .select("l_orderkey", "l_linenumber", "metric", F.round("value", 4).cast("double").alias("value"))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@query(
    "explode_outer_nulls",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN NULL
                    ELSE str_split(text, ' ')[1:3] END AS toks
        FROM documents WHERE doc_id % 40 = 0
    )
    SELECT doc_id, u.tok
    FROM t LEFT JOIN LATERAL unnest(t.toks) AS u(tok) ON true
    ORDER BY doc_id, tok NULLS FIRST
    """,
    tags=("explode",),
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps rows whose array is NULL (plain explode
    drops them) — the null-preserving flatten."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 40 == 0)
    toks = F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.slice(F.split("text", " "), 1, 3))
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.col("tok").asc_nulls_first())
    )


@query(
    "sample_and_introspect",
    oracle=None,  # sampling is engine-specific; bounds checked in tests
    tags=("sample", "introspection"),
)
def sample_and_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + engine-introspection columns
    (spark_partition_id, input_file_name, monotonically_increasing_id)
    — all nondeterministic w.r.t. partitioning by definition, hence
    rows-only; the companion test bounds the sample fraction."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.sample(fraction=0.1, seed=42)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("src_file"),
        )
    )
