"""ANSI-mode safety surface: Spark 4 runs with ansi.enabled=true, so
division by zero / invalid casts / overflow THROW instead of returning
NULL. The try_* family restores null-on-error semantics per expression
— the right granularity for dirty-data pipelines (fail loudly by
default, tolerate where declared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "scalar_try_safety",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_quantity / nullif(l_linenumber - 1, 0), 4) AS DOUBLE) AS qty_per_extra_line,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS line_as_int,
           (l_quantity / nullif(l_linenumber - 1, 0)) IS NULL AS div_was_null
    FROM lineitem
    WHERE l_orderkey % 400 = 9
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "ansi"),
)
def scalar_try_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide (zero denominators → NULL, not an ANSI exception) and
    try_cast (unparseable strings → NULL): l_linenumber=1 rows exercise
    the divide-by-zero path, l_returnflag ('A'/'N'/'R') the bad-cast
    path, stringified l_linenumber the good-cast path."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 400 == 9)
    qpe = F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(qpe, 4).cast("double").alias("qty_per_extra_line"),
            F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("bigint").alias("flag_as_int"),
            F.col("l_linenumber").cast("string").try_cast("bigint").alias("line_as_int"),
            qpe.isNull().alias("div_was_null"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
