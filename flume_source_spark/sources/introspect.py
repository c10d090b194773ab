"""Source introspection: per-file lineage via Spark's hidden
``_metadata`` column.

``source_parquet_metadata`` — every file-based scan in Spark carries
a hidden ``_metadata`` struct (file_path, file_name, file_size,
file_modification_time). Selecting it costs nothing extra — values
come from the scan's file index, not from data pages — and it is THE
tool for per-file audits: which physical file produced these rows,
are files balanced (small-file problem), did one input contribute
anomalous rows.

The query materializes lineitem partitioned by ``l_returnflag``
(repartition on the partition column first → exactly one task and
therefore one data file per partition value), reads it back, and
attributes every row to its physical file via
``_metadata.file_path`` — extracting the Hive-style
``l_returnflag=X`` segment from the path and cross-checking it
against the row's own column value (`path_matches_column`), counting
physical files per partition. The oracle recomputes the per-flag row
counts from the original table and pins n_files = 1 — so the gate
verifies (a) row conservation through the partitioned write, (b)
path↔column agreement of the metadata attribution, (c) the
one-file-per-partition layout contract.

Scale: `_metadata` fields are constant-folded per file split — the
only shuffle is the final count by flag (3 groups). The
repartition-before-partitionBy write is the standard anti-small-file
pattern at 100 TB (without it, every one of ~10⁵ tasks writes a
file into every partition dir); pair with maxRecordsPerFile when a
single partition value exceeds one task's comfortable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables
from flume_source_spark.workdir import slot as _slot

_META_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS n_files,
           true AS path_matches_column
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("source_parquet_metadata", oracle=_META_ORACLE, tags=("source", "metadata"))
def source_parquet_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write → read-back with _metadata.file_path lineage:
    row conservation + path↔column agreement + 1-file-per-partition."""
    li = load_tables(spark, sf_dir)["lineitem"]
    out = _slot(sf_dir, "li_meta_parts")
    (
        li.select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition("l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    r = spark.read.parquet(out).select(
        "l_returnflag",
        F.col("_metadata.file_path").alias("fp"),
        F.regexp_extract(F.col("_metadata.file_path"), r"l_returnflag=([^/]+)", 1).alias(
            "flag_from_path"
        ),
    )
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("fp").cast("long").alias("n_files"),
            F.bool_and(F.col("flag_from_path") == F.col("l_returnflag")).alias(
                "path_matches_column"
            ),
        )
        .orderBy("l_returnflag")
    )
