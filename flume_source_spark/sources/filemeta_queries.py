"""Driver-facing correctness queries for the filemeta source.

The driver's sf_dir is itself a directory of files, so the batch twin
of the [REF] source can list it and be oracle-checked against the
statically-known fixture file names (mtimes are environment-dependent
and excluded from oracle output). canary=false because the testdata
directory is read-only by contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.sources.filemeta import register
from flume_source_spark.tables import TABLE_NAMES

_NAMES = sorted(f"{t}.parquet" for t in TABLE_NAMES)
_VALUES = ", ".join(f"('{n}')" for n in _NAMES)


@query(
    "filemeta_scan",
    oracle=f"""
    SELECT file_name FROM (VALUES {_VALUES}) AS t(file_name)
    ORDER BY file_name
    """,
    tags=("source", "ref-parity"),
)
def filemeta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory scan via the custom source (R1/R2/R7): list the sf_dir,
    project file_name, prove the listing+filter pipeline end to end."""
    register(spark)
    return (
        spark.read.format("filemeta")
        .option("path", sf_dir)
        .option("canary", "false")
        .load()
        .select("file_name")
        .orderBy("file_name")
    )


@query(
    "filemeta_sharded_scan",
    oracle=f"""
    SELECT file_name FROM (VALUES {_VALUES}) AS t(file_name)
    ORDER BY file_name
    """,
    tags=("source", "scale"),
)
def filemeta_sharded_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sharded (executor-side) listing path end-to-end in the
    driver environment: listingMode=sharded plans shard paths, the
    executors scandir them (sf_dir has no subdirectories, so the root
    is the only shard — multi-shard coverage is in
    tests/test_filemeta_source.py; the SCALE.md 1M-file measurement is
    why this mode exists). Same oracle as filemeta_scan: the two modes
    must agree on a flat directory."""
    register(spark)
    return (
        spark.read.format("filemeta")
        .option("path", sf_dir)
        .option("listingMode", "sharded")
        .option("canary", "false")
        .load()
        .select("file_name")
        .orderBy("file_name")
    )


@query(
    "filemeta_ignore_pattern",
    oracle=f"""
    SELECT file_name, length(file_name) AS name_len
    FROM (VALUES {_VALUES}) AS t(file_name)
    WHERE NOT regexp_matches(file_name, '^(lineitem|orders)')
    ORDER BY file_name
    """,
    tags=("source", "ref-parity"),
)
def filemeta_ignore_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ignorePattern option — dead config in the reference
    (CephFSEventReader.java:275-278), working here."""
    register(spark)
    return (
        spark.read.format("filemeta")
        .option("path", sf_dir)
        .option("canary", "false")
        .option("ignorePattern", "^(lineitem|orders)")
        .load()
        .select("file_name", F.length("file_name").cast("bigint").alias("name_len"))
        .orderBy("file_name")
    )
