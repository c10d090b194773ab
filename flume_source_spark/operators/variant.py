"""Spark 4 VARIANT type: semi-structured JSON stored in a binary
encoding that supports typed path extraction WITHOUT re-parsing the
text per access — the engine-native answer to JSON columns at scale
(`parse_json` once at ingest; `variant_get` per access is a cheap
binary probe, vs `get_json_object` re-tokenizing the string every
call).

The oracle extracts the same paths with DuckDB's JSON functions — the
check is typed-value equality of variant extraction vs an independent
JSON parser, not variant internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_VARIANT_ORACLE = """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract(props, '$.k') AS DOUBLE) / 10 AS k_tenth,
           json_extract(props, '$.missing') IS NULL AS missing_is_null,
           json_type(json(props)) = 'OBJECT' AS is_object
    FROM events
    WHERE event_id % 100 = 0
    ORDER BY event_id
"""


@query("scalar_variant", oracle=_VARIANT_ORACLE, tags=("scalar", "variant", "json"))
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json → VARIANT → typed variant_get extraction (long,
    double arithmetic, missing-path null) + schema_of_variant-backed
    top-level type. Parse once, probe many — the 100 TB JSON-column
    pattern."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("event_id") % 100 == 0)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return (
        v.select(
            "event_id",
            F.variant_get("v", "$.k", "bigint").alias("k_int"),
            (F.variant_get("v", "$.k", "double") / 10).alias("k_tenth"),
            F.variant_get("v", "$.missing", "string").isNull().alias("missing_is_null"),
            F.schema_of_variant(F.col("v")).startswith("OBJECT").alias("is_object"),
        )
        .orderBy("event_id")
    )
