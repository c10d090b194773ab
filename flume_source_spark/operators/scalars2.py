"""Scalar wave 2: bitwise and regexp function families.

- ``scalar_bitwise`` — row-level bit arithmetic (``bit_count``,
  AND/OR/XOR, power-of-two shifts) plus the bitwise AGGREGATES
  ``bit_and``/``bit_or`` (``bit_xor`` lives in agg_wave2). Engine
  portability notes are the point of the query: DuckDB 1.0 has no
  ``shiftleft`` and no ``<<`` operator, so the oracle expresses the
  shift as an exact multiply (x * 8 on BIGINT — identical two's-
  complement result for in-range values); XOR is the ``xor()``
  function there vs the ``^`` operator in Spark (where ``^`` is
  xor, NOT power — the classic migration trap this query pins).
- ``scalar_regexp_suite`` — the extraction surface over real text:
  first-match extract, all-matches extract + count, global replace,
  boolean rlike, and regex split. Patterns are restricted to the
  RE2 ∩ java.util.regex common subset (character classes, ``+``; no
  lookaround, no backrefs) so both engines' regex flavors agree —
  documented as the portability contract for user-supplied patterns.

Scale: both are pure row-maps — narrow transformations inside
WholeStageCodegen, no shuffle except the final tiny aggregates; all
regexes are compiled once per task, not per row (Spark caches the
compiled pattern when the pattern is a literal — keep patterns
literal at 100 TB, a column-typed pattern recompiles per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_BITWISE_ORACLE = """
    WITH r AS (
        SELECT o_orderkey AS k,
               CAST(bit_count(o_orderkey) AS INT) AS popcount,
               CAST(o_orderkey * 8 AS BIGINT) AS shl3,
               CAST(o_orderkey // 4 AS BIGINT) AS shr2,
               CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
               CAST(o_orderkey | 1 AS BIGINT) AS set_lsb,
               CAST(xor(o_orderkey, 21845) AS BIGINT) AS xor_mask
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT k, popcount, shl3, shr2, low_byte, set_lsb, xor_mask,
           CAST((SELECT bit_and(low_byte) FROM r) AS BIGINT) AS all_and,
           CAST((SELECT bit_or(low_byte) FROM r) AS BIGINT) AS all_or
    FROM r ORDER BY k
"""


@query("scalar_bitwise", oracle=_BITWISE_ORACLE, tags=("scalar", "bitwise"))
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit ops row-level + bit_and/bit_or aggregates; shifts are
    exact power-of-two arithmetic so DuckDB (no shift op) agrees."""
    o = load_tables(spark, sf_dir)["orders"]
    r = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.bit_count("o_orderkey").cast("int").alias("popcount"),
        F.shiftleft(F.col("o_orderkey"), 3).cast("long").alias("shl3"),
        F.shiftright(F.col("o_orderkey"), 2).cast("long").alias("shr2"),
        (F.col("o_orderkey").bitwiseAND(F.lit(255))).cast("long").alias("low_byte"),
        (F.col("o_orderkey").bitwiseOR(F.lit(1))).cast("long").alias("set_lsb"),
        (F.col("o_orderkey").bitwiseXOR(F.lit(21845))).cast("long").alias("xor_mask"),
    )
    aggs = r.agg(
        F.bit_and("low_byte").cast("long").alias("all_and"),
        F.bit_or("low_byte").cast("long").alias("all_or"),
    )
    return r.crossJoin(F.broadcast(aggs)).orderBy("k")


# RE2 ∩ java.regex portable subset only (no lookaround / backrefs).
_RX_ORACLE = """
    SELECT doc_id,
           coalesce(regexp_extract(text, '[0-9]+'), '') AS first_num,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]{2,}')) AS BIGINT)
               AS n_vowel_runs,
           lower(text) SIMILAR TO '.*(data|model|train).*' AS mentions_ml,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS n_letters,
           CAST(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
                                x -> length(x) > 0)) AS BIGINT) AS n_words
    FROM documents ORDER BY doc_id
"""


@query("scalar_regexp_suite", oracle=_RX_ORACLE, tags=("scalar", "regexp"))
def scalar_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract / extract_all+count / rlike / global replace /
    split over documents — pattern set restricted to the RE2∩Java
    common flavor so a user regex behaves identically on both."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_num"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long").alias("n_nums"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiou]{2,}"), 0))
        .cast("long")
        .alias("n_vowel_runs"),
        F.lower("text").rlike("(data|model|train)").alias("mentions_ml"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long").alias("n_letters"),
        F.size(F.filter(F.split("text", "[^a-zA-Z0-9]+"), lambda x: F.length(x) > 0))
        .cast("long")
        .alias("n_words"),
    ).orderBy("doc_id")
