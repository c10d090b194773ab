"""Scalar-function families: string, date/time, math, conditional,
array (incl. higher-order), JSON, hash.

Everything stays JVM-side (pyspark.sql.functions — whole-stage
codegen); no Python UDFs anywhere in this module. Each family gets at
least one oracle-checked query; function name differences between
Spark and DuckDB are resolved in the oracle SQL (instr↔strpos,
split↔str_split, get_json_object↔json_extract_string, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           concat_ws('|', p_brand, p_type) AS brand_type,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 1, 5) AS name_head,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim('  ' || p_name || ' ') AS name_trimmed,
           strpos(p_name, 'e') AS first_e,
           translate(p_brand, '#', '-') AS brand_dashed,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           printf('%s/%d', p_brand, p_size) AS brand_size
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
            F.instr("p_name", "e").cast("bigint").alias("first_e"),
            F.translate("p_brand", "#", "-").alias("brand_dashed"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
            F.format_string("%s/%d", "p_brand", "p_size").alias("brand_size"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mon,
           day(o_orderdate) AS dom,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    WHERE o_orderkey % 97 = 3
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 97 == 3)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
            F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("plus_30d"),
            F.date_format(F.add_months(F.col("o_orderdate"), 2), "yyyy-MM-dd").alias("plus_2mo"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).cast("bigint").alias("days_to_2002"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_months_between_bround",
    oracle="""
    WITH p AS (
        SELECT o_orderkey, o_orderdate,
               TIMESTAMP '1998-06-15 00:00:00' AS ref
        FROM orders WHERE o_orderkey % 250 = 1
    )
    SELECT o_orderkey,
           CAST(round(
             CASE WHEN day(ref) = day(last_day(ref)) AND day(o_orderdate) = day(last_day(o_orderdate))
                  THEN (year(ref) - year(o_orderdate)) * 12 + (month(ref) - month(o_orderdate))
                  ELSE (year(ref) - year(o_orderdate)) * 12 + (month(ref) - month(o_orderdate))
                       + (day(ref) - day(o_orderdate)) / 31.0 END, 6) AS DOUBLE) AS months_to_ref,
           CAST(round_even(CAST(o_orderkey AS DOUBLE) + 0.5, 0) AS DOUBLE) AS key_banker
    FROM p
    ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime", "math"),
)
def scalar_months_between_bround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """months_between (Spark's /31-fraction + last-day rule, emulated
    exactly in the oracle) and bround (banker's half-even ↔ DuckDB
    round_even; ties built on exact .5 via integer + 0.5 so double
    representation can't smear the tie)."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 250 == 1)
    ref = F.lit("1998-06-15 00:00:00").cast("timestamp")
    return (
        o.select(
            "o_orderkey",
            F.round(F.months_between(ref, F.col("o_orderdate")), 6).cast("double").alias("months_to_ref"),
            F.bround(F.col("o_orderkey").cast("double") + 0.5, 0).cast("double").alias("key_banker"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice, 1) AS DOUBLE) AS price_r1,
           CAST(abs(l_discount - 0.05) AS DOUBLE) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(round(sqrt(l_extendedprice), 6) AS DOUBLE) AS price_sqrt,
           CAST(round(ln(l_extendedprice), 6) AS DOUBLE) AS price_ln,
           CAST(round(log10(l_extendedprice), 6) AS DOUBLE) AS price_log10,
           CAST(round(pow(l_quantity, 2), 4) AS DOUBLE) AS qty_sq,
           CAST(round(exp(l_discount), 6) AS DOUBLE) AS disc_exp,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(greatest(l_quantity, 25.0) AS DOUBLE) AS qty_floor25,
           CAST(least(l_tax, l_discount) AS DOUBLE) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 200 = 11
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 200 == 11)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 1).cast("double").alias("price_r1"),
            F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
            F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
            (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
            F.round(F.sqrt("l_extendedprice"), 6).cast("double").alias("price_sqrt"),
            F.round(F.log("l_extendedprice"), 6).cast("double").alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 6).cast("double").alias("price_log10"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).cast("double").alias("qty_sq"),
            F.round(F.exp("l_discount"), 6).cast("double").alias("disc_exp"),
            F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
            F.greatest("l_quantity", F.lit(25.0)).cast("double").alias("qty_floor25"),
            F.least("l_tax", "l_discount").cast("double").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS segment_masked,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           CAST(coalesce(NULL, NULL, c_acctbal, 0) AS DOUBLE) AS bal_or_zero,
           coalesce(nullif(c_name, ''), 'n/a') AS name_nvl,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS bal_null_safe_eq_null
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/nvl/CASE + null-safe equality (<=> ↔ IS NOT
    DISTINCT FROM). ``nvl`` is Spark's two-arg coalesce alias
    (SURVEY.md:125); DuckDB spells it coalesce."""
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("REDACTED")).alias("segment_masked"),
            F.when(F.col("c_acctbal") < 0, "debt").when(F.col("c_acctbal") < 5000, "low").otherwise("high").alias("bal_class"),
            F.coalesce(F.lit(None), F.lit(None), F.col("c_acctbal"), F.lit(0)).cast("double").alias("bal_or_zero"),
            F.nvl(F.nullif(F.col("c_name"), F.lit("")), F.lit("n/a")).alias("name_nvl"),
            F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")).alias("bal_null_safe_eq_null"),
        )
        .orderBy("c_custkey")
    )


@query(
    "scalar_array_hof",
    oracle="""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS tokens FROM documents
        WHERE doc_id % 20 = 1
    )
    SELECT doc_id,
           len(tokens) AS n_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(tokens))[1:5], ',') AS first5_distinct,
           array_to_string(list_transform(tokens, t -> CAST(length(t) AS VARCHAR))[1:8], ',') AS token_lens,
           len(list_filter(tokens, t -> length(t) > 4)) AS n_long_tokens,
           list_reduce(list_transform(tokens, t -> length(t)), (a, b) -> a + b) AS total_chars
    FROM toks
    ORDER BY doc_id
    """,
    tags=("scalar", "array", "higher-order"),
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (transform/filter/aggregate) over
    tokenized text — all JVM-side lambdas, zero Python."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 20 == 1)
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    return (
        toks.select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.array_contains("tokens", "spark").alias("has_spark"),
            # final arrays serialized to strings for a scalar comparison
            # surface (the HOFs themselves are what's exercised)
            F.array_join(F.slice(F.array_sort(F.array_distinct("tokens")), 1, 5), ",").alias("first5_distinct"),
            F.array_join(
                F.slice(F.transform("tokens", lambda t: F.length(t).cast("string")), 1, 8), ","
            ).alias("token_lens"),
            F.size(F.filter("tokens", lambda t: F.length(t) > 4)).cast("bigint").alias("n_long_tokens"),
            F.aggregate(
                F.transform("tokens", lambda t: F.length(t).cast("bigint")), F.lit(0).cast("bigint"), lambda a, b: a + b
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    WHERE event_id % 25 = 2
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props: get_json_object (path query)
    and from_json (full schema parse) produce the same values."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = load_tables(spark, sf_dir)["events"].filter(F.col("event_id") % 25 == 2)
    schema = StructType([StructField("k", LongType())])
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", schema).getField("k").alias("k_int"),
            (F.from_json("props", schema).getField("k") * 2).alias("k_doubled"),
        )
        .orderBy("event_id")
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    WHERE c_custkey % 50 = 9
    ORDER BY c_custkey
    """,
    tags=("scalar", "hash"),
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes are engine-portable (md5/sha256); Spark's
    xxhash64/crc32/hash are engine-specific → scalar_hash_spark."""
    c = load_tables(spark, sf_dir)["customer"].filter(F.col("c_custkey") % 50 == 9)
    return (
        c.select(
            "c_custkey",
            F.md5("c_name").alias("name_md5"),
            F.sha2("c_name", 256).alias("name_sha256"),
        )
        .orderBy("c_custkey")
    )


@query(
    "scalar_hash_spark",
    oracle=None,  # xxhash64/crc32/hash are Spark-specific bit patterns;
    # determinism is pinned by tests/test_functions.py instead
    tags=("scalar", "hash"),
)
def scalar_hash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes — the building blocks for MinHash/salting;
    deterministic across runs/partitionings, which the dedup pipeline
    relies on."""
    c = load_tables(spark, sf_dir)["customer"].filter(F.col("c_custkey") % 50 == 9)
    return (
        c.select(
            "c_custkey",
            F.xxhash64("c_name").alias("name_xx64"),
            F.crc32("c_name").alias("name_crc32"),
            F.hash("c_name").alias("name_hash32"),
            F.xxhash64("c_name", F.lit(1)).alias("name_xx64_seeded"),
        )
        .orderBy("c_custkey")
    )


@query(
    "scalar_struct_map",
    oracle="""
    SELECT o_orderkey,
           CAST(to_json({'status': o_orderstatus, 'priority': o_orderpriority}) AS VARCHAR) AS order_info,
           CAST(map_extract(map([o_orderstatus], [o_totalprice]), o_orderstatus)[1] AS DOUBLE) AS price_via_map
    FROM orders
    WHERE o_orderkey % 150 = 4
    ORDER BY o_orderkey
    """,
    tags=("scalar", "struct", "map"),
)
def scalar_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + map build/lookup round-trip. The struct is
    serialized with to_json so the comparison surface is a plain string
    (raw nested objects render differently across Arrow/non-Arrow)."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 150 == 4)
    return (
        o.select(
            "o_orderkey",
            F.to_json(
                F.struct(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
            ).alias("order_info"),
            F.element_at(
                F.create_map(F.col("o_orderstatus"), F.col("o_totalprice")), F.col("o_orderstatus")
            ).cast("double").alias("price_via_map"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_json_tools",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_tuple,
           'STRUCT<k: BIGINT>' AS props_schema,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
    FROM events
    WHERE event_id % 40 = 7
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def scalar_json_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple (multi-path extraction as a generator) and
    schema_of_json (schema inference from a sample document). The
    inferred schema string is engine-specific syntax, so the oracle
    pins Spark's exact rendering as a constant — the check is that
    inference sees the same shape on every row."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("event_id") % 40 == 7)
    return (
        e.select(
            "event_id",
            F.json_tuple(F.col("props"), "k").alias("k_tuple"),
            F.schema_of_json(F.lit('{"k": 1}')).alias("props_schema"),
            F.size(F.json_object_keys("props")).cast("bigint").alias("n_keys"),
        )
        .orderBy("event_id")
    )


@query(
    "scalar_map_ops",
    oracle="""
    WITH m AS (
        SELECT o_orderkey,
               'status,priority' AS keys_csv,
               o_orderstatus || ',' || o_orderpriority AS vals_csv,
               o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 120 = 11
    )
    SELECT o_orderkey, keys_csv, vals_csv, 'status' AS mk, o_orderstatus AS mv FROM m
    UNION ALL
    SELECT o_orderkey, keys_csv, vals_csv, 'priority' AS mk, o_orderpriority AS mv FROM m
    ORDER BY o_orderkey, mk
    """,
    tags=("scalar", "map"),
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_keys / map_values / explode(map): build a map per row,
    enumerate its keys and values (serialized to CSV strings — raw
    arrays render differently across Arrow/non-Arrow), and explode the
    map into (key, value) rows. The oracle spells the same answer with
    UNION ALL since DuckDB's map explode is engine-specific syntax."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") % 120 == 11)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return (
        o.select(
            "o_orderkey",
            F.array_join(F.map_keys(m), ",").alias("keys_csv"),
            F.array_join(F.map_values(m), ",").alias("vals_csv"),
            F.explode(m).alias("mk", "mv"),
        )
        .orderBy("o_orderkey", "mk")
    )
