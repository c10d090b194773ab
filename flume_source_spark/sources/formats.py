"""File-format sources and sinks: CSV and JSON-lines scans (explicit
schema — no inference in production paths), parquet/CSV writes, and
partitioned writes with partition pruning.

The driver fixtures are parquet-only, so each query materializes the
alternate format from parquet first (exercising the WRITER), reads it
back (the SCANNER), and aggregates — the oracle runs the same
aggregation on the original parquet, so a full write→read→compute
round-trip is what's actually verified.

Writes land under /tmp (never in the read-only testdata dir), keyed by
sf_dir so scale factors don't collide.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

from flume_source_spark.workdir import slot as _slot  # noqa: E402


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT n_name, count(*) AS n_cust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header, explicit quoting) → schema'd CSV scan →
    join+agg. Oracle computes from the original parquet, so the CSV
    writer/scanner round-trip must be lossless (incl. doubles via
    full-precision serialization)."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "customer_csv")
    t["customer"].write.mode("overwrite").option("header", True).csv(out)
    schema = "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    c = spark.read.schema(schema).option("header", True).csv(out)
    return (
        c.join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), dsum(dec("c_acctbal"), "total_bal"))
        .orderBy("n_name")
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("source", "json"),
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → schema'd json scan → agg (timestamps
    carried as ISO strings in the JSON layer; the agg doesn't depend
    on them, making the round-trip exact)."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "events_jsonl")
    t["events"].select("event_id", "event_type", "value").write.mode("overwrite").json(out)
    e = spark.read.schema("event_id long, event_type string, value double").json(out)
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum(dec("value"), "total_value"))
        .orderBy("event_type")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → scan → agg: the second columnar format (built into
    Spark; same pushdown/pruning machinery as parquet). Avro is NOT in
    this image (external spark-avro module) — see `avro_unavailable`."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "part_orc")
    t["part"].write.mode("overwrite").orc(out)
    p = spark.read.orc(out)
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"), dsum(dec("p_retailprice"), "total_price"))
        .orderBy("p_brand")
    )


def avro_unavailable() -> str:
    """Avro requires the external spark-avro jar (org.apache.spark:
    spark-avro_2.13), which is not baked into this image. Gate usage:

        try:
            df.write.format("avro").save(path)
        except Exception:
            # deploy spark-avro or fall back to parquet
            ...
    """
    return "avro needs external spark-avro jar; not available in this image"


@query(
    "source_csv_options",
    oracle="""
    SELECT s_suppkey, s_name,
           coalesce(CAST(round(s_acctbal, 2) AS DOUBLE), -1.0) AS bal_or_neg1
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("source", "csv"),
)
def source_csv_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scanner options: custom delimiter (|), no header, explicit
    nullValue sentinel — written with the same options so negative
    balances round-trip and NULLs survive as the sentinel."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "supplier_pipe_csv")
    (
        t["supplier"]
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).cast("double").alias("bal"))
        .withColumn("bal", F.when(F.col("bal").isNull(), None).otherwise(F.col("bal")))
        .write.mode("overwrite")
        .option("sep", "|")
        .option("header", False)
        .option("nullValue", "\\N")
        .csv(out)
    )
    s = (
        spark.read.schema("s_suppkey long, s_name string, bal double")
        .option("sep", "|")
        .option("header", False)
        .option("nullValue", "\\N")
        .csv(out)
    )
    return (
        s.select("s_suppkey", "s_name", F.coalesce(F.col("bal"), F.lit(-1.0)).alias("bal_or_neg1"))
        .orderBy("s_suppkey")
    )


@query(
    "sink_partitioned_write",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("sink", "partitioned", "plan"),
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet write (partitionBy=o_orderstatus)
    then a filtered read-back: the o_orderstatus='O' predicate prunes
    to ONE partition directory (PartitionFilters in the scan — pinned
    by tests/test_plans.py::test_partitioned_write_prunes). This is the
    100 TB layout decision: partition on the always-filtered column."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "orders_by_status")
    t["orders"].write.mode("overwrite").option("compression", "zstd").partitionBy("o_orderstatus").parquet(out)
    o = spark.read.parquet(out)
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum(dec("o_totalprice"), "total"))
        .orderBy("o_orderstatus")
    )


@query(
    "sink_clustered_write",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
    """,
    tags=("sink", "clustered", "plan"),
)
def sink_clustered_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered parquet layout: ``repartitionByRange(l_shipdate)``
    + ``sortWithinPartitions(l_shipdate)`` before the write, then a
    date-window read-back. The OTHER 100 TB layout decision next to
    Hive partitioning (``sink_partitioned_write``): when the filter
    column is high-cardinality (a date/timestamp), directory-per-value
    partitioning explodes into tiny files — range clustering instead
    gives every output file a NARROW min/max footer range on the sort
    column, so a predicate skips whole files (and row groups within
    them) via parquet statistics, no directory scheme needed. The
    pushed-down filter reaching the clustered scan is pinned by
    tests/test_plans.py::test_clustered_write_skips_by_stats."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "lineitem_by_shipdate")
    (
        t["lineitem"]
        .repartitionByRange(8, F.col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(out)
    )
    li = spark.read.parquet(out)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01")) & (F.col("l_shipdate") <= F.lit("1995-03-31"))
    ).agg(
        F.count("*").alias("n"),
        dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"),
    )


@query(
    "source_text_roundtrip",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE NOT contains(text, chr(9)) AND NOT contains(text, chr(10))
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("source", "text"),
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → raw line-oriented text (``doc_id<TAB>text``, the
    classic log-file layout) → ``spark.read.text`` scan → parse the
    line back with substring_index → join to documents on the parsed
    id → agg. Exercises the text writer/scanner plus the
    line-parsing pattern every raw-log ingestion starts with; the
    oracle computes from the original parquet, so the round-trip must
    be lossless. Line-unsafe docs (text containing tab/newline — none
    in the fixtures) are excluded by the SAME containment predicate on
    BOTH sides, so the compared row set is identical by construction
    rather than by assumption."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "documents_text")
    d = t["documents"]
    (
        d.filter(~F.col("text").contains("\t") & ~F.col("text").contains("\n"))
        .select(F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("value"))
        .write.mode("overwrite")
        .text(out)
    )
    lines = spark.read.text(out)
    parsed = lines.select(
        F.substring_index("value", "\t", 1).cast("long").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text_rt"),
    )
    return (
        parsed.join(d.select("doc_id", "lang", "n_chars"), "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("lang")
    )


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT n_regionkey AS region_key, count(*) AS n_nations,
           min(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    ORDER BY region_key
    """,
    tags=("source", "xml"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → XML (Spark 4's built-in XML source, rowTag) → schema'd
    XML scan → agg; the oracle computes from the original parquet so
    writer+scanner round-trip correctness is what's checked."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "nation_xml")
    t["nation"].write.mode("overwrite").option("rowTag", "nation").xml(out)
    n = (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .option("rowTag", "nation")
        .xml(out)
    )
    return (
        n.groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(F.count("*").alias("n_nations"), F.min("n_name").alias("first_nation"))
        .orderBy("region_key")
    )


@query(
    "source_csv_malformed",
    oracle="""
    SELECT 'permissive' AS mode, CAST(4 AS BIGINT) AS n_rows, CAST(2 AS BIGINT) AS n_corrupt
    UNION ALL
    SELECT 'dropmalformed', 2, 0
    ORDER BY mode
    """,
    tags=("source", "csv", "robustness"),
)
def source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV malformed-row policy surface: the same 4-line file (one row
    with a non-numeric value in a LONG column, one with too few
    columns) read under PERMISSIVE (rows kept, bad fields null, raw
    line captured in _corrupt_record) and DROPMALFORMED (both bad rows
    dropped). The corrupt-record column must be IN the schema for both
    reads — without it Spark 4's CSV parser does not classify the
    type-conversion row as malformed. The oracle is the policy
    contract itself — fixed expected counts — because the input is a
    constant crafted here, not fixture data. FAILFAST (the third mode)
    is pinned by tests/test_properties.py as an exception, which a
    row-compare can't express."""
    out = _slot(sf_dir, "malformed_csv")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "rows.csv"), "w") as f:
        f.write("1,alpha,10\n2,beta,oops\n3,gamma\n4,delta,40\n")
    schema = "id long, name string, qty long, _corrupt_record string"

    def read(mode):
        return (
            spark.read.schema(schema)
            .option("mode", mode)
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(out)
            # Spark disallows queries whose referenced columns prune
            # down to ONLY the internal corrupt-record column
            # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
            # the documented pattern is to materialize first.
            .cache()
        )

    n_perm = read("PERMISSIVE").agg(
        F.count("*").alias("n_rows"),
        F.count("_corrupt_record").alias("n_corrupt"),
    ).select(F.lit("permissive").alias("mode"), "n_rows", "n_corrupt")
    n_drop = read("DROPMALFORMED").agg(F.count("*").alias("n_rows")).select(
        F.lit("dropmalformed").alias("mode"), "n_rows", F.lit(0).cast("long").alias("n_corrupt")
    )
    return n_perm.unionByName(n_drop).orderBy("mode")


@query(
    "sink_compact_small_files",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("sink", "maintenance", "compaction"),
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance operator every
    long-running ingest needs (streaming sinks and per-trigger writes
    produce file counts that grow without bound; at 100 TB the
    metadata and open() overhead of millions of small files dominates
    scan time long before bytes do). Simulates the problem by writing
    ``documents`` as 64 deliberate fragments, then compacts with
    ``coalesce(4)`` — a NARROW repartitioning: each output task
    concatenates ~16 input fragments with no shuffle at all (this is
    the OPTIMIZE/bin-packing primitive; use repartitionByRange instead
    when the rewrite should also re-cluster, cf.
    ``sink_clustered_write``). Verified on three axes: the compacted
    file count is actually ≤ 4 (asserted here — a compaction that
    silently doesn't compact is the classic regression), the
    round-tripped data aggregates identically to the original parquet
    (the oracle), and the write is atomic-by-directory (overwrite
    mode)."""
    t = load_tables(spark, sf_dir)
    frag = _slot(sf_dir, "documents_fragmented")
    compact = _slot(sf_dir, "documents_compacted")
    t["documents"].repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    n_files = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    assert n_files <= 4, f"compaction produced {n_files} files (> 4)"
    d = spark.read.parquet(compact)
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("lang")
    )


@query(
    "source_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN o_orderdate >= DATE '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("source", "schema-evolution"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read — the other inevitable operational
    reality of a long-lived 100 TB table: early files were written
    before a column existed. Writes ``orders`` as two generations
    (v1: WITHOUT o_orderdate, for orders before 1996; v2: full
    schema, the rest), reads the union with ``mergeSchema=true``
    (Spark reconciles the footers; v1 rows surface NULL o_orderdate),
    and aggregates with explicit NULL handling. The oracle computes
    the identical result from the original table: a 1996+ date exists
    exactly for the v2 generation, so ``n_with_date`` counts evolved
    rows — pinning both the schema merge and the NULL semantics of
    the missing column."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "orders_evolved")
    o = t["orders"]
    v1 = o.filter(F.col("o_orderdate") < "1996-01-01").drop("o_orderdate")
    v2 = o.filter(F.col("o_orderdate") >= "1996-01-01")
    v1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("o_orderdate").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_date"),
        )
        .orderBy("o_orderstatus")
    )


N_ZORDER_FILES = 16
_ZBITS = 8  # 8 bits per dimension → 16-bit z-values


def _zorder_bucket(col: Column, bounds: list[float]) -> Column:
    """Quantile-bucket assignment WITHOUT a global sort: count how many
    precomputed boundaries lie at or below the value (a 255-element
    array scan per row, pure expression work). This is the scale-safe
    replacement for ntile() over an unpartitioned window, which would
    funnel the whole table through one task; the boundaries themselves
    come from approxQuantile — a driver-bounded (≤255 scalars)
    Greenwald-Khanna sketch, the same sampling strategy
    repartitionByRange uses internally."""
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(barr, lambda b: b <= col.cast("double")))


def _interleave_bits(bx: Column, by: Column) -> Column:
    """16-bit Morton (z-order) code from two 8-bit bucket ranks —
    bit-interleave as a fixed chain of shift/mask expressions (JVM
    codegen, no UDF)."""
    z = F.lit(0)
    for i in range(_ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


@query(
    "sink_zorder_write",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 500
      AND o_totalprice BETWEEN 100000 AND 150000
    """,
    tags=("sink", "clustered", "plan", "zorder"),
)
def sink_zorder_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustered parquet layout on TWO columns
    — the multi-dimensional file-skipping layout (Delta OPTIMIZE
    ZORDER BY / Iceberg sort-order analogue) that 1-D range clustering
    (``sink_clustered_write``) cannot provide: range-cluster on
    o_custkey and every o_totalprice predicate still reads all files;
    interleave the two dims' quantile-bucket ranks bit-by-bit and
    every output file covers a narrow rectangle in BOTH dims, so
    min/max footer stats skip files for predicates on either column.
    Pipeline: approxQuantile boundaries (driver-bounded sketch) →
    per-row bucket rank via array scan (no global sort) → 16-bit
    Morton code → repartitionByRange(z) + sortWithinPartitions(z) →
    parquet. The skipping itself is pinned by
    tests/test_plans.py::test_zorder_write_skips_both_dims; this query
    verifies the layout is LOSSLESS via a 2-D filtered read-back
    aggregate against the original table."""
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "orders_zorder")
    orders = t["orders"]
    qs = [i / 256 for i in range(1, 256)]
    # ONE sketch pass for both dims (approxQuantile accepts a column
    # list) — at 100 TB the quantile scan is the dominant extra cost
    # of z-ordering, so never pay it per-column
    cust_bounds, price_bounds = orders.approxQuantile(["o_custkey", "o_totalprice"], qs, 0.001)
    z = _interleave_bits(
        _zorder_bucket(F.col("o_custkey"), cust_bounds),
        _zorder_bucket(F.col("o_totalprice"), price_bounds),
    )
    (
        orders.withColumn("_z", z)
        .repartitionByRange(N_ZORDER_FILES, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(out)
    )
    o = spark.read.parquet(out)
    return o.filter(
        F.col("o_custkey").between(100, 500) & F.col("o_totalprice").between(100000, 150000)
    ).agg(
        F.count("*").alias("n"),
        dsum(dec("o_totalprice"), "total_price"),
    )
