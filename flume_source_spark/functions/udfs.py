"""The Python UDF/UDAF/UDTF surface — every escape-hatch tier, each
verified against a pure-SQL oracle so what's tested is the
Python-boundary machinery itself (serialization, Arrow batching,
grouping, SQL registration), not the arithmetic.

Tier order (prefer the lowest that expresses the semantics — UDFs are
the slow path, and the same logic as built-ins stays in codegen):

1. built-in expressions            — everything else in this repo
2. @pandas_udf (Arrow, vectorized) — `pandas_scale`
3. applyInPandas (grouped map)     — `group_zscore`
4. mapInArrow (batch-level)        — `udf_map_in_arrow` (raw
   RecordBatches, zero pandas; numpy over the flat Arrow buffer)
5. @udtf / posexplode              — `udtf_expand`; polymorphic
   analyze() — `udtf_analyze_dynamic`; TABLE argument with
   PARTITION BY/ORDER BY (engine-sorted streaming partition state)
   — `udtf_table_partition`
6. row-at-a-time @udf              — `row_classify` (deliberately the
   worst tier: per-row pickling; exists for surface completeness and
   as the baseline the vectorized tiers beat)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice * (1 - l_discount) * 1.1 AS DECIMAL(18,6)), 4) AS DOUBLE) AS adjusted
    FROM lineitem
    WHERE l_orderkey % 500 = 2
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→Series pandas_udf (Arrow-batched). ~10-100× the row UDF;
    still slower than the equivalent built-in expression — used only
    when numpy/pandas semantics are genuinely needed."""

    @F.pandas_udf(DoubleType())
    def adjust(price: pd.Series, disc: pd.Series) -> pd.Series:
        # NOTE: no rounding in Python — numpy/pandas round half-even,
        # SQL round() rounds half-away; canonicalize with F.round outside
        return price * (1 - disc) * 1.1

    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") % 500 == 2)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            # the ×1.1 product sits on 5th-decimal half-boundaries where
            # double-rounding diverges between engines; bridge through an
            # exact decimal before rounding (same strategy as canon.py)
            F.round(adjust("l_extendedprice", "l_discount").cast("decimal(18,6)"), 4)
            .cast("double")
            .alias("adjusted"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS DOUBLE) AS zscore
    FROM customer
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("udf", "applyInPandas"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (grouped-map/UDAF
    class): whole group as one pandas frame — the shape for per-group
    model scoring. Shuffles once on the group key; group size must fit
    an executor (mktsegment groups do; an unbounded key would not)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        # raw values out; rounding happens JVM-side (half-even vs
        # half-away divergence between numpy and SQL round)
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "zscore": (pdf["c_acctbal"] - mu) / sd,
            }
        )

    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_mktsegment string, c_custkey long, zscore double")
        .select("c_mktsegment", "c_custkey", F.round("zscore", 4).cast("double").alias("zscore"))
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "udf_row_classify",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END
             || '-' || lower(p_type) AS size_type
    FROM part
    ORDER BY p_partkey
    """,
    tags=("udf", "row"),
)
def udf_row_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the slowest tier (per-row serde, no
    vectorization, breaks codegen). Registered for SQL use via
    spark.udf.register; exists to pin the surface, not as a pattern."""

    def classify(size: int, ptype: str) -> str:
        bucket = "S" if size < 10 else ("M" if size < 30 else "L")
        return f"{bucket}-{ptype.lower()}"

    spark.udf.register("classify_part", classify, StringType())
    p = load_tables(spark, sf_dir)["part"]
    p.createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, classify_part(p_size, p_type) AS size_type FROM part ORDER BY p_partkey"
    )


@query(
    "udtf_expand",
    oracle="""
    SELECT s_suppkey, CAST(part_idx AS BIGINT) AS part_idx,
           CAST(round(s_acctbal / 3, 4) AS DOUBLE) AS tranche
    FROM supplier, unnest([0, 1, 2]) AS t(part_idx)
    ORDER BY s_suppkey, part_idx
    """,
    tags=("udf", "udtf"),
)
def udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many expansion via a Python UDTF (PySpark ≥ 3.5): split
    each supplier balance into 3 tranches. Same plan class as
    explode(sequence(...)) — prefer the built-in when the expansion is
    expressible; the UDTF exists for computed expansions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="s_suppkey bigint, part_idx bigint, tranche double")
    class Tranches:
        def eval(self, s_suppkey: int, s_acctbal: float):
            for i in range(3):
                yield s_suppkey, i, s_acctbal / 3  # raw; round() in SQL (half-even hazard)

    spark.udtf.register("tranches", Tranches)
    load_tables(spark, sf_dir)["supplier"].createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT t.s_suppkey, t.part_idx,
               CAST(round(t.tranche, 4) AS DOUBLE) AS tranche
        FROM supplier, LATERAL tranches(s_suppkey, s_acctbal) t
        ORDER BY t.s_suppkey, t.part_idx
        """
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))), 4) AS DOUBLE) AS l2norm
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow tier: the kernel receives raw pyarrow RecordBatches —
    no pandas conversion at all — and computes per-vector L2 norms
    with numpy over the ListArray's flat values buffer (zero-copy).
    This is the lowest-overhead Python boundary Spark offers, the tier
    for kernels that speak Arrow natively (DataFusion-style compute,
    GPU libraries via CUDA array interface, tokenizers with Arrow
    input). Rounding happens JVM-side after the kernel (numpy rounds
    half-even, SQL half-away — the kernel returns raw doubles)."""
    import numpy as np
    import pyarrow as pa

    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")

    def l2(batches):
        for b in batches:
            emb = b.column(1)
            offs = emb.offsets.to_numpy().astype(np.int64)
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = offs - offs[0]  # sliced arrays carry a start offset
            sums = np.add.reduceat(flat * flat, offs[:-1]) if len(offs) > 1 else np.array([])
            dims = np.diff(offs).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(dims, pa.int32()), pa.array(np.sqrt(sums), pa.float64())],
                names=["vec_id", "dim", "l2"],
            )

    out = e.mapInArrow(l2, "vec_id long, dim int, l2 double")
    return out.select(
        "vec_id", "dim", F.round("l2", 4).cast("double").alias("l2norm")
    ).orderBy("vec_id")


@query(
    "udf_cogrouped_merge",
    oracle="""
    WITH clicks AS (
        SELECT user_id, count(*) AS n_clicks,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS click_value
        FROM events WHERE event_type = 'click' AND user_id % 25 = 3
        GROUP BY user_id
    ),
    buys AS (
        SELECT user_id, count(*) AS n_purchases,
               CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS purchase_value
        FROM events WHERE event_type = 'purchase' AND user_id % 25 = 3
        GROUP BY user_id
    )
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
           coalesce(click_value, 0.0) AS click_value,
           CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
           coalesce(purchase_value, 0.0) AS purchase_value
    FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
    ORDER BY user_id
    """,
    tags=("udf", "cogroup"),
)
def udf_cogrouped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 3b of the Python surface: cogrouped ``applyInPandas`` —
    TWO grouped DataFrames aligned per key in one Python kernel (the
    merge-asof / custom-join escape hatch; here the kernel computes a
    per-user click-vs-purchase rollup so the whole Python boundary is
    pinned by a FULL OUTER JOIN oracle — keys existing on only one
    side must still appear, which is exactly the cogroup contract).
    Scale: one shuffle per side on user_id (same as any grouped-map),
    Arrow-batched both directions.

    Decimal note: the kernel sums cents as int64 then divides by 100 —
    pandas float sums would be order-dependent and hash-diverge."""
    e = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") % 25 == 3)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "value")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", "value")

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        def cents_sum(pdf):
            return round((pdf["value"] * 100).round().astype("int64").sum() / 100.0, 2)

        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(left)],
                "click_value": [cents_sum(left) if len(left) else 0.0],
                "n_purchases": [len(right)],
                "purchase_value": [cents_sum(right) if len(right) else 0.0],
            }
        )

    out = clicks.groupBy("user_id").cogroup(buys.groupBy("user_id")).applyInPandas(
        merge,
        schema="user_id long, n_clicks long, click_value double, "
        "n_purchases long, purchase_value double",
    )
    return out.orderBy("user_id")


@query(
    "udtf_analyze_dynamic",
    oracle="""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents WHERE doc_id % 20 = 1)
    SELECT doc_id,
           toks[1] AS tok0, toks[2] AS tok1, toks[3] AS tok2, toks[4] AS tok3,
           CAST(len(toks) AS BIGINT) AS n_tokens
    FROM t
    ORDER BY doc_id
    """,
    tags=("udf", "udtf", "analyze"),
)
def udtf_analyze_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is computed
    at plan time by ``analyze()`` from a constant argument — here a
    leading-token widener whose column count (tok0..tokN-1) comes from
    the N literal in the query. This is the UDTF tier you cannot
    express with a static returnType (``udtf_expand``): schema is
    data-dependent-by-argument, resolved once on the driver, and
    Catalyst plans the lateral join against the resolved shape. The
    kernel itself stays a plain row generator on executors."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class LeadTokens:
        @staticmethod
        def analyze(row, n):
            if not n.isConstantExpression:
                raise ValueError("n must be a constant literal")
            schema = StructType().add("doc_id", LongType())
            for i in range(int(n.value)):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema.add("n_tokens", LongType()))

        def eval(self, row, n):
            toks = (row["text"] or "").split(" ")
            yield (row["doc_id"], *[toks[i] if i < len(toks) else None for i in range(n)], len(toks))

    spark.udtf.register("lead_tokens", udtf(LeadTokens))
    load_tables(spark, sf_dir)["documents"].createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT t.* FROM documents_v d,
        LATERAL lead_tokens(struct(d.doc_id, d.text), 4) t
        WHERE d.doc_id % 20 = 1
        ORDER BY doc_id
        """
    )


@query(
    "udtf_table_partition",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    isl AS (
        SELECT user_id, rn,
               sum(CASE WHEN prev IS NULL OR value <= prev THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY rn
                         ROWS UNBOUNDED PRECEDING) AS run_id
        FROM ordered),
    runs AS (SELECT user_id, run_id, CAST(count(*) AS BIGINT) AS run_len
             FROM isl GROUP BY 1, 2)
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_events,
           CAST(max(run_len) AS BIGINT) AS longest_inc_run
    FROM runs GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("udf", "udtf", "table-arg"),
)
def udtf_table_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument + PARTITION BY/ORDER BY
    (Spark 4): the engine hash-partitions the input on user_id, sorts
    each partition by (ts, event_id), streams the rows through
    ``eval`` and calls ``terminate`` at each partition boundary — the
    UDTF-tier equivalent of applyInPandas with streaming (row-at-a-
    time, O(1) state) instead of whole-group materialization. Kernel:
    per-user event count + longest strictly-increasing run of value
    in time order — trivially sequential, annoying in pure SQL
    (gaps-and-islands), natural as partition state."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, longest_inc_run bigint")
    class RunStats:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.prev = None
            self.cur = 0
            self.best = 0

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            v = row["value"]
            self.cur = self.cur + 1 if (self.prev is not None and v > self.prev) else 1
            self.best = max(self.best, self.cur)
            self.prev = v

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.n, self.best)

    spark.udtf.register("run_stats", RunStats)
    load_tables(spark, sf_dir)["events"].createOrReplaceTempView("events_utp")
    return spark.sql(
        """
        SELECT * FROM run_stats(
            TABLE(events_utp) PARTITION BY user_id ORDER BY (ts, event_id))
        ORDER BY user_id
        """
    )
