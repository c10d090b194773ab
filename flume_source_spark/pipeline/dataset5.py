"""Dataset-prep wave 5: dataloader batch plan + distribution drift.

- ``ds_batch_plan`` — the last mile between a curated corpus and a
  training job: materialize the DETERMINISTIC batch schedule. Every
  doc gets a reproducible shuffle rank (identity hash — same
  primitive as ``ds_global_shuffle``, so the order is independent of
  partitioning/cluster size), consecutive runs of ``BATCH_DOCS``
  ranked docs form one global step, and the plan row per step carries
  what a dataloader needs: doc count, token sum, token max (the
  padding-waste driver), and the id range. Rank→step is pure
  arithmetic ((rank−1) div B) — no sequential state, so the plan is
  embarrassingly parallel and any worker can locate its steps by
  predicate pushdown on the step column. Round 11: the rank runs
  through the DISTRIBUTED global-order helper
  (flume_source_spark/global_order.py) — exact row_number over the
  hash order with no single-partition sort; the window-form SQL
  stays as the oracle because the helper is bit-identical to it.
- ``dq_drift_psi`` — Population Stability Index between a reference
  and a current slice (here: orders before/after the fixture's
  median-year boundary), the standard "did the distribution move"
  monitor for training mixtures and feature pipelines. Buckets are
  FIXED-WIDTH on integer cents (not quantiles — quantile edges move
  with the data, which hides drift); PSI = Σ (p−q)·ln(p/q) over
  smoothed bucket shares. The only float is the final ln (identical
  IEEE input rationals on both engines, round 6); shares use exact
  integer counts with +1 Laplace smoothing so empty buckets are
  log-safe, deterministic, and identically smoothed cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

BATCH_DOCS = 32

_BATCH_PLAN_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               row_number() OVER (
                   ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT), doc_id) AS rk
        FROM documents),
    steps AS (
        SELECT (rk - 1) // {BATCH_DOCS} AS step, doc_id, n_tokens FROM ranked)
    SELECT CAST(step AS BIGINT) AS step,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM steps GROUP BY step
    ORDER BY step
"""


@query("ds_batch_plan", oracle=_BATCH_PLAN_ORACLE, tags=("llm", "dataset", "dataloader"))
def ds_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataloader schedule: identity-hash shuffle rank →
    fixed-size global steps → per-step doc/token/padding accounting.
    Round 11: the rank is the DISTRIBUTED global-order helper (the
    md5 hash is a near-uniform bucket key, so the boundary buckets are
    balanced by construction) — exact row_number, no single-partition
    sort, unchanged oracle."""
    from flume_source_spark.global_order import with_global_rank

    d = load_tables(spark, sf_dir)["documents"]
    hashed = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    ranked = with_global_rank(
        hashed, [F.col("h"), F.col("doc_id")], F.col("h"), rank_col="rk"
    )
    steps = ranked.withColumn(
        "step", ((F.col("rk") - 1) / BATCH_DOCS).cast("long")
    )
    return (
        steps.groupBy("step")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("step")
    )


# Fixed-width 500-cent buckets over o_totalprice-like values; the
# fixture's lineitem extendedprice spans a wide range, so bucket on
# l_extendedprice div 10000 cents (=100-currency windows), capped into
# a final overflow bucket to keep the bucket count bounded.
N_BUCKETS = 20

_PSI_ORACLE = f"""
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey % 2 = 0 AS is_ref
        FROM lineitem),
    b AS (
        SELECT least(cents // 500000, {N_BUCKETS - 1}) AS bucket, is_ref
        FROM c),
    counts AS (
        SELECT bucket,
               CAST(count(*) FILTER (is_ref) AS BIGINT) AS n_ref,
               CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS n_cur
        FROM b GROUP BY bucket),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts),
    spine AS (SELECT unnest(generate_series(0, {N_BUCKETS - 1})) AS bucket),
    sm AS (
        SELECT s.bucket,
               COALESCE(c.n_ref, 0) + 1 AS a,
               COALESCE(c.n_cur, 0) + 1 AS b,
               t.t_ref + {N_BUCKETS} AS ta,
               t.t_cur + {N_BUCKETS} AS tb
        FROM spine s LEFT JOIN counts c USING (bucket) CROSS JOIN tot t)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(a - 1 AS BIGINT) AS n_ref,
           CAST(b - 1 AS BIGINT) AS n_cur,
           CAST(round((CAST(a AS DOUBLE)/ta - CAST(b AS DOUBLE)/tb)
                      * ln((CAST(a AS DOUBLE)/ta) / (CAST(b AS DOUBLE)/tb)), 6)
                AS DOUBLE) AS psi_term
    FROM sm
    ORDER BY bucket
"""


@query("dq_drift_psi", oracle=_PSI_ORACLE, tags=("quality", "drift"))
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms between the even-key
    (reference) and odd-key (current) lineitem slices over fixed-width
    price buckets, Laplace-smoothed; Σ psi_term is the drift score
    (PSI < 0.1 stable, > 0.25 drifted by the usual rule of thumb)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    c = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_orderkey") % 2 == 0).alias("is_ref"),
    )
    b = c.select(
        F.least(F.expr("cents div 500000"), F.lit(N_BUCKETS - 1)).alias("bucket"),
        "is_ref",
    )
    counts = b.groupBy("bucket").agg(
        F.count_if("is_ref").alias("n_ref"),
        F.count_if(~F.col("is_ref")).alias("n_cur"),
    )
    spine = spark.range(N_BUCKETS).select(F.col("id").alias("bucket"))
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    sm = (
        spine.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.coalesce("n_ref", F.lit(0)) + 1).alias("a"),
            (F.coalesce("n_cur", F.lit(0)) + 1).alias("b"),
            (F.col("t_ref") + N_BUCKETS).alias("ta"),
            (F.col("t_cur") + N_BUCKETS).alias("tb"),
        )
    )
    pa = F.col("a").cast("double") / F.col("ta")
    pb = F.col("b").cast("double") / F.col("tb")
    return sm.select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.col("a") - 1).cast("long").alias("n_ref"),
        (F.col("b") - 1).cast("long").alias("n_cur"),
        F.round((pa - pb) * F.log(pa / pb), 6).cast("double").alias("psi_term"),
    ).orderBy("bucket")


_CURATION_ORACLE = """
    WITH t AS (
        SELECT doc_id, source, lang,
               str_split(text, ' ') AS toks,
               md5(lower(trim(text))) AS h
        FROM documents),
    feat AS (
        SELECT doc_id, source, lang,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               (len(toks) >= 20 AND
                len(list_distinct(toks)) * 1.0 / len(toks) >= 0.15) AS passes_q,
               h
        FROM t),
    dup AS (SELECT h FROM feat GROUP BY h HAVING count(*) >= 2)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f.lang) AS BIGINT) AS n_langs,
           CAST(sum(f.n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(f.n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(f.n_tokens) AS BIGINT) AS max_tokens,
           CAST(count(*) FILTER (f.passes_q) AS BIGINT) AS n_quality_pass,
           count(*) FILTER (f.passes_q) * 10000 // count(*) AS quality_permyriad,
           CAST(count(*) FILTER (d.h IS NOT NULL) AS BIGINT) AS n_exact_dup,
           CAST(sum(f.n_tokens) FILTER (f.passes_q AND d.h IS NULL) AS BIGINT)
               AS curated_tokens
    FROM feat f LEFT JOIN dup d USING (h)
    GROUP BY f.source
    ORDER BY f.source
"""


@query("ds_curation_report", oracle=_CURATION_ORACLE, tags=("llm", "dataset", "report"))
def ds_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation dashboard in ONE pass + one
    dictionary join: doc/lang/token census, quality pass rate
    (text_quality's composite rule), exact-dup incidence
    (dedup_exact's normalized hash), and the curated token yield
    (quality-passing AND not duplicated) — the number a pretraining
    data report leads with. Composes three operator families into a
    single plan: the scan computes all per-doc features at once
    (column-pruned: doc_id/source/lang/text only), the dup dictionary
    is the df≥2 hash set (broadcastable, same shape as
    text_line_dedup's), and the rollup is one map-side-combinable
    aggregate keyed on source."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split("text", " ")
    feat = d.select(
        "doc_id", "source", "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            (F.size(toks) >= 20)
            & (F.size(F.array_distinct(toks)) * 1.0 / F.size(toks) >= 0.15)
        ).alias("passes_q"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    dup = (
        feat.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h", F.lit(True).alias("is_dup"))
    )
    j = feat.join(F.broadcast(dup), "h", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(False))
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.count_if("passes_q").alias("n_quality_pass"),
            # integral div, NOT double division + cast (round-9 audit):
            # matches the oracle's floor `//` even when the quotient
            # lands within one ulp of an integer; non-negative operands
            F.expr(
                "CAST(count_if(passes_q) * 10000 div count(*) AS BIGINT)"
            ).alias("quality_permyriad"),
            F.count_if("is_dup").alias("n_exact_dup"),
            F.sum(F.when(F.col("passes_q") & ~F.col("is_dup"), F.col("n_tokens"))).alias(
                "curated_tokens"
            ),
        )
        .orderBy("source")
    )
