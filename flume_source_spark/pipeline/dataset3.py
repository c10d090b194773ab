"""Dataset-prep wave 3: length histogram, deterministic importance
resampling, curriculum ordering.

- ``ds_length_histogram`` — fixed-width histogram of document length
  (bucket = floor(n_chars / 200)) with cumulative counts/fractions.
  One hash aggregate on a derived int key (map-side combinable) plus
  one window over the tiny bucket table; DuckDB 1.0 has no
  ``width_bucket``, so the bucket IS the floor arithmetic on both
  engines (also the version that pushes into codegen).
- ``ds_importance_resample`` — weighted up/down-sampling with ZERO
  RNG state: each doc's copy count is floor(w) plus one Bernoulli
  extra decided by comparing frac(w) against the doc's own
  md5-identity uniform (same hash family as ds_split_deterministic
  — reproducible across runs, retries, and engines; sampling
  decisions must never depend on partitioning). w is a length-based
  quality proxy capped at 2.0; both engines evaluate the identical
  double expression, so the comparison is bit-reproducible.
- ``ds_curriculum_order`` — curriculum stages (easy→hard quartiles
  via exact NTILE(4) over a UNIQUE (n_chars, doc_id) ordering —
  unique ordering is what makes ntile deterministic and cross-engine
  stable) with intra-stage order shuffled by identity hash, and a
  global curriculum rank. Round 11: both full-corpus orderings run
  through the DISTRIBUTED global-order helper
  (flume_source_spark/global_order.py — boundary-bucketed two-level
  rank, exact by construction), so no single-partition sort remains;
  the window-form SQL stays as the oracle because the helper is
  bit-identical to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


def _hash_mod(col: F.Column, mod: int) -> F.Column:
    """Identity hash: first 8 hex chars of md5, base-16, mod N —
    portable to DuckDB (see pipeline/dataset.py)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % mod


_HIST_ORACLE = """
    WITH b AS (
        SELECT CAST(n_chars // 200 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    )
    SELECT bucket,
           CAST(bucket * 200 AS BIGINT) AS lo_chars,
           CAST((bucket + 1) * 200 AS BIGINT) AS hi_chars,
           n_docs,
           CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
           CAST(round(sum(n_docs) OVER (ORDER BY bucket)
                      / (SELECT CAST(count(*) AS DOUBLE) FROM documents), 4)
                AS DOUBLE) AS cum_frac
    FROM b ORDER BY bucket
"""


@query("ds_length_histogram", oracle=_HIST_ORACLE, tags=("llm", "dataset", "histogram"))
def ds_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width length histogram + CDF: hash-agg on floor-bucket,
    window only over the O(buckets) aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    total = d.count()  # scalar; at 100 TB reuse the agg below instead
    b = d.groupBy(
        (F.floor(F.col("n_chars") / 200)).cast("long").alias("bucket")
    ).agg(F.count("*").cast("long").alias("n_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.withColumn("lo_chars", (F.col("bucket") * 200).cast("long"))
        .withColumn("hi_chars", ((F.col("bucket") + 1) * 200).cast("long"))
        .withColumn("cum_docs", F.sum("n_docs").over(w).cast("long"))
        .withColumn("cum_frac", F.round(F.col("cum_docs") / F.lit(float(total)), 4))
        .select("bucket", "lo_chars", "hi_chars", "n_docs", "cum_docs", "cum_frac")
        .orderBy("bucket")
    )


_RESAMPLE_ORACLE = """
    WITH w AS (
        SELECT doc_id, source,
               least(2.0, n_chars / 800.0) AS wt,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 10000) / 10000.0 AS u
        FROM documents
    ),
    c AS (
        SELECT doc_id, source,
               CAST(floor(wt) + CASE WHEN wt - floor(wt) > u THEN 1 ELSE 0 END
                    AS BIGINT) AS copies
        FROM w
    )
    SELECT source, copies,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(copies) AS BIGINT) AS emitted_rows
    FROM c GROUP BY source, copies ORDER BY source, copies
"""


@query("ds_importance_resample", oracle=_RESAMPLE_ORACLE, tags=("llm", "dataset", "sampling"))
def ds_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless weighted resampling: copies = floor(w) + Bernoulli
    via the doc's own identity-hash uniform. No RNG, no seed plumbing,
    identical decisions under any partitioning/retry — emit with
    explode(sequence(1, copies)) when materializing."""
    d = load_tables(spark, sf_dir)["documents"]
    w = d.select(
        "doc_id",
        "source",
        F.least(F.lit(2.0), F.col("n_chars") / 800.0).alias("wt"),
        (_hash_mod(F.col("doc_id"), 10000) / 10000.0).alias("u"),
    )
    c = w.select(
        "doc_id",
        "source",
        (
            F.floor("wt")
            + F.when(F.col("wt") - F.floor("wt") > F.col("u"), 1).otherwise(0)
        )
        .cast("long")
        .alias("copies"),
    )
    return (
        c.groupBy("source", "copies")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("copies").cast("long").alias("emitted_rows"),
        )
        .orderBy("source", "copies")
    )


_CURRICULUM_ORACLE = """
    WITH s AS (
        SELECT doc_id, n_chars,
               ntile(4) OVER (ORDER BY n_chars, doc_id) AS stage,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100000 AS h
        FROM documents
    )
    SELECT doc_id, CAST(stage AS INT) AS stage,
           CAST(row_number() OVER (ORDER BY stage, h, doc_id) AS BIGINT)
               AS curriculum_rank
    FROM s ORDER BY curriculum_rank
"""


@query("ds_curriculum_order", oracle=_CURRICULUM_ORACLE, tags=("llm", "dataset", "curriculum"))
def ds_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Easy→hard curriculum: quartile stages (deterministic ntile on a
    unique ordering) + identity-hash shuffle within stage. Round 11:
    both full-corpus windows replaced by the DISTRIBUTED global-order
    helper (module doc's 100 TB formulation, now code): the stage is
    an exact NTILE(4) bucketed on n_chars; the curriculum rank is an
    exact row_number bucketed on the composite ``stage·100000 + h``
    (h < 100000 by construction, so the composite is
    ascending-monotone in (stage, h)). Bit-identical to the unchanged
    window-form oracle."""
    from flume_source_spark.global_order import with_global_ntile, with_global_rank

    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(
        "doc_id",
        "n_chars",
        _hash_mod(F.col("doc_id"), 100000).alias("h"),
    )
    s = with_global_ntile(
        base,
        4,
        [F.col("n_chars"), F.col("doc_id")],
        F.col("n_chars"),
        tile_col="stage",
    )
    ranked = with_global_rank(
        s,
        [F.col("stage"), F.col("h"), F.col("doc_id")],
        F.col("stage").cast("long") * 100000 + F.col("h"),
        rank_col="curriculum_rank",
    )
    return ranked.select("doc_id", "stage", "curriculum_rank").orderBy(
        "curriculum_rank"
    )


_RESERVOIR_ORACLE = """
    WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT) % 100000, doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk, n_chars
    FROM r WHERE rk <= 5 ORDER BY source, rk
"""


@query("ds_reservoir_per_group", oracle=_RESERVOIR_ORACLE, tags=("llm", "dataset", "sampling"))
def ds_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample (reservoir-sampling
    semantics without reservoir state): rank each doc within its
    source by identity hash, keep rank ≤ 5. Because the hash is a
    pure function of doc_id, the selection is uniform-like yet
    reproducible under any partitioning, retry, or engine — the same
    no-RNG contract as ds_split_deterministic, here in k-exact form
    (vs ds_stratified_sample's fraction form). Scale: one window
    partitioned by the stratum key; for heavy strata replace
    row_number with a per-partition top-k (TakeOrdered-shaped)
    pre-reduction — algebraically identical because the hash order
    is total."""
    d = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy(_hash_mod(F.col("doc_id"), 100000), F.col("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "rk", "n_chars")
        .orderBy("source", "rk")
    )


_TEMP_MIX_ORACLE = """
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               sqrt(CAST(n_docs AS DOUBLE)) AS scaled,
               sum(sqrt(CAST(n_docs AS DOUBLE))) OVER () AS z,
               sum(n_docs) OVER () AS total
        FROM c
    )
    SELECT source, n_docs,
           CAST(round(scaled / z, 6) AS DOUBLE) AS weight,
           CAST(round((scaled / z) * total / n_docs, 4) AS DOUBLE) AS dup_factor
    FROM w ORDER BY source
"""


@query("ds_mixture_temperature", oracle=_TEMP_MIX_ORACLE, tags=("llm", "dataset", "mixture"))
def ds_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights computed FROM the corpus
    (vs ds_mixture_weighted's static tiers): w_i ∝ n_i^(1/T) with
    T = 2 — the multilingual-LM flattening that up-weights small
    sources. T = 2 makes the scaling an exact sqrt (IEEE
    correctly-rounded in both engines), so the weights hash-match
    without a pow() portability caveat. dup_factor = w_i·N/n_i is
    the per-source duplication a sampler must apply; feed it to
    ds_importance_resample's copy machinery to materialize. One
    aggregate + one O(|sources|) window — nothing touches row scale."""
    d = load_tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    wall = Window.partitionBy()
    w = c.withColumn("scaled", F.sqrt(F.col("n_docs").cast("double"))).withColumn(
        "z", F.sum("scaled").over(wall)
    ).withColumn("total", F.sum("n_docs").over(wall))
    return w.select(
        "source",
        "n_docs",
        F.round(F.col("scaled") / F.col("z"), 6).alias("weight"),
        F.round((F.col("scaled") / F.col("z")) * F.col("total") / F.col("n_docs"), 4).alias(
            "dup_factor"
        ),
    ).orderBy("source")
