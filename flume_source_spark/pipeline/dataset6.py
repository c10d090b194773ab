"""Dataset-prep wave 6: leakage-safe splitting and hard-negative
mining — two training-pipeline operators that sit directly on top of
the dedup / similarity primitives.

``ds_split_leakage_safe`` — the standard train/test-contamination
bug in LLM data prep is splitting per-DOCUMENT while the corpus holds
duplicates: copies of one text land on both sides and the eval set
measures memorization. The fix is to split per CONTENT GROUP — every
member of a duplicate cluster inherits the split of its group — so a
text can never appear on both sides. This variant groups by exact
content hash (SQL-expressible → driver-hashable); the production
composition swaps the group id for the near-dup connected-component
label (``dedup_cluster_cc_lsh``) with the identical downstream plan.

``sim_hard_negatives`` — contrastive-training data mining: for each
query vector, the top-k most-similar vectors with a DIFFERENT label
(hard negatives: look alike, aren't the same class). Same bounded
architecture as ``sim_cosine_topk`` (broadcast ≤ Q_MAX query rows,
corpus streams, per-query top-k inside the window) — label blocking
cannot apply here because negatives are cross-label by definition,
which is exactly why the query side must be hard-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dataset import TRAIN_PCT, VAL_PCT, split_bucket
from flume_source_spark.pipeline.similarity import (
    _QWHERE_SQL,
    TOP_K,
    _dvec,
    _query_filter,
    cosine,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_LEAKAGE_SPLIT_ORACLE = f"""
    WITH h AS (
        SELECT doc_id, md5(lower(trim(coalesce(text, '')))) AS content_hash
        FROM documents
    ),
    g AS (SELECT content_hash, min(doc_id) AS group_id FROM h GROUP BY content_hash),
    b AS (
        SELECT h.doc_id, g.group_id,
               CAST(('0x' || substr(md5(CAST(g.group_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM h JOIN g ON h.content_hash = g.content_hash
    )
    SELECT doc_id, group_id, bucket,
           CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
"""


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Core group-aware split over a ``(doc_id, text)`` DataFrame —
    factored out so the group-cohesion property can be tested on a
    corpus with PLANTED exact duplicates (the driver fixtures contain
    near-dups only, where exact grouping degenerates to singletons).

    Plan: one shuffle for the group aggregate; the join-back is on
    the same content_hash key, so the exchange is reused (the agg and
    the probe are co-partitioned — same one-shuffle shape as
    ``dedup_exact``). At 100 TB this composes with the LSH cluster
    label instead of the hash with no plan change.

    NULL text coalesces to '' BEFORE hashing (ADVICE r5): md5(NULL)
    is NULL and the inner equi-join never matches NULL keys on either
    engine, so NULL-text docs would silently vanish from the split —
    instead they form one deterministic group and get a side."""
    hashed = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.coalesce(F.col("text"), F.lit(""))))).alias("content_hash"),
    )
    grp = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("group_id"))
    bucket = split_bucket(F.col("group_id"))
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        hashed.join(grp, "content_hash")
        .select("doc_id", "group_id", bucket.alias("bucket"), split.alias("split"))
        .orderBy("doc_id")
    )


@query(
    "ds_split_leakage_safe",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("llm", "dataset", "split", "dedup"),
)
def ds_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware 80/10/10 split: the split bucket is a
    pure function of the GROUP id (min doc_id per exact-content
    cluster), so all copies of one text land on the same side. See
    :func:`leakage_safe_split` for the plan and scale notes."""
    return leakage_safe_split(load_tables(spark, sf_dir)["documents"])


_HARD_NEG_ORACLE = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE {_QWHERE_SQL}),
    scored AS (
        SELECT qid, e.vec_id AS nid, e.label AS nlabel,
               list_dot_product(qv, v) /
                 (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
        FROM q JOIN e ON e.label <> qlabel
    ),
    ranked AS (
        SELECT qid, nid, nlabel, sim,
               row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, nid) AS rn
        FROM scored
    )
    SELECT qid, nid, nlabel, CAST(round(sim, 4) AS DOUBLE) AS sim, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY qid, rn
"""


@query(
    "sim_hard_negatives",
    oracle=_HARD_NEG_ORACLE,
    tags=("llm", "similarity", "training"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cross-label nearest neighbors per bounded query vector —
    hard-negative candidates for contrastive training. Broadcast the
    ≤ Q_MAX query rows; the corpus never shuffles; ranking is tie-free
    cross-engine (round-6dp sim, nid tiebreak), output sims rounded
    4 dp (house float rule)."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", _dvec("embedding").alias("v")
    )
    q = e.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            cosine(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "qid",
            "nid",
            "nlabel",
            F.round("sim", 4).cast("double").alias("sim"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("qid", "rn")
    )


SAMPLE_MOD = 10
SAMPLE_KEEP = 2  # keep buckets {0,1} → a deterministic 20% sample


@query(
    "ds_deterministic_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                % {SAMPLE_MOD} AS BIGINT) AS sample_bucket,
           n_chars
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          % {SAMPLE_MOD} < {SAMPLE_KEEP}
    ORDER BY doc_id
    """,
    tags=("llm", "dataset", "sample"),
)
def ds_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed deterministic sampling — the REPRODUCIBLE
    twin of ``sample_and_introspect``'s seeded Bernoulli (whose RNG
    stream is engine-specific, hence rows-only). The gate is
    md5(doc_id) taken as an integer mod SAMPLE_MOD: every engine, every
    run, every cluster size picks the SAME 20% of documents — the
    property a training pipeline actually needs from a sample (re-run
    the pipeline, get the same training subset; grow the corpus, keep
    every previously sampled doc). md5-first-8-hex is the house
    portable token hash (conv(substr(md5,1,8),16,10) on Spark ==
    CAST('0x'||... AS BIGINT) on DuckDB, both zero-extended 32-bit so
    never negative).

    100 TB shape: the GATE is a pure map-side scan filter — no
    shuffle, no UDF, whole-stage codegen; selectivity is exact
    (SAMPLE_KEEP / SAMPLE_MOD) regardless of data skew because the
    hash is uniform over ids, and it composes with partition pruning
    (the filter prunes rows, the scan still prunes columns). The
    trailing orderBy is presentation/determinism only — a pipeline
    consumer drops it and the whole query is exchange-free."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_MOD
    )
    return (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", bucket.alias("sample_bucket"), "n_chars")
        .where(F.col("sample_bucket") < SAMPLE_KEEP)
        .orderBy("doc_id")
    )
