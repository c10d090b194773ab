"""Quality-aware canonical selection for dedup clusters.

``dedup_keep_best`` — every ``dedup_cluster_cc*`` query elects the
MIN-doc_id member as keeper, which is the right *deterministic* choice
but the wrong *corpus-quality* choice: production dedup pipelines
(e.g. the keep-longest policies in C4/RefinedWeb-style cleanups) keep
the best-quality member of each near-dup cluster — typically the
longest version, because truncated/paywalled/mobile variants are the
duplicates worth dropping. This operator composes the two halves the
engine already has:

    LSH pair graph (``dedup_minhash_lsh``) → connected components
    (``connected_components``) → per-cluster argmax(quality).

keeping per cluster the member with the most tokens (tie → smallest
doc_id), and reporting what the policy drops (member count, dropped
token mass).

Scale design: cluster assignment is the banded+capped LSH closure (see
``pipeline/graph.py``); the election is a single per-component
aggregate of ``max_by(struct(n_tokens, -doc_id))`` — one shuffle on
component_id over (doc_id, component_id, n_tokens) triples, no window
sort needed (max_by is a mergeable aggregate, so it map-side combines;
a row_number window would sort every partition group instead). Token
counts ride along from the docs scan with column pruning (only doc_id
+ text are read).

Oracle: the shared recursive-closure CTE from ``pipeline/graph.py``
(exact Jaccard pair graph — equal to the LSH edge set on this corpus,
the equivalence ``dedup_cluster_cc_lsh`` pins) extended with an
arg-max election, formulated independently as a row_number window so
the two engines agree via different mechanisms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.graph import _CC_CTE, connected_components
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_KEEP_BEST_ORACLE = _CC_CTE + """
    , scored AS (
        SELECT c.doc_id, c.component_id,
               len(str_split(d.text, ' ')) AS n_tokens
        FROM comp c JOIN documents d USING (doc_id)),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY component_id
                                    ORDER BY n_tokens DESC, doc_id) AS rn
          FROM scored)
    SELECT component_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keeper_doc_id,
           CAST(max(CASE WHEN rn = 1 THEN n_tokens END) AS BIGINT) AS keeper_tokens,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS dropped_tokens
    FROM r GROUP BY component_id
    ORDER BY component_id
"""


def keep_best(members: DataFrame) -> DataFrame:
    """Election over (doc_id, component_id, n_tokens): one row per
    component with the argmax(n_tokens, tie → min doc_id) keeper and
    drop accounting. Single mergeable aggregate — no window sort."""
    # max_by on struct(n_tokens, -doc_id): lexicographic struct order
    # makes the max the longest member, ties broken to the SMALLEST
    # doc_id (negation flips the tiebreak direction).
    key = F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id"))
    return (
        members.groupBy("component_id")
        .agg(
            F.count("*").alias("n_members"),
            F.max_by("doc_id", key).alias("keeper_doc_id"),
            F.max("n_tokens").alias("keeper_tokens"),
            (F.count("*") - 1).alias("n_dropped"),
            (F.sum("n_tokens") - F.max("n_tokens")).alias("dropped_tokens"),
        )
        .orderBy("component_id")
    )


@query("dedup_keep_best", oracle=_KEEP_BEST_ORACLE, tags=("llm", "dedup", "graph"))
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: keep the longest member (tie → smallest
    doc_id), report members/keeper/dropped-token accounting."""
    from flume_source_spark.pipeline.dedup import dedup_minhash_lsh, spread

    docs = spread(load_tables(spark, sf_dir)["documents"])
    nodes = docs.select(F.col("doc_id").alias("id"))
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("i").alias("src"), F.col("j").alias("dst"))
    comp = connected_components(nodes, edges)
    members = comp.join(
        docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        ),
        comp["id"] == F.col("doc_id"),
    ).select("doc_id", "component_id", "n_tokens")
    return keep_best(members)
