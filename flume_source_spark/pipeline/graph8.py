"""Graph wave 8 (round 12): bipartite projection — item-item
co-occurrence from the order×part purchase graph, the classic
"bought together" projection every recommender bootstrap starts from
(and, over (document, entity) edges, the co-mention graph a KG
pipeline builds the same way).

Semantics: project the bipartite (order, part) edge set onto parts —
two parts are linked with weight = the number of orders containing
both. Published: the top-20 part pairs by co-occurrence count under
the total (count DESC, p1, p2) order.

Scale design: the projection's hazard is the hub order — an order
with k parts emits C(k, 2) pairs, so pair volume is Σ_o C(k_o, 2).
The standard fix is the hub cap: orders with more than
``COPURCHASE_MAX_BASKET`` distinct parts are EXCLUDED before any
pair work (a giant basket links everything to everything — pure
noise for co-occurrence; same discipline as dedup's MAX_BUCKET and
the winnowing stop-gram cap). TPC-H orders hold ≤ 7 parts so the
fixture loses nothing; at 100 TB the cap bounds pair fan-out at
C(cap, 2) per order. The plan is ONE exchange: groupBy(order) →
collect_set(part) (dedup inside the agg), size-gate, per-row bounded
pair expansion via nested transform (no self-join — the
text_cooccurrence_pmi shape), map-side-combinable pair count, top-20
via orderBy().limit() = TakeOrderedAndProject. The oracle reaches
the same pairs through a DISTINCT + self-join formulation — two
independent constructions, one answer.

Reference parity note: the reference engine (`CephFsSource.java`)
has no graph surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

COPURCHASE_MAX_BASKET = 16
_TOPK = 20

_COPURCHASE_ORACLE = f"""
    WITH po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    kept AS (
        SELECT o FROM po GROUP BY o
        HAVING count(*) BETWEEN 2 AND {COPURCHASE_MAX_BASKET}
    ),
    pairs AS (
        SELECT a.p AS p1, b.p AS p2,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM po a
        JOIN kept USING (o)
        JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    )
    SELECT p1, p2, n_orders FROM pairs
    ORDER BY n_orders DESC, p1, p2
    LIMIT {_TOPK}
"""


def bipartite_copurchase(
    edges: DataFrame, max_basket: int = COPURCHASE_MAX_BASKET, topk: int = _TOPK
) -> DataFrame:
    """Core projection over an (o, p) bipartite edge frame: hub-capped
    per-group pair expansion → co-occurrence counts → top-k. Factored
    so closed-form model tests (a 3-part order emits exactly its 3
    pairs; an over-cap basket emits none; counts add across orders)
    drive the production stages."""
    sets = (
        edges.groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .filter((F.size("ps") >= 2) & (F.size("ps") <= max_basket))
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ps) - 2),"
                " i -> transform(sequence(i + 1, size(ps) - 1),"
                "  j -> struct(ps[i] AS p1, ps[j] AS p2))))"
            )
        ).alias("pr")
    ).select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(topk)
    )


@query(
    "graph_bipartite_copurchase",
    oracle=_COPURCHASE_ORACLE,
    tags=("graph", "recsys"),
)
def graph_bipartite_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs by co-purchase count: the bipartite
    (order, part) graph projected onto parts with the
    ``COPURCHASE_MAX_BASKET`` hub cap — one exchange, per-order
    bounded pair expansion, TakeOrdered top-k."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return bipartite_copurchase(
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
    )
