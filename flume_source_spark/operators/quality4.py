"""Data-quality wave 4: mutual information between two categorical
columns — the information-theoretic association measure next to the
chi²-family effect size (``quality3.dq_cramers_v_sq``). MI answers
"how many nats does knowing the language tell me about the source?"
— the curation question behind stratified mixing: if MI(lang, source)
is high, sampling by source silently skews the language mix (and vice
versa), so mixture weights must be set on the JOINT table.

Reference parity note: the reference engine (``CephFsSource.java``,
``CephFSEventReader.java``) has no analytics surface; this module
belongs to the declared [NS] engine surface (SURVEY.md §2.2).

Exactness/portability: every input to the float arithmetic is an
exact BIGINT count from one hash aggregation; the per-cell term
(o/t)·ln((o·t)/(rn·cn)) is computed in the identical IEEE op order on
both engines (products cast to DOUBLE before the divide — no BIGINT
product overflow at any corpus size), and the only cross-row float
sums run over the CONTINGENCY CELLS (|lang|·|source|, a few dozen),
not the corpus — ~1e-16 relative error against round-6 outputs.
Zero cells contribute exactly 0·ln(·) = 0 to MI, so no lattice fill
is needed (unlike the (0−e)²/e terms of Cramér's V²).

Scale: ONE shuffle on the (r, c) pair to build the cells; marginals
and totals are re-aggregations of the cells frame (cell-count-sized,
broadcast back). Nothing downstream of the first groupBy touches the
corpus. Empty-frame symmetry: every final-stage aggregate is grouped
(GROUP BY t), so an empty input yields an empty result on BOTH
engines (the entity2/quality3 GROUP-BY-guard convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_MI_ORACLE = """
    WITH cells AS (
        SELECT lang AS r, source AS c, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rn FROM cells GROUP BY r),
    cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY c),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS t,
                 CAST(count(*) AS BIGINT) AS n_cells
          FROM cells),
    mi AS (
        SELECT t.t, t.n_cells,
               sum((o / t.t) * ln((CAST(o AS DOUBLE) * t.t)
                                  / (CAST(rn AS DOUBLE) * cn))) AS mi
        FROM cells
        JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN t
        GROUP BY t.t, t.n_cells
    ),
    hr AS (SELECT t.t, sum(-(rn / t.t) * ln(rn / t.t)) AS h
           FROM rm CROSS JOIN t GROUP BY t.t),
    hc AS (SELECT t.t, sum(-(cn / t.t) * ln(cn / t.t)) AS h
           FROM cm CROSS JOIN t GROUP BY t.t)
    SELECT mi.t AS n,
           mi.n_cells,
           CAST(round(mi.mi, 6) AS DOUBLE) AS mi_nats,
           CAST(round(hr.h, 6) AS DOUBLE) AS h_rows,
           CAST(round(hc.h, 6) AS DOUBLE) AS h_cols,
           CASE WHEN hr.h > 0 AND hc.h > 0 THEN
               CAST(round((mi.mi / sqrt(hr.h * hc.h)) * 1000000) AS BIGINT)
           END AS nmi_ppm
    FROM mi JOIN hr ON hr.t = mi.t JOIN hc ON hc.t = mi.t
"""


def mutual_information(cells: DataFrame) -> DataFrame:
    """Core MI fold over an ``(r, c, o)`` contingency frame. Factored
    so closed-form model tests (perfect association → NMI = 10⁶ ppm
    and MI = ln k; exact independence → MI = 0) drive the production
    margin joins and the per-cell arithmetic."""
    # cells is |r|·|c| rows but its lineage is the corpus-wide
    # hash-agg; materialize it ONCE so the four consumers (margins,
    # totals, term join) don't each replay the corpus scan (the
    # static plan duplicates the subtree 4x without this)
    cells = cells.localCheckpoint(eager=True)
    rm = cells.groupBy("r").agg(F.sum("o").cast("long").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").cast("long").alias("cn"))
    t = cells.agg(
        F.sum("o").cast("long").alias("t"),
        F.count("*").cast("long").alias("n_cells"),
    )
    mi = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(t))
        .groupBy("t", "n_cells")
        .agg(
            F.sum(
                (F.col("o") / F.col("t"))
                * F.log(
                    (F.col("o").cast("double") * F.col("t"))
                    / (F.col("rn").cast("double") * F.col("cn"))
                )
            ).alias("mi")
        )
    )
    hr = (
        rm.crossJoin(F.broadcast(t))
        .groupBy("t")
        .agg(
            F.sum(-(F.col("rn") / F.col("t")) * F.log(F.col("rn") / F.col("t"))).alias(
                "h_rows_raw"
            )
        )
    )
    hc = (
        cm.crossJoin(F.broadcast(t))
        .groupBy("t")
        .agg(
            F.sum(-(F.col("cn") / F.col("t")) * F.log(F.col("cn") / F.col("t"))).alias(
                "h_cols_raw"
            )
        )
    )
    return (
        mi.join(hr, "t")
        .join(hc, "t")
        .select(
            F.col("t").alias("n"),
            "n_cells",
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_rows_raw", 6).alias("h_rows"),
            F.round("h_cols_raw", 6).alias("h_cols"),
            F.when(
                (F.col("h_rows_raw") > 0) & (F.col("h_cols_raw") > 0),
                F.round(
                    (F.col("mi") / F.sqrt(F.col("h_rows_raw") * F.col("h_cols_raw")))
                    * 1000000
                ).cast("long"),
            ).alias("nmi_ppm"),
        )
    )


@query(
    "dq_mutual_information",
    oracle=_MI_ORACLE,
    tags=("quality", "stats", "llm", "exact-twin"),
)
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(lang, source) on documents in nats, with both marginal
    entropies and the normalized MI in ppm — one (lang, source)
    hash-agg, then cell-sized arithmetic; one row out."""
    d = load_tables(spark, sf_dir)["documents"]
    cells = d.groupBy(
        F.col("lang").alias("r"), F.col("source").alias("c")
    ).agg(F.count("*").cast("long").alias("o"))
    return mutual_information(cells)
