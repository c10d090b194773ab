"""Geo wave 2 (round 12): radius-bounded k-NN join — the k = 3
generalization of ``geo_nearest_neighbor`` (operators/geo.py),
completing the spatial family: radius self-join, 1-NN, k-NN,
density raster, point-in-polygon.

Semantics: for every point, its up-to-3 nearest neighbors within
``GRID_JOIN_RADIUS`` (500 cd — the non-empty fixture radius), ranked
by (squared distance, neighbor id) so ties are deterministic on both
engines. Points with fewer than 3 in-radius neighbors emit fewer
rows; points with none are absent (the bounded-search contract of
the 1-NN query — an unbounded k-NN needs expanding-ring search).

Scale design: candidates come from the SAME 3×3 grid-blocked
equi-join as geo_grid_join (bounded 9× replication, hash shuffle on
cell id — never a cartesian); the per-point rank window partitions
by the point id over its in-radius candidate list (radius-bounded
fan-in, the window frame a dedup pipeline's blocking step also
produces). Integer squared distances end-to-end; the reported
distance floor(sqrt) is IEEE-exact.

Reference parity note: the reference engine (`CephFsSource.java`)
has no spatial surface; this operator belongs to the declared [NS]
engine surface (SURVEY.md §2.2, geo family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.operators.geo import (
    _COORDS_SQL,
    GRID_JOIN_RADIUS,
    _points,
    grid_pairs,
)
from flume_source_spark.registry import query

KNN_K = 3

_KNN_ORACLE = f"""
    WITH pts AS ({_COORDS_SQL}),
    pairs AS (
        SELECT a.id AS i, b.id AS j,
               (a.lat_cd - b.lat_cd) * (a.lat_cd - b.lat_cd)
             + (a.lon_cd - b.lon_cd) * (a.lon_cd - b.lon_cd) AS d2
        FROM pts a JOIN pts b ON a.id <> b.id),
    inr AS (SELECT * FROM pairs WHERE d2 <= {GRID_JOIN_RADIUS ** 2}),
    r AS (SELECT i, j, d2,
                 row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rn
          FROM inr)
    SELECT i, CAST(rn AS BIGINT) AS rk, j AS nn_id,
           CAST(d2 AS BIGINT) AS d2,
           CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT) AS dist_cd
    FROM r WHERE rn <= {KNN_K}
    ORDER BY i, rk
"""


def knn_from_pairs(pairs: DataFrame, k: int = KNN_K) -> DataFrame:
    """Per-point k nearest neighbors from an (i < j, d2) pair frame:
    symmetrize, rank by (d2, j) within each point, keep rank ≤ k.
    Factored so the brute-force equivalence test at the non-empty
    radius drives the production window."""
    from pyspark.sql import Window

    both = pairs.union(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "d2")
    )
    w = Window.partitionBy("i").orderBy("d2", "j")
    return (
        both.select(
            "i",
            "j",
            "d2",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= k)
        .select(
            "i",
            "rk",
            F.col("j").alias("nn_id"),
            "d2",
            F.floor(F.sqrt(F.col("d2").cast("double")))
            .cast("long")
            .alias("dist_cd"),
        )
        .orderBy("i", "rk")
    )


@query("geo_knn_join", oracle=_KNN_ORACLE, tags=("geo", "join"))
def geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up-to-3 nearest neighbors per point within 500 cd, ranked by
    (distance, id), from the grid-blocked candidate pairs — the
    spatial blocking step a store-coverage or duplicate-site review
    reads (oracle: independent quadratic formulation)."""
    return knn_from_pairs(
        grid_pairs(_points(spark, sf_dir), radius=GRID_JOIN_RADIUS)
    )
