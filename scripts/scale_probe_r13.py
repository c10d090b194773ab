"""Round-13 probe: degree-ordered wedge orientation for the triangle
census (VERDICT r12 item 3, guide §2.5).

Compares the two wedge-enumeration shapes on a planted hub-skew graph
(the adversarial degree distribution the id-orientation is weakest
on) at 1x and 8x:

- ID-ORIENTED (the pre-r13 production shape): wedges centered at each
  vertex b pair its lower-id neighbors with its higher-id neighbors —
  a hub of degree d contributes ~d^2/4 wedge pairs regardless of
  where it sits in the degree distribution.
- DEGREE-ORIENTED (the r13 production shape, graph2.triangle_census):
  each edge points from its lower-(degree, id) endpoint to the higher
  one; wedges pair only OUT-neighbors, so a hub's contribution is
  out-degree^2 where out-degree counts only its >= -degree neighbors
  — O(sqrt(m)) on any graph.

Both close the wedge against the canonical (i<j) edge list and must
produce the IDENTICAL per-label census (asserted). The metric is the
wedge-join output row count (the quantity that explodes) plus wall.

Usage: python scripts/scale_probe_r13.py [scale]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flume_source_spark.pipeline.graph2 import triangle_census
from flume_source_spark.session import get_session


def planted_hub_edges(spark, n_hubs: int, n_spokes: int, n_clique: int):
    """One label block: n_hubs hubs each adjacent to every spoke (and
    to each other), spokes otherwise only in a sparse ring; plus a
    clique block so triangles exist on both shapes.

    Hub ids sit in the MIDDLE of the spoke id range — the adversarial
    placement for id-orientation: a mid-id hub of degree d owns
    ~(d/2)^2 wedges as the (a < b < c) center, while degree-ordered
    orientation points every hub edge spoke->hub (spokes have lower
    degree) so the hub fans out almost nothing."""
    half = n_spokes // 2
    hub_ids = [half * 10 + k for k in range(n_hubs)]  # mid-range ids
    def spoke_id(s):
        # spokes 0..half-1 below the hubs, the rest far above (offset
        # big enough that no scale's spoke range collides with hub ids)
        return s if s < half else 1_000_000 + s
    rows = []
    for a in range(n_hubs):
        for b in range(a + 1, n_hubs):
            rows.append((hub_ids[a], hub_ids[b], "hub"))
    for s in range(n_spokes):
        for h in hub_ids:
            i, j = sorted((h, spoke_id(s)))
            rows.append((i, j, "hub"))
    for s in range(n_spokes - 1):
        i, j = sorted((spoke_id(s), spoke_id(s + 1)))
        rows.append((i, j, "hub"))
    base = 10_000_000
    for a in range(n_clique):
        for b in range(a + 1, n_clique):
            rows.append((base + a, base + b, "clique"))
    return spark.createDataFrame(rows, "i long, j long, label string")


def id_oriented_census(edges):
    """The pre-r13 two-join i<j<k enumeration (kept here, not in the
    package, purely as the probe baseline)."""
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.select(F.col("i").alias("a"), F.col("j").alias("b"), "label")
    e2 = edges.select(F.col("i").alias("b2"), F.col("j").alias("c"))
    e3 = edges.select(F.col("i").alias("a3"), F.col("j").alias("c3"))
    wedge = e1.join(e2, F.col("b") == F.col("b2"))
    tri = wedge.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    per_label = tri.groupBy("label").agg(F.count("*").alias("n_triangles"))
    return wedge, per_label


def deg_oriented_wedges(edges):
    """The r13 wedge frame (mirrors graph2.triangle_census exactly)."""
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("i").alias("v"))
        .unionAll(edges.select(F.col("j").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    e = edges.join(
        deg.select(F.col("v").alias("i"), F.col("d").alias("di")), "i"
    ).join(deg.select(F.col("v").alias("j"), F.col("d").alias("dj")), "j")
    src_is_i = (F.col("di") < F.col("dj")) | (F.col("di") == F.col("dj"))
    oriented = e.select(
        F.when(src_is_i, F.col("i")).otherwise(F.col("j")).alias("src"),
        F.when(src_is_i, F.col("j")).otherwise(F.col("i")).alias("dst"),
        "label",
    ).localCheckpoint(eager=True)
    o1 = oriented.select("src", F.col("dst").alias("y"), "label")
    o2 = oriented.select(F.col("src").alias("src2"), F.col("dst").alias("z"))
    return o1.join(o2, (F.col("src") == F.col("src2")) & (F.col("y") < F.col("z")))


def main() -> int:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_session(app_name="scale_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, scale) if scale != 1 else (1,):
        n_spokes = 300 * mult
        edges = planted_hub_edges(spark, n_hubs=6, n_spokes=n_spokes, n_clique=12)

        t0 = time.perf_counter()
        wedge_old, census_old = id_oriented_census(edges)
        n_wedge_old = wedge_old.count()
        old_rows = {r["label"]: r["n_triangles"] for r in census_old.collect()}
        t_old = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_wedge_new = deg_oriented_wedges(edges).count()
        new_rows = {
            r["label"]: r["n_triangles"]
            for r in triangle_census(edges).collect()
        }
        t_new = time.perf_counter() - t0

        assert old_rows == new_rows, (old_rows, new_rows)
        print(
            f"mult={mult} spokes={n_spokes}: census identical {old_rows}; "
            f"wedges id-oriented={n_wedge_old} deg-oriented={n_wedge_new} "
            f"({n_wedge_old / max(n_wedge_new, 1):.1f}x fewer); "
            f"wall id={t_old:.2f}s deg={t_new:.2f}s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
