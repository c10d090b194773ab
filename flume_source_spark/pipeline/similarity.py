"""Similarity search over embedding columns.

Three tiers, mirroring how ANN actually ships at scale:

1. ``sim_cosine_topk`` — brute-force cosine top-k as JVM column
   expressions (zip_with/aggregate). Exact; O(Q·N). The baseline and
   the oracle-checked truth.
2. ``sim_ann_lsh`` — random-hyperplane LSH: 16-bit signatures via
   fixed (seeded at import, no runtime RNG) hyperplanes, candidates =
   same-bucket, exact re-rank within bucket. Sub-linear candidate set;
   recall measured against tier 1 in tests. The 100 TB path: bucket is
   a join key, so candidate generation is a shuffle, not a scan.
3. ``sim_cosine_arrow`` — the same brute force through mapInArrow +
   numpy matmul (Arrow-vectorized Python), the pattern for when
   similarity needs BLAS or a real model; verified equal to tier 1.

All cosines computed double-precision as dot/(|a|·|b|) with identical
operation order in the DuckDB oracle (list_dot_product + sqrt), so
values hash-match after rounding.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

TOP_K = 5
QUERY_MOD = 100  # vec_id % QUERY_MOD == 0 → query vectors
# The query workload is a BOUNDED set, never a fraction of the corpus:
# at most Q_MAX query vectors regardless of N. This is what makes the
# broadcast/closure-capture of the query side legitimate at 100 TB —
# the driver only ever materializes ≤ Q_MAX rows. (A %-of-corpus query
# set would grow linearly with N and sink any broadcast plan.)
Q_MAX = 64


def _query_filter():
    return (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_MOD * Q_MAX)


_QWHERE_SQL = f"vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_MOD * Q_MAX}"

# multi-table random-hyperplane LSH: L tables × r bits. Few bits per
# table + union over tables trades candidate-set size for recall —
# required when vectors are weakly clustered (single long signatures
# collide never; see test_ann_lsh_recall_vs_bruteforce).
LSH_TABLES = 8
LSH_BITS = 5
EMB_DIM = 64
_rng = random.Random(7)
# fixed gaussian hyperplanes (Box-Muller from seeded PRNG at import)
HYPERPLANES = [
    [
        [
            math.sqrt(-2.0 * math.log(_rng.random() or 1e-12)) * math.cos(2.0 * math.pi * _rng.random())
            for _ in range(EMB_DIM)
        ]
        for _ in range(LSH_BITS)
    ]
    for _ in range(LSH_TABLES)
]


def ceil_sqrt(n: int) -> int:
    """⌈√n⌉ for n ≥ 1 (n ≤ 0 → 1): the shared adaptive-nlist term —
    semdedup's cluster count and the k-NN graph's cell count both
    track √N through this one definition (review finding: the isqrt
    idiom was previously duplicated per module)."""
    return math.isqrt(max(n, 1) - 1) + 1


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b):
    """dot/(|a|·|b|), double precision, left-fold accumulation — the
    exact op order the DuckDB oracle mirrors."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_COSINE_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE {_QWHERE_SQL}),
    scored AS (
        SELECT qid, e.vec_id AS nid,
               list_dot_product(qv, v) /
                 (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
        FROM q JOIN e ON e.vec_id <> qid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, nid) AS rn
        FROM scored
    )
    SELECT qid, nid, CAST(round(sim, 4) AS DOUBLE) AS sim, rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY qid, rn
"""


@query("sim_cosine_topk", oracle=_COSINE_TOPK_ORACLE, tags=("llm", "similarity"))
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: query rows × all rows, ranked per
    query. The crossJoin explicitly broadcasts the (small) query side
    so candidates never shuffle. The query side is HARD-BOUNDED at
    Q_MAX rows by _query_filter() — not a fraction of the corpus — so
    the broadcast stays driver-small by contract while N streams
    through executors."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", _dvec("embedding").alias("v"))
    q = e.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"), cosine(F.col("qv"), F.col("v")).alias("sim"))
    )
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "nid", F.round("sim", 4).cast("double").alias("sim"), F.col("rn").cast("long").alias("rn"))
        .orderBy("qid", "rn")
    )


@query(
    "sim_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS i, b.vec_id AS j, a.label,
           CAST(round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS DOUBLE) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    ORDER BY i, j
    """,
    tags=("llm", "similarity", "dedup"),
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with label blocking — the
    blocked-self-join shape: at 100 TB the block key bounds the
    quadratic term exactly like LSH buckets do."""
    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "label", _dvec("embedding").alias("v"))
    a = e.select(F.col("vec_id").alias("i"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("label").alias("label_b"), F.col("v").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("i") < F.col("j")))
        .withColumn("sim_raw", sim)
        .filter(F.col("sim_raw") >= 0.35)
        .select("i", "j", "label", F.round("sim_raw", 4).cast("double").alias("sim"))
        .orderBy("i", "j")
    )


@query(
    "sim_ann_lsh",
    oracle=None,  # approximate by construction; recall vs sim_cosine_topk
    # is asserted in tests/test_llm_ops.py
    tags=("llm", "similarity", "ann"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 8 tables × 5-bit
    bucket signatures; a vector pair is a candidate if it collides in
    ANY table; exact cosine re-rank over the candidate union.
    Candidate generation is an equi-join on (table, bucket) — a
    shuffle, not an O(N²) scan — and the explode factor is the fixed
    table count, not data-dependent."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", _dvec("embedding").alias("v"))
    table_sigs = []
    for t, planes in enumerate(HYPERPLANES):
        sig = F.lit(0)
        for i, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            sig = sig + F.when(_dot(F.col("v"), lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        table_sigs.append(sig.cast("int"))
    e = e.select("vec_id", "v", F.posexplode(F.array(*table_sigs)).alias("tbl", "bucket"))
    q = e.filter(_query_filter()).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("tbl").alias("qtbl"), F.col("bucket").alias("qbucket"),
    )
    cand = (
        e.join(
            F.broadcast(q),
            (F.col("tbl") == F.col("qtbl")) & (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", F.col("vec_id").alias("nid"), F.col("qv"), F.col("v"))
        .dropDuplicates(["qid", "nid"])  # collided in ≥1 table → one candidate
        .select("qid", "nid", cosine(F.col("qv"), F.col("v")).alias("sim"))
    )
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "nid", F.round("sim", 4).cast("double").alias("sim"), F.col("rn").cast("long").alias("rn"))
        .orderBy("qid", "rn")
    )


def assign_nearest(e: DataFrame, c_mat, k: int) -> DataFrame:
    """(vec_id, cluster) rows assigning each embedding to its k nearest
    centroids by cosine (spherical k-means assignment) — one
    mapInPandas pass with the ≤ nlist×dim centroid matrix captured in
    the kernel closure (broadcast-sized, never the corpus). Stable
    argsort so equal-similarity ties break identically across runs."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m_n @ c_mat.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                    "cluster": order.ravel().astype("int64"),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(kernel, "vec_id long, cluster long")


def train_spherical_kmeans(e: DataFrame, nlist: int = 16, iters: int = 2):
    """Distributed spherical k-means — the IVF coarse quantizer, shared
    with SemDeDup (``ds_semdedup``). Deterministic seeds: the nlist
    vectors whose hashed ids sort lowest (uniform for ANY id
    distribution; TakeOrderedAndProject, so executors each retain nlist
    rows and the driver receives exactly nlist). Per Lloyd round: ONE
    fused assign-and-partial-sum pass (the kernel emits ≤ nlist
    (cluster, Σvec, n) rows per partition) + a distributed zip_with
    fold over the partials; only the nlist refined centroids return to
    the driver. Components rounded 6 dp per round so
    float-sum ordering noise cannot flip boundary assignments, then
    re-normalized so the returned matrix is exactly unit-norm (dot
    consumers like SemDeDup's centroid_sim read it as a cosine).
    Returns the unit-norm centroid matrix (nlist × dim float64)."""
    import numpy as np

    cpdf = (
        e.orderBy(F.xxhash64(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(nlist)
        .select("vec_id", "embedding")
        .toPandas()
    )
    c_mat = np.array([np.asarray(v, dtype=np.float64) for v in cpdf["embedding"]])
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    dim = c_mat.shape[1]
    for _ in range(iters):
        # FUSED Lloyd round (round-7 latency fix): the assignment pass
        # also emits per-partition partial sums — (cluster, Σvec, n),
        # ≤ nlist rows per partition — instead of joining a separate
        # assignment frame back against the corpus. The old shape
        # (assign → shuffle-join on vec_id → posexplode → two-stage
        # agg over N·dim rows) cost two corpus exchanges + sorts per
        # round; this one costs the single Python pass it already paid
        # for assignment plus one nlist×partitions-row exchange. The
        # driver still receives only the ≤ nlist reduced centroids:
        # the elementwise partial reduce (zip_with fold) is
        # distributed, NOT a driver concat — at 1000 executors the
        # partials exchange is nlist×partitions rows, never corpus-
        # or driver-sized. Assignment ties break exactly like
        # assign_nearest (argmax = first index at the max = stable
        # argsort head), so the trained matrix is unchanged in
        # semantics; only float-sum ORDER differs, which the 6-dp
        # round below absorbs by design.
        cm = c_mat  # bind per round for the kernel closure

        def partials_kernel(batches, _c=cm):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
                cl = np.argmax(m_n @ _c.T, axis=1)
                sums = np.zeros((_c.shape[0], _c.shape[1]))
                np.add.at(sums, cl, m)
                counts = np.bincount(cl, minlength=_c.shape[0])
                live = np.flatnonzero(counts)
                yield pd.DataFrame(
                    {
                        "cluster": live.astype("int64"),
                        "s": [sums[i].tolist() for i in live],
                        "n": counts[live].astype("int64"),
                    }
                )

        means = (
            e.select("embedding")
            .mapInPandas(partials_kernel, "cluster long, s array<double>, n long")
            .groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("s"),
                    F.array_repeat(F.lit(0.0), dim),
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("sum_vec"),
                F.sum("n").alias("n"),
            )
            .collect()  # ≤ nlist rows — the only driver transfer per round
        )
        new_c = c_mat.copy()
        for r in means:
            v = np.asarray(r["sum_vec"], dtype=np.float64) / r["n"]
            n = np.linalg.norm(v)
            if n > 0:
                new_c[r["cluster"]] = v / n
        # round 6 dp to absorb distributed float-sum ordering noise,
        # then RE-normalize: rounding alone leaves |c| off unity by up
        # to ~1e-6·√dim, which would make a dot(v̂, c) consumer (e.g.
        # SemDeDup's centroid_sim) deviate from the documented
        # assignment-cosine semantics at 4-dp boundaries. The renorm
        # is deterministic (driver-side numpy on the already-canonical
        # rounded components), so round-to-round stability is kept.
        c_mat = np.round(new_c, 6)
        norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        c_mat = c_mat / norms
    return c_mat


@query(
    "sim_ann_ivf",
    oracle=None,  # approximate by construction; recall vs sim_cosine_topk
    # asserted in tests/test_llm_ops.py
    tags=("llm", "similarity", "ann", "ivf"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (deterministic seed sample +
    distributed Lloyd refinement) partitions the corpus into inverted
    lists; each query probes its nprobe nearest lists and exact-reranks
    only those vectors. Complements sim_ann_lsh: IVF adapts to the
    data distribution (centroids are trained on the corpus), LSH is
    data-independent.

    Scale shape: assignment is one broadcast(centroids)-vs-corpus pass;
    search is an equi-join on cluster id — candidates ≈ nprobe/nlist of
    the corpus per query instead of all of it. Centroid selection is
    fully distributed and id-distribution-agnostic: hash-order the ids
    and TakeOrdered the lowest NLIST, so executors each retain NLIST
    rows and only those ≤ NLIST centroid rows ever reach the driver —
    never the id list of the corpus. Each Lloyd round is ONE fused
    assign-and-partial-sum pass (the kernel emits ≤ NLIST
    (cluster, Σvec, n) rows per partition) followed by a distributed
    zip_with fold over those partials — no corpus join, no posexplode;
    only the NLIST refined centroids return to the driver per round.
    Centroid components are rounded (6 dp) after every round so
    float-sum ordering noise cannot flip boundary assignments between
    runs. Training/assignment live in :func:`train_spherical_kmeans` /
    :func:`assign_nearest` (shared with ``ds_semdedup``)."""
    from pyspark.sql import Window as W

    NLIST, NPROBE, KMEANS_ITERS = 16, 4, 2
    e = load_tables(spark, sf_dir)["embeddings"]
    # deterministic coarse quantizer: the NLIST vectors whose hashed
    # ids sort lowest — a uniform deterministic sample for ANY id
    # distribution (a modulus filter can return zero rows when ids are
    c_mat = train_spherical_kmeans(e, NLIST, KMEANS_ITERS)
    corpus_assign = assign_nearest(e, c_mat, 1)
    query_assign = assign_nearest(e.filter(_query_filter()), c_mat, NPROBE).select(
        F.col("vec_id").alias("qid"), "cluster"
    )
    ev = e.select("vec_id", _dvec("embedding").alias("v"))
    cand = (
        corpus_assign.join(F.broadcast(query_assign), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .dropDuplicates(["qid", "vec_id"])
        .join(ev, "vec_id")
        .join(ev.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")), "qid")
        .select("qid", F.col("vec_id").alias("nid"), cosine(F.col("qv"), F.col("v")).alias("sim"))
    )
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "nid", F.round("sim", 4).cast("double").alias("sim"), F.col("rn").cast("long").alias("rn"))
        .orderBy("qid", "rn")
    )


@query("sim_cosine_arrow", oracle=_COSINE_TOPK_ORACLE, tags=("llm", "similarity", "arrow"))
def sim_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-k as sim_cosine_topk but scored in numpy via
    mapInPandas (Arrow batches): the pattern for BLAS/model-based
    scoring. The query matrix is a closure capture of the HARD-BOUNDED
    query set (≤ Q_MAX rows by _query_filter()) — the toPandas() pulls
    at most Q_MAX rows regardless of corpus size, so the per-task
    closure is O(Q_MAX·dim), not O(N). Scores stream out per Arrow
    batch and the final top-k stays in Spark. Oracle-checked against
    the same truth as the expression version."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    e = load_tables(spark, sf_dir)["embeddings"]
    qpdf = e.filter(_query_filter()).select("vec_id", "embedding").toPandas()
    q_ids = qpdf["vec_id"].to_numpy()
    q_mat = np.array([np.asarray(v, dtype=np.float64) for v in qpdf["embedding"]])
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def score(batches):
        for pdf in batches:
            n_mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(n_mat) == 0:
                continue
            n_norm = np.sqrt((n_mat * n_mat).sum(axis=1))
            sims = (n_mat @ q_mat.T) / np.outer(n_norm, q_norm)
            nid = pdf["vec_id"].to_numpy()
            out = pd.DataFrame(
                {
                    "qid": np.repeat(q_ids, len(nid)),
                    "nid": np.tile(nid, len(q_ids)),
                    "sim": sims.T.ravel(),
                }
            )
            yield out[out.qid != out.nid]

    scored = e.select("vec_id", "embedding").mapInPandas(score, "qid long, nid long, sim double")
    w = W.partitionBy("qid").orderBy(F.round("sim", 6).desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "nid", F.round("sim", 4).cast("double").alias("sim"), F.col("rn").cast("long").alias("rn"))
        .orderBy("qid", "rn")
    )
