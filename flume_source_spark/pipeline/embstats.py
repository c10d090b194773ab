"""Embedding-column statistics: per-label centroids and cluster
cohesion — the embedding-space health report run before/after any
clustering-based curation (is a label actually a tight cluster, or
noise?).

``emb_centroid_cohesion``: per label, the elementwise-mean centroid
(computed distributively: posexplode → partial avg per (label, dim) —
the same shuffle shape as the IVF Lloyd step in
``pipeline/similarity.py``; NEVER a collect of vectors) and then each
label's mean/min cosine of members to their own centroid.

Scale: two shuffles — (label, dim) partial-avg (map-side combinable,
output = |labels|·dim rows) and the per-label cohesion aggregate. The
centroid table is |labels|·dim ≪ corpus, broadcast back for the
cosine pass; corpus embeddings stream through both passes without
repartitioning. Floats: the cosine is rounded 4 dp and the centroid
components 6 dp on BOTH engines before the cosine, so partial-avg
ordering noise cannot reach the compared digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.pipeline.similarity import _dvec
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

_COHESION_ORACLE = """
    WITH m AS (
        -- DuckDB 1.0: no WITH ORDINALITY / lateral generate_series
        -- over a column, so the unnest is a cross join against the
        -- fixed embedding dim (64), guarded by len()
        SELECT label, g.i - 1 AS dim,
               round(avg(CAST(embedding[g.i] AS DOUBLE)), 6) AS c
        FROM embeddings, generate_series(1, 64) AS g(i)
        WHERE g.i <= len(embedding)
        GROUP BY label, g.i
    ),
    cent AS (
        SELECT label, list(c ORDER BY dim) AS centroid FROM m GROUP BY label
    ),
    cos AS (
        SELECT e.label, e.vec_id,
               list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   c.centroid) AS sim
        FROM embeddings e JOIN cent c ON e.label = c.label
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(round(avg(sim), 4) AS DOUBLE) AS mean_cohesion,
           CAST(round(min(sim), 4) AS DOUBLE) AS min_cohesion
    FROM cos GROUP BY label ORDER BY label
"""


@query("emb_centroid_cohesion", oracle=_COHESION_ORACLE, tags=("llm", "similarity", "embedding"))
def emb_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (distributed elementwise mean) + member→
    centroid cosine cohesion. The oracle recomputes the centroid and
    cosine independently with DuckDB list functions."""
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", _dvec("embedding").alias("v")
    )
    # distributed elementwise mean per label (posexplode → avg)
    cent = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["c"]).alias("centroid"))
    )
    j = e.join(F.broadcast(cent), "label")
    dot = F.aggregate(F.zip_with("v", "centroid", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    nv = F.sqrt(F.aggregate(F.transform("v", lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    nc = F.sqrt(
        F.aggregate(F.transform("centroid", lambda a: a * a), F.lit(0.0), lambda s, x: s + x)
    )
    return (
        j.select("label", (dot / (nv * nc)).alias("sim"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("sim"), 4).cast("double").alias("mean_cohesion"),
            F.round(F.min("sim"), 4).cast("double").alias("min_cohesion"),
        )
        .orderBy("label")
    )


QUANT_BITS = 8

_QUANT_ORACLE = """
    WITH b AS (  -- per-dimension min/max over the corpus (the codebook)
        SELECT g.i AS dim,
               min(CAST(embedding[g.i] AS DOUBLE)) AS lo,
               max(CAST(embedding[g.i] AS DOUBLE)) AS hi
        FROM embeddings, generate_series(1, 64) AS g(i)
        WHERE g.i <= len(embedding)
        GROUP BY g.i
    ),
    codes AS (
        SELECT e.vec_id, b.dim,
               coalesce(CAST(least(255, greatest(0,
                   floor((CAST(e.embedding[b.dim] AS DOUBLE) - b.lo)
                         / nullif(b.hi - b.lo, 0) * 256))) AS BIGINT), 0) AS code
        FROM embeddings e, b
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(code) AS BIGINT) AS code_sum,
           CAST(min(code) AS BIGINT) AS code_min,
           CAST(max(code) AS BIGINT) AS code_max
    FROM codes GROUP BY vec_id ORDER BY vec_id
"""


@query("emb_quantize_int8", oracle=_QUANT_ORACLE, tags=("llm", "similarity", "embedding", "quantization"))
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min-max) int8 quantization of the
    embedding column — the 4× memory cut that makes billion-vector ANN
    fit in RAM: codebook = per-dim (lo, hi) over the corpus (one
    bounded aggregate, dim rows out), code = floor((x-lo)/(hi-lo)·256)
    clamped to [0,255]. Emitted as per-vector code digests (sum/min/
    max) so the hash check pins every code without exploding output.
    The codebook is dims-sized → broadcast back; the corpus never
    shuffles. Quantization arithmetic is identical floor/clamp ops on
    identical doubles on both engines — exact, no rounding gamble."""
    e = load_tables(spark, sf_dir)["embeddings"].select("vec_id", _dvec("embedding").alias("v"))
    dims = e.select("vec_id", F.posexplode("v").alias("dim0", "x")).select(
        "vec_id", (F.col("dim0") + 1).alias("dim"), "x"
    )
    book = dims.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    # coalesce(…, 0) on BOTH sides pins constant-dimension (hi == lo)
    # behavior explicitly: the nullif division yields NULL, and the
    # engines disagree on NULL through least/greatest (Spark's
    # least/greatest skip NULLs; DuckDB 1.0 propagates), so a constant
    # dim maps to code 0 by contract rather than by engine version.
    code = F.coalesce(
        F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor((F.col("x") - F.col("lo")) / F.nullif(F.col("hi") - F.col("lo"), F.lit(0)) * 256),
            ),
        ).cast("long"),
        F.lit(0),
    )
    return (
        dims.join(F.broadcast(book), "dim")
        .select("vec_id", code.alias("code"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_dims"),
            F.sum("code").cast("long").alias("code_sum"),
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
        )
        .orderBy("vec_id")
    )


PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (embeddings are 64-d)
PQ_K = 16  # centroids per subspace codebook (4-bit codes)
PQ_ITERS = 2


def _pq_train(spark: SparkSession, sf_dir: str, iters: int = PQ_ITERS):
    """Train PQ codebooks: returns (embeddings_df, books ndarray of
    shape (M, K, dsub)). Separated from the digest so the ADC search
    query reuses the trained codebooks."""
    import numpy as np
    import pandas as pd

    e = load_tables(spark, sf_dir)["embeddings"]
    # deterministic seed codebooks: PQ_K vectors by hashed-id
    # TakeOrdered (executors each retain PQ_K rows; the driver receives
    # exactly PQ_K rows, never the corpus), sliced per subspace
    seed = (
        e.orderBy(F.xxhash64(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(PQ_K)
        .select("embedding")
        .toPandas()
    )
    mat = np.array([np.asarray(v, dtype=np.float64) for v in seed["embedding"]])
    books = np.stack([mat[:, m * PQ_DSUB : (m + 1) * PQ_DSUB] for m in range(PQ_M)])

    def assign_kernel(bks):
        def kernel(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
                n = len(X)
                codes = np.empty((n, PQ_M), dtype="int64")
                for m in range(PQ_M):
                    S = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                    d2 = ((S[:, None, :] - bks[m][None, :, :]) ** 2).sum(-1)
                    codes[:, m] = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(pdf["vec_id"].to_numpy(), PQ_M),
                        "sub": np.tile(np.arange(PQ_M, dtype="int64"), n),
                        "code": codes.ravel(),
                    }
                )

        return kernel

    # Lloyd per subspace, all subspaces in ONE pass per round:
    # broadcast-assign (mapInPandas, codebooks travel in the closure —
    # M·K·dsub = 1024 doubles), then new centroids = mean per
    # (sub, code, sub-dim) with map-side partial aggregation; only
    # M·K·dsub ≤ 1024 rows return to the driver per round. Empty cells
    # keep their previous centroid. Components round to 6 dp per round
    # so float-sum ordering noise can't flip boundary assignments.
    dims = e.select("vec_id", F.posexplode(_dvec("embedding")).alias("dim", "x")).select(
        "vec_id",
        (F.col("dim") / PQ_DSUB).cast("long").alias("sub"),
        (F.col("dim") % PQ_DSUB).alias("sd"),
        "x",
    )
    for _ in range(iters):
        assigned = e.select("vec_id", "embedding").mapInPandas(
            assign_kernel(books), "vec_id long, sub long, code long"
        )
        rows = (
            dims.join(assigned, ["vec_id", "sub"])
            .groupBy("sub", "code", "sd")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_books = books.copy()
        acc = {}
        for r in rows:
            acc.setdefault((r["sub"], r["code"]), {})[r["sd"]] = r["m"]
        for (s, c), comp in acc.items():
            if len(comp) == PQ_DSUB:
                new_books[s][c] = [comp[d] for d in range(PQ_DSUB)]
        books = np.round(new_books, 6)
    return e, books


def _pq_digest(spark: SparkSession, sf_dir: str, iters: int = PQ_ITERS) -> DataFrame:
    """Per-vector PQ code digests + reconstruction MSE; ``iters``
    exposed so tests can pin that Lloyd training reduces the error
    (iters=0 → raw seed codebooks)."""
    import numpy as np
    import pandas as pd

    e, books = _pq_train(spark, sf_dir, iters)

    def digest_kernel(bks):
        def kernel(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
                n = len(X)
                codes = np.empty((n, PQ_M), dtype="int64")
                err = np.zeros(n, dtype=np.float64)
                for m in range(PQ_M):
                    S = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                    d2 = ((S[:, None, :] - bks[m][None, :, :]) ** 2).sum(-1)
                    codes[:, m] = np.argmin(d2, axis=1)
                    err += d2[np.arange(n), codes[:, m]]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "n_subs": np.full(n, PQ_M, dtype="int64"),
                        "code_sum": codes.sum(1),
                        "code_min": codes.min(1),
                        "code_max": codes.max(1),
                        "recon_mse": np.round(err / (PQ_M * PQ_DSUB), 6),
                    }
                )

        return kernel

    out_schema = "vec_id long, n_subs long, code_sum long, code_min long, code_max long, recon_mse double"
    return (
        e.select("vec_id", "embedding")
        .mapInPandas(digest_kernel(books), out_schema)
        .orderBy("vec_id")
    )


@query(
    "emb_quantize_pq",
    oracle=None,  # iterative k-means training has no closed-form SQL
    # twin; determinism + code range + Lloyd-improves-MSE +
    # beats-single-centroid pinned in tests/test_llm_ops.py
    tags=("llm", "similarity", "embedding", "quantization"),
)
def emb_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each 64-d embedding into M=8
    subvectors, learn a K=16-centroid codebook per subspace
    (distributed Lloyd — the ``sim_ann_ivf`` training shape applied
    per subspace, one assign pass + one bounded mean-aggregation per
    round), emit per-vector code digests + reconstruction MSE. The
    memory story beyond int8 (``emb_quantize_int8``): M·log2(K) =
    32 bits per vector instead of 64×32 — a 64× cut — while keeping
    distance computation table-driven (ADC: per-query M×K lookup
    tables), which is how billion-vector indexes fit in RAM. Corpus
    never collects: codebooks are 1024 doubles in the kernel closure,
    training transfers ≤ M·K·dsub rows per round."""
    return _pq_digest(spark, sf_dir, PQ_ITERS)


PQ_TOP_K = 5
PQ_Q_MAX = 16  # bounded query panel, same policy as sim_cosine_topk's Q_MAX


@query(
    "sim_ann_pq_adc",
    oracle=None,  # approximate by construction; recall vs exact
    # euclidean top-k asserted in tests/test_llm_ops.py
    tags=("llm", "similarity", "ann", "pq"),
)
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes — the
    query side of product quantization, completing the billion-vector
    path: each query precomputes an M×K lookup table of exact
    squared distances from its subvectors to every codebook centroid
    (1024 doubles per query, computed once on the driver), and
    corpus-side distance is then M table lookups per CODE — the
    corpus's raw vectors are never touched at search time, which is
    the whole memory story. Scale shape: the query LUTs ride in the
    mapInPandas closure (Q_MAX·M·K doubles, hard-bounded like
    sim_cosine_topk's query panel), the corpus streams through one
    Arrow pass emitting per-query candidate distances, and a bounded
    (qid × TOP_K) window selects the winners."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    e, books = _pq_train(spark, sf_dir, PQ_ITERS)
    qpdf = (
        e.orderBy(F.xxhash64((F.col("vec_id") + 1).cast("string")), F.col("vec_id"))
        .limit(PQ_Q_MAX)
        .select("vec_id", "embedding")
        .toPandas()
    )
    qids = qpdf["vec_id"].to_numpy()
    Q = np.array([np.asarray(v, dtype=np.float64) for v in qpdf["embedding"]])
    # per-query LUT: luts[q, m, k] = ||Q[q]_sub_m - books[m][k]||²
    luts = np.stack(
        [
            ((Q[:, m * PQ_DSUB : (m + 1) * PQ_DSUB][:, None, :] - books[m][None, :, :]) ** 2).sum(-1)
            for m in range(PQ_M)
        ],
        axis=1,
    )

    def adc_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            n = len(X)
            codes = np.empty((n, PQ_M), dtype="int64")
            for m in range(PQ_M):
                S = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                d2 = ((S[:, None, :] - books[m][None, :, :]) ** 2).sum(-1)
                codes[:, m] = np.argmin(d2, axis=1)
            # dist[q, i] = Σ_m luts[q, m, codes[i, m]]
            dist = np.zeros((len(qids), n), dtype=np.float64)
            for m in range(PQ_M):
                dist += luts[:, m, :][:, codes[:, m]]
            # LOCAL top-k per query within this Arrow batch: the
            # global top-k of a union equals the top-k of the locals,
            # so only k rows per (query, batch) ever reach the global
            # window — without this, the window's |queries| partition
            # keys would each receive the WHOLE corpus at scale
            nids = pdf["vec_id"].to_numpy()
            k = min(PQ_TOP_K + 1, n)  # +1: self-match dropped later
            idx = np.argpartition(dist, k - 1, axis=1)[:, :k]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, k),
                    "nid": nids[idx].ravel(),
                    "adc_dist": np.round(np.take_along_axis(dist, idx, axis=1).ravel(), 6),
                }
            )

    cand = e.select("vec_id", "embedding").mapInPandas(
        adc_kernel, "qid long, nid long, adc_dist double"
    )
    cand = cand.filter(F.col("qid") != F.col("nid"))
    w = W.partitionBy("qid").orderBy("adc_dist", "nid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOP_K)
        .select("qid", "nid", F.col("adc_dist").cast("double"), F.col("rn").cast("long").alias("rn"))
        .orderBy("qid", "rn")
    )
