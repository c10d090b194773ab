"""Streaming crawl-ingest pipeline: filemeta stream → Bloom screen →
incremental MinHash-LSH match against a standing signature index.

``StreamingCrawlPipeline`` — the stream-side composition of the
batch ``ds_pipeline_end_to_end`` (VERDICT r8 item 5a): the daily-crawl
loop where every arriving micro-batch of documents is (1) screened
against everything ever seen by segment Bloom (exact-segment
duplicates, NO false negatives), and (2) matched for NEAR-duplicates
against a standing banded-MinHash index, then (3) folded into both
state stores — without ever retaining history TEXT. Per micro-batch:

    1. EPOCH FENCE — redelivered epochs no-op (the ParquetUpsertSink /
       StreamingBloomDedup single-commit-pointer contract).
    2. Bloom screen (reuses ``StreamingBloomDedup``'s machinery:
       ``_segments`` → probe against the PRE-batch filter) → one
       screening row per doc (n_segments, n_flagged, maybe_dup).
    3. LSH match: the batch's 63-component MinHash signatures are
       banded (21 bands × 3 rows — the ``dedup_minhash_lsh`` config)
       and equi-joined against the COMMITTED standing index's bands;
       history-side buckets above ``MAX_BUCKET`` are dropped exactly
       like ``dedup_incremental_lsh``'s corpus cap. Candidates verify
       by SIGNATURE-estimated Jaccard (matching components / 63) ≥
       the house threshold — the stream keeps no shingles to verify
       exactly, BY DESIGN: the index is O(history) × 63 longs, not
       O(history text). Cross-batch semantics: a batch's docs match
       prior history only, never each other (deterministic regardless
       of intra-batch order).
    4. Append the batch's signatures as the index's epoch partition
       (append-only — no index rewrite: at 100 TB the standing index
       only ever gains one bucket-partitioned file per batch), merge
       the batch's segment delta into the Bloom filter, and commit
       {epoch, bloom generation} atomically. A crash before the
       commit leaves the old state live and the epoch unfenced; the
       retry redoes screen+match against the OLD state (idempotent:
       the per-epoch output dirs are overwritten, the bloom bit-OR
       re-merge is a no-op, the index epoch partition is rewritten).

Determinism / batch-twin: the union of all epochs' match rows equals
a single-batch replay that matches every doc against docs of strictly
earlier epochs (pinned by the live test) — which is what makes the
streaming composition verifiable without a streaming oracle.

Reference: this is the Spark-native end of the reference source's
ingest loop (CephFsSource.java:148 channel emit): the reference stops
at emitting file rows; this pipeline is what a 100 TB consumer does
with them next.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flume_source_spark.pipeline.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    N_HASHES,
    ROWS_PER_BAND,
    minhash_signature,
    shingle_col,
)
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


def _sig_bands(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, h0..h62) → (id, band, band_sig) — the dedup._banded
    banding over a stored signature frame."""
    return sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                f"h{band * ROWS_PER_BAND + r}"
                                for r in range(ROWS_PER_BAND)
                            ],
                        )
                    )
                    for band in range(BANDS)
                ]
            )
        ).alias("band", "band_sig"),
    )


def _est_jaccard():
    """Signature-estimated Jaccard between two 63-component minhash
    signatures laid out as ia.h{i} / ib.h{i}: matching components /
    N_HASHES (the standard unbiased MinHash estimator)."""
    hits = sum(
        (F.col(f"a_h{i}") == F.col(f"b_h{i}")).cast("int") for i in range(N_HASHES)
    )
    return hits / F.lit(N_HASHES)


class StreamingCrawlPipeline:
    """foreachBatch sink: Bloom-screen + LSH-match (doc_id, text)
    micro-batches against persistent cross-batch state."""

    def __init__(self, state_path: str, out_path: str):
        self.state_path, self.out_path = state_path, out_path
        self._commit = os.path.join(state_path, "_commit")
        self._index = os.path.join(state_path, "index")
        os.makedirs(self._index, exist_ok=True)
        os.makedirs(os.path.join(out_path, "screen"), exist_ok=True)
        os.makedirs(os.path.join(out_path, "matches"), exist_ok=True)

    # -- commit protocol (single atomic pointer)

    def _read_commit(self) -> dict | None:
        try:
            with open(self._commit) as f:
                return json.loads(f.read())
        except FileNotFoundError:
            return None

    def _fenced_parts(self, root: str, fence: int) -> list[str]:
        parts = [
            p
            for p in os.listdir(root)
            if p.startswith("epoch-")
            and p.split("-", 1)[1].isdecimal()
            and int(p.split("-", 1)[1]) <= fence
        ]
        return [os.path.join(root, p) for p in parts]

    def current_bloom(self, spark) -> DataFrame | None:
        c = self._read_commit()
        if c is None or c.get("bloom_gen") is None:
            return None
        return spark.read.parquet(os.path.join(self.state_path, c["bloom_gen"]))

    def current_index(self, spark) -> DataFrame | None:
        """Committed signature index: epoch partitions ≤ the fence."""
        c = self._read_commit()
        if c is None:
            return None
        parts = self._fenced_parts(self._index, int(c["epoch"]))
        if not parts:
            return None
        return spark.read.parquet(*parts)

    def _fenced_out(self, spark, sub: str) -> DataFrame | None:
        c = self._read_commit()
        if c is None:
            return None
        parts = self._fenced_parts(os.path.join(self.out_path, sub), int(c["epoch"]))
        if not parts:
            return None
        return spark.read.parquet(*parts)

    def screening_output(self, spark) -> DataFrame | None:
        return self._fenced_out(spark, "screen")

    def match_output(self, spark) -> DataFrame | None:
        return self._fenced_out(spark, "matches")

    # -- the sink

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from flume_source_spark.pipeline.dataset4 import (
            _segments,
            bloom_build,
            bloom_probe,
        )

        c = self._read_commit()
        if c is not None and epoch_id <= int(c["epoch"]):
            return  # redelivered epoch → no-op
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")

        # 2. Bloom screen against the PRE-batch filter
        segs = _segments(docs)
        prior_bloom = self.current_bloom(spark)
        if prior_bloom is None:
            flagged = segs.select("doc_id", "seg").limit(0)
        else:
            flagged = bloom_probe(segs, prior_bloom).select("doc_id", "seg")
        screen = (
            segs.groupBy("doc_id")
            .agg(F.count("*").alias("n_segments"))
            .join(
                flagged.groupBy("doc_id").agg(F.count("*").alias("n_flagged")),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                "n_segments",
                F.coalesce("n_flagged", F.lit(0).cast("long")).alias("n_flagged"),
                (F.coalesce("n_flagged", F.lit(0)) > 0).alias("maybe_dup"),
                F.lit(epoch_id).cast("long").alias("epoch"),
            )
        )
        screen.write.mode("overwrite").parquet(
            os.path.join(self.out_path, "screen", f"epoch-{epoch_id}")
        )

        # 3. LSH match: batch signatures vs committed standing index
        sig = minhash_signature(
            docs.select("doc_id", shingle_col(F.col("text")).alias("shingles")),
            "doc_id",
            "shingles",
        ).localCheckpoint(eager=True)  # signatures compute once: match + index append
        index = self.current_index(spark)
        if index is not None:
            b_inc = _sig_bands(sig, "doc_id").select(
                F.col("doc_id").alias("i"), "band", "band_sig"
            )
            b_hist = _sig_bands(index, "doc_id").select(
                F.col("doc_id").alias("j"), "band", "band_sig"
            )
            # history-side bucket cap (the dedup_incremental_lsh
            # corpus-cap discipline: per-bucket work is bounded even
            # when the standing index holds a degenerate hot bucket)
            hist_ok = (
                b_hist.groupBy("band", "band_sig")
                .agg(F.collect_set("j").alias("js"))
                .filter(F.size("js") <= MAX_BUCKET)
            )
            cand = (
                b_inc.join(hist_ok, ["band", "band_sig"])
                .select("i", F.explode("js").alias("j"))
                .distinct()
            )
            a = sig.select(
                F.col("doc_id").alias("i"),
                *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(N_HASHES)],
            )
            b = index.select(
                F.col("doc_id").alias("j"),
                *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(N_HASHES)],
            )
            jac = _est_jaccard()
            matches = (
                cand.join(F.broadcast(a), "i")
                .join(b, "j")
                .select(
                    "i",
                    "j",
                    F.round(jac, 4).cast("double").alias("est_jaccard"),
                    F.lit(epoch_id).cast("long").alias("epoch"),
                )
                .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
            )
        else:
            matches = spark.createDataFrame(
                [], "i long, j long, est_jaccard double, epoch long"
            )
        matches.write.mode("overwrite").parquet(
            os.path.join(self.out_path, "matches", f"epoch-{epoch_id}")
        )

        # 4. append the batch's signatures as this epoch's index
        # partition, merge the bloom delta, commit atomically
        sig.write.mode("overwrite").parquet(
            os.path.join(self._index, f"epoch-{epoch_id}")
        )
        delta = bloom_build(segs.select("seg").distinct())
        merged = (
            delta
            if prior_bloom is None
            else prior_bloom.unionByName(delta)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        gen = f"gen-{epoch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(os.path.join(self.state_path, gen))
        tmp = self._commit + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"bloom_gen": gen, "epoch": epoch_id}))
        os.replace(tmp, self._commit)


def crawl_pipeline_batch_twin(docs_with_epoch: DataFrame) -> DataFrame:
    """Single-batch REPLAY of the stream's match output: every doc
    LSH-matched against docs of strictly EARLIER epochs (same bands,
    same estimator, same threshold, same history-side bucket cap
    applied per-epoch prefix). The live test pins stream == twin —
    the determinism argument that substitutes for a streaming SQL
    oracle."""
    docs = docs_with_epoch.select("doc_id", "text", "epoch")
    sig = minhash_signature(
        docs.select("doc_id", shingle_col(F.col("text")).alias("shingles")),
        "doc_id",
        "shingles",
    ).join(docs.select("doc_id", "epoch"), "doc_id")
    bands = _sig_bands(sig, "doc_id").join(
        sig.select("doc_id", "epoch"), "doc_id"
    )
    b_inc = bands.select(
        F.col("doc_id").alias("i"), F.col("epoch").alias("ei"), "band", "band_sig"
    )
    b_hist = bands.select(
        F.col("doc_id").alias("j"), F.col("epoch").alias("ej"), "band", "band_sig"
    )
    # per-increment-epoch history cap: the bucket the stream saw at
    # epoch e contains only docs of epochs < e
    hist_sets = (
        b_hist.join(
            b_inc.select("ei").distinct(), F.col("ej") < F.col("ei"), "inner"
        )
        .groupBy("ei", "band", "band_sig")
        .agg(F.collect_set("j").alias("js"))
        .filter(F.size("js") <= MAX_BUCKET)
    )
    cand = (
        b_inc.join(hist_sets, ["ei", "band", "band_sig"])
        .select("i", F.col("ei").alias("epoch"), F.explode("js").alias("j"))
        .distinct()
    )
    a = sig.select(
        F.col("doc_id").alias("i"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(N_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("j"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(N_HASHES)],
    )
    jac = _est_jaccard()
    return (
        cand.join(a, "i")
        .join(b, "j")
        .select(
            "i", "j", F.round(jac, 4).cast("double").alias("est_jaccard"), "epoch"
        )
        .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Driver-visible registration of the crawl composition (VERDICT r9
# item 3). The live stream's match output is pinned stream == twin by
# tests/test_streaming_crawl.py; the twin itself is a deterministic
# batch DataFrame, so ITS pair set can be oracled directly. The
# registered projection drops est_jaccard (a 63-component xxhash64
# signature estimate DuckDB cannot reproduce) and claims the PAIR SET:
# on this corpus the signature-estimated threshold admits exactly the
# exact-Jaccard ≥ 0.5 cross-epoch pairs (the same "LSH equals exact
# here" argument as dedup_minhash_lsh / dedup_incremental_lsh, now
# for the estimator too — validated at sf0.001 and sf0.01 before
# registration: 20 / 18 identical pairs). Epochs are a deterministic
# doc_id % 3 split standing in for three daily crawls.
# ---------------------------------------------------------------------------

_CRAWL_TWIN_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
              FROM sh a JOIN sh b ON a.shingle = b.shingle
              WHERE b.doc_id % 3 < a.doc_id % 3
              GROUP BY 1, 2)
    SELECT CAST(i AS BIGINT) AS i,
           CAST(j AS BIGINT) AS j,
           CAST(i % 3 AS BIGINT) AS epoch
    FROM inter
    JOIN sz sa ON i = sa.doc_id
    JOIN sz sb ON j = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    ORDER BY i, j
"""


@query(
    "stream_crawl_matches_twin",
    oracle=_CRAWL_TWIN_ORACLE,
    tags=("streaming", "dedup", "lsh", "batch-twin"),
)
def stream_crawl_matches_twin(spark, sf_dir: str) -> DataFrame:
    """Cross-epoch near-dup pair set of the streaming crawl pipeline's
    batch twin over documents split into three doc_id%3 crawl epochs —
    each pair (i, j): increment doc i LSH-matched a strictly-earlier
    -epoch doc j at signature-estimated Jaccard ≥ the house threshold.
    The live stream produces the SAME rows epoch by epoch
    (tests/test_streaming_crawl.py pins stream == twin); the oracle is
    the exact cross-epoch shingle-Jaccard join."""
    d = load_tables(spark, sf_dir)["documents"]
    docs = d.select(
        "doc_id", "text", (F.col("doc_id") % 3).cast("long").alias("epoch")
    )
    return (
        crawl_pipeline_batch_twin(docs)
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("epoch").cast("long").alias("epoch"),
        )
        .orderBy("i", "j")
    )
