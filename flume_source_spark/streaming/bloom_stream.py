"""Streaming incremental dedup: a Bloom-screened document stream.

``StreamingBloomDedup`` — the streaming composition of
``ds_bloom_dedup`` (pipeline/dataset4.py): a foreachBatch sink that
screens each micro-batch of documents against everything the stream
has EVER seen, without retaining any history rows — only the bloom
word table (a few thousand (word_idx, word) pairs) persists between
batches. Per micro-batch:

    1. EPOCH FENCE — redelivered epochs no-op (same exactly-once
       contract as ``ParquetUpsertSink``).
    2. segment the batch's documents (SEG-token windows, shared with
       text_line_dedup / ds_bloom_dedup),
    3. PROBE each segment against the PRE-batch filter (cross-batch
       semantics: a batch's docs are screened against prior history,
       not against each other — deterministic regardless of intra-
       batch ordering), emit one screening row per document
       (n_segments, n_flagged, maybe_dup) into an append-only
       per-epoch output directory,
    4. MERGE the batch's own word-table delta into the filter with
       ``bit_or`` (the associative/commutative/idempotent merge
       pipeline/dataset4.py pins) and commit a new filter generation
       via the single-commit-file protocol of ``ParquetUpsertSink``
       — crash before the commit leaves the old filter live and the
       epoch unfenced; the retry redoes probe+merge against the OLD
       filter (idempotent: OR-ing the same bits twice is a no-op).

Guarantees: NO false negatives — a document sharing a segment with
any prior batch is always flagged (bloom property + the fence/merge
ordering). False positives are possible (that is the trade the
operator exists to make); ``maybe_dup`` names the contract honestly.
The downstream exact-verify option of ds_bloom_dedup does not exist
here BY DESIGN: the stream retains no history to verify against —
at 100 TB that is the point (O(filter bits) state instead of
O(history) state; re-screen flagged docs offline against the lake
where exactness matters).

Live-tested in tests/test_streaming_bloom.py: cross-batch duplicate
flagged, unique doc clean, third-batch duplicate of second-batch
content flagged (filter actually accumulates), epoch redelivery
no-ops, restart resumes from the committed filter, and the merged
filter equals a from-scratch build over all seen segments
(mergeability end-to-end).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingBloomDedup:
    """foreachBatch sink: screen (doc_id, text) micro-batches against
    a persistent bloom of all previously seen segments."""

    def __init__(self, state_path: str, out_path: str):
        self.state_path, self.out_path = state_path, out_path
        self._commit = os.path.join(state_path, "_commit")
        os.makedirs(state_path, exist_ok=True)
        os.makedirs(out_path, exist_ok=True)

    # -- commit protocol (single atomic pointer, as ParquetUpsertSink)

    def _read_commit(self) -> dict | None:
        try:
            with open(self._commit) as f:
                return json.loads(f.read())
        except FileNotFoundError:
            return None

    def current_filter(self, spark) -> DataFrame | None:
        c = self._read_commit()
        if c is None:
            return None
        return spark.read.parquet(os.path.join(self.state_path, c["gen"]))

    def screening_output(self, spark) -> DataFrame | None:
        """Only FENCED epochs: the per-epoch output dir is written
        (step 3) before the filter commit (step 4), so a crash between
        the two leaves an epoch-N dir whose filter merge never
        happened. Epochs commit in order, so the committed epoch is
        the fence — dirs beyond it are invisible until their epoch is
        reprocessed and committed (the redelivery check reruns any
        epoch > committed, overwriting the dir)."""
        c = self._read_commit()
        if c is None:
            return None
        fence = int(c["epoch"])
        # guarded parse (ADVICE r5): a stray dir matching the prefix
        # with a non-decimal suffix (e.g. a leftover 'epoch-3.tmp')
        # must be skipped, not crash every subsequent read
        parts = [
            p
            for p in os.listdir(self.out_path)
            if p.startswith("epoch-")
            and p.split("-", 1)[1].isdecimal()
            and int(p.split("-", 1)[1]) <= fence
        ]
        if not parts:
            return None
        return spark.read.parquet(*[os.path.join(self.out_path, p) for p in parts])

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
        segs = _segments(batch_df.select("doc_id", "text"))
        prior = self.current_filter(spark)

        # 3. probe against the PRE-batch filter
        if prior is None:
            flagged = segs.select("doc_id", "seg").limit(0)
        else:
            flagged = bloom_probe(segs, prior).select("doc_id", "seg")
        per_doc = (
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
                F.lit(epoch_id).alias("epoch"),
            )
        )
        per_doc.write.mode("overwrite").parquet(
            os.path.join(self.out_path, f"epoch-{epoch_id}")
        )

        # 4. merge the batch delta into the filter, commit atomically
        delta = bloom_build(segs.select("seg").distinct())
        merged = delta if prior is None else (
            prior.unionByName(delta)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        gen = f"gen-{epoch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(os.path.join(self.state_path, gen))
        tmp = self._commit + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"gen": gen, "epoch": epoch_id}))
        os.replace(tmp, self._commit)
