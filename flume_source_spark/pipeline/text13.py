"""Text analysis wave 13 (round 9, session 3): compressibility gate.

``text_compression_ratio`` — per-source distribution of the zlib
compression ratio of document text: ratio_ppm = compressed_bytes *
1e6 div utf8_bytes. The classic cheap junk detector in LLM data
curation (used alongside the Gopher rules): highly repetitive
machine-generated text compresses far below prose (< ~30%), while
random/encrypted blobs refuse to compress (> ~90%); both tails are
quality-filter candidates that token-level heuristics
(text_repetition_filter, text_dup_ngram_fraction) can miss because
zlib sees BYTE-level structure, not token boundaries.

Tier/arithmetic: the compressor is a deterministic C routine, so this
is the legitimate pandas-UDF tier (Arrow-batched, one call per batch,
zero per-row python in the driver plan) — the quality-gate analogue
of the BPE trainer's python-kernel precedent. Per-document output is
an exact integer ppm (zlib with a FIXED level and strategy is
bit-deterministic for a given input on a given build, and the driver
compares Spark against Spark-recomputed pins, not across compressor
builds); all cross-row math is integer counts/sums.

Oracle status: rows-only by construction — DuckDB ships no zlib
surface, so no SQL oracle can exist (the BPE-trainer policy). The pin
is exact and total: the test recomputes every document's ratio with
the same stdlib zlib IN PROCESS and matches the Spark output
bit-for-bit at sf0.001 (tests/test_round9c_ops.py).

Scale: one corpus scan through an Arrow-batched kernel (CPU-bound,
embarrassingly parallel — zlib level 6 compresses ~100 MB/s/core, so
100 TB is ~300 core-hours, a small fraction of any dedup pass), then
one map-side-combinable fold onto per-source counters.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

ZLIB_LEVEL = 6
LOW_PPM = 300_000   # below: repetitive/templated tail
HIGH_PPM = 900_000  # above: incompressible (binary/garbled) tail


def _zlib_ratio_udf():
    """Build the Arrow-batched kernel lazily (house rule,
    functions/udfs.py:51): decorating at module import would resolve
    the return type through the active SparkContext, which does not
    exist at registry-import time (pytest collection, driver import)."""

    @F.pandas_udf(LongType())
    def _zlib_ratio_ppm(text: pd.Series) -> pd.Series:
        """ratio_ppm = compressed_len * 1e6 // utf8_len per document.
        Empty/NULL text maps to -1 (flagged, excluded from aggregates
        on both the Spark side and the pin recompute)."""
        import zlib

        def one(t):
            if t is None:
                return -1
            b = t.encode("utf-8")
            if not b:
                return -1
            return len(zlib.compress(b, ZLIB_LEVEL)) * 1_000_000 // len(b)

        return text.map(one)

    return _zlib_ratio_ppm


def compression_ratio_ppm(t):
    """Python reference for the kernel — the test pin recomputes every
    fixture document through THIS function and matches the registered
    query's output exactly."""
    import zlib

    if t is None:
        return -1
    b = t.encode("utf-8")
    if not b:
        return -1
    return len(zlib.compress(b, ZLIB_LEVEL)) * 1_000_000 // len(b)


def compression_profile(docs: DataFrame) -> DataFrame:
    """Core per-source fold over a (doc_id, source, text) frame:
    document count, mean ratio (integral div), min/max, and the two
    quality-tail counts."""
    scored = docs.select(
        "source", _zlib_ratio_udf()(F.col("text")).alias("ratio_ppm")
    ).filter(F.col("ratio_ppm") >= 0)
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("CAST(sum(ratio_ppm) div count(*) AS BIGINT)").alias(
                "avg_ratio_ppm"
            ),
            F.min("ratio_ppm").cast("long").alias("min_ratio_ppm"),
            F.max("ratio_ppm").cast("long").alias("max_ratio_ppm"),
            F.sum(F.when(F.col("ratio_ppm") < LOW_PPM, 1).otherwise(0))
            .cast("long")
            .alias("n_repetitive"),
            F.sum(F.when(F.col("ratio_ppm") > HIGH_PPM, 1).otherwise(0))
            .cast("long")
            .alias("n_incompressible"),
        )
        .orderBy("source")
    )


@query("text_compression_ratio", oracle=None, tags=("llm", "text", "quality", "udf"))
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source zlib compressibility profile of document text —
    count, mean/min/max ratio in ppm, and the repetitive (<30%) and
    incompressible (>90%) tail counts. The byte-level junk detector
    token heuristics miss. Rows-only by construction (no zlib in SQL);
    pinned bit-for-bit against an in-process python recompute."""
    d = load_tables(spark, sf_dir)["documents"]
    return compression_profile(d.select("doc_id", "source", "text"))
