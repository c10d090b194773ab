"""Multimodal column plumbing: opaque binary payloads with typed
metadata, Arrow-batched decode/feature-extract, frame sampling.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (`_fake_decode`) — the Spark-side
contract (binary column + schema'd mapInPandas + batch shapes +
partitioning) is real and tested; swapping in PIL/ffmpeg changes one
function body, not the plan.

Real binary ingestion exists too: ``multimodal_binaryfile`` reads the
sf_dir through Spark's built-in binaryFile source (content + metadata
columns), the exact shape used to load image/audio shards at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables


@query(
    "multimodal_binary_meta",
    oracle="""
    WITH b AS (SELECT doc_id, lang, text, encode(text) AS payload FROM documents)
    SELECT doc_id, lang,
           octet_length(payload) AS n_bytes,
           sha256(text) AS payload_sha256,
           substring(upper(hex(payload)), 1, 8) AS magic_hex,
           CASE WHEN octet_length(payload) > 300 THEN 'large' ELSE 'small' END AS size_class
    FROM b
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata projection — hashing, sizing and
    magic-byte sniffing as pure JVM expressions over a binary column
    (text bytes stand in for image bytes; the ops are type-generic)."""
    d = load_tables(spark, sf_dir)["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        d.select("doc_id", "lang", payload.alias("payload"))
        .select(
            "doc_id",
            "lang",
            F.length("payload").cast("bigint").alias("n_bytes"),
            F.sha2("payload", 256).alias("payload_sha256"),
            F.upper(F.hex(F.expr("substring(payload, 1, 4)"))).alias("magic_hex"),
            F.when(F.length("payload") > 300, "large").otherwise("small").alias("size_class"),
        )
        .orderBy("doc_id")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decode kernel — deterministic fake in place of a real
    image decoder (no codecs in this container). Returns
    (width, height, channels) derived from the bytes. Swap body with
    e.g. PIL.Image.open(io.BytesIO(payload)).size for real decoding.

    channels keys off the first CHARACTER's code point (not the first
    UTF-8 byte) so the SQL oracle's ascii(substring(text,1,1)) agrees
    for non-ASCII leading characters too."""
    n = len(payload)
    first_cp = ord(payload.decode("utf-8", errors="replace")[0]) if n else 0
    return (1 + n % 64, 1 + (n // 64) % 64, 1 + first_cp % 4 if n else 1)


@query(
    "multimodal_decode",
    oracle="""
    WITH b AS (SELECT doc_id, text, encode(text) AS payload FROM documents)
    SELECT doc_id,
           1 + octet_length(payload) % 64 AS width,
           1 + (octet_length(payload) // 64) % 64 AS height,
           CAST(1 + ascii(substring(text, 1, 1)) % 4 AS BIGINT) AS channels,
           (1 + octet_length(payload) % 64) * (1 + (octet_length(payload) // 64) % 64) AS n_pixels
    FROM b
    ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via mapInPandas: binary in, typed features
    out. The oracle recomputes the deterministic fake kernel in SQL —
    so what's verified is precisely the Python/Arrow plumbing (batch
    iteration, binary round-trip, schema, row alignment)."""
    import pandas as pd

    d = load_tables(spark, sf_dir)["documents"]
    binary = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def decode(batches):
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "n_pixels": [f[0] * f[1] for f in feats],
                }
            )

    return (
        binary.mapInPandas(decode, "doc_id long, width long, height long, channels long, n_pixels long")
        .orderBy("doc_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (SELECT doc_id, 1 + (n_chars % 10) AS n_frames FROM documents WHERE doc_id % 25 = 3)
    SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1)) AS frame_idx
    FROM v
    ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal", "udtf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per sampled frame via
    posexplode(sequence(...)) — the one-to-many UDTF shape for video;
    a real sampler replaces the synthetic frame count with decoder
    metadata, the expansion plan is identical."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 25 == 3)
    v = d.select("doc_id", (1 + F.col("n_chars") % 10).cast("bigint").alias("n_frames"))
    return (
        v.select("doc_id", "n_frames", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "multimodal_binaryfile",
    oracle=None,  # file sizes/paths are environment state DuckDB can't
    # observe; sanity (≥10 files, parquet magic "PAR1") checked in tests
    tags=("llm", "multimodal", "source"),
)
def multimodal_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real binary ingestion: Spark's binaryFile source over the
    sf_dir — path/length metadata + raw content, the load shape for
    image/audio shards (content capped via magic-bytes projection so
    the result stays metadata-sized)."""
    return (
        spark.read.format("binaryFile")
        .load(f"{sf_dir}/*.parquet")
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.hex(F.expr("substring(content, 1, 4)")).alias("magic_hex"),
        )
        .orderBy("file_name")
    )


@query(
    "multimodal_content_dedup",
    oracle="""
    WITH b AS (
        SELECT doc_id, text, encode(text) AS payload FROM documents
    ),
    sig AS (
        SELECT doc_id,
               sha256(text) AS payload_sha256,
               1 + octet_length(payload) % 64 AS width,
               1 + (octet_length(payload) // 64) % 64 AS height,
               CAST(1 + ascii(substring(text, 1, 1)) % 4 AS BIGINT) AS channels
        FROM b
    )
    SELECT width, height, channels,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(DISTINCT payload_sha256) AS BIGINT) AS n_distinct_payloads,
           min(doc_id) AS kept_doc_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM sig
    GROUP BY width, height, channels
    ORDER BY width, height, channels
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-bucket dedup for binary media — the LAION-style
    image-dedup shape: bucket by a decode-derived signature (here the
    deterministic fake decoder's (width, height, channels); a real
    pipeline uses pHash/dHash), keep one representative per bucket
    (min doc_id), and report exact-content diversity inside each
    bucket via sha2 over the raw bytes. Both stages are one hash
    aggregate keyed on the signature — no pairwise comparison, so the
    plan is the same at 100 TB (pHash buckets are the image analogue
    of LSH bands; intra-bucket verify would broadcast bucket members
    exactly like dedup_minhash_lsh's verify stage)."""
    d = load_tables(spark, sf_dir)["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    sig = d.select(
        "doc_id",
        F.sha2(payload, 256).alias("payload_sha256"),
        (1 + F.length(payload) % 64).alias("width"),
        (1 + F.expr("octet_length(encode(text, 'UTF-8')) div 64") % 64).alias("height"),
        (1 + F.ascii(F.substring("text", 1, 1)) % 4).cast("bigint").alias("channels"),
    )
    return (
        sig.groupBy("width", "height", "channels")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("payload_sha256").alias("n_distinct_payloads"),
            F.min("doc_id").alias("kept_doc_id"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .orderBy("width", "height", "channels")
    )


_CLIP_ORACLE = """
    WITH t AS (
        SELECT vec_id AS doc_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS tv
        FROM embeddings),
    img AS (
        SELECT doc_id,
               list_reverse(tv) AS iv,
               tv
        FROM t),
    sim AS (
        SELECT doc_id,
               list_dot_product(tv, iv)
               / (sqrt(list_dot_product(tv, tv)) * sqrt(list_dot_product(iv, iv)))
                   AS s
        FROM img)
    SELECT doc_id,
           CAST(round(s, 4) AS DOUBLE) AS clip_sim,
           round(s, 4) >= 0.2 AS keep_pair
    FROM sim
    ORDER BY doc_id
"""


@query("multimodal_clip_filter", oracle=_CLIP_ORACLE, tags=("llm", "multimodal", "similarity"))
def multimodal_clip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score pair filtering — the LAION/WebLI curation shape:
    per (text, image) pair, the cosine between the text embedding and
    the image embedding, thresholded to keep aligned pairs. The
    fixture has no real image encoder (the container has no vision
    libs), so the 'image tower' embedding is a deterministic stand-in
    (the reversed text vector — guaranteeing a realistic spread of
    similarities rather than all-1s) while every Spark-side mechanic
    is real: both towers as array columns, JVM-side zip_with dot
    products, rounding-before-threshold so the keep boundary is
    cross-engine exact. At scale this is one narrow projection per
    pair — no shuffle at all (the towers arrive in the same row, the
    common case when pairs are materialized upstream); the expensive
    upstream (the encoders) runs as the mapInPandas kernels
    multimodal_decode demonstrates."""
    from flume_source_spark.pipeline.similarity import _dvec, cosine

    e = load_tables(spark, sf_dir)["embeddings"]
    pairs = e.select(
        F.col("vec_id").alias("doc_id"),
        _dvec("embedding").alias("tv"),
        F.reverse(_dvec("embedding")).alias("iv"),
    )
    sim = pairs.select("doc_id", cosine(F.col("tv"), F.col("iv")).alias("s"))
    return sim.select(
        "doc_id",
        F.round("s", 4).cast("double").alias("clip_sim"),
        (F.round("s", 4) >= 0.2).alias("keep_pair"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Perceptual-hash Hamming-band near-dup (round 10, VERDICT r9 item
# 6c): the image-side twin of text near-dedup, reusing the
# dedup_simhash_hamming_join pigeonhole machinery on 64-bit pHash
# codes. multimodal_content_dedup buckets EXACT signature matches;
# real perceptual hashes of re-encoded/resized images differ in a FEW
# bits, so the production question is "which pairs are within Hamming
# distance r?" — answered by the Charikar/Manku multi-index: split
# the 64-bit code into r+1 = 4 disjoint 16-bit bands; any pair within
# distance 3 agrees exactly on ≥ 1 band (pigeonhole), so a band
# equi-join + an exact popcount filter finds all of them with no n²
# scan.
#
# The pHash stand-in (no image codecs in this container): a 64-bucket
# content-histogram threshold sketch — md5(shingle) % 64 bucket
# counts, bit_i = 1 iff 64·s_i > n (bucket above the mean) — which
# has the property that matters: near-identical content flips FEW
# bits (measured on the fixture: planted near-dup pairs sit at
# Hamming 0-2, background pairs at 9+, a clean gap at the radius-3
# cut). A real pipeline swaps the sketch column for a DCT pHash
# computed in the multimodal_decode Arrow-kernel shape; every
# downstream stage (band split, capped equi-join, xor+bit_count
# verify) is identical.
#
# Scale: sketch = one explode + two map-side-combinable aggregates;
# candidate generation is the banded equi-join with hot buckets
# capped at PHASH_MAX_BUCKET (the MAX_BUCKET discipline — an
# all-zero band value is a degenerate bucket by construction); the
# verify stage touches candidates only. Pair work is bounded by
# Σ_bucket |bucket|² with |bucket| ≤ cap — never corpus².
# ---------------------------------------------------------------------------

PHASH_RADIUS = 3
PHASH_BANDS = PHASH_RADIUS + 1  # pigeonhole: r-distance pairs share a band
PHASH_BAND_BITS = 64 // PHASH_BANDS  # 16-bit bands
PHASH_MAX_BUCKET = 200  # dedup.MAX_BUCKET discipline

_PHASH_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    bk AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % 64 AS bucket
        FROM sh
    ),
    cnt AS (SELECT doc_id, bucket, count(*) AS s FROM bk GROUP BY 1, 2),
    tot AS (SELECT doc_id, count(*) AS n FROM bk GROUP BY 1),
    bits AS (
        SELECT c.doc_id, c.bucket
        FROM cnt c JOIN tot t USING (doc_id)
        WHERE 64 * c.s > t.n
    ),
    ph AS MATERIALIZED (
        SELECT t.doc_id, g.band,
               CAST(coalesce(sum(CASE WHEN b.bucket IS NOT NULL
                    THEN 1 << CAST(b.bucket % {PHASH_BAND_BITS} AS INT)
                    ELSE 0 END), 0) AS BIGINT) AS v
        FROM tot t
        CROSS JOIN (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band) g
        LEFT JOIN bits b
          ON b.doc_id = t.doc_id AND b.bucket // {PHASH_BAND_BITS} = g.band
        GROUP BY t.doc_id, g.band
    ),
    keep AS (
        SELECT band, v FROM ph GROUP BY band, v
        HAVING count(*) <= {PHASH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM ph a
        JOIN keep k ON a.band = k.band AND a.v = k.v
        JOIN ph b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ),
    wide AS (
        SELECT doc_id,
               min(CASE WHEN band = 0 THEN v END) AS b0,
               min(CASE WHEN band = 1 THEN v END) AS b1,
               min(CASE WHEN band = 2 THEN v END) AS b2,
               min(CASE WHEN band = 3 THEN v END) AS b3
        FROM ph GROUP BY doc_id
    )
    SELECT c.i, c.j,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
                AS BIGINT) AS hamming
    FROM cand c
    JOIN wide x ON x.doc_id = c.i
    JOIN wide y ON y.doc_id = c.j
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {PHASH_RADIUS}
    ORDER BY i, j
"""


def phash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, v) 16-bit band values of the 64-bit perceptual
    sketch over a (doc_id, text) frame — every doc emits ALL
    PHASH_BANDS rows (zero-valued bands included: a missing row would
    silently exclude the doc from that band's candidate join).
    Factored so planted tests (bit-flip neighbors within/beyond the
    radius) drive the production sketch + band split."""
    from flume_source_spark.pipeline.audit import _md5int
    from flume_source_spark.pipeline.dedup import shingle_col

    sh = docs.select("doc_id", F.explode(shingle_col(F.col("text"))).alias("shingle"))
    bk = sh.select("doc_id", (_md5int(F.col("shingle")) % 64).alias("bucket"))
    cnt = bk.groupBy("doc_id", "bucket").agg(F.count("*").alias("s"))
    tot = bk.groupBy("doc_id").agg(F.count("*").alias("n"))
    bits = cnt.join(tot, "doc_id").filter(64 * F.col("s") > F.col("n"))
    band_vals = (
        bits.select(
            "doc_id",
            F.expr(f"bucket div {PHASH_BAND_BITS}").alias("band"),
            F.expr(
                f"CAST(shiftleft(1, CAST(bucket % {PHASH_BAND_BITS} AS INT))"
                " AS BIGINT)"
            ).alias("w"),
        )
        .groupBy("doc_id", "band")
        .agg(F.sum("w").alias("v"))
    )
    lattice = tot.select("doc_id").crossJoin(
        F.broadcast(
            docs.sparkSession.range(PHASH_BANDS).select(F.col("id").alias("band"))
        )
    )
    return lattice.join(band_vals, ["doc_id", "band"], "left").select(
        "doc_id", "band", F.coalesce(F.col("v"), F.lit(0)).cast("long").alias("v")
    )


def _phash_cand_wide(ph: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared candidate stage: the capped band equi-join's distinct
    i<j pair set and the doc-wide band-value pivot — the inputs to
    both the radius membership query (phash_hamming_pairs) and the
    top-k serving lookup (phash_similar_topk).

    Round-12 single-corpus-pass re-shape: ``ph`` embeds the whole
    sketch pipeline (shingle explode + md5 + three aggregations) and
    is referenced by FOUR branches here (cap filter, kept side, pair
    side, pivot), and the outputs are themselves multiply consumed
    (top-k mirrors ``cand``; every caller joins ``wide`` per pair
    side) — unmaterialized, the corpus was re-scanned up to 62× per
    plan (live-scan audit). Each frame is linear and small ((doc_id,
    band, v) ×4 / capped pairs / one row per doc), so all three are
    checkpointed once."""
    ph = ph.localCheckpoint(eager=True)
    keep = (
        ph.groupBy("band", "v")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= PHASH_MAX_BUCKET)
        .select("band", "v")
    )
    kept = ph.join(keep, ["band", "v"], "left_semi")
    cand = (
        kept.alias("a")
        .join(
            ph.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    wide = ph.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("band") == b, F.col("v"))).alias(f"b{b}")
            for b in range(PHASH_BANDS)
        ]
    ).localCheckpoint(eager=True)
    return cand, wide


def phash_hamming_pairs(ph: DataFrame, radius: int = PHASH_RADIUS) -> DataFrame:
    """(i, j, hamming) pairs within ``radius`` over a (doc_id, band,
    v) band frame, via the capped band equi-join + exact xor/popcount
    verify. Exact recall for radius ≤ PHASH_BANDS − 1 among docs
    whose shared band bucket is under the cap."""
    cand, wide = _phash_cand_wide(ph)
    ham = sum(
        F.bit_count(F.expr(f"xb{b} ^ yb{b}")) for b in range(PHASH_BANDS)
    ).cast("long")
    return (
        cand.join(
            wide.select(
                F.col("doc_id").alias("i"),
                *[F.col(f"b{b}").alias(f"xb{b}") for b in range(PHASH_BANDS)],
            ),
            "i",
        )
        .join(
            wide.select(
                F.col("doc_id").alias("j"),
                *[F.col(f"b{b}").alias(f"yb{b}") for b in range(PHASH_BANDS)],
            ),
            "j",
        )
        .select("i", "j", ham.alias("hamming"))
        .filter(F.col("hamming") <= radius)
        .orderBy("i", "j")
    )


@query(
    "multimodal_phash_hamming_neardup",
    oracle=_PHASH_ORACLE,
    tags=("llm", "multimodal", "dedup", "lsh"),
)
def multimodal_phash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All content pairs within Hamming distance 3 of each other's
    64-bit perceptual sketches, found by exact-recall 4×16-bit band
    blocking + popcount verify — the image-near-dup plan (pHash multi
    -index) run end-to-end on the deterministic sketch stand-in."""
    d = load_tables(spark, sf_dir)["documents"]
    return phash_hamming_pairs(phash_bands(d.select("doc_id", "text")))


# ---------------------------------------------------------------------------
# pHash serving lookup (round 11, VERDICT r10 item 6): completes the
# image-side family — multimodal_phash_hamming_neardup answers
# MEMBERSHIP ("which pairs are near-dups?"), this answers SERVING
# ("show me the 3 most similar images to this one") — the
# lsh_similar_topk pattern over the pHash band machinery. Candidates
# are the SAME capped pigeonhole band join (generated once, mirrored
# to serve both endpoints), ranked per doc by EXACT xor/popcount
# Hamming ascending with doc-id tiebreak; no radius filter — a
# serving lookup returns the best available neighbors even past the
# dedup cut, and the candidate scope (band-collision pairs) is the
# documented serving contract, identical on both engines.
#
# Scale: candidate work is the neardup query's (Σ|bucket|² with
# |bucket| ≤ cap), the rank is one window PARTITIONED by doc_id.
# ---------------------------------------------------------------------------

PHASH_TOPK = 3

_PHASH_TOPK_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                      for i in generate_series(1, len(toks)-2)])) AS shingle
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    ),
    bk AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % 64 AS bucket
        FROM sh
    ),
    cnt AS (SELECT doc_id, bucket, count(*) AS s FROM bk GROUP BY 1, 2),
    tot AS (SELECT doc_id, count(*) AS n FROM bk GROUP BY 1),
    bits AS (
        SELECT c.doc_id, c.bucket
        FROM cnt c JOIN tot t USING (doc_id)
        WHERE 64 * c.s > t.n
    ),
    ph AS MATERIALIZED (
        SELECT t.doc_id, g.band,
               CAST(coalesce(sum(CASE WHEN b.bucket IS NOT NULL
                    THEN 1 << CAST(b.bucket % {PHASH_BAND_BITS} AS INT)
                    ELSE 0 END), 0) AS BIGINT) AS v
        FROM tot t
        CROSS JOIN (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band) g
        LEFT JOIN bits b
          ON b.doc_id = t.doc_id AND b.bucket // {PHASH_BAND_BITS} = g.band
        GROUP BY t.doc_id, g.band
    ),
    keep AS (
        SELECT band, v FROM ph GROUP BY band, v
        HAVING count(*) <= {PHASH_MAX_BUCKET}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM ph a
        JOIN keep k ON a.band = k.band AND a.v = k.v
        JOIN ph b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ),
    sym AS (SELECT i, j FROM cand UNION ALL SELECT j AS i, i AS j FROM cand),
    wide AS (
        SELECT doc_id,
               min(CASE WHEN band = 0 THEN v END) AS b0,
               min(CASE WHEN band = 1 THEN v END) AS b1,
               min(CASE WHEN band = 2 THEN v END) AS b2,
               min(CASE WHEN band = 3 THEN v END) AS b3
        FROM ph GROUP BY doc_id
    ),
    scored AS (
        SELECT s.i, s.j,
               CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                  + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
                    AS BIGINT) AS hamming
        FROM sym s
        JOIN wide x ON x.doc_id = s.i
        JOIN wide y ON y.doc_id = s.j
    ),
    ranked AS (
        SELECT i, j, hamming,
               row_number() OVER (PARTITION BY i ORDER BY hamming, j) AS rk
        FROM scored
    )
    SELECT CAST(i AS BIGINT) AS doc_id, CAST(j AS BIGINT) AS neighbor,
           hamming, CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= {PHASH_TOPK}
    ORDER BY doc_id, rank
"""


def phash_similar_topk(ph: DataFrame, k: int = PHASH_TOPK) -> DataFrame:
    """Top-k nearest neighbors per doc by exact Hamming over the
    capped band candidates of a (doc_id, band, v) frame. Factored so
    planted tests (a bit-flip neighbor outranks a farther one; ranks
    are dense from 1) drive the production mirror + rank."""
    from pyspark.sql import Window

    cand, wide = _phash_cand_wide(ph)
    sym = cand.unionAll(cand.select(F.col("j").alias("i"), F.col("i").alias("j")))
    ham = sum(
        F.bit_count(F.expr(f"xb{b} ^ yb{b}")) for b in range(PHASH_BANDS)
    ).cast("long")
    scored = (
        sym.join(
            wide.select(
                F.col("doc_id").alias("i"),
                *[F.col(f"b{b}").alias(f"xb{b}") for b in range(PHASH_BANDS)],
            ),
            "i",
        )
        .join(
            wide.select(
                F.col("doc_id").alias("j"),
                *[F.col(f"b{b}").alias(f"yb{b}") for b in range(PHASH_BANDS)],
            ),
            "j",
        )
        .select("i", "j", ham.alias("hamming"))
    )
    w = Window.partitionBy("i").orderBy(F.col("hamming"), F.col("j"))
    return (
        scored.select("i", "j", "hamming", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .select(
            F.col("i").cast("long").alias("doc_id"),
            F.col("j").cast("long").alias("neighbor"),
            "hamming",
            F.col("rk").cast("long").alias("rank"),
        )
        .orderBy("doc_id", "rank")
    )


@query(
    "multimodal_similar_topk",
    oracle=_PHASH_TOPK_ORACLE,
    tags=("llm", "multimodal", "serving"),
)
def multimodal_similar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most perceptually similar documents per document, ranked
    by exact Hamming distance between 64-bit sketches over the capped
    pigeonhole band candidates — the image-side "view similar" serving
    lookup (the lsh_similar_topk pattern on the pHash machinery)."""
    d = load_tables(spark, sf_dir)["documents"]
    return phash_similar_topk(phash_bands(d.select("doc_id", "text")))
