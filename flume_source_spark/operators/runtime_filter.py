"""Runtime-filter join pruning: bloom-style semi-join prefilter.

The 100 TB problem this demonstrates: a fact⋈dim join where the dim
side is *selective* (a filter keeps a few % of it) but still too large
to hash-broadcast, so Catalyst plans a shuffle join and the ENTIRE
fact table pays the shuffle — including the ~95% of rows the join will
drop. The standard fix is a runtime row-level filter: condense the
surviving dim keys into a bloom filter (size independent of dim
cardinality), broadcast THAT, and discard non-matching fact rows
map-side before the exchange. Spark ships this as an optimizer rule
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, Spark 3.3+),
but the rule only fires inside its creation/size thresholds and its
``bloom_filter_agg``/``might_contain`` expressions are not exposed to
the public API (probed: UNRESOLVED_ROUTINE in Spark 4.1). This module
makes the lever explicit and tunable with public primitives — the same
word-bitmap arithmetic as ``ds_bloom_dedup``/``agg_bitmap_distinct``:

  build:  word_idx = h div 64, mask = 1 << (h mod 64), bit_or per word
          → ≤ nbits/64 NON-ZERO rows (≤ 1 MB at the default 2^23
          bits) — always
          broadcastable, REGARDLESS of dim row count
  probe:  broadcast-join fact on word_idx, test the bit — pure
          map-side, no shuffle of fact rows that fail

One hash function (k=1): false-positive rate is ~n/m for n keys in m
bits (size nbits ≳ 10× expected keys). False positives only waste
work — the exact join behind the prefilter removes them — while false
negatives are impossible (every dim key sets the bit any equal fact
key probes), so the operator's RESULT is exactly the plain join and
the DuckDB oracle needs no bloom at all. That asymmetry is the whole
trick: the probabilistic structure lives strictly on the
efficiency path, never on the correctness path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_source_spark.canon import dec, dsum
from flume_source_spark.operators.aggregates3 import bit_test, word_and_mask
from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables

# 2^23 bits = 131,072 64-bit words = 1 MB — broadcast-trivial, and
# only the NON-ZERO words ship (the build is a groupBy over words some
# key actually hit), so small dims pay proportionally less. Sizing
# rule: ≥ ~16× the expected surviving-key count (k=1 → FP ≈ n/m).
# Measured (scripts/scale_probe_r7b.py): the original 2^17 default
# saturated at the 8x-sf0.1 dim (80k keys / 131k bits → 46% FP,
# survivors 2.4M of 4.8M); 2^23 puts the same dim at ~1% FP. At
# 100 TB pass nbits ≈ 16× the dim-side key estimate (2^27 = 16 MB
# covers ~8M keys; past that, runtime filtering stops paying and a
# shuffle join on both sides is the right plan anyway).
BLOOM_NBITS = 1 << 23


def bloom_prefilter(
    fact: DataFrame, fact_key: str, dim_keys: DataFrame, dim_key: str,
    nbits: int = BLOOM_NBITS,
) -> DataFrame:
    """Drop fact rows whose ``fact_key`` is provably absent from
    ``dim_keys[dim_key]``, using a broadcast word-bitmap bloom filter.

    No false negatives (rows that would join always survive); false
    positives pass through and must be removed by the real join that
    follows. Both sides hash with ``xxhash64`` — engine-private hashes
    are fine here because the filter never determines the result, only
    the work.

    ``xxhash64`` is TYPE-SENSITIVE (``xxhash64(1::INT) !=
    xxhash64(1::BIGINT)``), so mismatched key types would silently
    break the no-false-negative contract: equal values hashing to
    different bits drop matching fact rows before the join ever sees
    them. Integral keys are therefore normalized to ``long`` on both
    sides; any other cross-type pairing is rejected rather than
    guessed at (a cast the join itself wouldn't apply has no business
    in a transparent prefilter).
    """
    _integral = {"tinyint", "smallint", "int", "bigint"}
    ft = dict(fact.dtypes)[fact_key]
    dt = dict(dim_keys.dtypes)[dim_key]
    if ft in _integral and dt in _integral:
        fact_key_col = F.col(fact_key).cast("long")
        dim_key_col = F.col(dim_key).cast("long")
    elif ft == dt:
        fact_key_col = F.col(fact_key)
        dim_key_col = F.col(dim_key)
    else:
        raise ValueError(
            f"bloom_prefilter: fact key {fact_key!r} ({ft}) and dim key "
            f"{dim_key!r} ({dt}) must share a type (or both be integral); "
            "xxhash64 is type-sensitive and a silent mismatch would drop "
            "matching rows"
        )
    # the word/mask slotting layout is shared with the positional
    # bitmaps (aggregates3.word_and_mask) so build and probe cannot
    # drift apart; the pmod'd hash is non-negative by construction
    h_dim = F.pmod(F.xxhash64(dim_key_col), F.lit(nbits))
    widx, mask = word_and_mask("h")
    words = (
        dim_keys.select(h_dim.alias("h"))
        .select(widx.alias("bloom_word_idx"), mask)
        .groupBy("bloom_word_idx")
        .agg(F.bit_or("mask").alias("bloom_word"))
    )
    probed = (
        fact.withColumn("__h", F.pmod(F.xxhash64(fact_key_col), F.lit(nbits)))
        .withColumn("__widx", word_and_mask("__h")[0])
        # INNER join: a word_idx absent from the bitmap means no dim
        # key hashed into that word — all 64 bits are zero and every
        # probe there fails, so dropping the row at the join is the
        # same decision the bit test would make, one comparison sooner.
        .join(F.broadcast(words), F.col("__widx") == F.col("bloom_word_idx"))
        .where(bit_test("bloom_word", "__h"))
        .drop("__h", "__widx", "bloom_word_idx", "bloom_word")
    )
    return probed


_BLOOM_JOIN_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query(
    "join_bloom_prefilter",
    oracle=_BLOOM_JOIN_ORACLE,
    tags=("join", "runtime-filter", "bloom", "skew"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim fact join behind a bloom prefilter: lineitem ⋈
    urgent-finished orders (~4% of orders), revenue per return flag.
    The bitmap of surviving order keys broadcasts at ≤ 1 MB no matter
    how many orders survive; fact rows failing the bit test never
    reach the join exchange. The oracle is the PLAIN join — the hash
    match proves the prefilter is transparent (no false negatives,
    and false positives all die in the exact join)."""
    t = load_tables(spark, sf_dir)
    dim = t["orders"].where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    pre = bloom_prefilter(
        t["lineitem"], "l_orderkey", dim.select("o_orderkey"), "o_orderkey"
    )
    return (
        pre.join(dim, pre["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"),
        )
        .orderBy("l_returnflag")
    )
