"""Distributed global ordering primitives: exact ``row_number`` /
``ntile`` over a corpus-sized table WITHOUT a single-partition sort.

The problem (VERDICT r10 "What's wrong"): ``row_number() OVER
(ORDER BY ...)`` with an empty PARTITION BY plans as ``Exchange
SinglePartition`` + one sort of the WHOLE table on one task — correct
at fixture scale, a straggler-then-OOM at 100 TB. The standard
decomposition (documented in prose at ``pipeline/dataset3.py`` /
``dataset8.py`` since round 5, implemented here):

1. **Bucket** every row by a numeric key that is monotone in the
   requested total order (the first ORDER BY column, or an explicit
   composite): boundaries come from one ``percentile_approx`` pass
   **materialized exactly once on the driver** (a 1-row, ≤buckets-1
   double collect) and inlined as literals; the bucket id is
   ``#(boundaries < key)`` via a binary-search CASE tree
   (``_bucket_expr`` — log₂(buckets) comparisons per row, plain
   codegen-friendly expressions, no higher-order-function fold).
   Because the boundaries are a fixed literal, the bucket is a pure
   function of the ROW for EVERY downstream plan branch — task
   retries, speculative duplicates, and the rank/offset branches all
   see byte-identical boundaries, even though ``percentile_approx``
   sketch merges are not order-deterministic at scale (ADVICE r11:
   re-evaluating the sketch per branch could re-bucket a row and
   corrupt the rank; collecting once removes that failure mode for
   the price of one tiny job).
2. **Local rank** within each bucket: ``row_number`` over
   ``Window.partitionBy(bucket)`` — a hash exchange on the bucket id;
   every sort is bucket-sized.
3. **Offsets**: per-bucket counts from ONE tiny collected job
   (≤``buckets`` rows to the driver — the ``_boundaries`` traffic
   class) turned into exclusive prefix sums in Python and inlined as
   an array LITERAL indexed by the bucket id (round-12 re-shape: the
   previous broadcast count self-join was a second/third full plan
   branch over the corpus — every helper user re-scanned its input
   3-4×; the literal leaves exactly one corpus branch and no offset
   join). Still no window, no single-partition SORT, no unpartitioned
   ``row_number`` window (the plan test pins exactly that).
4. ``global rank = offset + local rank``; ``ntile(n)`` is pure
   arithmetic on (rank, total): the first ``total % n`` tiles carry
   ``total div n + 1`` rows — bit-identical to SQL NTILE.

EXACTNESS IS INDEPENDENT OF BOUNDARY QUALITY: a skewed
``percentile_approx`` sketch only unbalances bucket sizes, never the
rank — which is why the four re-shaped queries keep their original
window-form oracles unchanged. Correctness therefore never depends on
the sampling; only the parallelism does.

Contract: ``order_cols`` must define a TOTAL order (include a unique
tiebreak) and ``bucket_key`` must be a non-null numeric expression
ascending-monotone in that order (negate for DESC heads; compose
``a * K + b`` for multi-column heads with b < K). ``df`` must be
DETERMINISTIC over a stable source: boundaries, per-bucket counts and
the ranked output are computed in SEPARATE jobs, so an input with
``rand()``/sampling upstream (or a source mutated between jobs) could
re-bucket rows between the count job and execution and produce
duplicated/gapped ranks — the old in-plan offset join was
self-consistent by construction, the literal form is not (ADVICE
r12). Every current caller orders by md5/plain-column keys. At 100 TB
pass ``buckets ≈ rows / 10M`` so each bucket-sort fits a task; the
default 64 suits fixture scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BNDS = "__go_bnds"
_BUCKET = "__go_bucket"
_LOCAL = "__go_local"

# percentile_approx sketch accuracy for the boundary pass. Exactness
# of the rank is provably independent of boundary quality (module
# doc), so the sketch only has to BALANCE buckets, not be precise.
# Round-12 probe (scripts/scale_probe_r12.py, SCALE.md part 12), all
# three settings producing the IDENTICAL histogram: accuracy 100
# unbalances buckets enough to cost wall (2.93 s solo / 4.73 s at 8×
# lineitem on the equidepth pipeline); 1000 and 10000 are
# indistinguishable (1.94/2.62 vs 1.85/2.40). 1000 keeps the full
# balance benefit with the 10× smaller sketch, the cheaper choice as
# the boundary pass grows with the corpus.
_BOUNDARY_ACCURACY = 1000


def _boundaries(df: DataFrame, bucket_key: Column, buckets: int) -> list[float]:
    """One tiny job: the ``buckets-1`` approximate quantile boundaries
    of ``bucket_key``, collected to the driver so every downstream
    plan branch (local rank, offsets, retries, speculative tasks)
    buckets rows against byte-identical literals."""
    pcts = [i / buckets for i in range(1, buckets)]
    row = df.agg(
        F.percentile_approx(
            bucket_key.cast("double"), pcts, _BOUNDARY_ACCURACY
        ).alias(_BNDS)
    ).first()
    bnds = row[_BNDS] if row is not None else None
    return [float(b) for b in bnds] if bnds else []


def _bucket_expr(bnds: list[float], key: Column) -> Column:
    """``#(boundaries < key)`` as a binary-search CASE tree over the
    driver-side boundary literals: ⌈log₂ buckets⌉ comparisons per row
    and — unlike a higher-order ``F.aggregate`` fold — a plain
    expression that stays inside whole-stage codegen everywhere the
    bucket column is duplicated (window partition key, join key, hash
    exchange). Round-12 measurement: the HOF fold evaluated
    interpreted at each duplication site and cost 11.4 s on the
    sf0.1 equidepth pipeline vs 1.2 s for this tree (SCALE.md part
    12); equal keys take the left branch, exactly the fold's
    strict-``>`` count."""

    def rec(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(key > F.lit(bnds[mid]), rec(mid + 1, hi)).otherwise(
            rec(lo, mid)
        )

    return rec(0, len(bnds))


def _bucketed(
    df: DataFrame, bucket_key: Column, buckets: int
) -> tuple[DataFrame, int]:
    """Stamp each row with its deterministic order-bucket id; returns
    ``(stamped_df, n_buckets)`` so callers share one copy of the
    empty/boundary fallback (ADVICE r12: ``with_global_rank`` used to
    inline a drifting duplicate of this branch)."""
    bnds = _boundaries(df, bucket_key, buckets)
    if not bnds:  # empty input (or all-null key): one bucket
        return df.withColumn(_BUCKET, F.lit(0)), 1
    return (
        df.withColumn(_BUCKET, _bucket_expr(bnds, bucket_key.cast("double"))),
        len(bnds) + 1,
    )


def _offset_literals(bucketed: DataFrame, n_buckets: int) -> tuple[list[int], int]:
    """Exclusive prefix counts per bucket as DRIVER-SIDE literals: one
    tiny job (≤ buckets rows collected — the same bounded-driver-traffic
    class as ``_boundaries``). Round-12 re-shape: the previous
    formulation built the offsets as a broadcast self-join over a
    per-bucket count frame derived from ``bucketed`` — a SECOND (and,
    unmaterialized, third) full plan branch over the corpus, so every
    helper user re-scanned its input 3-4× per run (live-scan audit).
    Counting once and inlining ``offset[bucket]`` as an array literal
    leaves exactly ONE corpus branch in the main plan and deletes the
    join + two broadcast exchanges outright (guide §2.4)."""
    rows = bucketed.groupBy(_BUCKET).agg(F.count("*").alias("__go_n")).collect()
    cnt = {r[_BUCKET]: r["__go_n"] for r in rows}
    offs, acc = [], 0
    for b in range(n_buckets):
        offs.append(acc)
        acc += cnt.get(b, 0)
    return offs, acc


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    bucket_key: Column,
    rank_col: str = "r",
    buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Add ``rank_col`` = exact global ``row_number`` over
    ``order_cols`` (and optionally ``total_col`` = table row count)
    without any corpus-sized single-partition sort. See module doc for
    the contract on ``bucket_key``."""
    b, n_buckets = _bucketed(df, bucket_key, buckets)
    offs, total = _offset_literals(b, n_buckets)
    local = F.row_number().over(Window.partitionBy(_BUCKET).orderBy(*order_cols))
    out = b.withColumn(_LOCAL, local).withColumn(
        rank_col,
        (F.element_at(F.lit(offs), F.col(_BUCKET) + 1) + F.col(_LOCAL)).cast("long"),
    )
    keep = df.columns + [rank_col] + ([total_col] if total_col else [])
    if total_col:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out.select(*keep)


def with_global_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column],
    bucket_key: Column,
    tile_col: str = "tile",
    buckets: int = 64,
) -> DataFrame:
    """Add ``tile_col`` = exact SQL ``NTILE(n)`` over ``order_cols``:
    global rank (above) + closed-form tile arithmetic. With
    q = total div n and rem = total % n, tiles 1..rem hold q+1 rows;
    rank r maps to ``(r-1) div (q+1) + 1`` inside the fat prefix and
    ``rem + (r - rem*(q+1) - 1) div q + 1`` past it — the exact NTILE
    fill rule in both Spark and DuckDB."""
    ranked = with_global_rank(
        df, order_cols, bucket_key, rank_col="__go_r", buckets=buckets,
        total_col="__go_t",
    )
    r, t = F.col("__go_r"), F.col("__go_t")
    q = F.floor(t / n)
    rem = t % n
    fat = rem * (q + 1)
    tile = (
        F.when(q == 0, r)  # total < n: one row per tile, tile = rank
        .when(r <= fat, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - fat - 1) / q) + 1)
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("__go_r", "__go_t")
