"""Partition-pruned streaming MERGE: the fact-sized upsert target.

``PartitionedParquetUpsertSink`` — ``ParquetUpsertSink``
(streaming/engine.py) rewrites the WHOLE target per micro-batch,
which is right for dimension-sized targets and wrong for fact-sized
ones; its docstring promises the fix ("partition by key range and
rewrite only touched partitions"). This class IS that fix, concrete:

    - the target is hash-bucketed on the merge key
      (``key % n_buckets`` — deterministic, no RNG state, same
      identity-bucket primitive the dataset-prep family uses),
    - each micro-batch computes its TOUCHED bucket set (one tiny
      distinct over the batch), merges latest-per-key ONLY within
      those buckets against only those buckets' current generations,
      writes one fresh generation dir per touched bucket,
    - commit is still ONE atomic file: epoch fence + the full
      bucket→generation pointer map replaced in a single
      ``os.replace`` — untouched buckets keep their old generation
      dirs byte-identical (asserted by test), crashed attempts leave
      orphan dirs invisible to readers (same contract as the
      unpartitioned sink's single commit point).

Cost per batch: O(batch + Σ_{touched buckets} |bucket|) instead of
O(target): with B buckets and a batch touching k keys, at most
min(k, B)/B of the target rewrites. At 100 TB, B scales with target
size (buckets ≈ file-sized) and the same layout doubles as the
bucketed-join layout (`bucketed_colocated_join`): merge key == join
key == bucket key, so downstream joins against the target are
co-located for free.

Redelivery: epoch ≤ fence → no-op. Crash between bucket writes and
commit: pointer map still names the OLD generations for every
bucket; the retry re-merges against those (fresh per-attempt dir
names prevent read/write collision).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class PartitionedParquetUpsertSink:
    def __init__(self, path: str, key: str, order_col: str, n_buckets: int = 16):
        self.path, self.key, self.order_col = path, key, order_col
        self.n_buckets = n_buckets
        self._commit = os.path.join(path, "_commit")
        os.makedirs(path, exist_ok=True)

    def _read_commit(self) -> dict | None:
        try:
            with open(self._commit) as f:
                return json.loads(f.read())
        except FileNotFoundError:
            return None

    def bucket_generations(self) -> dict[str, str]:
        c = self._read_commit()
        return dict(c["buckets"]) if c else {}

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.col(self.key), F.lit(self.n_buckets)).cast("int")

    def read_bucket(self, spark, bucket: int) -> DataFrame | None:
        gen = self.bucket_generations().get(str(bucket))
        if gen is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"bucket={bucket}", gen))

    def read_target(self, spark) -> DataFrame | None:
        gens = self.bucket_generations()
        if not gens:
            return None
        paths = [
            os.path.join(self.path, f"bucket={b}", g) for b, g in sorted(gens.items())
        ]
        return spark.read.parquet(*paths)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        c = self._read_commit()
        if c is not None and epoch_id <= int(c["epoch"]):
            return  # redelivered epoch → no-op
        spark = batch_df.sparkSession
        batch = batch_df.withColumn("__bucket", self._bucket_col())
        touched = sorted(
            r["__bucket"] for r in batch.select("__bucket").distinct().collect()
        )
        gens = dict(c["buckets"]) if c else {}
        w = Window.partitionBy(self.key).orderBy(
            F.col(self.order_col).desc(), F.col(self.key)
        )
        for b in touched:
            slice_df = batch.filter(F.col("__bucket") == b).drop("__bucket")
            current = self.read_bucket(spark, b)
            merged = slice_df if current is None else current.unionByName(slice_df)
            latest = (
                merged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            gen = f"gen-{epoch_id}-{uuid.uuid4().hex[:8]}"
            latest.write.mode("overwrite").parquet(
                os.path.join(self.path, f"bucket={b}", gen)
            )
            gens[str(b)] = gen  # staged; becomes visible only at commit
        tmp = self._commit + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"epoch": epoch_id, "buckets": gens}))
        os.replace(tmp, self._commit)  # single atomic commit point
