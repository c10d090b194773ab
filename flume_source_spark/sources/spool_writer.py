"""Spool-directory PRODUCER — a custom Python DataSource *writer*,
the inverse of the filemeta *reader* (``sources/filemeta.py``).

The reference consumes a spool directory: upstream producers drop one
file per record, the Flume source emits per-file events and
rename-commits them (`CephFSEventReader.java:172-210`). This module is
the other half of that contract: write a DataFrame out as one file per
row, with the same rename-as-commit protocol on the PRODUCER side —
rows are written to dot-prefixed temp names on executors and only
renamed to their final names in the driver-side job commit, so a
concurrently-polling consumer (the reference, or our filemeta source,
whose candidate filter skips dot-files — `CephFSEventReader.java:115`
parity) can never observe a half-written or uncommitted file. A failed
job aborts by deleting the temp files; the spool directory is left
unchanged.

This exercises the full Python DataSource API surface: the repo
already ships a batch reader, a simple stream reader, a partitioned
stream reader, and a stream *writer* path via foreachBatch; this adds
the batch ``DataSourceWriter`` (write → WriterCommitMessage →
commit/abort two-phase protocol).

Scale: each executor task writes its partition's files locally and
ships only (tmp, final) name pairs to the driver; the commit is pure
renames (one syscall/file on the shared filesystem a spool directory
implies). The per-file cost model is exactly the reference's — this is
the small-file regime by DESIGN (a spool contract), not an accident;
bulk data belongs in the parquet sinks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from flume_source_spark.registry import query
from flume_source_spark.tables import load_tables
from flume_source_spark.workdir import slot as _slot


@dataclass
class SpoolCommitMessage(WriterCommitMessage):
    # (tmp_path, final_path) pairs written by one task
    files: list = field(default_factory=list)


def _duplicate_finals(pending) -> list:
    """Final paths targeted by more than one (tmp, final) pair of the
    SAME commit — each would silently clobber its predecessor under
    plain rename, and no dest-exists check can see them (the dest is
    not on disk until the first publish)."""
    from collections import Counter

    counts = Counter(final for _, final in pending)
    return sorted(f for f, n in counts.items() if n > 1)


def _cleanup_temps(pending) -> None:
    for tmp, _ in pending:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass


def _publish_no_replace(tmp: str, final: str) -> None:
    """Atomic no-replace publish: hard-link the temp to its final name
    (link(2) fails with EEXIST if the dest appeared since the
    pre-check — rename(2) would silently replace it), then drop the
    temp name. Same syscall count as rename; closes the
    exists()→rename() TOCTOU window."""
    os.link(tmp, final)
    os.unlink(tmp)


def _publish_all_no_replace(pending) -> None:
    """Publish every (tmp, final) pair no-replace; on a dest appearing
    inside the check→publish TOCTOU window, keep the already-published
    finals (same contract as the pre-check clash path) but clean the
    unpublished remainder's temps so commit itself leaves no strays
    even if the caller never invokes abort(). Shared by the batch and
    stream writers — the loop's failure contract must not diverge
    between the two commit paths."""
    for i, (tmp, final) in enumerate(pending):
        try:
            _publish_no_replace(tmp, final)
        except FileExistsError:
            _cleanup_temps(pending[i:])
            raise


class SpoolWriter(DataSourceWriter):
    """Two-phase spool writer: temp-write on executors, rename on
    job commit. Input schema must provide ``file_name`` and ``body``
    string columns."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("textspool writer requires option 'path'")
        self.suffix = options.get("tmpPrefix", ".spool-tmp-")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        files = []
        for row in iterator:
            name = row["file_name"]
            if not name or name.startswith(".") or "/" in name:
                raise ValueError(f"illegal spool file name: {name!r}")
            tmp = os.path.join(self.path, f"{self.suffix}{uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(row["body"] if row["body"] is not None else "")
            files.append((tmp, os.path.join(self.path, name)))
        return SpoolCommitMessage(files=files)

    def commit(self, messages) -> None:
        pending = [p for m in messages if m is not None for p in m.files]
        # two rows in ONE commit targeting the same final name would
        # pass any dest-exists check (dest not on disk yet) and the
        # second publish would silently destroy the first — fail the
        # job instead (same data-loss contract as dest-exists)
        dups = _duplicate_finals(pending)
        if dups:
            _cleanup_temps(pending)
            raise FileExistsError(
                f"duplicate spool destinations within one commit: {dups[:3]}..."
            )
        if self.overwrite:
            keep = {tmp for tmp, _ in pending}
            for entry in os.listdir(self.path):
                full = os.path.join(self.path, entry)
                if os.path.isfile(full) and full not in keep:
                    os.remove(full)
            for tmp, final in pending:
                os.rename(tmp, final)
        else:
            # errorifexists/append parity with the reference's
            # dest-exists rename failure (CephFSEventReader.java:189).
            # The pre-check gives a clean all-or-nothing failure for
            # the common case; the publish itself is link+unlink
            # (no-replace), so a dest appearing INSIDE the
            # check→publish window (TOCTOU) still cannot clobber.
            clash = [f for _, f in pending if os.path.exists(f)]
            if clash:
                _cleanup_temps(pending)
                raise FileExistsError(f"spool destinations already exist: {sorted(clash)[:3]}...")
            _publish_all_no_replace(pending)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _ in m.files:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass


class TextSpoolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "textspool"

    def writer(self, schema, overwrite: bool) -> SpoolWriter:
        names = [f.name for f in schema.fields]
        if "file_name" not in names or "body" not in names:
            raise ValueError(f"textspool requires (file_name, body) columns, got {names}")
        return SpoolWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        names = [f.name for f in schema.fields]
        if "file_name" not in names or "body" not in names:
            raise ValueError(f"textspool requires (file_name, body) columns, got {names}")
        return SpoolStreamWriter(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(TextSpoolDataSource)


@query(
    "sink_spool_writer",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE NOT contains(text, chr(9)) AND NOT contains(text, chr(10))
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("sink", "source", "spool", "datasource"),
)
def sink_spool_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one spool file per doc via the custom textspool
    writer (rename-commit) → read back with text(wholetext) +
    input-file-name parsing → per-lang aggregate, oracle-checked
    against the original parquet: the written bytes must round-trip
    losslessly through the two-phase protocol. Line-unsafe docs are
    excluded by the same predicate on both sides (none exist in the
    fixtures)."""
    register(spark)
    t = load_tables(spark, sf_dir)
    out = _slot(sf_dir, "documents_spool")
    d = t["documents"].filter(~F.col("text").contains("\t") & ~F.col("text").contains("\n"))
    (
        d.select(
            F.concat(F.lit("doc-"), F.col("doc_id"), F.lit(".txt")).alias("file_name"),
            F.col("text").alias("body"),
        )
        .write.format("textspool")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    back = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(out)
        .select(
            F.regexp_extract(F.input_file_name(), r"doc-(\d+)\.txt$", 1).cast("long").alias("doc_id"),
            F.col("value").alias("text_back"),
        )
    )
    return (
        d.join(back, "doc_id")
        .filter(F.col("text") == F.col("text_back"))  # lossless round-trip gate
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("lang")
    )


class SpoolStreamWriter(DataSourceStreamWriter):
    """STREAMING spool producer — the `DataSourceStreamWriter` tier of
    the Python DataSource API (the batch `SpoolWriter` above covers
    `writer()`; with this the engine ships all four custom-DataSource
    roles: batch/stream reader, batch/stream writer). Same two-phase
    protocol per micro-batch: executors temp-write dot-prefixed files,
    the driver's per-epoch ``commit(messages, batchId)`` renames them
    and advances a single epoch-marker file (atomic replace). The
    marker makes redelivered epochs idempotent: a retried commit for
    an already-marked epoch deletes its temps and renames nothing, so
    a consumer polling the spool (the filemeta source) sees each
    row's file exactly once. ``abort`` removes the epoch's temps and
    leaves the spool unchanged."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("textspool stream writer requires option 'path'")
        self.suffix = options.get("tmpPrefix", ".spool-tmp-")
        # dest-exists behavior, parity with the batch writer: a later
        # epoch re-emitting a published file_name must NOT silently
        # destroy the earlier file (and the filemeta consumer's
        # exactly-once view). Opt in to overwrite explicitly.
        self.overwrite = str(options.get("overwrite", "false")).lower() == "true"
        self._marker = os.path.join(self.path, ".spool-epoch")

    def _last_epoch(self) -> int:
        try:
            with open(self._marker) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        files = []
        for row in iterator:
            name = row["file_name"]
            if not name or name.startswith(".") or "/" in name:
                raise ValueError(f"illegal spool file name: {name!r}")
            tmp = os.path.join(self.path, f"{self.suffix}{uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(row["body"] if row["body"] is not None else "")
            files.append((tmp, os.path.join(self.path, name)))
        return SpoolCommitMessage(files=files)

    def commit(self, messages, batchId: int) -> None:
        pending = [p for m in messages if m is not None for p in m.files]
        if batchId <= self._last_epoch():
            for tmp, _ in pending:  # redelivered epoch: drop, don't re-publish
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
            return
        # same intra-epoch duplicate-finals contract as the batch
        # writer: two rows of one epoch targeting the same name would
        # silently lose the first under rename — fail the epoch
        dups = _duplicate_finals(pending)
        if dups:
            _cleanup_temps(pending)
            raise FileExistsError(
                f"duplicate spool destinations within one epoch: {dups[:3]}..."
            )
        if not self.overwrite:
            # mirror the batch writer's rename-failure contract
            # (CephFSEventReader.java:189): collect clashes, clean the
            # temps, and FAIL the epoch rather than silently replacing
            # a previously published file. Publish is link+unlink
            # (no-replace) so the check→publish TOCTOU window cannot
            # clobber either.
            clash = [f for _, f in pending if os.path.exists(f)]
            if clash:
                _cleanup_temps(pending)
                raise FileExistsError(
                    f"spool destinations already exist: {sorted(clash)[:3]}... "
                    "(set writer option overwrite=true to allow replacement)"
                )
            _publish_all_no_replace(pending)
        else:
            for tmp, final in pending:
                os.rename(tmp, final)
        tmp_marker = self._marker + ".tmp"
        with open(tmp_marker, "w") as f:
            f.write(str(batchId))
        os.replace(tmp_marker, self._marker)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _ in m.files:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
