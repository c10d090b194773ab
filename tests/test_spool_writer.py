"""Spool-directory producer (custom Python DataSource writer):
two-phase commit protocol, dest-exists parity, and composition with
the filemeta consumer source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write(spark, rows, path, mode="append"):
    from flume_source_spark.sources.spool_writer import register

    register(spark)
    (
        spark.createDataFrame(rows, "file_name string, body string")
        .write.format("textspool")
        .mode(mode)
        .option("path", path)
        .save()
    )


def test_spool_commit_leaves_only_final_files(spark, tmp_path):
    d = str(tmp_path / "spool")
    _write(spark, [(f"f{i}.txt", f"payload-{i}") for i in range(20)], d)
    names = sorted(os.listdir(d))
    assert names == sorted(f"f{i}.txt" for i in range(20))
    assert not any(n.startswith(".") for n in names)  # no temp residue
    assert open(os.path.join(d, "f3.txt")).read() == "payload-3"


def test_spool_errorifexists_on_clash_cleans_temps(spark, tmp_path):
    d = str(tmp_path / "spool")
    _write(spark, [("a.txt", "one")], d)
    with pytest.raises(Exception, match="already exist"):
        _write(spark, [("a.txt", "two")], d, mode="append")
    assert sorted(os.listdir(d)) == ["a.txt"]
    assert open(os.path.join(d, "a.txt")).read() == "one"  # original intact


def test_spool_overwrite_replaces_directory_contents(spark, tmp_path):
    d = str(tmp_path / "spool")
    _write(spark, [("old.txt", "old")], d)
    _write(spark, [("new.txt", "new")], d, mode="overwrite")
    assert sorted(os.listdir(d)) == ["new.txt"]


def test_spool_rejects_illegal_names(spark, tmp_path):
    d = str(tmp_path / "spool")
    with pytest.raises(Exception, match="illegal spool file name"):
        _write(spark, [(".hidden", "x")], d)
    with pytest.raises(Exception, match="illegal spool file name"):
        _write(spark, [("a/b.txt", "x")], d)


def test_spool_producer_feeds_filemeta_consumer(spark, tmp_path):
    """The two custom datasources compose: files produced by the
    textspool writer are exactly what the filemeta source consumes —
    names, count, and rename-commit on the consumer side."""
    from flume_source_spark.sources.filemeta import register as reg_reader

    d = str(tmp_path / "spool")
    _write(spark, [(f"evt{i:03d}.txt", f"body {i}") for i in range(10)], d)
    reg_reader(spark)
    rows = (
        spark.read.format("filemeta")
        .option("path", d)
        .option("consumeOrder", "oldest")
        .option("canary", "false")
        .load()
        .select("file_name")
        .collect()
    )
    assert sorted(r.file_name for r in rows) == [f"evt{i:03d}.txt" for i in range(10)]
