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


# ---- streaming writer tier


def _docs_stream(spark, d):
    return spark.readStream.schema("doc_id LONG, text STRING").parquet(d)


def test_stream_spool_writer_publishes_per_epoch(spark, tmp_path):
    """writeStream.format('textspool'): per micro-batch two-phase
    publish — final names only after commit, no dot-temps left, epoch
    marker advances, redelivered commit is a no-op, and the produced
    spool is readable by the filemeta source (producer→consumer
    composition)."""
    import pandas as pd

    from flume_source_spark.sources.spool_writer import (
        SpoolCommitMessage,
        SpoolStreamWriter,
        register,
    )

    register(spark)
    src = str(tmp_path / "in")
    spool = str(tmp_path / "spool")
    os.makedirs(src, exist_ok=True)
    pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]}).to_parquet(
        os.path.join(src, "b1.parquet")
    )
    q = (
        _docs_stream(spark, src)
        .selectExpr("concat('doc-', doc_id) AS file_name", "text AS body")
        .writeStream.format("textspool")
        .option("path", spool)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        pd.DataFrame({"doc_id": [3], "text": ["gamma"]}).to_parquet(
            os.path.join(src, "b2.parquet")
        )
        q.processAllAvailable()
    finally:
        q.stop()
    names = sorted(os.listdir(spool))
    assert [n for n in names if not n.startswith(".")] == ["doc-1", "doc-2", "doc-3"]
    assert not [n for n in names if n.startswith(".spool-tmp-")]
    with open(os.path.join(spool, "doc-3")) as f:
        assert f.read() == "gamma"

    # redelivered epoch: commit must drop temps without re-publishing
    w = SpoolStreamWriter({"path": spool})
    tmp = os.path.join(spool, ".spool-tmp-redeliver")
    with open(tmp, "w") as f:
        f.write("SHOULD_NOT_PUBLISH")
    w.commit([SpoolCommitMessage(files=[(tmp, os.path.join(spool, "doc-1"))])], 0)
    with open(os.path.join(spool, "doc-1")) as f:
        assert f.read() == "alpha"  # original content intact
    assert not os.path.exists(tmp)

    # composition: the filemeta source consumes what the stream produced
    from flume_source_spark.sources.filemeta import register as reg_meta

    reg_meta(spark)
    got = (
        spark.read.format("filemeta")
        .option("path", spool)
        .option("canary", "false")
        .load()
        .select("file_name")
        .collect()
    )
    assert sorted(r["file_name"] for r in got) == ["doc-1", "doc-2", "doc-3"]


def test_stream_spool_dest_exists_fails_epoch_not_file(spark, tmp_path):
    """ADVICE r4 (medium): the STREAM commit must carry the batch
    writer's dest-exists contract — a NEW epoch re-emitting an
    already-published file_name fails the epoch (temps cleaned,
    original file untouched) instead of silently destroying it.
    overwrite=true opts in to replacement."""
    from flume_source_spark.sources.spool_writer import (
        SpoolCommitMessage,
        SpoolStreamWriter,
    )

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    final = os.path.join(spool, "doc-1")
    with open(final, "w") as f:
        f.write("original")

    w = SpoolStreamWriter({"path": spool})
    # simulate epoch 0 already committed so epoch 1 is NEW (not a
    # redelivery — that path drops temps silently by design)
    with open(os.path.join(spool, ".spool-epoch"), "w") as f:
        f.write("0")
    tmp = os.path.join(spool, ".spool-tmp-clash")
    with open(tmp, "w") as f:
        f.write("CLOBBER")
    import pytest

    with pytest.raises(FileExistsError, match="doc-1"):
        w.commit([SpoolCommitMessage(files=[(tmp, final)])], 1)
    with open(final) as f:
        assert f.read() == "original"  # previously published file intact
    assert not os.path.exists(tmp)  # temp cleaned

    # explicit opt-in replaces
    w2 = SpoolStreamWriter({"path": spool, "overwrite": "true"})
    tmp2 = os.path.join(spool, ".spool-tmp-ow")
    with open(tmp2, "w") as f:
        f.write("replaced")
    w2.commit([SpoolCommitMessage(files=[(tmp2, final)])], 1)
    with open(final) as f:
        assert f.read() == "replaced"


def test_spool_duplicate_finals_within_one_commit_fail(spark, tmp_path):
    """ADVICE r5 (medium): two rows of ONE commit targeting the same
    final name pass any dest-exists check (the dest isn't on disk
    yet) and the second publish would silently destroy the first —
    the commit must fail instead, batch and stream alike, with temps
    cleaned and nothing published."""
    from flume_source_spark.sources.spool_writer import (
        SpoolCommitMessage,
        SpoolStreamWriter,
    )

    d = str(tmp_path / "spool")
    with pytest.raises(Exception, match="duplicate spool destinations"):
        _write(spark, [("same.txt", "one"), ("same.txt", "two")], d)
    assert sorted(os.listdir(d)) == []  # nothing published, temps cleaned

    # stream epoch path: same contract
    spool = str(tmp_path / "spool2")
    os.makedirs(spool)
    w = SpoolStreamWriter({"path": spool})
    final = os.path.join(spool, "doc-1")
    t1, t2 = os.path.join(spool, ".t1"), os.path.join(spool, ".t2")
    for t, body in ((t1, "one"), (t2, "two")):
        with open(t, "w") as f:
            f.write(body)
    with pytest.raises(FileExistsError, match="duplicate spool destinations"):
        w.commit([SpoolCommitMessage(files=[(t1, final), (t2, final)])], 0)
    assert not os.path.exists(final)
    assert not os.path.exists(t1) and not os.path.exists(t2)


def test_spool_publish_is_no_replace_under_toctou(tmp_path):
    """The publish primitive itself must refuse to clobber: a dest
    appearing AFTER the pre-check but BEFORE the publish (TOCTOU)
    raises instead of replacing — link(2)+unlink, not rename(2)."""
    from flume_source_spark.sources.spool_writer import _publish_no_replace

    tmp = str(tmp_path / ".tmp-x")
    final = str(tmp_path / "x.txt")
    with open(tmp, "w") as f:
        f.write("new")
    with open(final, "w") as f:
        f.write("original")  # the racing writer won
    with pytest.raises(FileExistsError):
        _publish_no_replace(tmp, final)
    assert open(final).read() == "original"
    # and with no dest present it publishes atomically
    os.remove(final)
    _publish_no_replace(tmp, final)
    assert open(final).read() == "new"
    assert not os.path.exists(tmp)


def test_spool_midloop_toctou_cleans_unpublished_temps(tmp_path, monkeypatch):
    """ADVICE r6: a dest appearing INSIDE the check→publish window
    (mid-loop TOCTOU) must leave the commit in the same shape as the
    pre-check clash path — already-published finals KEPT, the failing
    pair's temp and every later unpublished temp removed by commit
    ITSELF (not deferred to abort), and the squatter file intact.
    The squatter is planted by the publish hook right before pair 1
    publishes — after commit's pre-check already passed."""
    import pytest

    import flume_source_spark.sources.spool_writer as sw

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    temps, finals = [], []
    for i in range(3):
        t = os.path.join(spool, f".spool-tmp-{i}")
        with open(t, "w") as f:
            f.write(f"body-{i}")
        temps.append(t)
        finals.append(os.path.join(spool, f"doc-{i}"))

    real_publish = sw._publish_no_replace

    def squat_then_publish(tmp, final):
        if final == finals[1] and not os.path.exists(final):
            with open(final, "w") as f:
                f.write("squatter")  # appears inside the TOCTOU window
        real_publish(tmp, final)

    monkeypatch.setattr(sw, "_publish_no_replace", squat_then_publish)
    w = sw.SpoolWriter({"path": spool}, overwrite=False)
    with pytest.raises(FileExistsError):
        w.commit([sw.SpoolCommitMessage(files=list(zip(temps, finals)))])
    assert os.path.exists(finals[0])  # published final kept
    with open(finals[1]) as f:
        assert f.read() == "squatter"  # squatter not clobbered
    # failing pair's temp and the unpublished remainder cleaned by
    # commit itself, no abort() needed
    assert not os.path.exists(temps[1]) and not os.path.exists(temps[2])
    assert not os.path.exists(finals[2])


def test_stream_spool_midloop_toctou_cleans_unpublished_temps(tmp_path, monkeypatch):
    """The STREAM commit must carry the batch writer's mid-loop TOCTOU
    contract (same shared publish loop): a dest appearing inside the
    check→publish window fails the epoch with already-published finals
    kept, the unpublished remainder's temps removed by commit itself,
    the squatter intact — and the epoch marker NOT advanced, so the
    epoch stays re-drivable."""
    import pytest

    import flume_source_spark.sources.spool_writer as sw

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    temps, finals = [], []
    for i in range(3):
        t = os.path.join(spool, f".spool-tmp-{i}")
        with open(t, "w") as f:
            f.write(f"body-{i}")
        temps.append(t)
        finals.append(os.path.join(spool, f"doc-{i}"))

    real_publish = sw._publish_no_replace

    def squat_then_publish(tmp, final):
        if final == finals[1] and not os.path.exists(final):
            with open(final, "w") as f:
                f.write("squatter")
        real_publish(tmp, final)

    monkeypatch.setattr(sw, "_publish_no_replace", squat_then_publish)
    w = sw.SpoolStreamWriter({"path": spool})
    with pytest.raises(FileExistsError):
        w.commit([sw.SpoolCommitMessage(files=list(zip(temps, finals)))], 5)
    assert os.path.exists(finals[0])  # published final kept
    with open(finals[1]) as f:
        assert f.read() == "squatter"  # squatter not clobbered
    assert not os.path.exists(temps[1]) and not os.path.exists(temps[2])
    assert not os.path.exists(finals[2])
    assert w._last_epoch() == -1  # marker untouched: epoch re-drivable
