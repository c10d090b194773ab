"""Parity tests for the filemeta source (FIXTURES.md §B scenarios).

Unit tests pin the reference behaviors (selection order, tiebreak,
filtering, body format, canary, rename protocol); streaming tests run
the real ``readStream.format("filemeta")`` path end-to-end.
"""

from __future__ import annotations

import os
import stat
import time
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from flume_source_spark.sources.filemeta import (
    FileMetaDataSource,
    _canary_probe,
    _list_candidates,
    _order_files,
    _rename_commit,
    body_bytes,
    format_mtime_unpadded,
    register,
)


def make_files(d, entries):
    """entries: (name, mtime_offset_s) — materialize with controlled mtimes."""
    base = 1700000000.0
    for name, off in entries:
        p = os.path.join(d, name)
        with open(p, "w") as f:
            f.write(f"content of {name}\n")
        os.utime(p, (base + off, base + off))


# ---------- unit parity ----------


def test_body_format_unpadded_golden():
    # CephFSEventReader.java:231-234: "yyyy-MM-dd H:m:s" → 9:5:7 not 09:05:07
    assert format_mtime_unpadded(datetime(2024, 1, 5, 9, 5, 7)) == "2024-01-05 9:5:7"
    assert format_mtime_unpadded(datetime(2024, 12, 15, 23, 59, 59)) == "2024-12-15 23:59:59"


def test_order_oldest_youngest_tiebreak():
    files = [("b", "/x/b", 100.0), ("a", "/x/a", 110.0), ("c", "/x/c", 120.0)]
    assert [f[0] for f in _order_files(files, "oldest")] == ["b", "a", "c"]
    assert [f[0] for f in _order_files(files, "youngest")] == ["c", "a", "b"]
    # tie → lexicographically smallest first in BOTH orders (Reader:139-140,150-151)
    ties = [("bb", "/x/bb", 100.0), ("aa", "/x/aa", 100.0)]
    assert [f[0] for f in _order_files(ties, "oldest")] == ["aa", "bb"]
    assert [f[0] for f in _order_files(ties, "youngest")] == ["aa", "bb"]


def test_order_random_is_listing_order():
    # R6: "RANDOM" = cached listing order, no RNG (Reader:131-134)
    files = [("z", "/x/z", 1.0), ("m", "/x/m", 2.0), ("a", "/x/a", 3.0)]
    assert _order_files(files, "random") == files


def test_invalid_order_raises():
    with pytest.raises(ValueError):
        _order_files([], "chaotic")


def test_candidate_filtering(tmp_path):
    d = str(tmp_path)
    make_files(d, [("good", 0), (".hidden", 1), ("done.COMPLETED", 2)])
    os.mkdir(os.path.join(d, "subdir"))
    names = [f[0] for f in _list_candidates(d, ".COMPLETED", "^$")]
    assert names == ["good"] or set(names) == {"good"}


def test_ignore_pattern_works(tmp_path):
    # The reference documents ignorePattern but never wires it
    # (Reader:275-278) — ours works, and the default matches nothing.
    d = str(tmp_path)
    make_files(d, [("keep.txt", 0), ("skip.tmp", 1)])
    names = {f[0] for f in _list_candidates(d, ".COMPLETED", r".*\.tmp$")}
    assert names == {"keep.txt"}
    default = {f[0] for f in _list_candidates(d, ".COMPLETED", "^$")}
    assert default == {"keep.txt", "skip.tmp"}


def test_canary_fails_on_unwritable_dir(tmp_path):
    # a missing dir always fails the probe; a chmod-0 dir only fails
    # for non-root users (CI may run as root)
    with pytest.raises(RuntimeError, match="spooling directory"):
        _canary_probe(str(tmp_path / "does-not-exist"))
    if os.geteuid() != 0:
        d = tmp_path / "ro"
        d.mkdir()
        os.chmod(d, stat.S_IRUSR | stat.S_IXUSR)
        try:
            with pytest.raises(RuntimeError, match="spooling directory"):
                _canary_probe(str(d))
        finally:
            os.chmod(d, stat.S_IRWXU)


def test_rename_commit_and_collision(tmp_path):
    d = str(tmp_path)
    make_files(d, [("file1", 0)])
    p = os.path.join(d, "file1")
    _rename_commit(p, ".COMPLETED")
    assert not os.path.exists(p)
    assert os.path.exists(p + ".COMPLETED")
    # collision: dest exists → refuse (Reader:189-192)
    make_files(d, [("file1", 5)])
    with pytest.raises(RuntimeError, match="re-used"):
        _rename_commit(p, ".COMPLETED")


# ---------- batch reader e2e ----------


def test_batch_read_single_file(spark, tmp_path):
    register(spark)
    d = str(tmp_path)
    make_files(d, [("file1", 0)])
    df = spark.read.format("filemeta").option("path", d).load()
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.file_name == "file1"
    assert r.file_path == os.path.join(d, "file1")
    mt = datetime.fromtimestamp(1700000000.0)
    assert r.body == f"file1,{r.file_path},{format_mtime_unpadded(mt)}"
    assert r.last_modified is not None


def test_batch_read_filters_and_ignore(spark, tmp_path):
    register(spark)
    d = str(tmp_path)
    make_files(d, [("good", 0), (".hidden", 1), ("done.COMPLETED", 2), ("skip.tmp", 3)])
    os.mkdir(os.path.join(d, "subdir"))
    df = (
        spark.read.format("filemeta")
        .option("path", d)
        .option("ignorePattern", r".*\.tmp$")
        .load()
    )
    assert [r.file_name for r in df.collect()] == ["good"]


def test_batch_empty_dir(spark, tmp_path):
    register(spark)
    df = spark.read.format("filemeta").option("path", str(tmp_path)).load()
    assert df.count() == 0


def test_charset_encoding(spark, tmp_path):
    # body bytes in configured charsets (Reader:94, Consts:18-19):
    # default UTF-8 plus GBK / UTF-16LE / ISO-8859-1 round-trips
    register(spark)
    d = str(tmp_path)
    make_files(d, [("文件一.txt", 0)])
    df = spark.read.format("filemeta").option("path", d).load()
    for spark_cs, py_cs in [("UTF-8", "utf-8"), ("GBK", "gbk"), ("UTF-16LE", "utf-16-le")]:
        row = body_bytes(spark, df, spark_cs).select("body_bytes", "body").collect()[0]
        assert bytes(row.body_bytes) == row.body.encode(py_cs), spark_cs
    # non-representable chars in a narrow charset: Spark raises
    # MALFORMED_CHARACTER_CODING (stricter than the reference's Java
    # encoder, which silently substitutes '?') — pinned as an error
    with pytest.raises(Exception, match="(?i)malformed|charac"):
        body_bytes(spark, df, "ISO-8859-1").select("body_bytes").collect()


def test_stream_admission_order_youngest(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("b", 0), ("a", 10), ("c", 20)])
    seen: list[str] = []
    q = (
        spark.readStream.format("filemeta")
        .option("path", d)
        .option("consumeOrder", "youngest")
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(lambda df, eid: seen.extend(r.file_name for r in df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        assert seen == ["c", "a", "b"]  # newest first (Reader:135-145)
    finally:
        q.stop()


def test_missing_path_option_raises(spark, tmp_path):
    register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("filemeta").load().collect()


# ---------- streaming e2e ----------


def run_stream(spark, d, tmp_path, extra_opts=None, checkpoint=None):
    reader = spark.readStream.format("filemeta").option("path", d)
    for k, v in (extra_opts or {}).items():
        reader = reader.option(k, v)
    name = f"fm_{abs(hash((d, str(extra_opts), str(checkpoint)))) % 10**8}"
    writer = reader.load().writeStream.format("memory").queryName(name).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    return q, name


def test_stream_checkpoint_mode_no_rename(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("file1", 0)])
    q, name = run_stream(spark, d, tmp_path)
    try:
        q.processAllAvailable()
        rows = spark.sql(f"select * from {name}").collect()
        assert [r.file_name for r in rows] == ["file1"]
        assert os.path.exists(os.path.join(d, "file1"))  # untouched
    finally:
        q.stop()


def test_stream_new_arrivals_no_duplicates(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("early", 0)])
    q, name = run_stream(spark, d, tmp_path)
    try:
        q.processAllAvailable()
        make_files(d, [("late1", 10), ("late2", 20)])
        q.processAllAvailable()
        q.processAllAvailable()  # extra cycle: still no duplicates
        names = sorted(r.file_name for r in spark.sql(f"select * from {name}").collect())
        assert names == ["early", "late1", "late2"]
    finally:
        q.stop()


def test_stream_rename_commit_mode(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("file1", 0)])
    q, name = run_stream(spark, d, tmp_path, {"commitMode": "rename"})
    try:
        q.processAllAvailable()
        deadline = time.time() + 10  # commit() runs just after the batch completes
        while time.time() < deadline and os.path.exists(os.path.join(d, "file1")):
            time.sleep(0.1)
        assert os.path.exists(os.path.join(d, "file1.COMPLETED"))
        assert not os.path.exists(os.path.join(d, "file1"))
        # next cycle: suffixed file is filtered, nothing new
        q.processAllAvailable()
        rows = spark.sql(f"select * from {name}").collect()
        assert [r.file_name for r in rows] == ["file1"]
    finally:
        q.stop()


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    cp = str(tmp_path / "cp")
    os.makedirs(d)
    make_files(d, [("first", 0)])
    run1: list[str] = []
    run2: list[str] = []

    def start(acc):
        return (
            spark.readStream.format("filemeta")
            .option("path", d)
            .load()
            .writeStream.option("checkpointLocation", cp)
            .foreachBatch(lambda df, eid: acc.extend(r.file_name for r in df.collect()))
            .start()
        )

    q = start(run1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert run1 == ["first"]
    make_files(d, [("second", 10)])
    q2 = start(run2)
    try:
        q2.processAllAvailable()
        # checkpoint resume: 'first' is already consumed, only 'second' arrives
        assert run2 == ["second"]
    finally:
        q2.stop()


def test_stream_admission_order_oldest(spark, tmp_path):
    # maxFilesPerTrigger=1 → one file per micro-batch, admitted in
    # OLDEST priority; capture per-batch arrival via foreachBatch.
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("b", 0), ("a", 10), ("c", 20)])
    seen: list[list[str]] = []

    def sink(df, epoch_id):
        seen.append([r.file_name for r in df.collect()])

    q = (
        spark.readStream.format("filemeta")
        .option("path", d)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        flat = [n for batch in seen for n in batch]
        assert flat == ["b", "a", "c"]
    finally:
        q.stop()


def test_partitioned_reader_emits_and_renames(spark, tmp_path):
    """readerMode=partitioned: executor-side reads, rename commit, new
    arrivals across micro-batches, no duplicates."""
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("b", 0), ("a", 10)])
    got: list[str] = []
    q = (
        spark.readStream.format("filemeta")
        .option("path", d)
        .option("readerMode", "partitioned")
        .option("commitMode", "rename")
        .load()
        .writeStream.foreachBatch(lambda df, eid: got.extend(r.file_name for r in df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        make_files(d, [("c", 20)])
        q.processAllAvailable()
        # commit(end) for a batch fires as a LATER batch progresses (the
        # rename lags one cycle — the same post-durability window the
        # reference has); kick one more batch so c's commit lands
        make_files(d, [("kick", 30)])
        q.processAllAvailable()
        deadline = time.time() + 10
        while time.time() < deadline and len([f for f in os.listdir(d) if f.endswith(".COMPLETED")]) < 3:
            time.sleep(0.1)
    finally:
        q.stop()
    assert sorted(got) == ["a", "b", "c", "kick"]
    done = sorted(f for f in os.listdir(d) if f.endswith(".COMPLETED"))
    assert done[:3] == ["a.COMPLETED", "b.COMPLETED", "c.COMPLETED"]


def test_partitioned_reader_checkpoint_mode_no_duplicates(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("one", 0)])
    got: list[str] = []
    q = (
        spark.readStream.format("filemeta")
        .option("path", d)
        .option("readerMode", "partitioned")
        .load()
        .writeStream.foreachBatch(lambda df, eid: got.extend(r.file_name for r in df.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()  # no new files → no re-emission
        make_files(d, [("two", 10)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(got) == ["one", "two"]
    assert os.path.exists(os.path.join(d, "one"))  # untouched in checkpoint mode


def test_partitioned_reader_restart_no_data_loss(spark, tmp_path):
    """Restart from checkpoint with the partitioned reader: files
    arriving after the restart MUST be emitted. Regression for the
    reset-batch-counter bug where post-restart offsets were planned as
    empty batches (and rename mode renamed files it never emitted)."""
    register(spark)
    d = str(tmp_path / "watch")
    cp = str(tmp_path / "cp")
    os.makedirs(d)
    make_files(d, [("pre1", 0), ("pre2", 10)])

    def start(acc):
        return (
            spark.readStream.format("filemeta")
            .option("path", d)
            .option("readerMode", "partitioned")
            .option("commitMode", "rename")
            .load()
            .writeStream.option("checkpointLocation", cp)
            .foreachBatch(lambda df, eid: acc.extend(r.file_name for r in df.collect()))
            .start()
        )

    run1: list[str] = []
    q = start(run1)
    try:
        q.processAllAvailable()
        make_files(d, [("pre3", 20)])  # second batch advances the counter
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(run1) == ["pre1", "pre2", "pre3"]
    run2: list[str] = []
    make_files(d, [("post1", 30), ("post2", 40)])
    q2 = start(run2)
    try:
        q2.processAllAvailable()
        make_files(d, [("post3", 50)])
        q2.processAllAvailable()
    finally:
        q2.stop()
    # un-renamed leftovers from run1's final batch may re-emit
    # (at-least-once), but every post-restart file MUST appear
    assert {"post1", "post2", "post3"} <= set(run2), run2


def test_lifecycle_10_start_stop_cycles(spark, tmp_path):
    """Mirror of the reference's testLifecycle (TestCephSource.java:
    100-124): 10 start/stop cycles; with a shared checkpoint no file is
    lost or duplicated across cycles."""
    register(spark)
    d = str(tmp_path / "watch")
    cp = str(tmp_path / "cp")
    os.makedirs(d)
    seen: list[str] = []
    for cycle in range(10):
        make_files(d, [(f"f{cycle}", cycle * 10)])
        q = (
            spark.readStream.format("filemeta")
            .option("path", d)
            .load()
            .writeStream.option("checkpointLocation", cp)
            .foreachBatch(lambda df, eid: seen.extend(r.file_name for r in df.collect()))
            .start()
        )
        try:
            assert q.isActive
            q.processAllAvailable()
        finally:
            q.stop()
        assert not q.isActive
    assert sorted(seen) == [f"f{c}" for c in range(10)]  # each exactly once


def test_stream_metrics_via_listener(spark, tmp_path):
    """R16 parity: the reference double-counts its SourceCounter
    (CephFsSource.java:144-145 + 162-163); Spark's StreamingQuery
    progress counts each row once — asserted here."""
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("a", 0), ("b", 10)])
    q, name = run_stream(spark, d, tmp_path)
    try:
        q.processAllAvailable()
        total = sum(p["numInputRows"] for p in [q.lastProgress] if p) or sum(
            p["numInputRows"] for p in q.recentProgress
        )
        rows = spark.sql(f"select * from {name}").count()
    finally:
        q.stop()
    assert rows == 2
    total_all = sum(p["numInputRows"] for p in q.recentProgress)
    assert total_all == 2, f"metrics must count each event once, got {total_all}"


def test_drain_directory_available_now(spark, tmp_path):
    """One-shot drain API: processes all current files, renames them
    (parity mode), terminates on its own, and a second drain after new
    arrivals picks up only the new files."""
    from flume_source_spark.sources.filemeta import drain_directory

    d = str(tmp_path / "watch")
    os.makedirs(d)
    make_files(d, [("f1", 0), ("f2", 10)])
    got: list[str] = []
    drain_directory(spark, d, lambda df, eid: got.extend(r.file_name for r in df.collect()),
                    commitMode="rename")
    assert sorted(got) == ["f1", "f2"]
    deadline = time.time() + 10
    while time.time() < deadline and len([f for f in os.listdir(d) if f.endswith(".COMPLETED")]) < 2:
        time.sleep(0.1)
    assert sorted(os.listdir(d)) == ["f1.COMPLETED", "f2.COMPLETED"]
    make_files(d, [("f3", 20)])
    got2: list[str] = []
    drain_directory(spark, d, lambda df, eid: got2.extend(r.file_name for r in df.collect()),
                    commitMode="rename")
    assert got2 == ["f3"]


def test_stream_empty_dir_idles(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "watch")
    os.makedirs(d)
    q, name = run_stream(spark, d, tmp_path)
    try:
        q.processAllAvailable()
        assert spark.sql(f"select * from {name}").count() == 0
        assert q.exception() is None
    finally:
        q.stop()


# ---------- offset compaction (maxFileAge) + maxBackoff parity ----------


def _simple_reader(d, **extra):
    from flume_source_spark.sources.filemeta import FileMetaSimpleStreamReader, _Options

    opts = _Options({"path": d, "canary": "false", **extra})
    return FileMetaSimpleStreamReader(opts)


def test_offset_compaction_bounds_consumed_map(tmp_path):
    """With maxFileAge, the checkpoint-mode offset is bounded by the
    retention horizon, and compacted-away files are never re-admitted
    (eviction and admission share one cutoff)."""
    d = str(tmp_path)
    r = _simple_reader(d, maxfileage="100")
    make_files(d, [(f"wave1_{i:03d}", i) for i in range(50)])
    it, off1 = r.read(r.initialOffset())
    rows1 = list(it)
    assert len(rows1) == 50
    assert len(off1["consumed"]) == 50  # all within horizon of wm

    # second wave lands far past the horizon. Wave-1 entries survive
    # THIS batch's offset (compaction uses the start-of-batch cutoff so
    # a restart replay of this very range can't lose rows)...
    make_files(d, [(f"wave2_{i:03d}", 200 + i) for i in range(50)])
    it, off2 = r.read(off1)
    rows2 = list(it)
    assert len(rows2) == 50
    assert len(off2["consumed"]) == 100  # wave1 still replayable here

    # ...and evict one batch later, once the start cutoff itself has
    # moved past them: the offset is bounded by arrival-rate × horizon
    # with one batch of slack, never unbounded.
    it, off3 = r.read(off2)
    assert list(it) == []
    assert set(off3["consumed"]) == {f"wave2_{i:03d}" for i in range(50)}
    assert len(off3["consumed"]) == 50  # bounded: NOT 100

    # wave-1 files still sit on disk below the cutoff — compaction must
    # not resurrect them, and wave-2 stays consumed
    it, off4 = r.read(off3)
    assert list(it) == []
    assert off4["consumed"] == off3["consumed"]


def test_offset_compaction_same_batch_replay_no_loss(tmp_path):
    """Regression: a batch admitting files whose mtimes straddle the
    horizon (old file within the START cutoff + much newer file) must
    keep BOTH in its end offset — compacting with the end-of-batch
    watermark would evict the old file from the very offset range that
    references it, and a restart replaying (start, end) via
    readBetweenOffsets would silently drop its row."""
    d = str(tmp_path)
    r = _simple_reader(d, maxfileage="100")
    make_files(d, [("old_file", 10), ("new_file", 500)])
    start = r.initialOffset()
    it, end = r.read(start)
    assert len(list(it)) == 2
    assert set(end["consumed"]) == {"old_file", "new_file"}  # both replayable

    replayed = {row[0] for row in r.readBetweenOffsets(start, end)}
    assert replayed == {"old_file", "new_file"}  # restart loses nothing


def test_offset_compaction_off_by_default(tmp_path):
    d = str(tmp_path)
    r = _simple_reader(d)
    make_files(d, [(f"f{i:03d}", i) for i in range(30)])
    it, off = r.read(r.initialOffset())
    assert len(list(it)) == 30
    assert len(off["consumed"]) == 30  # no horizon → everything remembered
    # old checkpoints (no "wm" key) keep working
    legacy = {"consumed": dict(off["consumed"])}
    it, off2 = r.read(legacy)
    assert list(it) == []


def test_partitioned_reader_consumed_memory_bounded(tmp_path):
    from flume_source_spark.sources.filemeta import FileMetaPartitionedStreamReader, _Options

    d = str(tmp_path)
    r = FileMetaPartitionedStreamReader(
        _Options({"path": d, "canary": "false", "maxfileage": "100"})
    )
    make_files(d, [(f"a{i:03d}", i) for i in range(40)])
    r.latestOffset()
    make_files(d, [(f"b{i:03d}", 500 + i) for i in range(40)])
    off = r.latestOffset()
    assert {f[0] for f in off["files"]} == {f"b{i:03d}" for i in range(40)}
    assert len(r._consumed) == 40  # a* evicted from driver memory
    # stale-but-present a* files are not re-admitted after eviction
    off2 = r.latestOffset()
    assert off2 == off


def test_max_backoff_accepted_with_warning(tmp_path):
    from flume_source_spark.sources.filemeta import _Options

    d = str(tmp_path)
    with pytest.warns(UserWarning, match="maxBackoff"):
        opts = _Options({"path": d, "maxbackoff": "8000"})
    assert opts.max_backoff == 8000
    with pytest.raises(ValueError):
        _Options({"path": d, "maxbackoff": "-1"})
    # default: reference's DEFAULT_MAX_BACKOFF, silently
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert _Options({"path": d}).max_backoff == 4000


def test_invalid_max_file_age_raises(tmp_path):
    from flume_source_spark.sources.filemeta import _Options

    with pytest.raises(ValueError):
        _Options({"path": str(tmp_path), "maxfileage": "0"})


# ---------- rename-mode crash window (reference §3.2 loss fixed) ----------


def test_rename_mode_crash_between_admit_and_commit_is_at_least_once(tmp_path):
    """The reference renames the file BEFORE handing the event to the
    channel, so a full channel after the rename drops the event forever
    (CephFsSource.java:149-159 + CephFSEventReader.java:96). Here the
    rename is deferred to commit(): a batch that is admitted (read /
    latestOffset ran) but crashes before commit() leaves the file
    un-renamed on disk, and a restarted reader re-admits it —
    at-least-once, never lossy."""
    d = str(tmp_path)
    make_files(d, [("file1", 0)])

    # --- simple reader: admit, then "crash" (no commit, fresh reader)
    r1 = _simple_reader(d, commitmode="rename")
    it, end = r1.read(r1.initialOffset())
    assert [t[0] for t in it] == ["file1"]
    # rename deferred: the watched file is untouched pre-commit
    assert os.path.exists(os.path.join(d, "file1"))
    assert not os.path.exists(os.path.join(d, "file1.COMPLETED"))

    r2 = _simple_reader(d, commitmode="rename")  # restart: in-flight set gone
    it2, end2 = r2.read(r2.initialOffset())
    assert [t[0] for t in it2] == ["file1"]  # re-admitted, not lost
    r2.commit(end2)
    assert os.path.exists(os.path.join(d, "file1.COMPLETED"))
    # post-commit: nothing left to admit
    it3, _ = r2.read(end2)
    assert list(it3) == []


def test_rename_mode_partitioned_crash_window_at_least_once(tmp_path):
    from flume_source_spark.sources.filemeta import FileMetaPartitionedStreamReader, _Options

    d = str(tmp_path)
    make_files(d, [("file1", 0)])
    r1 = FileMetaPartitionedStreamReader(
        _Options({"path": d, "canary": "false", "commitmode": "rename"})
    )
    off = r1.latestOffset()
    assert [f[0] for f in off["files"]] == ["file1"]
    assert os.path.exists(os.path.join(d, "file1"))  # rename deferred

    # crash before commit → restart with empty in-flight memory
    r2 = FileMetaPartitionedStreamReader(
        _Options({"path": d, "canary": "false", "commitmode": "rename"})
    )
    off2 = r2.latestOffset()
    assert [f[0] for f in off2["files"]] == ["file1"]  # re-admitted
    r2.commit(off2)
    assert os.path.exists(os.path.join(d, "file1.COMPLETED"))
    # manifest replay after the rename is tolerant (file already moved)
    r2.commit(off2)


# ---------- sharded (executor-side) listing ----------


def test_sharded_listing_reads_all_shards_and_root(spark, tmp_path):
    """listingMode=sharded: files in shard subdirectories AND loose
    top-level files all emit; candidate filters (suffix/dot/ignore)
    apply per shard exactly as in flat mode."""
    register(spark)
    make_files(str(tmp_path), [("loose_a", 0), ("loose_b.COMPLETED", 1), (".hidden", 2)])
    for shard in ("shard0", "shard1", "shard2"):
        d = tmp_path / shard
        d.mkdir()
        make_files(str(d), [(f"{shard}_f{i}", i) for i in range(4)])
    make_files(str(tmp_path / "shard1"), [("skipme.COMPLETED", 9)])
    got = (
        spark.read.format("filemeta")
        .option("path", str(tmp_path))
        .option("listingMode", "sharded")
        .option("canary", "false")
        .load()
        .select("file_name")
        .collect()
    )
    names = sorted(r.file_name for r in got)
    expect = sorted(["loose_a"] + [f"shard{s}_f{i}" for s in range(3) for i in range(4)])
    assert names == expect


def test_sharded_listing_matches_flat_union(spark, tmp_path):
    """Sharded output == the union of flat reads over root + each
    shard (same rows, any order)."""
    register(spark)
    make_files(str(tmp_path), [("root_x", 0)])
    for shard in ("p0", "p1"):
        d = tmp_path / shard
        d.mkdir()
        make_files(str(d), [(f"{shard}_y{i}", i) for i in range(3)])
    sharded = (
        spark.read.format("filemeta")
        .option("path", str(tmp_path))
        .option("listingMode", "sharded")
        .option("canary", "false")
        .load()
        .select("file_name", "file_path", "body")
    )
    flats = []
    for d in (tmp_path, tmp_path / "p0", tmp_path / "p1"):
        flats.append(
            spark.read.format("filemeta")
            .option("path", str(d))
            .option("canary", "false")
            .load()
            .select("file_name", "file_path", "body")
        )
    flat_union = flats[0].unionAll(flats[1]).unionAll(flats[2])
    assert sorted(map(tuple, sharded.collect())) == sorted(map(tuple, flat_union.collect()))


def test_flat_mode_still_ignores_subdirectories(spark, tmp_path):
    """Default (flat) semantics are unchanged by the sharded feature:
    subdirectory contents must NOT appear (reference parity — the
    spool dir is flat; Reader:111-121 skips dirs)."""
    register(spark)
    make_files(str(tmp_path), [("top", 0)])
    sub = tmp_path / "sub"
    sub.mkdir()
    make_files(str(sub), [("nested", 1)])
    got = (
        spark.read.format("filemeta")
        .option("path", str(tmp_path))
        .option("canary", "false")
        .load()
        .select("file_name")
        .collect()
    )
    assert [r.file_name for r in got] == ["top"]


def test_sharded_listing_partitions_plan(tmp_path):
    """Planner contract: #input partitions = min(listingPartitions,
    #shards incl. root), and partitions carry shard PATHS (executor
    does the listing), never file lists."""
    from flume_source_spark.sources.filemeta import (
        FileMetaBatchReader,
        ShardsPartition,
        _Options,
    )

    for i in range(5):
        (tmp_path / f"s{i}").mkdir()
    opts = _Options(
        {"path": str(tmp_path), "listingmode": "sharded", "listingpartitions": "3", "canary": "false"}
    )
    parts = FileMetaBatchReader(opts).partitions()
    assert len(parts) == 3
    assert all(isinstance(p, ShardsPartition) for p in parts)
    covered = sorted(s for p in parts for s in p.shards)
    assert covered == sorted([str(tmp_path)] + [str(tmp_path / f"s{i}") for i in range(5)])


def test_invalid_listing_mode_raises(tmp_path):
    from flume_source_spark.sources.filemeta import _Options

    import pytest

    with pytest.raises(ValueError, match="invalid listingMode"):
        _Options({"path": str(tmp_path), "listingmode": "banana"})
    with pytest.raises(ValueError, match="invalid listingPartitions"):
        _Options({"path": str(tmp_path), "listingpartitions": "0"})
