"""Live tests for the streaming crawl-ingest composition
(flume_source_spark/streaming/crawl_pipeline.py): filemeta stream →
Bloom screen → incremental LSH match against the standing signature
index. Pins cross-batch match semantics, epoch-fence idempotence,
restart-from-commit, the filemeta end-to-end path, and stream ==
single-batch-replay twin equality (the determinism argument that
substitutes for a streaming SQL oracle)."""

from __future__ import annotations

import os

import pandas as pd

from flume_source_spark.streaming.crawl_pipeline import (
    StreamingCrawlPipeline,
    crawl_pipeline_batch_twin,
)

DOCS_SCHEMA = "doc_id LONG, text STRING"


def _text(prefix: str, n: int = 30) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _near(text: str) -> str:
    """One word changed — shingle overlap stays far above τ=0.5."""
    toks = text.split(" ")
    toks[len(toks) // 2] = "CHANGED"
    return " ".join(toks)


def write_docs(d: str, name: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    ).to_parquet(os.path.join(d, f"{name}.parquet"))


def _drain(spark, d, sink, checkpoint):
    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_crawl_stream_cross_batch_matches_and_restart(spark, tmp_path):
    d = str(tmp_path / "docs")
    state = str(tmp_path / "crawl_state")
    out = str(tmp_path / "crawl_out")
    ckpt = str(tmp_path / "ckpt")
    sink = StreamingCrawlPipeline(state, out)

    a, b, c = _text("a"), _text("b"), _text("c")
    # batch 1: two unique docs, one pair of INTRA-batch near-dups
    # (1 vs 11) — must NOT match (cross-batch semantics)
    write_docs(d, "b1", [(1, a), (2, b), (11, _near(a))])
    _drain(spark, d, sink, ckpt)
    m1 = sink.match_output(spark)
    assert m1 is None or m1.count() == 0

    # batch 2: doc 3 near-dups doc 1; doc 4 unique
    write_docs(d, "b2", [(3, _near(a)), (4, c)])
    _drain(spark, d, sink, ckpt)
    m2 = {(r.i, r.j) for r in sink.match_output(spark).collect()}
    assert (3, 1) in m2 and (3, 11) in m2, m2
    assert all(i == 3 for i, _ in m2), m2  # doc 4 clean
    for r in sink.match_output(spark).collect():
        assert r.est_jaccard >= 0.5

    # batch 3: near-dup of BATCH-2 content — the index accumulates
    write_docs(d, "b3", [(5, _near(c))])
    _drain(spark, d, sink, ckpt)
    m3 = {(r.i, r.j) for r in sink.match_output(spark).collect()}
    assert (5, 4) in m3, m3

    # bloom screen rows exist for every doc, exact-dup flags none here
    # (all docs differ in at least one segment word)
    screen = {r.doc_id: r.asDict() for r in sink.screening_output(spark).collect()}
    assert set(screen) == {1, 2, 3, 4, 5, 11}

    # restart with a FRESH sink instance + the SAME checkpoint: the
    # committed state (not python state) is the memory
    sink2 = StreamingCrawlPipeline(state, out)
    write_docs(d, "b4", [(6, _near(b))])
    _drain(spark, d, sink2, ckpt)
    m4 = {(r.i, r.j) for r in sink2.match_output(spark).collect()}
    assert (6, 2) in m4, m4


def test_crawl_stream_epoch_fence_no_ops(spark, tmp_path):
    d = str(tmp_path / "docs")
    sink = StreamingCrawlPipeline(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    write_docs(d, "b1", [(1, _text("a"))])
    _drain(spark, d, sink, str(tmp_path / "ckpt"))
    c0 = sink._read_commit()
    # redeliver epoch 0 by hand — must no-op (commit unchanged)
    batch = spark.createDataFrame([(9, _text("z"))], DOCS_SCHEMA)
    sink(batch, 0)
    assert sink._read_commit() == c0
    idx = sink.current_index(spark)
    assert {r.doc_id for r in idx.select("doc_id").collect()} == {1}


def test_crawl_stream_equals_batch_twin(spark, tmp_path):
    """The union of the stream's per-epoch match rows equals a
    single-batch replay matching each doc against strictly earlier
    epochs — same bands, estimator, threshold, per-prefix bucket
    cap."""
    d = str(tmp_path / "docs")
    sink = StreamingCrawlPipeline(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    ckpt = str(tmp_path / "ckpt")
    a, b = _text("a"), _text("b")
    batches = [
        [(1, a), (2, b)],
        [(3, _near(a)), (4, _text("c"))],
        [(5, _near(b)), (6, _near(a))],
    ]
    for i, rows in enumerate(batches):
        write_docs(d, f"b{i}", rows)
        _drain(spark, d, sink, ckpt)

    stream_rows = {
        (r.i, r.j, r.est_jaccard) for r in sink.match_output(spark).collect()
    }
    twin_input = spark.createDataFrame(
        [(doc, text, e) for e, rows in enumerate(batches) for doc, text in rows],
        "doc_id long, text string, epoch long",
    )
    twin_rows = {
        (r.i, r.j, r.est_jaccard)
        for r in crawl_pipeline_batch_twin(twin_input).collect()
    }
    assert stream_rows == twin_rows
    assert stream_rows, "fixture must produce at least one match"


def test_crawl_pipeline_from_filemeta_stream(spark, tmp_path):
    """The reference-source end-to-end: files land in a watched
    directory, the filemeta stream admits them (rename-commit), a
    foreachBatch wrapper loads each admitted file's CONTENT as one
    document and feeds the crawl pipeline — a later file
    near-duplicating an earlier one must surface as an LSH match."""
    from flume_source_spark.sources.filemeta import register

    register(spark)
    watched = str(tmp_path / "incoming")
    os.makedirs(watched)
    sink = StreamingCrawlPipeline(
        str(tmp_path / "state"), str(tmp_path / "out")
    )

    def wrapper(batch_df, epoch_id):
        rows = batch_df.select("file_name", "file_path").collect()
        if not rows:
            return
        sp = batch_df.sparkSession
        docs = sp.createDataFrame(
            [
                (int(r.file_name.split("-")[1]), open(r.file_path).read())
                for r in rows
            ],
            DOCS_SCHEMA,
        )
        sink(docs, epoch_id)

    def drain():
        q = (
            spark.readStream.format("filemeta")
            .option("path", watched)
            .load()
            .writeStream.foreachBatch(wrapper)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    a = _text("a")
    with open(os.path.join(watched, "doc-1"), "w") as f:
        f.write(a)
    drain()
    with open(os.path.join(watched, "doc-2"), "w") as f:
        f.write(_near(a))
    drain()
    matches = {(r.i, r.j) for r in sink.match_output(spark).collect()}
    assert (2, 1) in matches, matches
