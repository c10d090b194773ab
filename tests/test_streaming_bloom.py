"""Live tests for the streaming Bloom-screened dedup sink
(flume_source_spark/streaming/bloom_stream.py): cross-batch flagging,
filter accumulation, epoch-fence idempotence, restart-from-commit,
and end-to-end filter mergeability."""

from __future__ import annotations

import os

import pandas as pd

from flume_source_spark.streaming.bloom_stream import StreamingBloomDedup

DOCS_SCHEMA = "doc_id LONG, text STRING"


def _tokens(prefix: str, n: int = 10) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def write_docs(d: str, name: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}).to_parquet(
        os.path.join(d, f"{name}.parquet")
    )


def docs_stream(spark, d: str):
    return spark.readStream.schema(DOCS_SCHEMA).parquet(d)


def _drain(spark, d, sink, checkpoint):
    q = (
        docs_stream(spark, d)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_bloom_cross_batch_flags_and_restart(spark, tmp_path):
    d = str(tmp_path / "docs")
    state = str(tmp_path / "bloom_state")
    out = str(tmp_path / "screened")
    ckpt = str(tmp_path / "ckpt")
    sink = StreamingBloomDedup(state, out)

    a, dtxt = _tokens("a"), _tokens("d")
    # batch 1: two unique docs
    write_docs(d, "b1", [(1, a), (2, _tokens("b"))])
    _drain(spark, d, sink, ckpt)
    # batch 2: doc 3 embeds doc 1's segment; doc 4 unique
    write_docs(d, "b2", [(3, _tokens("c") + " " + a), (4, dtxt)])
    _drain(spark, d, sink, ckpt)
    # batch 3: doc 5 embeds doc 4's segment (filter must have grown)
    write_docs(d, "b3", [(5, _tokens("e") + " " + dtxt)])
    _drain(spark, d, sink, ckpt)

    rows = {r["doc_id"]: r.asDict() for r in sink.screening_output(spark).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # first batch screened against an empty filter → clean
    assert not rows[1]["maybe_dup"] and not rows[2]["maybe_dup"]
    # cross-batch duplicate content flagged, exactly one segment
    assert rows[3]["maybe_dup"] and rows[3]["n_flagged"] == 1
    assert rows[3]["n_segments"] == 2
    # unique doc in batch 2 clean (no false positive on planted data)
    assert not rows[4]["maybe_dup"]
    # batch-3 duplicate of BATCH-2 content flagged → filter accumulates
    assert rows[5]["maybe_dup"] and rows[5]["n_flagged"] == 1

    # restart with a FRESH sink instance + the SAME checkpoint (real
    # restart semantics: epoch ids continue past the fence): the
    # committed filter (not python state) is the memory
    sink2 = StreamingBloomDedup(state, out)
    write_docs(d, "b4", [(6, _tokens("f") + " " + a)])
    _drain(spark, d, sink2, ckpt)
    rows2 = {r["doc_id"]: r.asDict() for r in sink2.screening_output(spark).collect()}
    assert rows2[6]["maybe_dup"] and rows2[6]["n_flagged"] == 1


def test_streaming_bloom_epoch_fence_and_mergeability(spark, tmp_path):
    from pyspark.sql import functions as F

    from flume_source_spark.pipeline.dataset4 import _segments, bloom_build

    d = str(tmp_path / "docs")
    state = str(tmp_path / "bloom_state")
    out = str(tmp_path / "screened")
    sink = StreamingBloomDedup(state, out)

    write_docs(d, "b1", [(1, _tokens("a")), (2, _tokens("b"))])
    _drain(spark, d, sink, str(tmp_path / "ckpt"))
    write_docs(d, "b2", [(3, _tokens("c"))])
    _drain(spark, d, sink, str(tmp_path / "ckpt"))

    before = sorted(
        tuple(r) for r in sink.current_filter(spark).collect()
    )
    n_out_before = sink.screening_output(spark).count()

    # simulate redelivery of epoch 0 after recovery → must no-op
    batch = spark.read.schema(DOCS_SCHEMA).parquet(d)
    sink(batch, 0)
    after = sorted(tuple(r) for r in sink.current_filter(spark).collect())
    assert after == before
    assert sink.screening_output(spark).count() == n_out_before

    # merged filter == from-scratch build over every segment ever seen
    all_docs = spark.read.schema(DOCS_SCHEMA).parquet(d)
    whole = bloom_build(_segments(all_docs).select("seg").distinct())
    assert sorted(tuple(r) for r in whole.collect()) == before

    # no-false-negative end-to-end: every segment seen so far probes
    # positive against the committed filter
    from flume_source_spark.pipeline.dataset4 import bloom_probe

    segs = _segments(all_docs).select("seg").distinct()
    assert bloom_probe(segs, sink.current_filter(spark)).count() == segs.count()


def test_streaming_bloom_screening_respects_commit_fence(spark, tmp_path):
    """ADVICE r4: a crash between the per-epoch output write (step 3)
    and the filter commit (step 4) leaves an epoch dir whose merge
    never happened — screening_output must NOT expose it. After the
    epoch is reprocessed (redelivery check reruns epochs beyond the
    committed fence) and committed, it becomes visible."""
    d = str(tmp_path / "docs")
    state = str(tmp_path / "bloom_state")
    out = str(tmp_path / "screened")
    sink = StreamingBloomDedup(state, out)

    write_docs(d, "b1", [(1, _tokens("a")), (2, _tokens("b"))])
    _drain(spark, d, sink, str(tmp_path / "ckpt"))
    fenced = sink.screening_output(spark)
    epochs_before = {r.epoch for r in fenced.select("epoch").distinct().collect()}

    # simulate the crash window: epoch-99 output exists, commit doesn't
    import pandas as pd

    os.makedirs(os.path.join(out, "epoch-99"))
    pd.DataFrame(
        {"doc_id": [7], "n_segments": [1], "n_flagged": [0],
         "maybe_dup": [False], "epoch": [99]}
    ).to_parquet(os.path.join(out, "epoch-99", "part-0.parquet"))
    visible = {r.epoch for r in sink.screening_output(spark).select("epoch").distinct().collect()}
    assert visible == epochs_before, "uncommitted epoch leaked past the fence"

    # ADVICE r5: a stray prefix-matching dir with a non-decimal suffix
    # (leftover temp, foreign dir) must be SKIPPED, not break reads
    os.makedirs(os.path.join(out, "epoch-99.tmp"), exist_ok=True)
    visible2 = {r.epoch for r in sink.screening_output(spark).select("epoch").distinct().collect()}
    assert visible2 == epochs_before

    # reprocess epoch 99 properly → committed → now visible
    batch = spark.read.schema(DOCS_SCHEMA).parquet(d)
    sink(batch, 99)
    visible2 = {r.epoch for r in sink.screening_output(spark).select("epoch").distinct().collect()}
    assert 99 in visible2 and epochs_before <= visible2

    # before any commit at all: no output is exposed
    empty_sink = StreamingBloomDedup(str(tmp_path / "s2"), str(tmp_path / "o2"))
    assert empty_sink.screening_output(spark) is None
