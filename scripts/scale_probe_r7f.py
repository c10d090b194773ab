"""Round-7 SCALE.md measurements, part 6: the session-6 additions.

1. text_bm25_topk at 1x and 8x documents (doc_id shifted, TEXT
   UNCHANGED — the vocabulary stays fixed while tf/df/N grow 8x, so
   the panel stays the same 8 tokens and the scoring probe grows
   linearly with the corpus). Claim: linear-ish — the tf wordcount is
   the only corpus-proportional stage (map-side combinable), the
   panel/scalars broadcast, and the top-K window sees only
   panel-matched rows.
2. ds_semdedup at 1x and 8x embeddings AFTER the fused Lloyd round
   (assignment pass emits per-partition partial sums; the per-round
   corpus shuffle-join and N*dim posexplode agg are gone). Replaces
   the pre-fusion row in the round-7 part-1 table (3.56 s / 6.32 s);
   the fixture-scale win is latency (fewer sequential exchanges), the
   at-scale win is two corpus exchanges per Lloyd round removed.

Protocol: scripts/scale_probe_r5/6/7.py — 8 exact copies with shifted
ids, unchanged tables symlinked, min-of-3, noop sink.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flume_source_spark.registry import load_all
from flume_source_spark.session import get_session
from scale_probe_r7 import BASE, make_dir, run


def main():
    spark = get_session(app_name="scale_probe_r7f")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out = {}

    run(specs, spark, "q01_pricing_summary", BASE)  # warm

    d_docs = d_emb = None
    try:
        d_docs = make_dir(spark, {"documents": {"doc_id": 100_000_000}})
        out["text_bm25_topk_1x"] = run(specs, spark, "text_bm25_topk", BASE)
        out["text_bm25_topk_8x"] = run(specs, spark, "text_bm25_topk", d_docs)

        d_emb = make_dir(spark, {"embeddings": {"vec_id": 100_000_000}})
        out["ds_semdedup_fused_1x"] = run(specs, spark, "ds_semdedup", BASE)
        out["ds_semdedup_fused_8x"] = run(specs, spark, "ds_semdedup", d_emb)
    finally:
        for d in (d_docs, d_emb):
            if d:
                shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
