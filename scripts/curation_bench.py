#!/usr/bin/env python
"""Continuous-curation throughput (round-5 task): drive the streaming
CurationPipeline capstone over a real corpus with several micro-batches,
and record per-batch latency, docs/s, and state growth from
StreamingMetricsListener + the on-disk state layout.

Usage: python scripts/curation_bench.py [docs_parquet] [n_slices]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.observability import StreamingMetricsListener  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402
from stream_cdc_spark.streaming.curation import CurationPipeline  # noqa: E402


def dir_stats(root: str) -> dict:
    out = {}
    for sub in ("decisions", "kept", "index"):
        p = os.path.join(root, sub)
        n_batches = 0
        n_bytes = 0
        for dirpath, _, files in os.walk(p):
            if os.path.basename(dirpath).startswith("batch="):
                n_batches += 1
            n_bytes += sum(
                os.path.getsize(os.path.join(dirpath, f)) for f in files
            )
        out[sub] = {"batches": n_batches, "bytes": n_bytes}
    return out


def main() -> None:
    docs_path = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/documents.parquet"
    )
    slices = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="stream-cdc-spark-curation-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = "/tmp/curation-bench"
    shutil.rmtree(work, ignore_errors=True)
    indir, ckpt, state = (os.path.join(work, p) for p in ("in", "ckpt", "state"))

    d = spark.read.parquet(docs_path).select("doc_id", "text")
    n_docs = d.count()
    d.repartition(slices).write.mode("overwrite").parquet(indir)

    pipe = CurationPipeline(state_dir=state, min_tokens=5)
    listener = StreamingMetricsListener()
    listener.attach(spark)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(indir)
    )
    t0 = time.time()
    q = (
        stream.writeStream.foreachBatch(pipe.sink())
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    listener.detach(spark)

    decisions = pipe.decisions(spark)
    kept = decisions.filter("keep").count()
    total = decisions.count()
    batches = [
        {
            "batch": r.get("batch_id"),
            "input_rows": r.get("input_rows"),
            "trigger_ms": r.get("trigger_ms"),
        }
        for r in listener.progress()
        if (r.get("input_rows") or 0) > 0
    ]
    print(json.dumps({
        "metric": "curation_drain",
        "docs_path": docs_path,
        "docs": n_docs,
        "slices": slices,
        "wall_s": round(wall, 1),
        "docs_per_s": round(n_docs / wall, 1),
        "decisions": total,
        "kept": kept,
        "state": dir_stats(state),
        "batches": batches,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
