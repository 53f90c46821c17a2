#!/usr/bin/env python
"""Soak the VERSIONED retrieval-index sink: N micro-batches of synthetic
documents through VersionedRetrievalIndexSnapshot with continuous
UPDATES, periodic deletes, and per-batch redelivery, recording per-batch
wall, state file/dir counts, probe latency, and a final BM25 equality
check against the batch scorer over the LATEST LIVE image of every doc.

Adversarial admission shape per batch b:
  - per_batch NEW docs (version 0);
  - UPDATES: the tail quarter of the previous batch's docs get a
    version-(b) image with different text — supersession every batch;
  - REDELIVERY: the previous batch's new (doc_id, 0) rows re-arrive and
    must drop whole (exactly-once on the (doc_id, version) key);
  - at batches 10/50/90: delete every admitted doc_id % 97 == 3
    (rolling right-to-be-forgotten; tombstone-applying folds erase them
    from the folded postings tiers as the stream runs).

Usage: python scripts/versioned_retrieval_soak.py [n_batches] [docs_per_batch]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.session import get_spark  # noqa: E402

VOCAB = 2000
TERMS = ["w3", "w17", "w211"]
DELETE_AT = (10, 50, 90)


def _text(seed: int) -> str:
    n = 6 + (seed * 13) % 55
    words = []
    for p in range(n):
        h = (seed * 31 + p * 7919) % (VOCAB * VOCAB)
        words.append(f"w{int(h ** 0.5)}")
    return " ".join(words)


def _vtext(doc_id: int, version: int) -> str:
    # version 0 is the original; updates re-seed so the image changes
    return _text(doc_id if version == 0 else doc_id * 1009 + version)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    state = ".scale/versioned-retrieval-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="versioned-retrieval-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from stream_cdc_spark.operators import text as T  # noqa: E402
    from stream_cdc_spark.streaming import statedir  # noqa: E402
    from stream_cdc_spark.streaming.retrieval_index import (  # noqa: E402
        VersionedRetrievalIndexSnapshot,
    )

    snap = VersionedRetrievalIndexSnapshot(
        state, compact_every=8, major_every=4
    )

    seen = 0
    upd_hi = 0  # docs below this with (d % per_batch) in the tail quarter are updated
    deleted_below = 0
    walls: list[float] = []
    sid = 0  # statedir batch ids interleave admit + delete triggers
    for b in range(n_batches):
        rows = [
            (seen + i, 0, _vtext(seen + i, 0)) for i in range(per_batch)
        ]
        if b > 0:
            # updates: tail quarter of the previous batch, version b
            lo = seen - per_batch + 3 * per_batch // 4
            rows += [(d, b, _vtext(d, b)) for d in range(lo, seen)]
            upd_hi = seen
            # redelivery of the previous batch's (doc_id, 0) rows
            lo_r = seen - per_batch // 5
            rows += [(d, 0, _vtext(d, 0)) for d in range(lo_r, seen)]
        seen += per_batch
        df = spark.createDataFrame(
            rows, "doc_id bigint, version bigint, text string"
        )
        t0 = time.time()
        snap.foreach_batch(df, sid)
        walls.append(round(time.time() - t0, 3))
        sid += 1
        if b in DELETE_AT:
            dead = [(d,) for d in range(0, seen) if d % 97 == 3]
            snap.delete_batch(
                spark.createDataFrame(dead, "doc_id bigint"), sid
            )
            deleted_below = seen
            sid += 1

    def seg(a, z):
        s = sorted(walls[max(0, a):z])
        return s[len(s) // 2]

    t0 = time.time()
    got = sorted(map(tuple, snap.bm25_topk(spark, TERMS, top_k=20).collect()))
    probe_s = round(time.time() - t0, 3)

    # expected latest-live corpus, computed from the deterministic model
    def latest_version(d: int) -> int:
        if d < upd_hi and d % per_batch >= 3 * per_batch // 4:
            return d // per_batch + 1
        return 0

    corpus = spark.createDataFrame(
        [
            (d, _vtext(d, latest_version(d)))
            for d in range(seen)
            if not (d % 97 == 3 and d < deleted_below)
        ],
        "doc_id bigint, text string",
    )
    want = sorted(map(tuple, T.bm25_topk(corpus, TERMS, top_k=20).collect()))

    n_l = snap.corpus_stats(spark).collect()[0]
    print(json.dumps({
        "metric": "versioned_retrieval_soak",
        "n_batches": n_batches,
        "docs_per_batch": per_batch,
        "ledger_rows": snap.docs(spark).count(),
        "live_docs": n_l["n"],
        "expected_live": corpus.count(),
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "probe_bm25_s": probe_s,
        "docs_dirs": statedir.dir_counts(os.path.join(state, "docs")),
        "postings_dirs": statedir.dir_counts(os.path.join(state, "postings")),
        "bm25_equal_to_latest_live_batch": got == want,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
