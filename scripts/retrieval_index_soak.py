#!/usr/bin/env python
"""Soak the incremental retrieval-index sink: N micro-batches of
synthetic documents through RetrievalIndexSnapshot, recording per-batch
wall, state file/dir counts, probe latency over the drained index, and
final BM25/TF-IDF equality checks against the batch scorers over the
union of all admitted documents.

The generator is adversarial on the admission path: every batch
redelivers a rolling slice of already-admitted doc_ids (must be dropped
by the exactly-once guard), vocabulary is Zipf-skewed (hot head words —
the df monoid and the word-sorted postings must stay cheap anyway), and
document lengths vary 6..60 tokens so dl/avgdl move every batch.

Usage: python scripts/retrieval_index_soak.py [n_batches] [docs_per_batch]
Prints one JSON line: wall medians (first/mid/last 10), state dir
counts, probe walls, equality flags.
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
TERMS = ["w3", "w17", "w211"]  # head, mid, tail of the Zipf vocab


def _text(doc_id: int) -> str:
    # deterministic Zipf-ish text: word rank r appears with prob ~ 1/r;
    # here each position picks rank ((doc_id*31 + p*7919) mod X) biased
    # to small ranks by a square
    n = 6 + (doc_id * 13) % 55
    words = []
    for p in range(n):
        h = (doc_id * 31 + p * 7919) % (VOCAB * VOCAB)
        rank = int(h**0.5)  # quadratic bias toward the head
        words.append(f"w{rank}")
    return " ".join(words)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    state = ".scale/retrieval-index-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="retrieval-index-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F  # noqa: E402
    from stream_cdc_spark.operators import text as T  # noqa: E402
    from stream_cdc_spark.streaming import statedir  # noqa: E402
    from stream_cdc_spark.streaming.retrieval_index import (  # noqa: E402
        RetrievalIndexSnapshot,
    )

    snap = RetrievalIndexSnapshot(state, compact_every=8, major_every=4)

    seen = 0
    walls: list[float] = []
    for b in range(n_batches):
        new = [(seen + i, _text(seen + i)) for i in range(per_batch)]
        # redeliver a rolling slice of ALREADY-admitted ids (1/5 of a
        # batch) — the guard must drop them whole, every batch after the
        # first
        redeliver = [
            (d, _text(d)) for d in range(max(0, seen - per_batch // 5), seen)
        ]
        seen += per_batch
        df = spark.createDataFrame(new + redeliver, "doc_id bigint, text string")
        t0 = time.time()
        snap.foreach_batch(df, b)
        walls.append(round(time.time() - t0, 3))

    def seg(a, z):
        s = sorted(walls[max(0, a):z])
        return s[len(s) // 2]

    t0 = time.time()
    got_bm25 = sorted(
        map(tuple, snap.bm25_topk(spark, TERMS, top_k=20).collect())
    )
    probe_bm25_s = round(time.time() - t0, 3)
    t0 = time.time()
    got_tfidf = sorted(map(tuple, snap.tfidf_top_terms(spark).collect()))
    probe_tfidf_s = round(time.time() - t0, 3)

    corpus = spark.createDataFrame(
        [(d, _text(d)) for d in range(seen)], "doc_id bigint, text string"
    )
    want_bm25 = sorted(
        map(tuple, T.bm25_topk(corpus, TERMS, top_k=20).collect())
    )
    toks = corpus.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    want_tfidf = sorted(
        map(tuple, T.tfidf_top_terms_from_tf(tf, n_docs).collect())
    )

    print(json.dumps({
        "metric": "retrieval_index_soak",
        "n_batches": n_batches,
        "docs_per_batch": per_batch,
        "admitted": snap.docs(spark).count(),
        "expected_admitted": seen,
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "probe_bm25_s": probe_bm25_s,
        "probe_tfidf_s": probe_tfidf_s,
        "postings_dirs": statedir.dir_counts(os.path.join(state, "postings")),
        "stats_dirs": statedir.dir_counts(os.path.join(state, "stats")),
        "bm25_equal_to_batch": got_bm25 == want_bm25,
        "tfidf_equal_to_batch": got_tfidf == want_tfidf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
