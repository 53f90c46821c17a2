#!/usr/bin/env python
"""Soak the incremental ANN index sink: N micro-batches of synthetic
embeddings through AnnIndexSnapshot, recording per-batch wall, state
file/dir counts, probe latency over the drained index, and a final topk
equality check against batch similarity.ivf_ann_topk over the union of
all admitted vectors.

The generator is adversarial on the admission path: every batch
redelivers a rolling slice of already-admitted ids (must be dropped by
the exactly-once guard and commit only the genuinely-new rows), vectors
are skewed toward a few hot cells (uneven cell growth — the pruned probe
must stay cheap anyway), and the centroid set is fixed up front exactly
like a production offline-trained quantizer.

Usage: python scripts/ann_index_soak.py [n_batches] [vecs_per_batch] [dim]
Prints one JSON line: wall medians (first/mid/last 10), state file
counts, probe wall, equality flag.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.session import get_spark  # noqa: E402


def _vec(vid: int, dim: int) -> list[float]:
    # deterministic pseudo-embedding: hot-cell skew (70% of ids point
    # near one of 4 of the 32 anchors), unit-ish scale
    anchor = (vid % 4) if vid % 10 < 7 else (vid % 32)
    return [
        round(math.sin(0.7 * anchor + 0.13 * d) + 0.01 * ((vid * 31 + d) % 7), 6)
        for d in range(dim)
    ]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    state = ".scale/ann-index-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="ann-index-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from stream_cdc_spark.operators import similarity  # noqa: E402
    from stream_cdc_spark.streaming import statedir  # noqa: E402
    from stream_cdc_spark.streaming.ann_index import AnnIndexSnapshot  # noqa: E402

    centroids = [(c, _vec(c * 97 + 5, dim)) for c in range(32)]
    # ANN_SOAK_BUCKETED=1 soaks the round-12 bucketed admission ledger:
    # the slim ledger/ state folds into a vec_id-bucketed snapshot and
    # the per-trigger redelivery anti-join reads it Exchange-free
    bucketed = os.environ.get("ANN_SOAK_BUCKETED", "0") == "1"
    snap = AnnIndexSnapshot(
        state, centroids, compact_every=8, major_every=4,
        bucketed=bucketed, num_buckets=32,
    )

    seen = 0
    walls: list[float] = []
    for b in range(n_batches):
        new = [(seen + i, _vec(seen + i, dim)) for i in range(per_batch)]
        # redeliver a rolling slice of ALREADY-admitted ids (1/5 of a
        # batch) — the guard must drop them without committing anything
        # for them, every batch after the first
        redeliver = [
            (v, _vec(v, dim))
            for v in range(max(0, seen - per_batch // 5), seen)
        ]
        seen += per_batch
        df = spark.createDataFrame(
            new + redeliver, "vec_id bigint, embedding array<float>"
        )
        t0 = time.time()
        snap.foreach_batch(df, b)
        walls.append(round(time.time() - t0, 3))

    def seg(a, z):
        s = sorted(walls[max(0, a):z])  # short runs: clamp, don't wrap
        return s[len(s) // 2]

    queries = spark.createDataFrame(
        [(10_000_000 + i, _vec(10_000_000 + i, dim)) for i in range(16)],
        "vec_id bigint, embedding array<float>",
    ).localCheckpoint(eager=True)
    t0 = time.time()
    got = sorted(map(tuple, snap.topk(spark, queries, k=5, nprobe=2).collect()))
    probe_s = round(time.time() - t0, 3)

    corpus = spark.createDataFrame(
        [(v, _vec(v, dim)) for v in range(seen)],
        "vec_id bigint, embedding array<float>",
    )
    cents_df = spark.createDataFrame(centroids, "cid bigint, cv array<float>")
    want = sorted(map(tuple, similarity.ivf_ann_topk(
        corpus, queries, cents_df, k=5, nprobe=2, quantize_bp=10000
    ).collect()))

    print(json.dumps({
        "metric": "ann_index_soak",
        "bucketed_ledger": bucketed,
        "n_batches": n_batches,
        "vecs_per_batch": per_batch,
        "dim": dim,
        "admitted": snap.vectors(spark).count(),
        "expected_admitted": seen,
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "probe_topk_s": probe_s,
        "vectors_dirs": statedir.dir_counts(os.path.join(state, "vectors")),
        "ledger_dirs": statedir.dir_counts(os.path.join(state, "ledger")),
        "equal_to_batch_ivf": got == want,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
