#!/usr/bin/env python
"""Soak the VERSIONED ANN-index sink: N micro-batches of synthetic
vectors through VersionedAnnIndexSnapshot with continuous RE-EMBEDDINGS,
periodic deletes, and per-batch redelivery, recording per-batch wall,
state file/dir counts, probe latency, and a final topk equality check
against batch similarity.ivf_ann_topk over the LATEST LIVE vector of
every id — the versioned_retrieval_soak shape on the embedding surface.

Adversarial admission shape per batch b:
  - per_batch NEW ids (version 0);
  - RE-EMBEDDINGS: the tail quarter of the previous batch's ids get a
    version-(b) vector seeded differently — supersession every batch,
    usually moving the id to a different cell;
  - REDELIVERY: the previous batch's new (vec_id, 0) rows re-arrive and
    must drop whole (exactly-once on the (vec_id, version) key);
  - at batches 10/50/90: delete every admitted vec_id % 97 == 3
    (rolling right-to-be-forgotten; folds erase superseded AND
    tombstoned codes from the folded vectors tiers as the stream runs).

Usage: python scripts/versioned_ann_soak.py [n_batches] [vecs_per_batch]
                                            [bucketed]
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

DIM = 16
N_CELLS = 32
DELETE_AT = (10, 50, 90)


def _vec(seed: int) -> list[float]:
    return [
        ((seed * 31 + p * 7919 + (seed >> 3) * 104729) % 2000 - 1000)
        / 1000.0
        for p in range(DIM)
    ]


def _vvec(vec_id: int, version: int) -> list[float]:
    # version 0 is the original; updates re-seed so the vector moves
    return _vec(vec_id if version == 0 else vec_id * 1009 + version)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    bucketed = len(sys.argv) > 3 and sys.argv[3] == "bucketed"
    state = ".scale/versioned-ann-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="versioned-ann-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from stream_cdc_spark.operators import similarity  # noqa: E402
    from stream_cdc_spark.streaming import statedir  # noqa: E402
    from stream_cdc_spark.streaming.ann_index import (  # noqa: E402
        VersionedAnnIndexSnapshot,
    )

    centroids = [(c, _vec(10 ** 7 + c)) for c in range(N_CELLS)]
    snap = VersionedAnnIndexSnapshot(
        state, centroids, compact_every=8, major_every=4,
        bucketed=bucketed, num_buckets=16,
    )

    seen = 0
    upd_hi = 0
    deleted_below = 0
    walls: list[float] = []
    sid = 0
    for b in range(n_batches):
        rows = [(seen + i, 0, _vvec(seen + i, 0)) for i in range(per_batch)]
        if b > 0:
            lo = seen - per_batch + 3 * per_batch // 4
            rows += [(d, b, _vvec(d, b)) for d in range(lo, seen)]
            upd_hi = seen
            lo_r = seen - per_batch // 5
            rows += [(d, 0, _vvec(d, 0)) for d in range(lo_r, seen)]
        seen += per_batch
        df = spark.createDataFrame(
            rows, "vec_id bigint, version bigint, embedding array<float>"
        )
        t0 = time.time()
        snap.foreach_batch(df, sid)
        walls.append(round(time.time() - t0, 3))
        sid += 1
        if b in DELETE_AT:
            dead = [(d,) for d in range(0, seen) if d % 97 == 3]
            snap.delete_batch(
                spark.createDataFrame(dead, "vec_id bigint"), sid
            )
            deleted_below = seen
            sid += 1

    def seg(a, z):
        s = sorted(walls[max(0, a):z])
        return s[len(s) // 2]

    queries = spark.createDataFrame(
        [(10 ** 9 + i, _vec(10 ** 9 + i)) for i in range(5)],
        "vec_id bigint, embedding array<float>",
    )
    t0 = time.time()
    got = sorted(
        map(tuple, snap.topk(spark, queries, k=10, nprobe=3).collect())
    )
    probe_s = round(time.time() - t0, 3)

    # expected latest-live corpus from the deterministic model
    def latest_version(d: int) -> int:
        if d < upd_hi and d % per_batch >= 3 * per_batch // 4:
            return d // per_batch + 1
        return 0

    corpus = spark.createDataFrame(
        [
            (d, _vvec(d, latest_version(d)))
            for d in range(seen)
            if not (d % 97 == 3 and d < deleted_below)
        ],
        "vec_id bigint, embedding array<float>",
    )
    cents_df = spark.createDataFrame(
        centroids, "cid bigint, cv array<float>"
    )
    want = sorted(
        map(
            tuple,
            similarity.ivf_ann_topk(
                corpus, queries, cents_df, k=10, nprobe=3,
                quantize_bp=10000,
            ).collect(),
        )
    )

    print(json.dumps({
        "metric": "versioned_ann_soak",
        "n_batches": n_batches,
        "vecs_per_batch": per_batch,
        "bucketed": bucketed,
        "ledger_rows": snap.ledger(spark).count(),
        "live_expected": corpus.count(),
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "probe_topk_s": probe_s,
        "vectors_dirs": statedir.dir_counts(os.path.join(state, "vectors")),
        "ledger_dirs": statedir.dir_counts(os.path.join(state, "ledger")),
        "topk_equal_to_latest_live_batch": got == want,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
