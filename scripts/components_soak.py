#!/usr/bin/env python
"""Soak the incremental connected-components sink: N micro-batches of
synthetic near-dup edges through IncrementalComponentsSnapshot, recording
per-batch wall, state file/dir counts, and a final labels() equality
check against batch connected_components over the union of all edges.

The edge generator is adversarial on purpose: each batch wires new
vertices into existing clusters (union-find work every batch), a rolling
share of edges lands INSIDE existing components (redundant — must commit
nothing), and periodically a brand-new small-id vertex absorbs a large
cluster (the relabel-through-the-log path whose cost must stay O(1) rows
regardless of cluster size).

Usage: python scripts/components_soak.py [n_batches] [edges_per_batch]
Prints one JSON line: first/mid/last wall quartiles, dir/file counts,
equality flag.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    state = ".scale/components-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="components-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from stream_cdc_spark.operators import dedup  # noqa: E402
    from stream_cdc_spark.streaming import statedir  # noqa: E402
    from stream_cdc_spark.streaming.components import (  # noqa: E402
        IncrementalComponentsSnapshot,
    )

    snap = IncrementalComponentsSnapshot(state, compact_every=8, major_every=4)

    all_edges: list[tuple[int, int]] = []
    next_vid = 1_000_000  # new vertices come from here
    walls: list[float] = []
    for b in range(n_batches):
        batch: list[tuple[int, int]] = []
        # grow existing clusters: chain new vertices onto cluster seeds
        for i in range(per_batch):
            seed = (i % 50) * 1_000  # 50 long-lived cluster anchors
            batch.append((seed, next_vid))
            next_vid += 1
        # redundant edges between two DISTINCT existing members of the
        # same cluster (cluster j's anchor j*1000 and its batch-0 chained
        # vertex 1_000_000+j) — exercises the known-vertex resolution
        # path AND the commit-nothing rule (not self-loops, which short-
        # circuit before resolution; review finding)
        if b > 2:
            batch += [(j * 1_000, 1_000_000 + j) for j in range(10)]
        # every 10th batch a NEW vertex with a strictly smaller id than
        # anything in its target cluster absorbs it — 500-b decreases
        # monotonically, so EVERY event relabels through the parent log
        # (a fixed small id stops absorbing once it IS the root; review
        # finding), exercising O(1)-rows-per-merge regardless of size
        if b % 10 == 9:
            batch.append((500 - b, (b % 50) * 1_000))
        all_edges += batch
        df = spark.createDataFrame(batch, "id_a bigint, id_b bigint")
        t0 = time.time()
        snap.foreach_batch(df, b)
        walls.append(round(time.time() - t0, 3))

    def seg(a, z):
        s = sorted(walls[max(0, a):z])  # short runs: clamp, don't wrap
        return s[len(s) // 2]

    t0 = time.time()
    labels = snap.labels(spark).localCheckpoint(eager=True)
    read_s = round(time.time() - t0, 3)
    got = {(r["vertex"], r["component"]) for r in labels.collect()}
    want_df = dedup.connected_components(
        spark.createDataFrame(all_edges, "id_a bigint, id_b bigint")
    )
    want = {(r["vertex"], r["component"]) for r in want_df.collect()}

    print(json.dumps({
        "metric": "components_soak",
        "n_batches": n_batches,
        "edges_per_batch": per_batch,
        "vertices": labels.count(),
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "labels_read_s": read_s,
        "state_dirs": statedir.dir_counts(os.path.join(state, "members")),
        "parents_dirs": statedir.dir_counts(os.path.join(state, "parents")),
        "equal_to_batch_cc": got == want,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
