#!/usr/bin/env python
"""Soak the COMPOSED cdc_full pipeline: N typed CDC envelope batches
through CdcFullPipeline — new inserts, good updates, BELOW-GATE updates
(admitted nowhere), per-batch redelivery, periodic in-band Delete
envelopes AND an out-of-band delete_batch channel — recording per-batch
wall, state counts, probe latencies, and final equality of BOTH surfaces
against batch references over the modeled latest-live GATED corpus.

Per batch b:
  - per_batch NEW docs (version 0, gate-passing text + synthetic vector);
  - GOOD updates: the tail quarter of the previous batch gets a
    version-(b) image (new text AND re-embedded vector);
  - BAD updates: the SECOND quarter gets a version-(b) image below the
    token gate — must be admitted to neither index;
  - REDELIVERY: the previous batch's (doc_id, 0) envelopes re-arrive;
  - at batches 10/50/90: in-band Delete envelopes for doc_id % 97 == 3;
    at batch 30: the OUT-OF-BAND channel deletes doc_id % 89 == 7.

Usage: python scripts/cdc_full_soak.py [n_batches] [docs_per_batch]
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
DIM = 8
N_CELLS = 16
TERMS = ["w3", "w17", "w211"]
MIN_TOKENS = 5
DELETE_AT = (10, 50, 90)
EXT_DELETE_AT = 30


def _text(seed: int) -> str:
    n = 6 + (seed * 13) % 55
    return " ".join(
        f"w{int(((seed * 31 + p * 7919) % (VOCAB * VOCAB)) ** 0.5)}"
        for p in range(n)
    )


def _vec(seed: int) -> list[float]:
    return [
        ((seed * 31 + p * 7919 + (seed >> 3) * 104729) % 2000 - 1000)
        / 1000.0
        for p in range(DIM)
    ]


def _image(doc_id: int, version: int, bad: bool) -> tuple[str, list[float]]:
    if bad:
        return "tiny doc", _vec(doc_id * 31 + version)
    seed = doc_id if version == 0 else doc_id * 1009 + version
    return _text(seed), _vec(seed)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    state = ".scale/cdc-full-soak-state"
    shutil.rmtree(state, ignore_errors=True)

    spark = get_spark(app_name="cdc-full-soak")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F  # noqa: E402

    from stream_cdc_spark.operators import similarity, text as T  # noqa: E402
    from stream_cdc_spark.streaming.cdc_full import CdcFullPipeline  # noqa: E402

    centroids = [(c, _vec(10 ** 7 + c)) for c in range(N_CELLS)]
    pipe = CdcFullPipeline(
        state, centroids, min_tokens=MIN_TOKENS,
        compact_every=8, major_every=4,
    )

    schema = (
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string, embedding array<float>>"
    )

    def up(doc_id, version, bad=False):
        t, v = _image(doc_id, version, bad)
        return ("Update" if version else "Insert", version, (doc_id, t, v))

    seen = 0
    good_hi = 0
    deleted_below = 0
    ext_deleted_below = 0
    walls: list[float] = []
    sid = 0
    for b in range(n_batches):
        rows = [up(seen + i, 0) for i in range(per_batch)]
        if b > 0:
            base = seen - per_batch
            # good updates: tail quarter; bad updates: second quarter
            rows += [
                up(d, b) for d in range(base + 3 * per_batch // 4, seen)
            ]
            rows += [
                up(d, b, bad=True)
                for d in range(base + per_batch // 4, base + per_batch // 2)
            ]
            good_hi = seen
            # redelivery of the previous batch's version-0 envelopes
            rows += [up(d, 0) for d in range(seen - per_batch // 5, seen)]
        seen += per_batch
        df = spark.createDataFrame(rows, schema)
        if b in DELETE_AT:
            dead = [
                ("Delete", 10 ** 6, (d, None, None))
                for d in range(seen)
                if d % 97 == 3
            ]
            df = df.unionByName(spark.createDataFrame(dead, schema))
        t0 = time.time()
        pipe.foreach_batch(df, sid)
        walls.append(round(time.time() - t0, 3))
        sid += 1
        if b in DELETE_AT:
            deleted_below = seen
        if b == EXT_DELETE_AT:
            ext = [(d,) for d in range(seen) if d % 89 == 7]
            pipe.delete_batch(
                spark.createDataFrame(ext, "doc_id bigint"), 0
            )
            ext_deleted_below = seen

    def seg(a, z):
        s = sorted(walls[max(0, a):z])
        return s[len(s) // 2]

    # modeled latest-live GATED corpus: the newest GOOD image (bad
    # updates are admitted nowhere, so the good tail-quarter updates
    # supersede; everyone else serves version 0)
    def latest_good_version(d: int) -> int:
        if d < good_hi and d % per_batch >= 3 * per_batch // 4:
            return d // per_batch + 1
        return 0

    def alive(d: int) -> bool:
        if d % 97 == 3 and d < deleted_below:
            return False
        if d % 89 == 7 and d < ext_deleted_below:
            return False
        return True

    images = [
        (d, *_image(d, latest_good_version(d), False))
        for d in range(seen)
        if alive(d)
    ]
    corpus_t = spark.createDataFrame(
        [(d, t) for d, t, _ in images], "doc_id bigint, text string"
    )
    corpus_v = spark.createDataFrame(
        [(d, v) for d, _, v in images],
        "vec_id bigint, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(10 ** 9 + i, _vec(10 ** 9 + i)) for i in range(5)],
        "vec_id bigint, embedding array<float>",
    )
    cents_df = spark.createDataFrame(centroids, "cid bigint, cv array<float>")

    t0 = time.time()
    got_r = sorted(
        map(tuple, pipe.retr.bm25_topk(spark, TERMS, top_k=20).collect())
    )
    probe_r = round(time.time() - t0, 3)
    want_r = sorted(
        map(tuple, T.bm25_topk(corpus_t, TERMS, top_k=20).collect())
    )
    t0 = time.time()
    got_a = sorted(
        map(tuple, pipe.ann.topk(spark, queries, k=10, nprobe=3).collect())
    )
    probe_a = round(time.time() - t0, 3)
    want_a = sorted(
        map(
            tuple,
            similarity.ivf_ann_topk(
                corpus_v, queries, cents_df, k=10, nprobe=3,
                quantize_bp=10000,
            ).collect(),
        )
    )

    print(json.dumps({
        "metric": "cdc_full_soak",
        "n_batches": n_batches,
        "docs_per_batch": per_batch,
        "retr_ledger_rows": pipe.retr.docs(spark).count(),
        "ann_ledger_rows": pipe.ann.ledger(spark).count(),
        "live_expected": corpus_t.count(),
        "wall_first10_median_s": seg(0, 10),
        "wall_mid10_median_s": seg(n_batches // 2 - 5, n_batches // 2 + 5),
        "wall_last10_median_s": seg(n_batches - 10, n_batches),
        "probe_bm25_s": probe_r,
        "probe_topk_s": probe_a,
        "bm25_equal_to_latest_live_gated_batch": got_r == want_r,
        "topk_equal_to_latest_live_gated_batch": got_a == want_a,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
