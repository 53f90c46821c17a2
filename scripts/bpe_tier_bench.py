#!/usr/bin/env python
"""BPE application-tier microbench: expression chain vs Arrow batch.

The expr tier is one codegen'd replace per merge — zero Python, but the
expression tree (analysis + codegen cost, and eventually JVM method
limits) grows with |merges|. The arrow tier is one pandas UDF whose
cost is flat in table size (classic encoder over distinct words, memo
per worker). This locates the wall-clock crossover on the documents
table so ARROW_TIER_MIN_MERGES (operators/bpe.py) is a measured number,
not a guess, and records the trainer's per-merge cost at two corpus
scales to prove merge cost is corpus-size-independent.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stream_cdc_spark.operators import bpe  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402
from stream_cdc_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_BIG = os.environ.get("SPARK_GRAFT_SF_DIR_BIG", "/root/testdata/sf0.1")
SIZES = [int(s) for s in os.environ.get(
    "TABLE_SIZES", "16,64,128,192,256,384,512"
).split(",")]
REPEATS = int(os.environ.get("REPEATS", "3"))


def synth_table(n: int) -> list[tuple[str, str]]:
    """A well-formed n-merge table: the default 16 'real' merges, then
    qq-chain padding (never fires — worst case for expr analysis cost,
    representative for arrow whose cost tracks APPLIED merges)."""
    table = list(bpe.DEFAULT_MERGES)
    pad = [("q", "q")]
    while len(table) + len(pad) < n:
        pad.append((pad[-1][0] + pad[-1][1], "q"))
    return (table + pad)[:n]


def time_count(docs, table, tier: str) -> float:
    best = None
    for _ in range(REPEATS):
        t0 = time.monotonic()
        docs.select(
            F.sum(
                bpe.bpe_token_count(F.col("text"), table, tier=tier)
            ).alias("n")
        ).collect()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = get_spark()
    if os.environ.get("HIGH_CARD"):
        # memo-hostile corpus: ~every word distinct (md5-derived), the
        # adversarial case for the arrow tier's per-worker word cache
        docs = spark.range(200_000).select(
            F.concat_ws(
                " ",
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(i)))
                    for i in range(10)
                ],
            ).alias("text")
        ).localCheckpoint(eager=True)
    else:
        docs = load(spark, SF_DIR, "documents").select("text")
    docs.count()  # warm scan

    tiers: dict[str, dict[str, float]] = {"expr": {}, "arrow": {}}
    crossover = None
    for n in SIZES:
        table = synth_table(n)
        tiers["expr"][str(n)] = time_count(docs, table, "expr")
        tiers["arrow"][str(n)] = time_count(docs, table, "arrow")
        if (
            crossover is None
            and tiers["arrow"][str(n)] < tiers["expr"][str(n)]
        ):
            crossover = n

    # trainer: per-merge cost must be independent of corpus rows —
    # profile build is the only corpus-dependent step, so (total time
    # - profile time) / n_merges should match across scales.
    trainer = {}
    for label, sf in (("small", SF_DIR), ("big", SF_DIR_BIG)):
        d = load(spark, sf, "documents")
        rows = d.count()
        t0 = time.monotonic()
        prof = bpe.word_profile(d).collect()
        t_profile = time.monotonic() - t0
        wc = [(bpe._word_parts(r["word"], "letter"), r["wc"]) for r in prof]
        t0 = time.monotonic()
        merges = bpe._train_from_profile(wc, 200, 1, "letter")
        t_loop = time.monotonic() - t0
        trainer[label] = {
            "corpus_rows": rows,
            "profile_words": len(prof),
            "profile_s": round(t_profile, 3),
            "merge_loop_s": round(t_loop, 3),
            "merges_learned": len(merges),
            "per_merge_ms": round(1000 * t_loop / max(len(merges), 1), 3),
        }

    print(json.dumps({
        "metric": "bpe_tier_bench",
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "tiers": tiers,
        "crossover_merges": crossover,
        "configured_threshold": bpe.ARROW_TIER_MIN_MERGES,
        "trainer": trainer,
    }))


if __name__ == "__main__":
    main()
