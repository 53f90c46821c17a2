#!/usr/bin/env python
"""Materialize a scaled-up copy of the driver testdata for stress runs.

The driver ships sf0.1 as its largest scale; the engine's claims are about
100 TB. This script builds an sf0.1 x FACTOR corpus (default 10 — "sf1")
under .scale/ by deterministic replication with three invariants:

- **join keys stay consistent**: every replica shifts each table's keys by
  replica * (max_key + 1) on BOTH sides of each relationship (orders &
  lineitem share the orderkey shift, customer & orders the custkey shift,
  events.user_id follows customer), so selectivities and join fan-outs
  scale linearly like a real bigger dataset, not quadratically.
- **replicas are independent, not near-duplicates**: document tokens get a
  per-replica suffix (replica 0 keeps the originals), so the shingle /
  MinHash / SimHash pair structure is 10 independent shards of the sf0.1
  structure instead of an everything-matches-everything pathology; the
  embedding table rotates each vector by `replica` positions (norms and
  within-replica cosines are exactly preserved, cross-replica cosines
  decorrelate).
- **fixed dims stay fixed**: region/nation are the broadcast dims at any
  scale and are copied as-is.

Output ids stay far below the q28-q30 planted-row offset (max doc_id
49,999 vs 100,000 at factor 10), so the sketch-oracle guards hold.

Round-5 addition — **skewed vocabulary head**: the plain per-replica
suffix flattens per-token counts (every token's corpus frequency stays
at its sf0.1 value while N grows by `factor`), which starves the
frequency-skew operators: q108 heavy hitters returned 0 rows at 10x,
and q103/q94's bigram LM saw an unrealistically flat unigram table.
Real corpora are Zipfian: the head tokens grow WITH the corpus. With
`--zipf-head N`, the top N tokens of the source corpus (by exact count)
keep their surface form in every replica — their counts scale by
`factor`, giving a realistic Zipf head — while tail tokens still get the
per-replica suffix.

The Zipf mode is OPT-IN and meant for the frequency-skew operator family
(heavy hitters, bigram LM, vocab coverage) on a SEPARATE corpus: all-hot
trigrams collide across replicas, which manufactures cross-replica
containment/overlap pairs (measured: q111 explodes from hundreds to
~500k pairs at 10x) — an everything-matches pathology the dedup-family
stress must not include. So: dedup corpora use the default flat mode
(shingle-disjoint replicas), and a documents-only Zipf corpus serves
q108/q103/q94/q119:

    python scripts/make_scale_data.py 10                      # dedup corpus
    python scripts/make_scale_data.py 10 .scale/sf10x0.1-zipf \
        --tables documents --zipf-head 32                      # skew corpus

Data is written outside git (.scale/ is ignored); regenerate on demand.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stream_cdc_spark.session import get_spark  # noqa: E402
from stream_cdc_spark.tables import TABLES, load  # noqa: E402

SRC = "/root/testdata/sf0.1"

# table -> columns shifted by that table's own key block
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("factor", type=int, nargs="?", default=10)
    p.add_argument("outdir", nargs="?", default=None)
    p.add_argument("--zipf-head", type=int, default=0)
    p.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to generate (e.g. "
        "'documents' for the dedup-family 100x stress)",
    )
    ns = p.parse_args()
    factor = ns.factor
    outdir = ns.outdir or f".scale/sf{factor}x0.1"
    zipf_head = ns.zipf_head
    only = set(ns.tables.split(",")) if ns.tables else None
    spark = get_spark(app_name="stream-cdc-spark-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")

    blocks = {
        t: load(spark, SRC, t).agg(F.max(KEY_OF[t])).first()[0] + 1 for t in KEY_OF
    }

    # Zipf head: exact top-N tokens of the source corpus (N-row collect —
    # a planning aggregate, not a data path)
    hot_tokens: list[str] = []
    if zipf_head > 0 and (only is None or "documents" in only):
        hot_tokens = [
            r["tok"]
            for r in (
                load(spark, SRC, "documents")
                .select(F.explode(F.split("text", " ")).alias("tok"))
                .groupBy("tok")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("tok"))
                .limit(zipf_head)
                .collect()
            )
        ]
        print(f"zipf head ({zipf_head}): {hot_tokens[:8]}...", file=sys.stderr)

    for t in TABLES:
        if only is not None and t not in only:
            continue
        src = load(spark, SRC, t)
        dst = os.path.join(outdir, f"{t}.parquet")
        if t in ("region", "nation"):
            src.write.mode("overwrite").parquet(dst)
            continue
        rep = src.crossJoin(
            spark.range(factor).select(F.col("id").alias("__r"))
        )
        for col, block_of in KEY_SHIFTS[t].items():
            rep = rep.withColumn(
                col, F.col(col) + F.col("__r") * F.lit(blocks[block_of])
            )
        if t == "documents":
            # per-replica token suffix => replicas share no (informative)
            # shingles; Zipf-head tokens keep their surface form so the
            # corpus frequency head scales with the corpus
            if hot_tokens:
                suffixed = F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.when(x.isin(*hot_tokens), x).otherwise(
                        F.concat(x, F.lit("~"), F.col("__r"))
                    ),
                )
            else:
                suffixed = F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit("~"), F.col("__r")),
                )
            rep = rep.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.array_join(suffixed, " ")
                ),
            )
        if t == "embeddings":
            # rotate by replica index: norms and within-replica angles are
            # bit-preserved, cross-replica directions decorrelate
            dim = len(src.select("embedding").first()[0])
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: F.element_at(
                            "embedding",
                            ((i + F.col("__r")) % dim).cast("int") + 1,
                        ),
                    )
                ),
            )
        rep.drop("__r").repartition(16).write.mode("overwrite").parquet(dst)
        print(f"wrote {dst}", file=sys.stderr)
    print(outdir)
    spark.stop()


if __name__ == "__main__":
    main()
