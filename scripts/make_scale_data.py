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

Usage: python scripts/make_scale_data.py [factor] [outdir]
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else f".scale/sf{factor}x0.1"
    spark = get_spark(app_name="stream-cdc-spark-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")

    blocks = {
        t: load(spark, SRC, t).agg(F.max(KEY_OF[t])).first()[0] + 1 for t in KEY_OF
    }

    for t in TABLES:
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
            # per-replica token suffix => replicas share no shingles
            rep = rep.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.concat(x, F.lit("~"), F.col("__r")),
                        ),
                        " ",
                    )
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
