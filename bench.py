#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_cdc_spark.plans.queries import QUERIES  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream-cdc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [n for n, s in sorted(QUERIES.items()) if s.headline]

    # Warm the JVM + parquet footers so timings measure query execution.
    QUERIES[headline[0]].builder(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in headline:
        start = time.perf_counter()
        QUERIES[name].builder(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
