#!/usr/bin/env python
"""Concurrent multi-query execution bench: run the 15 headline queries
4-at-a-time on FAIR scheduler pools, assert results identical to the
serial run, and record total wall vs serial.

A 100 TB cluster never runs one query at a time; this verifies the
engine's plans are safe under concurrent execution (no shared mutable
plan state, no temp-view collisions) and that the scheduler overlaps
them profitably on fixed hardware.

PySpark pinned-thread mode (default since 3.2) maps each Python thread
to one JVM thread, so per-thread setLocalProperty("spark.scheduler.pool")
isolates pools correctly.

Prints ONE JSON line. Usage: python scripts/concurrent_bench.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.plans.queries import QUERIES  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402

WORKERS = 4


def fingerprint(rows) -> str:
    def norm(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return repr(v)

    canon = sorted(tuple(norm(v) for v in r) for r in rows)
    return hashlib.sha256(repr(canon).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="stream-cdc-spark-concurrent-bench",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    headline = [n for n, s in sorted(QUERIES.items()) if s.headline]

    # warm: JVM, parquet footers, python worker pool
    for n in headline:
        QUERIES[n].builder(spark, sf_dir).collect()

    # serial reference
    serial: dict[str, float] = {}
    prints: dict[str, str] = {}
    t0 = time.time()
    for n in headline:
        t = time.time()
        rows = QUERIES[n].builder(spark, sf_dir).collect()
        serial[n] = round(time.time() - t, 3)
        prints[n] = fingerprint(rows)
    serial_total = round(time.time() - t0, 3)

    # concurrent, WORKERS at a time, one FAIR pool per worker slot
    def run(i_n):
        i, n = i_n
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"pool{i % WORKERS}"
        )
        t = time.time()
        rows = QUERIES[n].builder(spark, sf_dir).collect()
        return n, round(time.time() - t, 3), fingerprint(rows)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=WORKERS) as ex:
        results = list(ex.map(run, enumerate(headline)))
    concurrent_total = round(time.time() - t0, 3)

    mismatches = [n for n, _, fp in results if fp != prints[n]]
    print(
        json.dumps(
            {
                "metric": "concurrent_headline",
                "workers": WORKERS,
                "sf_dir": sf_dir,
                "serial_total_s": serial_total,
                "concurrent_total_s": concurrent_total,
                "speedup": round(serial_total / concurrent_total, 2),
                "identical_results": not mismatches,
                "mismatches": mismatches,
                "per_query_concurrent_s": {n: w for n, w, _ in results},
            }
        )
    )
    spark.stop()
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
