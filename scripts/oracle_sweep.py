#!/usr/bin/env python
"""Full oracle sweep at the driver's gate scale: every declared query with
an oracle is run through tests.oracle.compare on a VANILLA SparkSession
(the driver builds its own session without our conf — the engine must
self-heal via tables._ensure_session_conf). Prints one PASS/FAIL line per
query and a final summary; exit 1 on any failure.

Usage: python scripts/oracle_sweep.py [sf_dir] [only_prefix[,prefix...]]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as M  # noqa: E402
    from tests.oracle import compare  # noqa: E402

    qs, osql = M.queries(), M.oracle_sql()
    names = [n for n in qs if n in osql]
    if only:
        names = [n for n in names if any(n.startswith(p) for p in only)]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            compare(qs[name](spark, sf_dir), osql[name], sf_dir)
            print(f"PASS {name} {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name} {time.time() - t0:.1f}s: {e}", flush=True)
            traceback.print_exc()
    print(f"SUMMARY {len(names) - len(failed)}/{len(names)} pass; failed={failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
