#!/usr/bin/env python
"""Generate the per-operator bottleneck report for the headline queries.

Parity artifact for the reference's profiling harness
(stream_cdc/profiling/profile_app.py + analyze_profile.py): runs every
headline query at $SPARK_GRAFT_SF_DIR, attributes executor time / volume /
spill to physical operators via the SQL status store, and writes a ranked
markdown report.

Usage: python scripts/bottleneck_report.py [OUT.md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.observability import (  # noqa: E402
    QueryMetricsCollector,
    render_bottleneck_report,
)
from stream_cdc_spark.plans.queries import QUERIES  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BOTTLENECK.md"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream-cdc-spark-bottleneck")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [n for n, s in sorted(QUERIES.items()) if s.headline]
    # same JVM/Arrow warm-up as bench.py so operator times aren't start-up
    QUERIES[headline[0]].builder(spark, sf_dir).collect()

    collector = QueryMetricsCollector(spark)
    per_query = {}
    for name in headline:
        per_query[name] = collector.measure_with_breakdown(
            name, QUERIES[name].builder(spark, sf_dir)
        )
        print(f"measured {name}", file=sys.stderr)

    report = render_bottleneck_report(per_query)
    report = f"<!-- sf_dir: {sf_dir} -->\n\n" + report
    with open(out_path, "w") as f:
        f.write(report)
    print(out_path)
    spark.stop()


if __name__ == "__main__":
    main()
