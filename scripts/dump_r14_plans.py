#!/usr/bin/env python
"""Dump executed .explain('formatted') plans for named queries into
plans/r14/<query>_<tag>.txt — the before/after evidence for the round-14
optimization work. Usage:
    python scripts/dump_r14_plans.py before q24_ngram_jaccard_pairs q27...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_spark.plans.queries import QUERIES  # noqa: E402
from stream_cdc_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r14")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name=f"r14-plan-dump-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = QUERIES[name].builder(spark, SF)
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {tag} (sf={SF})\n\n{plan}")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
