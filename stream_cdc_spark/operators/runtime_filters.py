"""Runtime (bloom-filter) join pruning — Spark's dynamic semi-join filter.

When a selective dimension side of a shuffle join can't be broadcast,
Spark 3.3+ can still pre-filter the fact side *at runtime*: it builds a
bloom filter over the dimension's join keys (bloom_filter_agg) and injects
`might_contain(key)` into the fact scan, discarding non-joining rows
before the shuffle. At 100 TB this is the difference between shuffling the
whole fact table and shuffling only the ~matching fraction — the same
payoff as a broadcast join's implicit pruning, for joins too big to
broadcast.

The feature is on by default (`spark.sql.optimizer.runtime.bloomFilter.
enabled=true`) but gated by size heuristics tuned for clusters: the
application (fact) side must look > 10 GB before injection is considered.
That is correct in production — the filter costs a full pass over the
dimension keys — but means local[*] test plans never show it. This module
exposes the knobs so tests can pin the plan shape the engine relies on at
scale, and so deployments can tune the thresholds deliberately.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KNOBS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the fact side must look at least this big for injection to pay off
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
    # the dim side must be under this for the bloom build to be cheap
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
}


@contextmanager
def runtime_bloom_filters(
    spark: SparkSession,
    application_side_min: str = "1MB",
    creation_side_max: str = "50MB",
    disable_broadcast: bool = False,
):
    """Session-scoped override of the runtime-filter size gates.

    `disable_broadcast=True` additionally forces shuffle joins
    (autoBroadcastJoinThreshold=-1) so the bloom path — not a broadcast —
    is what the plan exercises; that is the 100 TB regime where the
    dimension exceeds broadcast limits. All conf is restored on exit.
    """
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_min,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": creation_side_max,
    }
    if disable_broadcast:
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    old = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
