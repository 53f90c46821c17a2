"""Partitioning-determinism harness: every registered query must produce
IDENTICAL results under different shuffle-partition counts.

This is the scale-bug class the oracle gate can't see: a query whose
output depends on partition count (unstable tie-breaks, per-partition
ids leaking into results, floats summed pre-quantization) passes the
sf0.01 oracle today and silently diverges on a 1000-executor cluster.
Running the whole registry under 32 and then 5 shuffle partitions and
demanding canonical equality pins the invariant. Slow tier: ~2x the
oracle sweep's cost, run once per round."""

from __future__ import annotations

import pytest

from stream_cdc_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL
from tests.oracle import canonicalize

pytestmark = pytest.mark.slow


def _canon(spark_df):
    return canonicalize(
        spark_df.columns, [tuple(r) for r in spark_df.collect()]
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_result_is_partitioning_invariant(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(QUERIES[name].builder(spark, SF_SMALL))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _canon(QUERIES[name].builder(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b, f"{name} output depends on shuffle partitioning"
