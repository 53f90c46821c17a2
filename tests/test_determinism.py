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


SCAN_HEAVY = [
    "q13_tpch_q1",
    "q19_exact_dedup",
    "q24_ngram_jaccard_pairs",
    "q34_tpch_q6",
    "q102_vocab_growth",
    "q112_gram_matrix",
]


@pytest.mark.parametrize("name", SCAN_HEAVY)
def test_result_is_input_split_invariant(spark, name):
    """Scan-split size changes the number and boundaries of input
    partitions (the other partitioning axis, untouched by
    shuffle.partitions) — per-partition partials (mapInPandas Gram
    blocks, map-side combines) must still merge to identical results."""
    base = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")  # 128 KB
        a = _canon(QUERIES[name].builder(spark, SF_SMALL))
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        b = _canon(QUERIES[name].builder(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", base)
    assert a == b, f"{name} output depends on input split boundaries"


AQE_SENSITIVE = [
    "q14_tpch_q3",            # AQE broadcast conversion
    "q24_ngram_jaccard_pairs",  # exchange reuse + skew-join machinery
    "q27_minhash_lsh_pairs",
    "q48_cdc_merge_apply",
    "q64_dedup_components",   # iterative with per-round exchanges
    "q110_incremental_dedup",
    "q116_equidepth_histogram",
]


@pytest.mark.parametrize("name", AQE_SENSITIVE)
def test_result_is_aqe_invariant(spark, name):
    """AQE re-plans at runtime (partition coalescing, broadcast
    conversion, skew splits); disabling it must not change any result —
    plans may differ, values may not."""
    base = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a = _canon(QUERIES[name].builder(spark, SF_SMALL))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = _canon(QUERIES[name].builder(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", base)
    assert a == b, f"{name} output depends on adaptive execution"
