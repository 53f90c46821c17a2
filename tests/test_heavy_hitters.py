"""Misra-Gries heavy hitters under adversarial skew — capacity far below
the vocabulary so the decrement/merge path actually fires (unlike q108's
corpus, whose vocab fits inside the capacity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators import incremental


def _docs(spark, texts, partitions=2):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(partitions, "doc_id")


def test_sketch_bounded_and_superset_under_skew(spark):
    # 200 'hot' tokens drowned in 300 distinct rare tokens; capacity 8.
    texts = ["hot " * 20 + f"r{i}a r{i}b r{i}c" for i in range(100)]
    sk = incremental.misra_gries_sketch(_docs(spark, texts), "text", capacity=8)
    rows = sk.collect()
    n_parts = _docs(spark, texts).rdd.getNumPartitions()
    assert len(rows) <= 8 * n_parts  # bounded summary size
    items = {r["item"] for r in rows}
    assert "hot" in items  # freq 2000/2300 >> N/9 -> must survive


def test_heavy_hitters_exact_despite_decrements(spark):
    texts = ["hot " * 20 + f"r{i}a r{i}b r{i}c" for i in range(100)]
    df = _docs(spark, texts)
    out = incremental.heavy_hitters(df, "text", k=5, capacity=8).collect()
    # N = 100 * 23 = 2300 tokens; threshold N/5 = 460; only 'hot' (2000)
    # qualifies — every rare token appears once (100 docs x 3 distinct).
    got = {r["token"]: r["cnt"] for r in out}
    assert got == {"hot": 2000}


def test_two_partitions_with_different_hot_items_both_survive(spark):
    a = ["alpha " * 30 + f"x{i}" for i in range(40)]
    b = ["beta " * 30 + f"y{i}" for i in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a + b)], ["doc_id", "text"]
    ).repartition(2, "doc_id")
    out = incremental.heavy_hitters(df, "text", k=4, capacity=8).collect()
    got = {r["token"]: r["cnt"] for r in out}
    # 2480 total tokens; threshold 620; alpha and beta are 1200 each.
    assert got == {"alpha": 1200, "beta": 1200}


def test_capacity_below_guarantee_rejected(spark):
    df = _docs(spark, ["a b c"])
    with pytest.raises(ValueError, match="guarantee"):
        incremental.heavy_hitters(df, "text", k=50, capacity=10)


def test_sketch_undercount_bound(spark):
    # c_hat never exceeds the true count, and undercount <= N_p/(cap+1).
    texts = ["m1 m2 m3 m4 m5 m6 " * 10 + f"z{i}" for i in range(30)]
    df = _docs(spark, texts, partitions=1)
    sk = {
        r["item"]: r["c_hat"]
        for r in incremental.misra_gries_sketch(df, "text", capacity=8).collect()
    }
    toks = df.select(F.explode(F.split("text", " ")).alias("w"))
    true = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    n = sum(true.values())
    for item, c_hat in sk.items():
        assert c_hat <= true[item]
        assert true[item] - c_hat <= n / 9
