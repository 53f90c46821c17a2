"""Leakage-safe splitting: the invariant and the assignment mechanics."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators.sampling import leakage_safe_split
from stream_cdc_spark.plans.queries import QUERIES, _shingle_pair_stats
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def test_no_near_dup_edge_crosses_splits(spark):
    """THE invariant: for every near-dup pair, both endpoints carry the
    same split — a doc and its 0.9-Jaccard twin can never land in train
    and test."""
    d = load(spark, SF_SMALL, "documents")
    joined, ratio = _shingle_pair_stats(d)
    edges = joined.filter(ratio >= 500000.0).select("id_a", "id_b")
    split = leakage_safe_split(d, edges).select("doc_id", "split")
    crossing = (
        edges.join(
            split.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "split", "sa"
            ),
            "id_a",
        )
        .join(
            split.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "split", "sb"
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossing == 0
    assert edges.count() > 0  # corpus genuinely exercises the invariant


def test_split_rates_roughly_hold_and_cover(spark):
    d = load(spark, SF_SMALL, "documents")
    empty_edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    split = leakage_safe_split(d, empty_edges)
    n = d.count()
    shares = {
        r["split"]: r["c"] / n
        for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert 0.8 < shares.get("train", 0) < 0.97
    assert shares.get("val", 0) < 0.12
    assert abs(sum(shares.values()) - 1.0) < 1e-9
    # with no edges every cluster is the doc itself
    assert split.filter(F.col("cluster") != F.col("doc_id")).count() == 0


def test_assignment_is_stable_under_repartitioning(spark):
    d = load(spark, SF_SMALL, "documents")
    joined, ratio = _shingle_pair_stats(d)
    edges = joined.filter(ratio >= 500000.0).select("id_a", "id_b")
    a = sorted(map(tuple, leakage_safe_split(d, edges).collect()))
    b = sorted(
        map(
            tuple,
            leakage_safe_split(d.repartition(13), edges.repartition(3)).collect(),
        )
    )
    assert a == b
