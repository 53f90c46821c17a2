"""Unit tests for the round-6 training-data operators: per-language
quality percentile gating, source-distribution drift, and the z-score
anomaly gate (q124-q126's operator layer — the oracle harness proves
value parity; these pin the SEMANTIC contracts on crafted inputs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stream_cdc_spark.operators import profiling, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


GOOD = "the cat sat on the mat and looked out of the window at the rain"
BAD = "x" * 40  # one 40-char token: fails length, stopword, and avg-len


def test_quality_gate_keeps_ceil_fraction_per_group(spark):
    rows = [(i, "en", GOOD if i % 2 else BAD) for i in range(10)]
    rows += [(100 + i, "fr", GOOD) for i in range(3)]
    out = text.quality_percentile_gate(_docs(spark, rows), top_p=0.5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # ceil(0.5*10)=5 for en, ceil(0.5*3)=2 for fr
    assert len(by_lang["en"]) == 5 and len(by_lang["fr"]) == 2


def test_quality_gate_never_keeps_worse_over_better(spark):
    rows = [(i, "en", GOOD if i % 2 else BAD) for i in range(10)]
    out = text.quality_percentile_gate(_docs(spark, rows), top_p=0.5).collect()
    # the 5 GOOD docs (odd ids) outscore the 5 BAD ones — exactly they survive
    assert sorted(r["doc_id"] for r in out) == [1, 3, 5, 7, 9]
    assert all(r["quality_score"] == 1.0 for r in out)


def test_drift_zero_for_identical_distributions(spark):
    # two sources with the same token distribution -> each equals the
    # mixture -> every ln term is 0 exactly (p == q bit-identical)
    rows = [(1, "a", "x y z"), (2, "b", "x y z")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        r["source"]: r["kl_ppb"]
        for r in text.token_distribution_drift(df).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_drift_ranks_the_shifted_source_highest(spark):
    rows = [(i, "base", "a b c d") for i in range(8)]
    rows += [(100, "shifted", "q q q q")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        r["source"]: r["kl_ppb"]
        for r in text.token_distribution_drift(df).collect()
    }
    assert out["shifted"] > out["base"] >= -4  # floor can lose <=1ppb/term
    # shifted source: its only token has p=1, q=4/36 -> KL = ln(9)
    assert abs(out["shifted"] / 1e9 - math.log(9.0)) < 1e-6


def test_zscore_flags_planted_outlier_only(spark):
    vals = [(i, "t", 10.0 + (i % 3) * 0.5) for i in range(50)]
    vals.append((999, "t", 10_000.0))
    df = spark.createDataFrame(vals, "event_id bigint, event_type string, value double")
    out = profiling.zscore_outliers(
        df, key_col="event_type", id_col="event_id", value_col="value"
    ).collect()
    assert [r["event_id"] for r in out] == [999]
    assert out[0]["z_ppm"] > 3_000_000


def test_zscore_constant_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [(i, "c", 5.0) for i in range(10)],
        "event_id bigint, event_type string, value double",
    )
    assert (
        profiling.zscore_outliers(
            df, key_col="event_type", id_col="event_id", value_col="value"
        ).count()
        == 0
    )


def test_zscore_plan_broadcasts_moments(spark):
    df = spark.createDataFrame(
        [(i, "t", float(i)) for i in range(100)],
        "event_id bigint, event_type string, value double",
    )
    plan = profiling.zscore_outliers(
        df, key_col="event_type", id_col="event_id", value_col="value"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_centroid_cosine_known_geometry(spark):
    from stream_cdc_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),   # centroid -> (1, 0)
        (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1),   # centroid -> (0, 1)
        (5, [1.0, 0.0], 2), (6, [0.0, 1.0], 2),   # centroid -> (.5, .5)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {
        (r["label_a"], r["label_b"]): r["cos_bp"]
        for r in similarity.group_centroid_cosine(df).collect()
    }
    assert out[(0, 1)] == 0          # orthogonal
    assert 7070 <= out[(0, 2)] <= 7072   # cos 45deg ~ 0.70710
    assert out[(0, 2)] == out[(1, 2)]    # symmetric geometry


def test_zscore_singleton_group_gates_not_crashes(spark):
    # round-7 ADVICE: a key with exactly one row made the (n - 1) divisor
    # 0 and, under this repo's ANSI mode, threw DIVIDE_BY_ZERO instead of
    # gating. Singleton keys must simply emit nothing.
    rows = [(i, "t", 10.0 + (i % 3) * 0.5) for i in range(50)]
    rows.append((999, "t", 10_000.0))
    rows.append((1000, "lonely", 42.0))  # singleton key
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    out = profiling.zscore_outliers(
        df, key_col="event_type", id_col="event_id", value_col="value"
    ).collect()
    assert [r["event_id"] for r in out] == [999]


def test_centroid_cosine_zero_vector_group_dropped_not_crash(spark):
    # round-7 ADVICE: an all-zero centroid made the norm divisor 0 under
    # ANSI mode. Zero-norm groups must drop out of the pairwise relation.
    from stream_cdc_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1),
        (5, [0.0, 0.0], 2), (6, [0.0, 0.0], 2),  # zero centroid
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {
        (r["label_a"], r["label_b"]): r["cos_bp"]
        for r in similarity.group_centroid_cosine(df).collect()
    }
    assert set(out) == {(0, 1)}  # pairs touching label 2 are gone
    assert out[(0, 1)] == 0
