"""SQ8 ANN margin evidence: the exact top-1 neighbor must sit far inside
the quantized candidate window (n_candidates=64), so q107's
candidate-then-verify oracle equality holds with a wide, measured margin
rather than by luck (round-3 advice: sketch oracles need margin
assertions so testdata drift produces a diagnosable failure)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_cdc_spark.operators import similarity
from stream_cdc_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_sq8_quantize_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {
        r["vec_id"]: r["sq"]
        for r in df.select(
            "vec_id", similarity.sq8_quantize(F.col("embedding")).alias("sq")
        ).collect()
    }
    q1, s1 = out[1]["q"], out[1]["scale"]
    assert s1 == 1.0 / 127.0
    assert q1 == [64, -127, 32, 0]  # round(x / scale)
    assert all(-127 <= v <= 127 for v in q1)
    q2, s2 = out[2]["q"], out[2]["scale"]
    assert s2 == 0.0 and q2 == [0, 0, 0, 0]


def test_true_top1_sits_deep_inside_sq8_candidate_window(spark):
    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qs = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.002)).alias("embedding"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        similarity.sq8_quantize(F.col("embedding")).alias("c_sq"),
    )
    q = qs.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        similarity.sq8_quantize(F.col("embedding")).alias("q_sq"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "c_id",
        (
            similarity.int_dot(F.col("q_sq.q"), F.col("c_sq.q"))
            * F.col("q_sq.scale")
            * F.col("c_sq.scale")
            / (similarity.l2_norm(F.col("q_vec")) * similarity.l2_norm(F.col("c_vec")))
        ).alias("approx_sim"),
        similarity.cosine(F.col("q_vec"), F.col("c_vec")).alias("exact_sim"),
    )
    wa = Window.partitionBy("q_id").orderBy(
        F.col("approx_sim").desc(), F.col("c_id").asc()
    )
    we = Window.partitionBy("q_id").orderBy(
        F.col("exact_sim").desc(), F.col("c_id").asc()
    )
    ranked = scored.select(
        "q_id",
        F.row_number().over(wa).alias("arank"),
        F.row_number().over(we).alias("erank"),
    )
    worst = ranked.filter(F.col("erank") == 1).agg(F.max("arank")).first()[0]
    # n_candidates=64: demand the true neighbor lands in the top 8 — an
    # 8x margin, so corpus regeneration noise degrades visibly here long
    # before q107's oracle equality could silently break.
    assert worst is not None and worst <= 8, f"worst approx rank {worst}"
