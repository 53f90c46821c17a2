"""Per-stratum quota sampling: exactness, determinism across
partitionings, and the prethin fast path's bit-identical equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators import sampling


def _corpus(spark, n_hot=400, n_cold=5):
    rows = [(i, "hot", f"hot text {i}") for i in range(n_hot)]
    rows += [(10_000 + i, "cold", f"cold text {i}") for i in range(n_cold)]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_cap_enforced_and_small_strata_kept_whole(spark):
    df = _corpus(spark)
    out = sampling.per_key_cap(df, "source", 10, "text", "doc_id")
    got = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    counts = {r["source"]: r["n"] for r in got}
    assert counts == {"hot": 10, "cold": 5}


def test_draw_stable_across_partitionings(spark):
    df = _corpus(spark)
    a = {
        r["doc_id"]
        for r in sampling.per_key_cap(df, "source", 10, "text", "doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.per_key_cap(
            df.repartition(13, "doc_id"), "source", 10, "text", "doc_id"
        ).collect()
    }
    assert a == b


def test_prethin_bit_identical_to_exact_window(spark):
    df = _corpus(spark, n_hot=2000, n_cold=7)
    exact = {
        r["doc_id"]
        for r in sampling.per_key_cap(df, "source", 10, "text", "doc_id").collect()
    }
    fast = {
        r["doc_id"]
        for r in sampling.capped_sample_with_prethin(
            df, "source", 10, "text", "doc_id"
        ).collect()
    }
    assert fast == exact


def test_prethin_actually_thins_the_hot_stratum(spark):
    df = _corpus(spark, n_hot=2000, n_cold=7)
    counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    cut = {
        r["source"]: sampling.hash_cutoff(
            min(sampling.RATE_DENOM, -(-sampling.RATE_DENOM * 8 * 10 // r["n"]))
        )
        for r in counts
    }
    assert cut["cold"] == "g"          # small stratum: no thinning
    assert cut["hot"] < "g"            # hot stratum: real cutoff
    rank_key = F.md5(F.col("text").cast("string"))
    survivors = df.filter(
        (F.col("source") == "hot")
        & (F.substring(rank_key, 1, 3) < F.lit(cut["hot"]))
    ).count()
    assert 10 <= survivors < 2000      # window input shrank, quota safe
