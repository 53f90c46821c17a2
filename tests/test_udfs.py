"""UDF/UDAF/UDTF surface: each pandas entry point must agree with its
JVM-expression twin (proving correctness AND making the 'UDFs are the slow
path' tradeoff measurable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.functions import (
    make_shingle_udtf,
    median_udaf,
    quality_score_udf,
    token_count_udf,
    udf_registry,
    zscore_per_group,
)
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def test_scalar_pandas_udfs_match_expressions(spark):
    from stream_cdc_spark.operators import text as T

    d = load(spark, SF_SMALL, "documents").limit(200)
    both = d.select(
        "doc_id",
        quality_score_udf("text").alias("udf_score"),
        token_count_udf("text").alias("udf_tokens"),
    )
    expr = T.quality_score(T.quality_features(d)).select(
        "doc_id", "quality_score", "n_tokens"
    )
    j = both.join(expr, "doc_id")
    bad = j.filter(
        (F.abs(F.col("udf_score") - F.col("quality_score")) > 1e-9)
        | (F.col("udf_tokens") != F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_grouped_agg_udaf_matches_exact_median(spark):
    ev = load(spark, SF_SMALL, "events")
    got = {
        r.event_type: r.med
        for r in ev.groupBy("event_type").agg(median_udaf("value").alias("med")).collect()
    }
    for etype, med in got.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        want = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
        assert abs(med - want) < 1e-9, etype


def test_grouped_map_zscore(spark):
    ev = load(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    z = zscore_per_group(ev, "event_type", "value")
    stats = z.groupBy("event_type").agg(
        F.round(F.avg("zscore"), 6).alias("mu"),
        F.round(F.stddev_pop("zscore"), 6).alias("sd"),
    )
    for r in stats.collect():
        assert abs(r.mu) < 1e-5 and abs(r.sd - 1.0) < 1e-5
    assert z.count() == ev.count()


def test_shingle_udtf(spark):
    make_shingle_udtf(spark)
    rows = spark.sql(
        "SELECT * FROM shingles_udtf('a b c d', 3) ORDER BY pos"
    ).collect()
    assert [(r.pos, r.shingle) for r in rows] == [(0, "a b c"), (1, "b c d")]
    # lateral join over a table: one row -> many
    spark.createDataFrame([(1, "x y z w"), (2, "s")], ["id", "t"]).createOrReplaceTempView(
        "udtf_docs"
    )
    out = spark.sql(
        "SELECT id, s.shingle FROM udtf_docs, LATERAL shingles_udtf(t, 2) s ORDER BY id, s.pos"
    ).collect()
    assert [(r.id, r.shingle) for r in out] == [
        (1, "x y"), (1, "y z"), (1, "z w"),
    ]


def test_udf_registry():
    assert set(udf_registry) >= {"quality_score", "token_count", "median"}
