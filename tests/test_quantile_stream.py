"""Continuous quantile maintenance: restart-safe, rank-error-bounded."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from stream_cdc_spark.streaming.stateful import quantile_stream
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL
import pytest


@pytest.mark.slow
def test_quantile_stream_restart_within_rank_bound(spark, tmp_path):
    """Drain the events table in two runs with a checkpoint restart; each
    key's final p50/p95 estimate must land within the 1/accuracy rank
    bound of the EXACT per-key quantile (the operator's GK contract —
    unlike HLL, merge order means bit-equality with batch is not
    promised)."""
    ev = load(spark, SF_SMALL, "events").select("event_type", "value")
    indir, ckpt, outdir = (str(tmp_path / p) for p in ("in", "ckpt", "out"))
    os.makedirs(indir, exist_ok=True)

    parts = (
        ev.repartition(4)
        .rdd.mapPartitionsWithIndex(lambda i, it: ((i, list(it)),))
        .collect()
    )

    def write_slice(i, rows):
        spark.createDataFrame(rows, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(indir, f"slice={i}"))

    def emit(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(outdir)

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(indir + "/slice=*")
        )
        q = (
            quantile_stream(stream, keys=("event_type",), percentiles=(0.5, 0.95))
            .writeStream.foreachBatch(emit)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i, rows in parts[:2]:
        write_slice(i, rows)
    run()
    for i, rows in parts[2:]:
        write_slice(i, rows)
    run()

    latest = (
        spark.read.parquet(outdir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.desc("batch_id"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    got = {r["event_type"]: (r["p50"], r["p95"]) for r in latest.collect()}

    # exact rank check per key: the estimate's rank must be within
    # eps*n of the target rank (eps = 1/accuracy = 1e-4, generous 1% here
    # to keep the test robust to ties)
    vals = ev.collect()
    per_key: dict[str, list] = {}
    for r in vals:
        per_key.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(per_key)
    for k, xs in per_key.items():
        xs.sort()
        n = len(xs)
        for est, p in zip(got[k], (0.5, 0.95)):
            lo = max(0, int((p - 0.01) * n) - 1)
            hi = min(n - 1, int((p + 0.01) * n) + 1)
            assert xs[lo] <= est <= xs[hi], (k, p, est, xs[lo], xs[hi])


@pytest.mark.slow
def test_percentile_gate_stream_restart_within_rank_band(spark, tmp_path):
    """The streaming twin of q124: drain the documents table in two runs
    with a checkpoint restart; each language's final streamed threshold
    must sit within the rank band of the EXACT (1 - top_p) score
    quantile, and applying the gate to the full corpus must keep exactly
    the >= -threshold set (broadcast join, corpus never shuffles)."""
    from stream_cdc_spark.operators.text import quality_features, quality_score
    from stream_cdc_spark.streaming.stateful import (
        apply_percentile_gate,
        percentile_gate_stream,
    )

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
    indir, ckpt, outdir = (str(tmp_path / p) for p in ("in", "ckpt", "out"))
    os.makedirs(indir, exist_ok=True)

    parts = (
        docs.repartition(4)
        .rdd.mapPartitionsWithIndex(lambda i, it: ((i, list(it)),))
        .collect()
    )

    def write_slice(i, rows):
        spark.createDataFrame(rows, docs.schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(indir, f"slice={i}"))

    def emit(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(outdir)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(indir + "/slice=*")
        )
        q = (
            percentile_gate_stream(stream, top_p=0.5)
            .writeStream.foreachBatch(emit)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i, rows in parts[:2]:
        write_slice(i, rows)
    run()
    for i, rows in parts[2:]:
        write_slice(i, rows)
    run()

    latest = (
        spark.read.parquet(outdir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("batch_id"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    got = {r["lang"]: r["score_threshold"] for r in latest.collect()}

    exact = quality_score(quality_features(docs)).select(
        "lang", "quality_score"
    ).collect()
    per_lang: dict[str, list] = {}
    for r in exact:
        per_lang.setdefault(r["lang"], []).append(r["quality_score"])
    assert set(got) == set(per_lang)
    for lang, xs in per_lang.items():
        xs.sort()
        n = len(xs)
        lo = max(0, int((0.5 - 0.01) * n) - 1)
        hi = min(n - 1, int((0.5 + 0.01) * n) + 1)
        assert xs[lo] <= got[lang] <= xs[hi], (lang, got[lang], xs[lo], xs[hi])

    # the gate itself: broadcast-join + >= filter, exact given thresholds
    thresholds = latest.select("lang", "score_threshold")
    kept = apply_percentile_gate(docs, thresholds)
    kept.collect()
    plan = kept._sc._jvm.PythonSQLUtils.explainString(
        kept._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    got_kept = {
        lang: kept.filter(F.col("lang") == lang).count() for lang in per_lang
    }
    for lang, xs in per_lang.items():
        want = sum(1 for s in xs if s >= got[lang])
        assert got_kept[lang] == want, (lang, got_kept[lang], want)


def test_percentile_gate_unseen_group_policy(spark):
    """A language with no threshold row yet (first seen this trigger) is
    governed by an EXPLICIT policy: admit_unseen=True (default) admits
    its documents, admit_unseen=False drops them; seen groups gate
    identically under both."""
    from stream_cdc_spark.streaming.stateful import apply_percentile_gate

    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the lazy dog again"),
            (2, "zz", "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id bigint, lang string, text string",
    )
    thresholds = spark.createDataFrame(
        [("en", -1e9)], "lang string, score_threshold double"
    )
    admit = apply_percentile_gate(docs, thresholds)
    assert sorted(r["doc_id"] for r in admit.collect()) == [1, 2]
    strict = apply_percentile_gate(docs, thresholds, admit_unseen=False)
    assert sorted(r["doc_id"] for r in strict.collect()) == [1]
