"""Streaming twin of q125: exact (group, token) counts in the state
store; drift over the drained counts must equal the batch operator
BIT-FOR-BIT (the counts are exact integers — no rank band needed)."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from stream_cdc_spark.operators.text import (
    drift_from_token_counts,
    token_distribution_drift,
)
from stream_cdc_spark.streaming.stateful import token_count_stream
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL
import pytest


@pytest.mark.slow
def test_drift_stream_restart_bit_equal_to_batch(spark, tmp_path):
    docs = load(spark, SF_SMALL, "documents").select("doc_id", "source", "text")
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
            token_count_stream(stream)
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

    # update mode re-emits a (grp, tok) row whenever its count changes:
    # the latest emission per key is the final exact count
    latest = (
        spark.read.parquet(outdir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("grp", "tok").orderBy(F.desc("batch_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("grp", "tok", "c")
    )
    streamed = {
        r["source"]: (r["n_tokens"], r["kl_ppb"])
        for r in drift_from_token_counts(latest).collect()
    }
    batch = {
        r["source"]: (r["n_tokens"], r["kl_ppb"])
        for r in token_distribution_drift(docs).collect()
    }
    assert streamed == batch  # bit-equal, not rank-band


def test_token_count_stream_bpe_mode_counts_closed_vocab(spark, tmp_path):
    """tokenizer='bpe': one availableNow drain maintains exact per-group
    SUBWORD counts equal to the batch explode, and every counted token
    sits inside the CLOSED BPE vocabulary (26 chars + one symbol per
    merge) — the state bound holds by construction, not corpus luck."""
    from stream_cdc_spark.operators import bpe

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "source", "text")
    indir, ckpt, outdir = (str(tmp_path / p) for p in ("in", "ckpt", "out"))
    docs.coalesce(1).write.mode("overwrite").parquet(indir)

    def emit(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(outdir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(indir)
    )
    q = (
        token_count_stream(stream, tokenizer="bpe")
        .writeStream.foreachBatch(emit)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    latest = (
        spark.read.parquet(outdir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("grp", "tok").orderBy(F.desc("batch_id"))
            ),
        )
        .filter("rn = 1")
        .select("grp", "tok", "c")
    )
    batch = (
        docs.select(
            F.col("source").alias("grp"),
            F.explode(bpe.bpe_tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = sorted(map(tuple, latest.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    voc = set(bpe.vocab())
    toks = {r["tok"] for r in latest.select("tok").distinct().collect()}
    assert toks <= voc
    assert len(voc) == 26 + len(bpe.DEFAULT_MERGES)
