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
