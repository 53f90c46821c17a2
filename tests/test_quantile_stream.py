"""Continuous quantile maintenance: restart-safe, rank-error-bounded."""

from __future__ import annotations

import os

from pyspark.sql import Window, functions as F

from stream_cdc_spark.streaming.stateful import quantile_stream
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


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
