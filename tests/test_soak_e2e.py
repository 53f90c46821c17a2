"""Long-haul streaming soak: the analogue of the reference's shell e2e
(scripts/test-db.sh:92-231), which drives real multi-statement transactions
and 1 MB payloads through the pipeline. Here: 100+ rate-limited
micro-batches through the cdc_replay source -> filter/serialize ->
claim-check queue sink, a hard mid-stream stop + checkpoint restart, and
oversize (~300 KB) payloads through the claim-check path — converging to
the exact batch answer under consumer-side content-hash dedup
(at-least-once delivery; an interrupted in-flight batch may legitimately
redeliver).

Marked `slow`; runs in the default suite (pytest.ini registers the marker).
"""

from __future__ import annotations

import glob
import json
import os
import time

import pytest

from pyspark.sql import functions as F

from stream_cdc_spark.config import AppConfig
from stream_cdc_spark.sinks.claimcheck import FileClaimCheckStore
from stream_cdc_spark.sinks.queue import (
    MAX_MESSAGE_SIZE_BYTES,
    FileQueue,
    foreach_batch_writer,
)
from stream_cdc_spark.sources import datasource_registry
from stream_cdc_spark.streaming.pipeline import CdcPipeline
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL

N_EVENTS = 1000  # sf0.001 events rows
BATCH_EVENTS = 10  # rate limit -> >= 100 micro-batches for a full drain
N_OVERSIZE = 10  # every 100th event gets a ~300 KB payload


def _write_soak_fixture(spark, path: str) -> None:
    """Copy sf0.001 events, inflating every 100th props to ~300 KB so those
    envelopes exceed the 245,760-byte message cap and must claim-check."""
    big = F.concat(F.lit("X" * 1024), F.lit("Y" * 1024))
    for _ in range(6):
        big = F.concat(big, big)  # 2 KB * 2^6 * ~2.3 -> ~300 KB after JSON
    ev = load(spark, SF_SMALL, "events").withColumn(
        "props",
        F.when(F.col("event_id") % 100 == 0, F.concat(big, big)).otherwise(
            F.col("props")
        ),
    )
    ev.coalesce(1).write.mode("overwrite").parquet(path)


def _pipeline(
    spark, fixture: str, qdir: str, ckpt: str, store: FileClaimCheckStore | None = None
) -> CdcPipeline:
    src = datasource_registry.create(
        "cdc_replay",
        spark=spark,
        path=_single_parquet(fixture),
        batchEvents=BATCH_EVENTS,
        readPartitions=4,
    )
    return CdcPipeline(
        spark,
        src,
        foreach_batch_writer(lambda: FileQueue(qdir), store=store),
        checkpoint_dir=ckpt,
        config=AppConfig(batch_size=10, flush_interval=0.05),
    )


def _single_parquet(dirname: str) -> str:
    files = glob.glob(os.path.join(dirname, "part-*.parquet"))
    assert len(files) == 1, files
    return files[0]


def _drained_by_hash(q: FileQueue) -> dict[str, dict]:
    """Consumer-side dedup: at-least-once delivery keyed by content hash."""
    return {
        m["MessageAttributes"]["content_sha256"]: m for m in q.drain()
    }


@pytest.mark.slow
def test_soak_restart_oversize_convergence(spark, tmp_path):
    fixture = str(tmp_path / "soak-events")
    qdir = str(tmp_path / "soak-q")
    ckpt = str(tmp_path / "soak-ckpt")
    store = FileClaimCheckStore(str(tmp_path / "soak-store"))
    _write_soak_fixture(spark, fixture)

    # ---- phase 1: continuous micro-batches, hard stop mid-stream --------
    pipe = _pipeline(spark, fixture, qdir, ckpt, store)
    pipe.start(available_now=False)  # ProcessingTime pacing (O15)
    queue = FileQueue(qdir)
    deadline = time.time() + 180
    while time.time() < deadline and len(queue.drain()) < N_EVENTS // 2:
        time.sleep(0.5)
    assert len(queue.drain()) >= N_EVENTS // 2, "phase 1 made no progress"
    pipe.query.stop()  # hard interrupt: in-flight batch may be uncommitted

    # ---- phase 2: restart from checkpoint, drain to completion ----------
    pipe2 = _pipeline(spark, fixture, qdir, ckpt, store)
    pipe2.start(available_now=False)
    deadline = time.time() + 240
    while time.time() < deadline and len(_drained_by_hash(queue)) < N_EVENTS:
        time.sleep(0.5)
    pipe2.query.stop()

    by_hash = _drained_by_hash(queue)
    assert len(by_hash) == N_EVENTS, (
        f"converged to {len(by_hash)} distinct messages, want {N_EVENTS}"
    )
    # at-least-once: duplicates only from the interrupted in-flight batch
    dupes = len(queue.drain()) - len(by_hash)
    assert dupes <= 3 * BATCH_EVENTS, f"excessive redelivery: {dupes}"

    # ---- 100+ micro-batches actually happened (committed offsets) -------
    committed = glob.glob(os.path.join(ckpt, "offsets", "*"))
    assert len(committed) >= 100, f"only {len(committed)} committed batches"

    # ---- oversize payloads went through the claim-check path ------------
    oversized = [
        m
        for m in by_hash.values()
        if m["MessageAttributes"].get("oversized") == "true"
    ]
    assert len(oversized) == N_OVERSIZE
    recovered_seqs = set()
    for m in oversized:
        body = json.loads(m["MessageBody"])
        assert body["message_type"] == "reference"
        assert len(m["MessageBody"].encode()) <= MAX_MESSAGE_SIZE_BYTES
        # the claim-check is recoverable: the executor that hit the
        # oversize wrote the full payload to the store BEFORE the
        # reference entered the queue — even across the hard restart
        # (content-addressed re-puts are idempotent)
        original = store.get_text(body["uri"])
        assert len(original.encode()) > MAX_MESSAGE_SIZE_BYTES
        recovered_seqs.add(json.loads(original)["seq"])
    assert len(recovered_seqs) == N_OVERSIZE
    assert all(s % 100 == 0 for s in recovered_seqs)
    # and every normal payload respected the cap too
    assert all(
        len(m["MessageBody"].encode()) <= MAX_MESSAGE_SIZE_BYTES
        for m in by_hash.values()
    )

    # ---- convergence: streamed envelopes == batch classification --------
    streamed_ops = {}
    for m in by_hash.values():
        body = json.loads(m["MessageBody"])
        if body.get("message_type") == "reference":
            continue
        streamed_ops[body["seq"]] = body["event_type"]
    batch = load(spark, SF_SMALL, "events").select("event_id", "event_type")
    from stream_cdc_spark.sources.cdc_replay import _OP_MAP

    expected = {
        r.event_id: _OP_MAP.get(r.event_type, "Insert")
        for r in batch.collect()
        if r.event_id % 100 != 0  # oversize rows arrive as references
    }
    assert streamed_ops == expected
