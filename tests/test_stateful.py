"""applyInPandasWithState operators: state must accumulate across
micro-batches (driven by the rate-limited cdc_replay source so the stream
genuinely spans multiple triggers) and converge to the batch answers."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stream_cdc_spark.sources import cdc_replay
from stream_cdc_spark.streaming.stateful import position_tracker, session_tracker
from stream_cdc_spark.streaming.pipeline import replay_stream
from stream_cdc_spark.tables import load, table_path
from tests.conftest import SF_SMALL


def _drain(spark, query_name, q, want_rows_fn, timeout_s=120):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if want_rows_fn():
            break
        time.sleep(1)
    q.stop()


def test_position_tracker_across_batches(spark, tmp_path):
    cdc_replay.register(spark)
    env = (
        spark.readStream.format("cdc_replay")
        .option("path", table_path(SF_SMALL, "events"))
        .option("batchEvents", "300")  # forces >= 4 micro-batches
        .load()
    )
    out = position_tracker(env, key_col="event_type", seq_col="seq")
    q = (
        out.writeStream.format("memory")
        .queryName("pos_track")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )

    ev = load(spark, SF_SMALL, "events")
    want = {
        cdc_replay._OP_MAP[r.event_type]: 0 for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"), F.max("event_id").alias("m")).collect():
        op = cdc_replay._OP_MAP[r.event_type]
        want[op] += r.n

    def done():
        rows = spark.sql(
            "SELECT key, MAX(n_events) n FROM pos_track GROUP BY key"
        ).collect()
        return sum(r.n for r in rows) >= sum(want.values())

    _drain(spark, "pos_track", q, done)
    final = {
        r.key: (r.n, r.m)
        for r in spark.sql(
            "SELECT key, MAX(n_events) n, MAX(last_seq) m FROM pos_track GROUP BY key"
        ).collect()
    }
    assert {k: v[0] for k, v in final.items()} == want
    # high-water mark: the max seq across all ops must be the global max
    assert max(v[1] for v in final.values()) == ev.agg(F.max("event_id")).collect()[0][0]
    # state really evolved across batches: early snapshots < final counts
    snaps = spark.sql("SELECT n_events FROM pos_track").collect()
    assert len(snaps) > len(final)  # multiple update emissions per key


def test_session_tracker_converges_to_batch_q31(spark, tmp_path):
    stream = session_tracker(replay_stream(spark, SF_SMALL), gap_seconds=1800)
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_track")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        int(r.key): r.ns
        for r in spark.sql(
            "SELECT key, MAX(n_sessions) ns FROM sess_track GROUP BY key"
        ).collect()
    }
    from stream_cdc_spark.plans.queries import QUERIES

    want = {
        r.user_id: r.n_sessions
        for r in QUERIES["q31_sessionization"].builder(spark, SF_SMALL).collect()
    }
    assert got == want
