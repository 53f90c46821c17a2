"""Debezium end-to-end: a file-backed JSON topic double is streamed through
from_debezium_json -> CdcPipeline (checkpointed) -> QueueSink; a consumer
folds the drained messages into the customer snapshot with
compaction.apply_changes and must reproduce q48's batch answer exactly,
including across a checkpoint restart (no redelivery).

This is the production ingest path parity test: the reference tails the
binlog itself (stream_cdc/datasources/mysql.py:367-426) and ships to SQS
(streams/sqs.py:149-203); at scale the binlog tail is operated by
Debezium/Kafka and the engine consumes the topic — same lifecycle
(main.py:16-66), same envelope, same sink semantics.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stream_cdc_spark.operators import compaction
from stream_cdc_spark.operators.envelope import from_debezium_json, to_debezium_json
from stream_cdc_spark.plans.queries import QUERIES
from stream_cdc_spark.sinks.queue import FileQueue, foreach_batch_writer
from stream_cdc_spark.streaming.pipeline import CdcPipeline
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def _write_topic(spark, topic_dir: str) -> None:
    """Produce the events table as Debezium JSON files (the topic double).

    'error' plays Delete (the q48 convention); everything else is an
    Update. gtid carries the event sequence so the consumer can compact.
    """
    ev = load(spark, SF_SMALL, "events").select("user_id", "event_id", "event_type")
    env = ev.select(
        F.when(F.col("event_type") == "error", F.lit("Delete"))
        .otherwise(F.lit("Update"))
        .alias("event_type"),
        F.struct(
            F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias(
                "before"
            ),
            F.create_map(
                F.lit("user_id"),
                F.col("user_id").cast("string"),
                F.lit("orig_type"),
                F.col("event_type"),
            ).alias("after"),
        ).alias("content"),
        F.lit("testdb").alias("database"),
        F.lit("events").alias("table"),
        F.col("event_id").cast("string").alias("gtid"),
    )
    to_debezium_json(env).repartition(4).write.mode("overwrite").text(topic_dir)


def _run_pipeline(spark, topic_dir: str, qdir: str, ckpt: str) -> None:
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 2)
        .text(topic_dir)
    )
    pipe = CdcPipeline(
        spark,
        from_debezium_json(raw),
        foreach_batch_writer(lambda: FileQueue(qdir)),
        checkpoint_dir=ckpt,
    )
    pipe.start(available_now=True)
    pipe.await_and_stop(timeout=120)


def test_debezium_topic_to_sink_to_apply_matches_batch(spark, tmp_path):
    topic_dir = str(tmp_path / "topic")
    qdir = str(tmp_path / "queue")
    ckpt = str(tmp_path / "ckpt")
    _write_topic(spark, topic_dir)

    _run_pipeline(spark, topic_dir, qdir, ckpt)
    n_events = load(spark, SF_SMALL, "events").count()
    first = FileQueue(qdir).drain()
    assert len(first) == n_events

    # checkpoint restart: a second run resumes from the offset log and
    # must redeliver nothing
    _run_pipeline(spark, topic_dir, qdir, ckpt)
    msgs = FileQueue(qdir).drain()
    assert len(msgs) == n_events

    # consumer side: parse the queue payloads back into a change log and
    # MERGE-apply onto the snapshot
    changes = [json.loads(m["MessageBody"]) for m in msgs]
    rows = [
        (
            int(c["content"]["after"]["user_id"]),
            int(c["gtid"]),
            c["event_type"],
        )
        for c in changes
    ]
    chg = spark.createDataFrame(rows, "user_id bigint, event_id bigint, event_type string")
    snap = load(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    applied = (
        compaction.apply_changes(
            snap, chg, "c_custkey", "user_id", "event_id", "event_type",
            delete_label="Delete",
        )
        .select("c_custkey", "c_name", "last_event_id")
        .orderBy("c_custkey")
    )
    expected = QUERIES["q48_cdc_merge_apply"].builder(spark, SF_SMALL)
    assert [tuple(r) for r in applied.collect()] == [
        tuple(r) for r in expected.collect()
    ]


def test_debezium_roundtrip_preserves_envelope(spark):
    # to_debezium_json and from_debezium_json are inverses on the envelope
    ev = load(spark, SF_SMALL, "events").limit(20)
    env = ev.select(
        F.lit("Insert").alias("event_type"),
        F.struct(
            F.create_map().cast("map<string,string>").alias("before"),
            F.create_map(F.lit("id"), F.col("event_id").cast("string")).alias("after"),
        ).alias("content"),
        F.lit("db").alias("database"),
        F.lit("t").alias("table"),
        F.col("event_id").cast("string").alias("gtid"),
    )
    back = from_debezium_json(to_debezium_json(env))
    got = {(r.event_type, r.gtid, r.database, r.table, r.content.after["id"]) for r in back.collect()}
    want = {("Insert", str(r.event_id), "db", "t", str(r.event_id)) for r in ev.collect()}
    assert got == want
