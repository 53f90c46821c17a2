"""Kafka+Debezium source contract (registry entry `kafka-debezium`).

No broker exists in the sandbox, so the tests drive the file-backed topic
double, which carries the EXACT Kafka wire schema — the only untested
difference vs a real broker is connectivity. The contract proven here:

1. streaming ingest through the registry == batch parse of the same
   messages (value-for-value, including transport offsets);
2. the envelope derived from the topic equals the envelope derived from
   the same fixture events directly (the cdc_replay-path convention:
   'error' plays Delete, everything else Update);
3. misconfiguration fails fast; the real-broker path constructs a plan
   only when a bootstrap server is configured.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_cdc_spark.operators.envelope import to_debezium_json
from stream_cdc_spark.sources import datasource_registry
from stream_cdc_spark.sources.kafka import (
    KAFKA_MESSAGE_SCHEMA,
    kafka_debezium_stream,
    parse_kafka_topic_batch,
)
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL

import pytest


def _write_mock_topic(spark, topic_dir: str) -> None:
    """Fixture events -> Debezium JSON values -> Kafka-wire-shaped JSON
    lines (key/value/topic/partition/offset/timestamp)."""
    ev = load(spark, SF_SMALL, "events").select("user_id", "event_id", "event_type")
    env = ev.select(
        F.when(F.col("event_type") == "error", F.lit("Delete"))
        .otherwise(F.lit("Update"))
        .alias("event_type"),
        F.struct(
            F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias(
                "before"
            ),
            F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias(
                "after"
            ),
        ).alias("content"),
        F.lit("testdb").alias("database"),
        F.lit("events").alias("table"),
        F.col("event_id").cast("string").alias("gtid"),
        F.col("event_id").alias("_seq"),
    )
    # Serialize the value, re-attach the event sequence (gtid is unique) to
    # derive stable per-message partition/offset transport metadata.
    values = to_debezium_json(env).withColumn(
        "gtid", F.get_json_object("value", "$.source.gtid")
    )
    wire = (
        env.select("gtid", "_seq")
        .join(values, "gtid")
        .select(
            F.col("gtid").alias("key"),
            "value",
            F.lit("cdc.testdb.events").alias("topic"),
            (F.col("_seq") % 4).cast("int").alias("partition"),
            F.col("_seq").alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
    )
    wire.coalesce(2).write.mode("overwrite").json(topic_dir)


def test_stream_equals_batch_parse(spark, tmp_path):
    topic_dir = str(tmp_path / "topic")
    _write_mock_topic(spark, topic_dir)

    stream = datasource_registry.create(
        "kafka-debezium", spark=spark, mock_path=topic_dir
    )
    out_table = "kafka_contract_out"
    q = (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table(out_table)
    batch = parse_kafka_topic_batch(
        spark.read.schema(KAFKA_MESSAGE_SCHEMA).json(topic_dir)
    )
    cols = ["event_type", "gtid", "database", "table", "topic", "partition", "offset"]
    s = {tuple(r) for r in streamed.select(cols).collect()}
    b = {tuple(r) for r in batch.select(cols).collect()}
    assert s == b and len(s) == batch.count()


def test_topic_envelope_matches_direct_events_envelope(spark, tmp_path):
    """Same fixture, two ingest paths: the Kafka topic double must yield
    the same (gtid -> event_type) envelope the engine derives from the
    events table directly (the cdc_replay/q48 classification convention)."""
    topic_dir = str(tmp_path / "topic")
    _write_mock_topic(spark, topic_dir)
    parsed = parse_kafka_topic_batch(
        spark.read.schema(KAFKA_MESSAGE_SCHEMA).json(topic_dir)
    )
    via_kafka = {r.gtid: r.event_type for r in parsed.collect()}

    ev = load(spark, SF_SMALL, "events")
    direct = {
        str(r.event_id): ("Delete" if r.event_type == "error" else "Update")
        for r in ev.collect()
    }
    assert via_kafka == direct


def test_misconfiguration_fails_fast(spark):
    with pytest.raises(ValueError, match="exactly one"):
        kafka_debezium_stream(spark)
    with pytest.raises(ValueError, match="exactly one"):
        kafka_debezium_stream(
            spark, bootstrap_servers="broker:9092", mock_path="/tmp/x"
        )
    # real-broker path without a topic would otherwise build
    # .option("subscribe", "") and die with an obscure Kafka error at
    # stream start — must fail fast like the mock path does
    with pytest.raises(ValueError, match="topic is required"):
        kafka_debezium_stream(spark, bootstrap_servers="broker:9092")
    with pytest.raises(ValueError, match="topic is required"):
        kafka_debezium_stream(spark, bootstrap_servers="broker:9092", topic="")


def test_registry_lists_kafka_source(spark):
    assert "kafka-debezium" in datasource_registry.names()


ENVELOPE_COLS = ["event_type", "gtid", "database", "table", "topic", "partition", "offset"]


@pytest.mark.skipif(
    "STREAM_CDC_KAFKA_BOOTSTRAP" not in os.environ,
    reason="real-broker integration: set STREAM_CDC_KAFKA_BOOTSTRAP (and "
    "optionally STREAM_CDC_KAFKA_TOPIC) with spark-sql-kafka-0-10 on the "
    "classpath — the reference's dockerized e2e analogue (tests.sh:1-30)",
)
def test_real_kafka_debezium_end_to_end(spark, tmp_path):
    """Env-gated real-broker path. Both branches of kafka_debezium_stream
    funnel into the SAME parse (`from_debezium_json(raw, keep_cols=...)`,
    sources/kafka.py), so the mock contract tests above already prove the
    envelope semantics; this test adds the only thing they can't —
    connectivity and the binary->string value cast against a live topic
    carrying Debezium JSON."""
    bootstrap = os.environ["STREAM_CDC_KAFKA_BOOTSTRAP"]
    topic = os.environ.get("STREAM_CDC_KAFKA_TOPIC", "cdc.testdb.events")
    env = kafka_debezium_stream(
        spark, bootstrap_servers=bootstrap, topic=topic
    )
    assert set(ENVELOPE_COLS) <= set(env.columns)  # same surface as mock
    q = (
        env.writeStream.format("memory")
        .queryName("real_kafka_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("real_kafka_out").select(ENVELOPE_COLS).collect()
    assert rows, "topic had no Debezium messages to ingest"
    assert all(r["offset"] is not None for r in rows)
