"""Kafka + Debezium CDC source behind the datasource registry.

The reference anticipates queue-backed streams as the production transport
(stream_cdc/streams/base.py:11 names Kafka alongside SQS; SURVEY.md names
Kafka+Debezium as the production CDC path). On Spark the idiomatic
realization is not a custom source at all: Debezium operates the binlog
tail, and the engine consumes the topic with the stock Kafka structured-
streaming reader — offset tracking (O4), seek/resume (O5), and graceful
restart (O27) all come from the source + checkpoint machinery.

Two paths, same downstream plan:

- **real broker**: ``spark.readStream.format("kafka")`` with the usual
  reader options. Requires the ``spark-sql-kafka-0-10`` package on the
  cluster classpath (not bundled in this test container, so this path is
  config-gated and exercised only as plan construction).
- **file-backed topic double** (``mock_path``): JSON-lines files carrying
  the exact Kafka wire schema (key/value/topic/partition/offset/
  timestamp). The contract test proves envelope-equivalence between this
  path and a direct batch parse of the same messages, so the only
  untested piece against a real broker is Kafka connectivity itself.

Either way the value column is parsed with
``operators.envelope.from_debezium_json`` and (topic, partition, offset)
ride along for offset-tracking parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_spark.operators.envelope import from_debezium_json

# The Kafka reader's fixed output schema (Spark's kafka source contract);
# the mock topic files carry the same shape so downstream code cannot tell
# the difference.
KAFKA_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

_TRANSPORT_COLS = ("topic", "partition", "offset")


def kafka_debezium_stream(
    spark: SparkSession,
    bootstrap_servers: str | None = None,
    topic: str | None = None,
    starting_offsets: str = "earliest",
    mock_path: str | None = None,
    max_files_per_trigger: int | None = None,
    **reader_opts: str,
) -> DataFrame:
    """Streaming envelope DataFrame from a Debezium-format Kafka topic.

    Exactly one of ``bootstrap_servers`` (real broker) or ``mock_path``
    (file-backed topic double) must be provided. Output columns: the CDC
    envelope (event_type, gtid, database, table, content) plus
    (topic, partition, offset) for offset tracking.
    """
    if (bootstrap_servers is None) == (mock_path is None):
        raise ValueError(
            "provide exactly one of bootstrap_servers (real Kafka) or "
            "mock_path (file-backed topic double)"
        )
    if mock_path is not None:
        reader = spark.readStream.schema(KAFKA_MESSAGE_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.json(mock_path)
    else:
        if not topic:
            # fail fast with the same clarity the mock path gets — an empty
            # 'subscribe' option would otherwise surface as an obscure Kafka
            # error at stream start (round-3 advice item)
            raise ValueError(
                "topic is required with bootstrap_servers (real Kafka path)"
            )
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        for k, v in reader_opts.items():
            reader = reader.option(k, str(v))
        raw = reader.load()
        # Kafka delivers key/value as binary; the topic carries UTF-8 JSON.
        raw = raw.withColumn("value", F.col("value").cast("string"))
    return from_debezium_json(raw, keep_cols=_TRANSPORT_COLS)


def parse_kafka_topic_batch(df: DataFrame) -> DataFrame:
    """Batch twin of kafka_debezium_stream's parse stage (for backfills and
    the contract test): same envelope, same transport columns."""
    return from_debezium_json(df, keep_cols=_TRANSPORT_COLS)
