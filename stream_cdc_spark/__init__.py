"""stream_cdc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SykesCottages/stream-cdc.

The reference (/root/reference, read-only) is a single-process MySQL-binlog →
SQS CDC pipeline (stream_cdc/main.py:16-66). This package re-expresses its
whole dataflow surface — source → classify → project → filter/transform →
serialize → batch → sink with offset checkpointing — as idiomatic Spark
(DataFrame/SQL/Catalyst + Structured Streaming), and extends it with the
batch/streaming query surface of a real engine (joins, aggregations, windows,
dedup, similarity search, text analysis) designed for 100 TB scale.

Layout:
  session.py    SparkSession builder with scale-oriented defaults
  tables.py     testdata table loaders / view registration
  config.py     env-config loader (reference: stream_cdc/config/loader.py)
  operators/    envelope, compaction, batching, claim-check, dedup,
                similarity, text analysis, multimodal
  filters/      FilterChain API (reference: stream_cdc/filters/base.py)
  sinks/        queue sink packing (reference: stream_cdc/streams/sqs.py)
  streaming/    Structured Streaming spine (coordinator/worker equivalents)
  plans/        declared query inventory (SURVEY.md §2.4) + DuckDB oracles
"""

from stream_cdc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
