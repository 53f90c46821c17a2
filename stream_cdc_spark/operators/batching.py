"""Batch-assembly and claim-check routing operators.

Reference semantics (citations into /root/reference/):
  - micro-batch assembly: flush every BATCH_SIZE=10 events
    (stream_cdc/processing/coordinator.py:26-59, config/loader.py:29-30)
  - sink packing under hard limits: <=10 msgs and <=262,000 B per request
    (stream_cdc/streams/sqs.py:149-203, limits :22-29)
  - oversized-message claim-check: payload > 240 KB replaced by a small
    reference record (stream_cdc/streams/sqs.py:250-302)

`assign_batches` declares the reference's *logical* batching (deterministic
over the ordering column) as a computation, so it is testable against an
oracle; the *runtime* batching lives in sinks/queue.py inside foreachBatch.

Scale note: a global row_number is inherently sequential — fine for the
correctness contract (it mirrors the reference's single-consumer arrival
order), but at 100 TB batching must be per-partition. `assign_batches`
therefore also offers partition-local mode: batch ids are (partition_id,
local_seq // n) pairs, embarrassingly parallel, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# SQS hard limits (stream_cdc/streams/sqs.py:22-29).
MAX_BATCH_MESSAGES = 10
MAX_BATCH_BYTES = 262_000
MAX_MESSAGE_BYTES = 245_760  # 240 KB effective per-message cap


def assign_batches(
    df: DataFrame,
    order_col: str,
    batch_size: int = MAX_BATCH_MESSAGES,
    global_order: bool = True,
) -> DataFrame:
    """Assign each row a batch id of count-capped greedy batches.

    global_order=True reproduces the reference's single-consumer semantics
    (one total order = one window over everything). global_order=False is
    the scale path: per-shuffle-partition batching with composite ids.
    """
    if global_order:
        w = Window.orderBy(F.col(order_col))
        rn = F.row_number().over(w)
        batch_id = F.floor((rn - F.lit(1)) / F.lit(batch_size)).cast("bigint")
        return df.withColumn("batch_id", batch_id)
    # Materialize the partition id BEFORE the window (a window partitioned
    # on a raw spark_partition_id() expression would evaluate it after its
    # own shuffle, collapsing distinct source partitions into one).
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(F.col(order_col))
    rn = F.row_number().over(w)
    local = F.floor((rn - F.lit(1)) / F.lit(batch_size))
    return with_pid.withColumn(
        "batch_id",
        (F.col("__pid").cast("bigint") * F.lit(1 << 32)) + local.cast("bigint"),
    ).drop("__pid")


def batch_stats(df_with_batches: DataFrame) -> DataFrame:
    """Per-batch row counts and order-col bounds (for the oracle contract)."""
    order_cols = [c for c in df_with_batches.columns if c != "batch_id"]
    first = order_cols[0]
    return df_with_batches.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("batch_n"),
        F.min(first).alias("first_" + first),
        F.max(first).alias("last_" + first),
    )


def message_size_bytes(payload: Column) -> Column:
    """Serialized message size in bytes.

    Reference computes len(json.dumps(msg).encode('utf-8'))
    (stream_cdc/streams/sqs.py:236-248); octet_length is the codegen'd
    equivalent for an already-serialized payload.
    """
    return F.octet_length(payload)


def claim_check_route(
    size_bytes: Column, threshold: int = MAX_MESSAGE_BYTES
) -> Column:
    """Route oversized payloads to the claim-check path.

    Reference: messages over the per-message cap are replaced by a reference
    record (sqs.py:250-302, trigger points :190-196). Pure expression —
    evaluated inside whole-stage codegen, no UDF.
    """
    return F.when(size_bytes > F.lit(threshold), F.lit("oversized")).otherwise(
        F.lit("inline")
    )


def make_claim_check_reference(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Replace oversized payloads with the small reference envelope the
    reference builds at sqs.py:263-283: keeps routing metadata + a
    deterministic message id (deterministic sha2 fixes the reference's
    ephemeral CPython id at sqs.py:205-234)."""
    size = message_size_bytes(F.col(payload_col))
    ref = F.to_json(
        F.struct(
            F.lit(True).alias("original_size_exceeded"),
            F.lit("reference").alias("message_type"),
            F.sha2(F.col(payload_col), 256).alias("message_id"),
            F.col(id_col).alias("id"),
            size.alias("original_size"),
        )
    )
    # Flag first: once the payload column is rewritten, a size expression
    # over it would measure the (small) reference instead of the original.
    return (
        df.withColumn("oversized", size > F.lit(MAX_MESSAGE_BYTES))
        .withColumn(
            payload_col,
            F.when(F.col("oversized"), ref).otherwise(F.col(payload_col)),
        )
    )
