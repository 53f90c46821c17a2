"""Distributed prefix sums (running totals) without a global window.

``SUM(v) OVER (ORDER BY k)`` with no PARTITION BY forces Spark to move
every row into a single partition (WindowExec warns exactly this) — a
scale killer the moment the windowed relation is proportional to the
data. The classic fix is the two-pass scan:

1. **Range-bucket** the rows on the order key (`repartitionByRange`
   samples the key distribution, so buckets are balanced even under
   skewed keys; equal keys never split across buckets).
2. **Local pass**: running sum *within* each bucket — the window is
   partitioned by bucket id, so no partition exceeds ~n/P rows.
3. **Offset pass**: per-bucket totals are P rows (P = a few hundred);
   compute each bucket's exclusive prefix offset from them and add it
   back via a broadcast join.

Total cost: two shuffles of the data (range exchange + bucket-window
exchange) plus a P-row broadcast — versus the single-partition global
window whose last stage is one task doing all the work. The P-row
aggregate is driver-visible only through a broadcast join; nothing is
collected.

Tie semantics match SQL's default ``RANGE BETWEEN UNBOUNDED PRECEDING
AND CURRENT ROW``: rows with equal order keys all see the full tied
group's sum (buckets never split a tie group, and the local window uses
a range frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKET = "__psum_bucket"
_LOCAL = "__psum_local"
_OFFSET = "__psum_offset"


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str,
    num_buckets: int = 200,
) -> DataFrame:
    """Append ``out_col`` = SUM(value_col) OVER (ORDER BY order_col).

    Semantics are identical to the global-window formulation (RANGE frame
    — ties share the tied group's cumulative sum) but no task ever holds
    more than one range bucket. ``num_buckets`` bounds per-task state at
    ~n/num_buckets rows; at 100 TB raise it so a bucket fits in executor
    memory — the offset relation stays tiny (one row per bucket).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col

    # Pass 1: range-bucket. The bucket id must be materialized as a
    # column BEFORE the window (same pitfall as batching.assign_batches:
    # a window partitioned on raw spark_partition_id() would evaluate it
    # after its own exchange). RangePartitioning assigns ascending key
    # ranges to ascending partition ids, so _BUCKET sorts like order_col.
    bucketed = (
        df.repartitionByRange(num_buckets, F.col(order_col))
        .withColumn(_BUCKET, F.spark_partition_id())
    )

    # Pass 2: local running sum (range frame for SQL tie semantics).
    local_w = (
        Window.partitionBy(_BUCKET)
        .orderBy(F.col(order_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(_LOCAL, F.sum(value).over(local_w))

    # Pass 3: exclusive per-bucket offsets. The totals relation has
    # num_buckets rows; its own running sum may run in one task — that
    # task sees P rows, not the data.
    totals = local.groupBy(_BUCKET).agg(F.sum(value).alias("__t"))
    offset_w = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _BUCKET,
        F.coalesce(F.sum("__t").over(offset_w), F.lit(0)).alias(_OFFSET),
    )

    return (
        local.join(F.broadcast(offsets), _BUCKET)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_BUCKET, _LOCAL, _OFFSET)
    )
