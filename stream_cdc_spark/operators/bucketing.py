"""Bucketed-table co-located joins: pre-shuffle once, join forever free.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem, events
x snapshots) is the shuffle. Bucketing both sides on the join key at write
time makes every subsequent join shuffle-free: Spark recognizes compatible
bucket specs and plans SortMergeJoin directly over matching buckets (no
Exchange on either side) — verified by plan assertion in
tests/test_bucketing.py.

This is the batch analogue of the reference's single ordered binlog
consumer: ordering/partitioning is established once at ingest and reused,
instead of re-established per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task sort of a
    SortMergeJoin. num_buckets should match downstream join parallelism
    (a small multiple of cluster cores at real scale).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two pre-bucketed tables; with matching bucket specs Catalyst
    plans this without any Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
