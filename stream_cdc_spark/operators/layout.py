"""Storage-layout operators: partitioned writes for partition pruning.

At 100 TB the cheapest byte is the one never read: writing fact tables
hive-partitioned by a low-cardinality predicate column (event date, event
type, tenant) lets Catalyst prune entire directories at planning time —
`PartitionFilters` in the scan, zero I/O for excluded partitions. This is
the storage-side complement to `bucketing.py` (which pre-shuffles for
joins); together they are the ingest-time layout contract a CDC pipeline
should write: partition by time/type, bucket by join key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet (one directory per partition value).

    Keep partition columns low-cardinality (date, type) — thousands of
    partitions are fine, millions of tiny files are not; pair with
    `ensure_parallelism`/coalesce upstream to control file counts.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
