"""Plan-shape utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition iff the input is under-parallel for the session.

    Small parquet files (one row-group) scan as a single partition; any
    fan-out operator downstream (explode, per-row scoring) then runs on one
    core. At cluster scale inputs arrive well-partitioned and this is a
    no-op — the check is on *current* partitions, so no gratuitous shuffle
    is added to an already-parallel plan.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
