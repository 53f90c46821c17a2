"""Externalized keyed KV state — the reference's DynamoDB position store.

Reference O20 (stream_cdc/state/dynamodb.py:72-122): items keyed
(PK=datasource_type, SK=datasource_source) with a `position` attribute;
write-dedup skips storing an unchanged position
(coordinator.py:137-141).

Structured Streaming already checkpoints offsets internally
(checkpointLocation); this store exists for *externally visible* positions
— e.g. downstream consumers asking "how far has CDC applied?". The
implementation is an append-only parquet log compacted on read via
latest-per-key (the same compaction operator the engine exposes as q03):
append-only writes scale (no read-modify-write races across executors),
and reads are a broadcast-sized aggregation.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F


class ParquetKVState:
    """StateManager protocol parity (state/base.py:4-13): store/read."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._last_saved: dict[tuple[str, str], str] = {}

    def store(self, ds_type: str, ds_source: str, position: str) -> bool:
        key = (ds_type, ds_source)
        # Write-dedup (coordinator.py:137-141): skip identical positions.
        if self._last_saved.get(key) == position:
            return True
        df = self.spark.createDataFrame(
            [
                Row(
                    datasource_type=ds_type,
                    datasource_source=ds_source,
                    position=position,
                    stored_at=time.time_ns(),
                )
            ]
        )
        df.coalesce(1).write.mode("append").parquet(self.path)
        self._last_saved[key] = position
        return True

    def read(self, ds_type: str, ds_source: str) -> str | None:
        if not os.path.exists(self.path):
            return None
        df = (
            self.spark.read.parquet(self.path)
            .filter(
                (F.col("datasource_type") == ds_type)
                & (F.col("datasource_source") == ds_source)
            )
            .orderBy(F.col("stored_at").desc())
            .limit(1)
        )
        rows = df.collect()
        return rows[0]["position"] if rows else None
