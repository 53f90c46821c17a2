"""Testdata table loaders.

The driver materializes deterministic parquet tables (TESTDATA.md):
  region nation customer supplier part orders lineitem events documents
  embeddings
under /root/testdata/sf{0.001,0.01,0.1}/. All engine queries read these via
``spark.read.parquet`` so Catalyst gets parquet filter pushdown + column
pruning for free (verified by .explain in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns stored as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp type, so they are read as raw int64 (nanosAsLong) and truncated
# to microseconds, exactly as DuckDB does when it reads NANOS into its
# microsecond TIMESTAMP. Integer `div` (not `/`) — ns epoch values exceed
# double's 53-bit mantissa.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_session_conf(spark: SparkSession) -> None:
    """Session settings the engine depends on, applied idempotently so the
    driver's own SparkSession (which we don't construct) behaves the same
    as one from session.get_spark()."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in _NANOS_TS_COLS.get(name, ()):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
