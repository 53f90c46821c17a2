"""SparkSession builder with scale-oriented defaults.

The reference wires its pipeline in main() (stream_cdc/main.py:16-66); here
the equivalent "engine bootstrap" is a SparkSession whose configuration is
chosen for large-cluster execution and flipped down for local testing via
env vars:

  SPARK_GRAFT_CPUS   local core count (default 32)
  SPARK_GRAFT_MASTER explicit master override

Scale rationale (100 TB target):
  - AQE on: runtime coalescing of shuffle partitions, broadcast-join
    conversion, and skew-join splitting replace hand-tuned partition counts.
  - shuffle.partitions is only the *initial* number; AQE coalesces. On a
    real cluster this would be set to ~2-3x total cores.
  - Arrow enabled for any pandas interchange (vectorized UDF path).
  - Session timezone pinned to UTC so timestamp semantics are stable across
    engines (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: re-plan at runtime from real shuffle statistics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics; matches the DuckDB oracle which
    # reads parquet naive timestamps as-is.
    "spark.sql.session.timeZone": "UTC",
    # Vectorized Arrow transfer for pandas UDFs / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan-side efficiency: pushdown + pruning are on by default in Spark,
    # pinned here so a misconfigured environment can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Broadcast threshold: dims (region/nation/customer at test SF) should
    # broadcast; AQE will also convert post-shuffle when stats allow.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Keep executor->driver result transfers honest.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "stream-cdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
