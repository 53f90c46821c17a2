"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (CDC apply join, q07) at sf0.001.
queries()     -> every declared query from stream_cdc_spark.plans.queries.
oracle_sql()  -> the matching DuckDB oracle SQL — every query has one
                 (the sketch-based ops are candidate-then-verify, so
                 their outputs are engine-independent).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stream_cdc_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q07_cdc_apply_join"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
