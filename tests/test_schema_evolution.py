"""Schema-evolution contract: additive parquet evolution reads cleanly
via mergeSchema; destructive evolution is refused by the ingest gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_cdc_spark.sources.evolution import (
    assert_compatible,
    read_evolving,
    schema_diff,
)


def _write_versions(spark, path):
    v1 = spark.range(5).select(F.col("id"), F.lit("a").alias("s"))
    v1.write.mode("overwrite").parquet(path)
    v2 = spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("s"), (F.col("id") * 10).alias("extra")
    )
    v2.write.mode("append").parquet(path)
    return v1.schema, v2.schema


def test_additive_evolution_reads_union_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_versions(spark, path)
    df = read_evolving(spark, path)
    assert set(df.columns) == {"id", "s", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert len(rows) == 8
    assert all(rows[i] is None for i in range(5))  # old files -> NULL
    assert all(rows[i] == 10 * i for i in range(5, 8))


def test_schema_diff_and_gate(spark, tmp_path):
    v1_schema, v2_schema = _write_versions(spark, str(tmp_path / "tbl"))
    d = assert_compatible(v1_schema, v2_schema)  # additive: passes
    assert d.added == ("extra",) and d.additive_only

    dropped = T.StructType([T.StructField("id", T.LongType())])
    with pytest.raises(ValueError, match="removed=\\['s'\\]"):
        assert_compatible(v1_schema, dropped)

    retyped = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.LongType())]
    )
    d2 = schema_diff(v1_schema, retyped)
    assert d2.type_changed == (("s", "string", "bigint"),)
    with pytest.raises(ValueError, match="type_changed"):
        assert_compatible(v1_schema, retyped)
