"""Partition-pruning proofs for the hive-partitioned storage layout
(operators/layout.write_partitioned): static pruning for literal
predicates and DYNAMIC partition pruning when the predicate only exists
on the dimension side of a join — the mechanism that turns a 100 TB fact
scan into reading only the partitions a filtered dim actually touches."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators.layout import read_partitioned, write_partitioned


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_fact_dim(spark, tmp_path):
    fact = spark.range(20000).select(
        F.col("id"),
        (F.col("id") % 20).alias("part_key"),
        (F.col("id") * 2).alias("v"),
    )
    write_partitioned(fact, str(tmp_path / "fact"), ["part_key"])
    dim = spark.range(20).select(
        F.col("id").alias("part_key"),
        F.when(F.col("id") < 3, 1).otherwise(0).alias("flag"),
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))


def test_static_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    _write_fact_dim(spark, tmp_path)
    f = read_partitioned(spark, str(tmp_path / "fact")).filter(
        F.col("part_key") == 7
    )
    files = {r[0] for r in f.select(F.input_file_name()).distinct().collect()}
    assert files and all("part_key=7" in p for p in files)
    assert "PartitionFilters" in _executed_plan(f)


def test_dynamic_partition_pruning_from_filtered_dim(spark, tmp_path):
    _write_fact_dim(spark, tmp_path)
    f = read_partitioned(spark, str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("flag") == 1)
    j = f.join(dim, "part_key").agg(
        F.sum("v").cast("bigint").alias("s"), F.count(F.lit(1)).alias("n")
    )
    # The fact scan must carry a runtime dynamicpruning expression fed by
    # the dim's selective predicate — planning-time proof that only the
    # dim-matching partitions are read.
    assert "dynamicpruningexpression" in _executed_plan(j).lower()
    row = j.collect()[0]
    # part_key in {0,1,2}: ids congruent 0/1/2 mod 20, 1000 ids each
    ids = [i for i in range(20000) if i % 20 < 3]
    assert (row.n, row.s) == (len(ids), sum(2 * i for i in ids))


def test_dpp_not_triggered_without_selective_dim(spark, tmp_path):
    """Guard against cargo-culting: an unfiltered dim gives the optimizer
    nothing to prune with — the fact scan keeps a plain partition read.
    (If this starts failing, Spark learned a new trick; revisit.)"""
    _write_fact_dim(spark, tmp_path)
    f = read_partitioned(spark, str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim"))
    j = f.join(dim, "part_key").agg(F.count(F.lit(1)).alias("n"))
    assert "dynamicpruningexpression" not in _executed_plan(j).lower()
    assert j.collect()[0].n == 20000
