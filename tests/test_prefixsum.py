"""Distributed prefix sum: SQL-equivalence (incl. ties) and plan shape."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from stream_cdc_spark.operators.prefixsum import distributed_prefix_sum


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_matches_global_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    got = distributed_prefix_sum(df, "k", "v", "rs", num_buckets=16)
    w = Window.orderBy("k").rangeBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rs", F.sum("v").over(w))
    assert _rows(got, "k", "v", "rs") == _rows(want, "k", "v", "rs")


def test_tie_semantics_match_sql_range_frame(spark):
    # 10 distinct keys x 500 rows each: every tie group straddles what a
    # naive row-ordered bucketing would split. SQL RANGE semantics: all
    # tied rows see the whole tie group's sum.
    df = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("k"), F.lit(1).alias("v")
    )
    got = distributed_prefix_sum(df, "k", "v", "rs", num_buckets=8)
    # Every row with key k must read (k+1)*500.
    bad = got.where(F.col("rs") != (F.col("k") + 1) * 500).count()
    assert bad == 0


def _window_lines(df):
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return plan, [ln for ln in plan.splitlines() if "Window [" in ln]


def _is_partitioned(window_line):
    # Partitioned: windowspecdefinition(<part cols...>, <order> ASC ...).
    # Unpartitioned: windowspecdefinition(<order> ASC NULLS ..., frame).
    # The first argument carries a sort direction only when there is no
    # partition spec.
    first_arg = window_line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
    return "NULLS" not in first_arg


def test_no_single_partition_window_over_data(spark):
    """The only unpartitioned window in the plan runs over the P-row
    bucket-totals relation (sum of __t above the bucket Aggregate), never
    the data."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan, windows = _window_lines(
        distributed_prefix_sum(df, "k", "v", "rs", num_buckets=8)
    )
    assert len(windows) == 2, plan
    unpartitioned = [w for w in windows if not _is_partitioned(w)]
    assert len(unpartitioned) == 1, plan
    # the unpartitioned pass is the offsets window over bucket totals
    assert "sum(__t#" in unpartitioned[0], plan
    partitioned = [w for w in windows if _is_partitioned(w)]
    assert "__psum_bucket#" in partitioned[0], plan


def test_q102_has_no_unpartitioned_window_over_docs(spark):
    from stream_cdc_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["q102_vocab_growth"].builder(spark, SF_SMALL)
    plan, windows = _window_lines(df)
    unpartitioned_over_data = [
        w for w in windows
        if not _is_partitioned(w) and "sum(__t#" not in w
    ]
    assert unpartitioned_over_data == [], plan
