"""Bucketed co-located join: correctness + the shuffle-free plan proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.operators.bucketing import bucketed_join, write_bucketed
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load(spark, SF_SMALL, "orders")
        lineitem = load(spark, SF_SMALL, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
        write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], 8, ["o_orderkey"])

        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        joined.collect()
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # the whole point: no shuffle on either side of the join
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness vs the plain (shuffling) join
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
        got = joined.groupBy().agg(F.sum("l_quantity")).collect()[0][0]
        want = plain.groupBy().agg(F.sum("l_quantity")).collect()[0][0]
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
