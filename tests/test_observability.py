"""Bottleneck report: per-operator metric attribution from the SQL status
store (parity with the reference's profiling/analyze_profile.py, which
ranks Python functions from a cProfile dump — here the ranked unit is the
physical operator and the numbers are the executors' own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_spark.observability import (
    QueryMetricsCollector,
    parse_metric_value,
    parse_node_metric,
    render_bottleneck_report,
    summarize_nodes,
)


def test_parse_metric_value_shapes():
    assert parse_metric_value("507 ms") == 507
    assert parse_metric_value("1.0 s (0 ms, 2 ms, 5 ms)") == 1000
    assert parse_metric_value("1,018.0 KiB") == 1018 * 1024
    assert parse_metric_value("26.5 MiB") == 26.5 * 1024**2
    assert parse_metric_value("12,345") == 12345
    assert parse_metric_value("garbage") is None


def test_parse_node_metric_two_line_shape():
    raw = (
        "total (min, med, max (stageId: taskId))\n"
        "33 ms (0 ms, 2 ms, 11 ms (stage 2.0: task 7))"
    )
    assert parse_node_metric(raw) == 33
    assert parse_node_metric("507 ms") == 507
    assert parse_node_metric("") is None


def test_summarize_nodes_ranks_by_time():
    nodes = [
        {"execution": 1, "node": "Scan parquet", "metrics": {"scan time": 100.0, "size of files read": 2048.0, "number of output rows": 10.0}},
        {"execution": 1, "node": "HashAggregate", "metrics": {"time in aggregation build": 900.0, "spill size": 1024.0}},
        {"execution": 2, "node": "Scan parquet", "metrics": {"scan time": 50.0}},
    ]
    out = summarize_nodes(nodes)
    assert [r["node"] for r in out] == ["HashAggregate", "Scan parquet"]
    assert out[0]["time_ms"] == 900 and out[0]["spill_bytes"] == 1024
    assert out[1]["time_ms"] == 150 and out[1]["rows"] == 10


def test_measure_with_breakdown_attributes_real_operators(spark):
    collector = QueryMetricsCollector(spark)
    df = (
        spark.range(0, 200_000)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    qm, nodes = collector.measure_with_breakdown("probe", df)
    assert qm.result_rows == 7
    names = {r["node"] for r in nodes}
    assert any("HashAggregate" in n for n in names)
    assert any("Exchange" in n for n in names)
    report = render_bottleneck_report({"probe": (qm, nodes)})
    assert "Operator bottleneck report" in report
    assert "HashAggregate" in report
    assert "Cross-query operator ranking" in report
