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


def test_streaming_metrics_listener_captures_batches(spark, tmp_path):
    import os
    import time

    from pyspark.sql import functions as F

    from stream_cdc_spark.observability import StreamingMetricsListener
    from stream_cdc_spark.streaming.stateful import position_tracker
    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    ev = load(spark, SF_SMALL, "events").selectExpr(
        "event_type", "CAST(event_id AS LONG) AS seq"
    )
    indir = str(tmp_path / "in")
    os.makedirs(indir, exist_ok=True)
    for i in range(3):
        ev.filter(F.col("seq") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(indir, f"s={i}"))

    listener = StreamingMetricsListener()
    listener.attach(spark)
    try:
        stream = (
            spark.readStream.schema("event_type string, seq long")
            .option("maxFilesPerTrigger", "1")
            .parquet(indir + "/s=*")
        )
        q = (
            position_tracker(stream, key_col="event_type", seq_col="seq")
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # listener callbacks are async; give the bus a moment to drain
        deadline = time.time() + 30
        while time.time() < deadline and len(listener.rows) < 3:
            time.sleep(0.5)
    finally:
        listener.detach(spark)

    t = listener.totals()
    assert t["batches"] >= 3  # one per input file
    assert t["input_rows"] == ev.count()
    assert t["max_state_rows"] > 0  # the stateful tracker registered state
    assert t["max_trigger_ms"] > 0
