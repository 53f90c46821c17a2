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


def test_partitioned_write_prunes_scan(spark, tmp_path):
    from stream_cdc_spark.operators.layout import read_partitioned, write_partitioned

    ev = load(spark, SF_SMALL, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    df = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the filter must become a partition filter (directory pruning), not a
    # data filter evaluated per row
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", "(ignore)") or \
        "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert df.count() == ev.filter("event_type = 'click'").count()


def test_sink_payload_roundtrip_through_pipeline(spark, tmp_path):
    """Full-circle fidelity: source table -> streaming pipeline -> queue
    payloads -> parsed back -> equals the source (per-type counts and ids).
    Proves the serialization boundary (O10) loses nothing."""
    import json as _json

    from stream_cdc_spark.config import AppConfig
    from stream_cdc_spark.sinks.queue import FileQueue, foreach_batch_writer
    from stream_cdc_spark.streaming.pipeline import CdcPipeline, replay_stream

    qdir = str(tmp_path / "rt-q")
    pipe = CdcPipeline(
        spark,
        replay_stream(spark, SF_SMALL),
        foreach_batch_writer(lambda: FileQueue(qdir)),
        checkpoint_dir=str(tmp_path / "rt-ckpt"),
        config=AppConfig(),
    )
    pipe.start(available_now=True)
    pipe.await_and_stop(timeout=120)

    bodies = [_json.loads(m["MessageBody"]) for m in FileQueue(qdir).drain()]
    parsed = spark.createDataFrame(bodies)
    ev = load(spark, SF_SMALL, "events")
    got = {r.event_type: r.n for r in parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    assert {r.event_id for r in parsed.select("event_id").collect()} == {
        r.event_id for r in ev.select("event_id").collect()
    }


def test_bucketed_band_index_probe_has_no_index_side_exchange(spark, tmp_path):
    """The q110 production claim: persist the MinHash band index bucketed
    on (band, key); when the arriving batch is too big to broadcast, the
    probe is a SortMergeJoin where ONLY the batch side shuffles — the
    corpus-sized index is read in place."""
    from stream_cdc_spark.operators import dedup
    from stream_cdc_spark.tables import load

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
        corpus = d.filter(F.col("doc_id") % 7 != 3)
        batch = d.filter(F.col("doc_id") % 7 == 3)
        write_bucketed(
            dedup.minhash_band_index(corpus),
            "b_band_index",
            ["band", "key"],
            8,
        )
        index = spark.table("b_band_index")
        probe = dedup.minhash_band_index(batch).withColumnRenamed("id", "new_id")
        joined = index.join(probe, ["band", "key"])
        joined.collect()
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # the path from the bucketed index scan UP to the join must hold
        # no Exchange (the probe side's own aggregation shuffles; the
        # corpus-sized index must not)
        tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
        lines = tree.splitlines()
        scan_i = next(
            i for i, ln in enumerate(lines) if "b_band_index" in ln
        )
        indent = len(lines[scan_i]) - len(lines[scan_i].lstrip())
        path = []
        for i in range(scan_i - 1, -1, -1):
            li = len(lines[i]) - len(lines[i].lstrip())
            if li < indent:
                path.append(lines[i])
                indent = li
                if "SortMergeJoin" in lines[i]:
                    break
        assert any("SortMergeJoin" in ln for ln in path), plan
        assert not any("Exchange" in ln for ln in path), (path, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_band_index")
