"""Plan-shape assertions for the round-4 operators (q105-q109): the scale
properties their docstrings claim must be visible in the physical plan."""

from __future__ import annotations

from stream_cdc_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_SMALL)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q105_segment_removal_no_cartesian_and_pruned_scan(spark):
    plan = _plan(spark, "q105_segment_removal")
    assert "CartesianProduct" not in plan
    # flag join is an equi-join on btext, never a nested loop
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # only doc_id/text reach the documents scan (lang/source/n_chars pruned)
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read and "n_chars" not in read


def test_q106_gapfill_bounds_broadcast_no_cartesian_blowup(spark):
    plan = _plan(spark, "q106_gapfill_locf")
    # the 2-row bounds relation rides in via broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # bucketed aggregation is a partial+final hash aggregate, not a raw-row window
    assert "HashAggregate" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read  # events scan pruned to ts/event_type/value/event_id


def test_q107_sq8_queries_broadcast_and_single_corpus_scan(spark):
    plan = _plan(spark, "q107_sq8_ann_topk")
    assert "BroadcastNestedLoopJoin" in plan  # 25 quantized queries broadcast
    assert "CartesianProduct" not in plan
    # two embeddings scans only: the full corpus pass and the pushed-down
    # 25-row query side; candidate ranking and exact re-rank reuse the
    # corpus scan's rows (no third pass). Formatted explain prints each
    # node twice (tree + details), hence the doubling.
    assert plan.count("Scan parquet") <= 4
    # row_number()<=k collapses to WindowGroupLimit — per-partition heaps,
    # not a full sort of every (query, candidate) score
    assert "WindowGroupLimit" in plan


def test_q108_heavy_hitters_broadcast_verify_and_bounded_sketch(spark):
    plan = _plan(spark, "q108_heavy_hitters")
    # candidate set and the 1-row total ride in via broadcast
    assert plan.count("BroadcastExchange") + plan.count("BroadcastNestedLoopJoin") >= 2
    assert "CartesianProduct" not in plan
    # sketch pass is Arrow-batched Python (MapInPandas), not a row UDF
    assert "MapInPandas" in plan


def test_q109_cap_is_one_shuffle_and_pruned_scan(spark):
    plan = _plan(spark, "q109_source_capped_sample")
    # two distinct exchanges only — the per-source window hash partition
    # and the presentation orderBy (formatted explain prints each node
    # twice: tree + details)
    assert plan.count("Exchange") <= 4
    assert "Window" in plan
    # the cap filter runs as WindowGroupLimit: per-partition top-cap heaps
    assert "WindowGroupLimit" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read and "n_chars" not in read


def test_q110_index_probe_broadcast_semi_pushdown(spark):
    plan = _plan(spark, "q110_incremental_dedup")
    # batch band keys broadcast into the index probe; corpus text pruned
    # to candidate ids via left-semi before shingling
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q111_containment_counts_not_rows(spark):
    plan = _plan(spark, "q111_containment_pairs")
    assert "CartesianProduct" not in plan
    # sizes join happens after the pair aggregate (counts ride shuffles,
    # not shingle rows) — same shape contract as q24
    assert "HashAggregate" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read and "source" not in read


def test_q112_gram_single_pandas_pass_small_shuffle(spark):
    plan = _plan(spark, "q112_gram_matrix")
    # one Arrow pass computes the per-partition partials
    assert plan.count("+- MapInPandas") == 1  # one Arrow pass in the tree
    assert "CartesianProduct" not in plan
    # only the embedding column is read (vec_id/label pruned)
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "vec_id" not in read and "label" not in read


def test_q113_fuzzy_hot_block_anti_join_broadcasts(spark):
    plan = _plan(spark, "q113_fuzzy_prefix_pairs")
    assert "CartesianProduct" not in plan
    # the hot-block exclusion is a broadcast anti-join, and the pair join
    # is an equi-join on the block key
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
