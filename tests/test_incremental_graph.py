"""Unit tests for incremental aggregate maintenance and fixed-point
PageRank — the invariants the q87/q88 oracles rely on, checked directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators import graph, incremental
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def _measures():
    return {
        "n": (F.lit(1), "count"),
        "total": (F.col("value").cast("decimal(18,4)"), "sum"),
        "vmin": (F.col("value"), "min"),
        "vmax": (F.col("value"), "max"),
    }


def test_merge_equals_recompute_any_split(spark):
    """merge(partial(A), partial(B)) == partial(A ∪ B) for an arbitrary
    (hash-based, key-crossing) split — the algebra must not depend on the
    split being time-aligned like q87's."""
    ev = load(spark, SF_SMALL, "events")
    kinds = {m: k for m, (_, k) in _measures().items()}
    a = ev.filter(F.xxhash64("event_id") % 3 == 0)
    b = ev.filter(F.xxhash64("event_id") % 3 != 0)
    merged = incremental.merge_partials(
        [
            incremental.partial_agg(a, ["event_type"], _measures()),
            incremental.partial_agg(b, ["event_type"], _measures()),
        ],
        ["event_type"],
        kinds,
    )
    full = incremental.partial_agg(ev, ["event_type"], _measures())
    cols = ["event_type", "n", "total", "vmin", "vmax"]
    assert sorted(merged.select(cols).collect()) == sorted(full.select(cols).collect())


def test_merge_handles_groups_missing_from_one_side(spark):
    ev = load(spark, SF_SMALL, "events")
    kinds = {m: k for m, (_, k) in _measures().items()}
    one_type = ev.select("event_type").distinct().limit(1).collect()[0][0]
    a = ev.filter(F.col("event_type") == one_type)
    b = ev.filter(F.col("event_type") != one_type)
    merged = incremental.merge_partials(
        [
            incremental.partial_agg(a, ["event_type"], _measures()),
            incremental.partial_agg(b, ["event_type"], _measures()),
        ],
        ["event_type"],
        kinds,
    )
    full = incremental.partial_agg(ev, ["event_type"], _measures())
    assert merged.count() == full.count()


def test_non_mergeable_kind_rejected(spark):
    ev = load(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="not mergeable"):
        incremental.partial_agg(
            ev, ["event_type"], {"d": (F.col("user_id"), "count_distinct")}
        )


def test_pagerank_star_graph_ranks_hub_highest(spark):
    """On a star (hub 0 — leaves 1..8) the hub must outrank every leaf,
    all leaves must tie exactly (integer arithmetic: identical inputs give
    identical ranks), and total mass stays near SCALE."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    pr = graph.pagerank_fixed_point(graph.symmetrize(edges), iters=3)
    rows = {r.node: r.rank for r in pr.collect()}
    hub, leaves = rows[0], [rows[i] for i in range(1, 9)]
    assert hub > max(leaves)
    assert len(set(leaves)) == 1
    assert abs(sum(rows.values()) - graph.SCALE) < graph.SCALE // 100


def test_pagerank_deterministic_across_partitionings(spark):
    """Bit-exactness: repartitioning the edge list must not change a single
    rank value (the property that makes q88 oracle-hashable)."""
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23],
        "src long, dst long",
    )
    sym = graph.symmetrize(edges)
    a = sorted(graph.pagerank_fixed_point(sym, iters=3).collect())
    b = sorted(
        graph.pagerank_fixed_point(sym.repartition(13), iters=3).collect()
    )
    assert a == b


def test_bm25_ranks_higher_tf_first(spark):
    """Integer BM25 algebra sanity on a known corpus: more occurrences of
    the query term => strictly higher score; docs without the term absent."""
    from stream_cdc_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "x x x filler filler filler"),
            (2, "x filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["x"], top_k=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].score > rows[1].score > 0


def test_hll_merge_equals_single_pass_sketch(spark):
    """HLL register state is a max-merge semilattice: merging per-split
    sketches must yield the *identical* estimate as one sketch built over
    the whole input — mergeability is exact even though the count is
    approximate."""
    ev = load(spark, SF_SMALL, "events")
    measures = {"sk": (F.col("user_id"), "hll")}
    a = ev.filter(F.xxhash64("event_id") % 2 == 0)
    b = ev.filter(F.xxhash64("event_id") % 2 != 0)
    merged = incremental.merge_partials(
        [
            incremental.partial_agg(a, ["event_type"], measures),
            incremental.partial_agg(b, ["event_type"], measures),
        ],
        ["event_type"],
        {"sk": "hll"},
    )
    single = incremental.partial_agg(ev, ["event_type"], measures)
    est = lambda df: sorted(  # noqa: E731
        df.select("event_type", F.hll_sketch_estimate("sk").alias("e")).collect()
    )
    assert est(merged) == est(single)
