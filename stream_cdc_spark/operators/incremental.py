"""Incremental aggregate maintenance — the O(delta) consumer path.

The reference engine ships raw change events and leaves materialization to
the consumer (`stream_cdc/processing/processor.py:23-46` produces events;
nothing downstream re-aggregates). At 100 TB the consumer cannot afford a
full recompute per batch: the standard answer is a *mergeable partial
aggregate* — keep (sum, count, min, max) per group, aggregate only the
delta, and merge the two partial states. This module provides that merge
algebra as DataFrame ops.

Scale shape: `partial_agg` over the delta is one hash-shuffle of the delta
only (map-side combine applies); `merge_partials` unions K-row partial
states (K = group count, tiny next to the fact table) and re-aggregates —
a shuffle of O(K) rows, not O(rows). Only mergeable (commutative-monoid)
aggregates are allowed; AVG is derived at finalize time from sum/count,
and exact COUNT DISTINCT is deliberately rejected — the mergeable path
for distinct counts is kind='hll' (a fixed-size DataSketches HLL state
per group, merged with hll_union_agg, estimated at finalize time; q90).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge function per aggregate kind: sums and counts merge by SUM,
#: min/max merge idempotently by themselves, HLL sketches merge by
#: hll_union_agg (the sketch path for distinct counts — a fixed-size
#: binary state per group instead of an unmergeable exact distinct).
_MERGE = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
    "hll": F.hll_union_agg,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c).cast("bigint"),
    "min": F.min,
    "max": F.max,
    "hll": F.hll_sketch_agg,
}


def partial_agg(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[Column, str]]
) -> DataFrame:
    """One partial-aggregate state row per group.

    measures maps output column name -> (input column, kind) where kind is
    one of sum/count/min/max. Raises on non-mergeable kinds so a caller
    cannot silently build an un-maintainable view.
    """
    aggs = []
    for out, (col, kind) in measures.items():
        if kind not in _PARTIAL:
            raise ValueError(
                f"aggregate kind {kind!r} is not mergeable; supported: "
                f"{sorted(_PARTIAL)} (use kind='hll' for distinct counts)"
            )
        aggs.append(_PARTIAL[kind](col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    parts: list[DataFrame], keys: list[str], kinds: dict[str, str]
) -> DataFrame:
    """Merge partial-aggregate states (base view + delta batches).

    kinds maps measure column -> its kind, so the right merge monoid is
    applied. Groups present in only one input merge via plain union —
    no outer-join needed because re-aggregation handles absence.
    """
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    aggs = []
    for out, kind in kinds.items():
        if kind not in _MERGE:
            raise ValueError(f"aggregate kind {kind!r} is not mergeable")
        aggs.append(_MERGE[kind](out).alias(out))
    return merged.groupBy(*keys).agg(*aggs)
