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


def mg_combine(
    counters: dict[str, int], local: dict[str, int], capacity: int
) -> dict[str, int]:
    """One Misra-Gries MERGE step (Agarwal et al. 2012): combine two
    counter maps, subtract the (capacity+1)-th largest combined count from
    everything, keep the strictly-positive rest. Each call adds at most the
    subtracted value to every item's undercount; summed over a stream the
    total undercount stays <= N/(capacity+1). Shared by the batch
    per-partition sketch and the streaming per-key maintenance
    (streaming/stateful.py) so both tiers carry the same guarantee."""
    for w, c in local.items():
        counters[w] = counters.get(w, 0) + c
    if len(counters) > capacity:
        sub = sorted(counters.values(), reverse=True)[capacity]
        counters = {w: c - sub for w, c in counters.items() if c > sub}
    return counters


def misra_gries_sketch(
    df: DataFrame, text_col: str, capacity: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries over the token
    stream of `text_col`: (item, c_hat), at most `capacity` rows per
    partition regardless of vocabulary size.

    The MERGE step follows Agarwal et al. 2012 ("Mergeable Summaries"):
    combine counter maps, then subtract the (capacity+1)-th largest count
    from every counter and drop the non-positive ones. Each merge adds at
    most that subtracted value to the undercount, and the total undercount
    per partition is bounded by N_p/(capacity+1) — so ANY item whose true
    global frequency exceeds N/(capacity+1) survives in at least one
    partition's summary. That bound is deterministic, not probabilistic:
    the union of partition sketches is a guaranteed superset of the true
    heavy hitters, which is what lets heavy_hitters() verify exactly and
    still hash-match a plain SQL oracle.

    Memory is O(capacity) per partition — the whole point at 100 TB, where
    an exact groupBy over a web-scale vocabulary (URLs, hosts, shingles)
    shuffles billions of group rows but the sketch ships P x capacity.
    Tokenization happens inside the Arrow batch (pandas str ops), so the
    corpus-sized token stream never crosses into a shuffle at all.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def _mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            local: dict[str, int] = {}
            for txt in pdf[text_col]:
                for w in txt.split(" "):
                    local[w] = local.get(w, 0) + 1
            counters = mg_combine(counters, local, capacity)
        yield pd.DataFrame(
            {"item": list(counters), "c_hat": list(counters.values())}
        )

    return df.select(text_col).mapInPandas(_mg, schema="item string, c_hat bigint")


def heavy_hitters(
    df: DataFrame, text_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters (tokens with frequency >= N/k) found via a
    bounded-memory candidate pass: Misra-Gries summaries per partition,
    union as candidate set, then ONE exact counting pass restricted to the
    candidates.

    Requires capacity >= k - 1 so the MG guarantee (any item above
    N/(capacity+1) survives) covers the emission threshold N/k — the
    candidate set provably contains every answer row, making the output
    EXACTLY the frequency->=N/k set, hash-matchable against plain SQL.

    Plan shape: sketch pass is a corpus scan with O(capacity) state and a
    P x capacity result; the verify pass broadcasts the candidate set onto
    the token stream (no fan-out — each token matches at most one
    candidate) and aggregates with map-side combine; the N total rides in
    as a broadcast 1-row relation. Nothing corpus-sized ever shuffles.
    """
    if capacity is None:
        capacity = max(4 * k, 64)
    if capacity < k - 1:
        raise ValueError(
            f"capacity {capacity} < k-1 ={k - 1}: the MG superset guarantee "
            "would not cover the N/k emission threshold"
        )
    cand = misra_gries_sketch(df, text_col, capacity).select("item").distinct()
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("item"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    return (
        toks.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k >= F.col("total"))
        .select(F.col("item").alias("token"), "cnt")
    )
