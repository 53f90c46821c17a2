"""Skew-aware aggregation: explicit salting for hot keys.

AQE's skew-join splitting covers joins, but a groupBy on a pathologically
hot key (one key = 30% of 100 TB) still funnels that key's rows into one
reducer before AQE can help — partial aggregation bounds the damage for
algebraic aggregates, yet high-cardinality payload aggs (collect/distinct)
or very wide rows still hurt. `salted_agg` is the classic two-phase fix:

  phase 1: group on (key, salt = pmod(hash(row-id-ish), S)) — the hot key
           spreads over S reducers
  phase 2: re-aggregate the S partials per key (combine step)

Supported aggregates are the algebraic ones whose combine is itself the
aggregate (count->sum, sum->sum, min->min, max->max) — exactly the shapes
that decompose correctly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs maps output column -> (agg_name, input_col); agg_name in
    {count, sum, min, max} ('count' ignores input_col). Result equals the
    unsalted groupBy exactly.

    The salt is derived from row content (hash of key + all aggregated
    input columns), not monotonically_increasing_id: a non-deterministic
    salt re-salts rows differently when a shuffle-fetch failure recomputes
    part of the map stage, double-counting or losing partials in phase 2.
    A content hash recomputes identically, and still spreads a hot key
    because the aggregated values vary within it; spark_partition_id (stable
    for a given partition under task retry) is mixed in so even a hot key of
    byte-identical rows spreads across input partitions.
    """
    for name, (kind, _) in aggs.items():
        if kind not in _COMBINE:
            raise ValueError(
                f"aggregate {kind!r} for {name!r} is not algebraic-decomposable; "
                f"supported: {sorted(_COMBINE)}"
            )
    salt_inputs = (
        [F.col(k) for k in keys]
        + [F.col(col) for _, (kind, col) in sorted(aggs.items()) if kind != "count"]
        + [F.spark_partition_id()]
    )
    salt = F.pmod(F.xxhash64(*salt_inputs), F.lit(salt_buckets)).alias("__salt")
    phase1_aggs: list[Column] = []
    for name, (kind, col) in aggs.items():
        expr = F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(F.col(col))
        phase1_aggs.append(expr.alias(f"__p_{name}"))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_aggs)
    )
    phase2_aggs = [
        _COMBINE[kind](F.col(f"__p_{name}")).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2_aggs)

def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant join: salt the big side, replicate the small side.

    AQE's skew-join splitting handles most cases at runtime, but it only
    fires on sort-merge joins past size thresholds; when a known-hot key
    must hash-join (or AQE is off), the manual fix is the classic one:
    the big side gets a content-derived salt in [0, S), the small side is
    replicated S times (explode of a literal sequence — S small copies,
    not a shuffle), and the join key becomes (keys..., salt), spreading
    each hot key over S reducers. Result equals the unsalted join.

    Only inner/left joins decompose correctly (an unmatched small-side
    row would surface once per replica under right/full semantics).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.spark_partition_id()),
        F.lit(salt_buckets),
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")
