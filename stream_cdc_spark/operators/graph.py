"""Iterative graph algorithms as DataFrame plans — fixed-point PageRank.

Companion to `dedup.connected_components` (the other Pregel-shaped loop in
the engine): rank mass propagates along edges for a fixed number of
synchronous rounds. Per round the plan is two shuffles — join ranks to
edges on src, aggregate contributions on dst — which is the canonical
distributed PageRank shape; at 100 TB the edge list is the only large
operand and it shuffles once per round on each side.

All arithmetic is 64-bit *integer* fixed-point (`div`, scale 1e12): rank
values are exact integers, so the result is bit-for-bit reproducible
across engines and partitionings — no floating-point accumulation-order
drift. The DuckDB oracle unrolls the identical integer recurrence
(`//` division), making PageRank hash-checkable, which a double-valued
formulation never is. Damping d is the rational d_num/d_den (default
17/20 = 0.85):

    r0(v)     = SCALE div N
    r_{k+1}(v) = ((SCALE div N) * (d_den - d_num)) div d_den
               + (d_num * sum_{u->v} (r_k(u) div deg(u))) div d_den

With a symmetrized edge list every node has out-degree >= 1, so there is
no dangling-mass term (callers wanting directed semantics must handle
dangling nodes themselves — symmetrize() is the supported path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: both directions, distinct.

    Both directions come from ONE narrow explode, not a self-union — the
    union form planned and executed the whole upstream ``edges`` subtree
    twice (for q88 that is the orders x lineitem join, twice) before any
    consumer even touched it. Rows are identical; only the evaluation
    topology changes (the connected_components edge-build pattern)."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("src"), F.col(dst).alias("dst")
                    ),
                    F.struct(
                        F.col(dst).alias("src"), F.col(src).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    d_num: int = 17,
    d_den: int = 20,
    scale: int = SCALE,
) -> DataFrame:
    """PageRank over a symmetric, deduplicated (src, dst) edge list.

    Returns DataFrame(node BIGINT, rank BIGINT) — rank in fixed-point
    units of 1/scale, materialized (localCheckpoint) so the edge cache
    below can be released before returning.

    Round shape (guide §2.2 co-partition once + §1.2-1): the pinned edge
    list is persisted hash-partitioned on src, so every iteration's
    contribution join reads it WITHOUT an Exchange (localCheckpoint
    alone reports UnknownPartitioning and r14's shape re-shuffled the
    2|E| edge rows every round — the dominant per-round cost at graph
    scale); only the |V|-row rank relation moves per round. deg is
    folded into the per-node base state, so the former second per-round
    join (and its per-round re-aggregation of the edge list) is gone —
    the per-edge share r div deg is computed once per node in the rank
    rebuild instead, the identical integer sequence.
    """
    e0 = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    # Pin the edge list once: referenced by deg/n_nodes and every
    # iteration's contribution join — unpinned, each reference
    # re-executed the whole upstream edge build + the symmetrize
    # distinct. The pin inherits the distinct's AQE-coalesced
    # partitioning; the persisted repartition below it advertises
    # HashPartitioning(src, n) to every round (n = the AQE-sized pin's
    # own partition count: scale-adaptive, 1 for a tiny graph).
    pinned = e0.localCheckpoint(eager=True)
    n_part = max(1, pinned.rdd.getNumPartitions())
    # single-partition pins (tiny graphs) gain nothing from the cache
    # layer (EnsureRequirements re-exchanges a 1-partition child) —
    # keep the bare checkpoint there
    e = (
        pinned.repartition(n_part, F.col("src")).persist()
        if n_part > 1
        else pinned
    )
    try:
        # Symmetric edges => every node occurs as src, and deg =
        # out-degree — so deg IS the node relation (no separate
        # distinct).
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("deg")
        )
        n_row = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))

        base = deg.join(F.broadcast(n_row)).select(
            "node",
            "deg",
            F.expr(f"{scale} div n_nodes").alias("r"),
            F.expr(
                f"(({scale} div n_nodes) * {d_den - d_num}) div {d_den}"
            ).alias("base"),
        )
        # base seeds the ranks AND re-enters every iteration's rebuild
        # (iters + 1 references): pin it so the degree + count
        # aggregates run once. O(nodes) rows — bounded by the edge list.
        base = base.localCheckpoint(eager=True)
        ranks = base  # columns: node, deg, r, base

        for _ in range(iters):
            contrib = (
                e.join(
                    ranks.select("node", F.expr("r div deg").alias("c")),
                    e.src == F.col("node"),
                )
                .select(F.col("dst"), "c")
            )
            sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            ranks = (
                base.select("node", "deg", "base")
                .join(sums, base.node == sums.dst, "left")
                .select(
                    "node",
                    "deg",
                    "base",
                    F.expr(
                        f"base + ({d_num} * coalesce(s, 0L)) div {d_den}"
                    ).alias("r"),
                )
            )

        # materialize before releasing the edge cache (the returned
        # relation must not depend on the unpersisted plan)
        out = ranks.select(
            "node", F.col("r").alias("rank")
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out
