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
    units of 1/scale. The plan is lazy: node count enters as a broadcast
    one-row aggregate (no eager .count() at build time), and the fixed
    iteration count keeps lineage shallow (for large `iters` interleave
    localCheckpoint like connected_components does).
    """
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    # Pin the edge list once: it is referenced by nodes, deg and every
    # iteration's contribution join (2 + iters references) — unpinned,
    # each reference re-executed the whole upstream edge build + the
    # symmetrize distinct. The pin inherits the distinct's AQE-coalesced
    # partitioning, so no extra shuffle is introduced.
    e = e.localCheckpoint(eager=True)
    # Symmetric edges => every node occurs as src, and deg = out-degree.
    nodes = e.select(F.col("src").alias("node")).distinct()
    n_row = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )

    base = nodes.join(F.broadcast(n_row)).select(
        "node",
        F.expr(f"{scale} div n_nodes").alias("r"),
        F.expr(f"(({scale} div n_nodes) * {d_den - d_num}) div {d_den}").alias("base"),
    )
    # base seeds the ranks AND re-enters every iteration's rebuild
    # (iters + 1 references): pin it so the node-distinct + count
    # aggregate run once. O(nodes) rows — bounded by the edge list.
    base = base.localCheckpoint(eager=True)
    ranks = base  # columns: node, r, base

    for _ in range(iters):
        contrib = (
            e.join(ranks.select("node", "r"), e.src == F.col("node"))
            .join(deg.withColumnRenamed("node", "dnode"), F.col("node") == F.col("dnode"))
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            base.select("node", "base")
            .join(sums, base.node == sums.dst, "left")
            .select(
                "node",
                "base",
                F.expr(f"base + ({d_num} * coalesce(s, 0L)) div {d_den}").alias("r"),
            )
        )

    return ranks.select("node", F.col("r").alias("rank"))
