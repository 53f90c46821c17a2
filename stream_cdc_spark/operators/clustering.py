"""K-means over embedding columns, expressed Spark-first.

The assignment step (the per-row hot path) is a NARROW map: for each row,
distances to all K broadcast centroid literals are computed with built-in
array expressions (`zip_with` + `aggregate`) inside whole-stage codegen and
the argmin is an `array_min` over (distance, centroid_id) structs — no
shuffle, no UDF, no Python in the loop. At 100 TB the assignment scales
with pure scan bandwidth; only the update step shuffles, and it shuffles
K × dim partial sums per partition (map-side combined), not rows.

Distances are quantized per element with FLOOR(1e6 * diff^2) -> BIGINT and
summed exactly, so results are order-insensitive and bit-identical across
engines (the DuckDB oracle reproduces them with list_transform/list_sum).

The reference (stream-cdc) has no ML/iterative operators; this implements
the training-data-pipeline side of SURVEY.md §7's north-star list (it is
also the centroid machinery behind similarity.ivf_assign).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000.0  # per-element squared-diff quantizer (ppm grid)


def _dist_q(vec_col: Column, centroid: Sequence[float]) -> Column:
    """Exact BIGINT-quantized squared L2 distance to a centroid literal.

    Per element: FLOOR(1e6 * ((x - c) * (x - c))) — the multiplication is
    parenthesized diff*diff first so the oracle can reproduce the exact
    IEEE operation order — then an exact integer sum over the array.
    """
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    per_elem = F.zip_with(
        vec_col,
        arr,
        lambda x, c: F.floor(
            F.lit(QUANT) * ((x.cast("double") - c) * (x.cast("double") - c))
        ).cast("long"),
    )
    return F.aggregate(per_elem, F.lit(0).cast("long"), lambda acc, v: acc + v)


def kmeans_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (narrow, shuffle-free).

    Ties break toward the lower centroid id via struct ordering. Returns
    (id_col, centroid_id BIGINT, dist_q BIGINT).
    """
    cands = F.array(
        *[
            F.struct(
                _dist_q(F.col(vec_col), c).alias("dist_q"),
                F.lit(i).cast("long").alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(cands)
    return df.select(
        F.col(id_col),
        best["cid"].alias("centroid_id"),
        best["dist_q"].alias("dist_q"),
    )


def initial_centroids(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic init: the first k vectors in id order (tiny collect)."""
    rows = df.orderBy(id_col).select(vec_col).limit(k).collect()
    return [list(r[0]) for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd iterations: narrow assign -> one-shuffle update.

    The update step computes per-(centroid, dimension) means via
    posexplode + partial aggregation — K*dim result rows regardless of
    corpus size — and collects only the K×dim centroid matrix to the
    driver between rounds (the classic Spark iterative-ML loop shape).
    Returns (centroids, final assignment DataFrame).
    """
    cents = initial_centroids(df, k, vec_col, id_col)
    assigned = kmeans_assign(df, cents, vec_col, id_col)
    for _ in range(iters):
        upd = (
            kmeans_assign(df, cents, vec_col, id_col)
            .join(df.select(id_col, vec_col), id_col)
            .select("centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = {(r.centroid_id, r.pos): r.m for r in upd}
        cents = [
            [new.get((cid, p), cents[cid][p]) for p in range(len(cents[cid]))]
            for cid in range(k)
        ]
        assigned = kmeans_assign(df, cents, vec_col, id_col)
    return cents, assigned


def inertia(assigned: DataFrame) -> int:
    """Total quantized within-cluster squared distance (exact BIGINT sum)."""
    return assigned.agg(F.sum("dist_q")).first()[0]
