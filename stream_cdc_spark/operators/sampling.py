"""Deterministic sampling operators for training-data curation.

Reproducible corpus sampling needs rates that are (a) content-addressed —
re-running the pipeline, adding executors, or reordering partitions must
select the *same* rows — and (b) stratified, so a domain-mixture target
("20% code, 50% web, ...") can be hit exactly. Spark's `df.sample()` is
seeded per-partition and therefore NOT stable under repartitioning, which
makes it unusable for resumable 100 TB curation runs; these operators hash
row content instead (the same technique the reference uses for stable
message ids, stream_cdc/streams/sqs.py:205-234, applied to sampling).

Mechanics: a row is kept iff the first 3 hex digits of md5(seed || key)
are lexicographically below a cutoff, giving rates in units of 1/4096
(0.024% granularity). md5 is available and bit-identical in every engine
(Spark, DuckDB, Python hashlib), so oracles can verify the exact row set,
and the selection is a pure codegen expression — no Python, no shuffle,
full scan bandwidth at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RATE_DENOM = 4096  # 16^3 — cutoff is exactly 3 hex digits


def hash_cutoff(rate_4096: int) -> str:
    """3-hex-digit cutoff string for a rate of rate_4096/4096.

    The full rate returns 'g': format(4096) would be the 4-char '1000',
    which sorts BELOW almost every 3-hex-digit prefix ('fff' > '1000'
    lexicographically) and would silently keep only 1/16 of rows; 'g'
    sorts above every hex digit, so `prefix < 'g'` keeps everything."""
    if not 0 <= rate_4096 <= RATE_DENOM:
        raise ValueError(f"rate_4096 must be in [0, {RATE_DENOM}]")
    if rate_4096 == RATE_DENOM:
        return "g"
    return format(rate_4096, "03x")


def sample_mark(key: Column, rate_4096: int, seed: str = "") -> Column:
    """Boolean keep/drop decision, stable across runs and partitionings."""
    digest = F.md5(F.concat(F.lit(seed), key.cast("string")))
    return F.substring(digest, 1, 3) < F.lit(hash_cutoff(rate_4096))


def hash_sample(
    df: DataFrame, key: str, rate_4096: int, seed: str = ""
) -> DataFrame:
    """Uniform deterministic sample at rate rate_4096/4096."""
    return df.filter(sample_mark(F.col(key), rate_4096, seed))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates_4096: dict[str, int],
    key: str,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (domain mixing).

    The rate table is a handful of rows — it broadcasts, so the plan is a
    broadcast hash join plus a codegen filter: no shuffle of the corpus.
    Strata missing from `rates_4096` are dropped (rate 0), which is the
    curation default: an explicit mixture lists everything it wants.
    """
    spark = df.sparkSession
    rate_rows = [(s, hash_cutoff(r)) for s, r in sorted(rates_4096.items())]
    cutoffs = spark.createDataFrame(rate_rows, f"{stratum_col} string, cutoff string")
    digest = F.md5(F.concat(F.lit(seed), F.col(key).cast("string")))
    return (
        df.join(F.broadcast(cutoffs), stratum_col)
        .filter(F.substring(digest, 1, 3) < F.col("cutoff"))
        .drop("cutoff")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    target_share: dict[str, float],
    total_rate_4096: int,
) -> dict[str, int]:
    """Planning step: derive per-stratum rates that steer the sampled
    corpus toward a target mixture while keeping ~total_rate_4096/4096 of
    the largest achievable volume.

    Runs one aggregate job over the corpus (counts per stratum — K rows to
    the driver, the same iterative-planning shape as k-means / IVF
    training). The returned dict feeds `stratified_sample`, which is fully
    declarative; keep the two phases separate so the sampling query itself
    stays lazy.
    """
    counts = dict(
        df.groupBy(stratum_col).count().collect()
    )  # K rows — stratum cardinality, not data
    total = sum(counts.get(s, 0) for s in target_share)
    if total == 0:
        return {s: 0 for s in target_share}
    # Volume each stratum must contribute for the mixture; the binding
    # stratum (highest demanded fraction of its own rows) caps the scale.
    demanded = {
        s: target_share[s] * total / max(counts.get(s, 0), 1)
        for s in target_share
    }
    scale = total_rate_4096 / RATE_DENOM / max(demanded.values())
    return {
        s: min(RATE_DENOM, round(demanded[s] * scale * RATE_DENOM))
        for s in target_share
    }

def shard_balance_audit(
    df: DataFrame,
    key: str,
    weight_col: str | None = None,
    hex_digits: int = 2,
    seed: str = "",
) -> DataFrame:
    """Content-addressed shard assignment + balance audit: assigns each row
    to one of 16^hex_digits shards by md5(seed || key) prefix and returns
    per-shard (shard, n_rows, total_weight).

    Training-data writers shard output files by content hash so that
    re-runs, retries, and added executors land every record in the same
    shard (the same stability argument as sample_mark above). The audit is
    the planning/verification half: hash sharding is balanced in
    expectation, and this one-shuffle aggregate (on the tiny shard key —
    map-side combine collapses each partition to <= 16^hex_digits rows)
    proves the realized skew before a 100 TB write commits to it. The hex
    prefix IS the shard id, so the oracle needs no cross-engine integer
    hash — md5 is bit-identical everywhere; production can map it to
    pmod(xxhash64, n) without changing the plan shape.
    """
    digest = F.md5(F.concat(F.lit(seed), F.col(key).cast("string")))
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(
            F.substring(digest, 1, hex_digits).alias("shard"),
            w.cast("bigint").alias("_w"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("_w").cast("bigint").alias("total_weight"),
        )
    )


def per_key_cap(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    order_col: str,
    tie_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum quota: keep at most `cap` rows per value
    of `stratum_col`, ranked by md5(seed || order_col) with `tie_col` as
    the total-order tiebreak.

    This is the exact-quota counterpart of `stratified_sample`'s
    rate-based keep/drop — the shape web-pipeline curation uses to cap
    documents per domain/source (RefinedWeb / CCNet cap per host) so one
    crawler-friendly site cannot dominate the mixture. Hash-ranking makes
    the quota a uniform random-without-replacement draw that is stable
    across runs, partitionings and incremental re-runs.

    Plan shape: one hash-shuffle on the stratum + a per-stratum window.
    A hot stratum serializes its window into one task, so for strata with
    row counts >> cap, pre-thin with `hash_sample` at a rate that leaves
    ~4x the cap (the draw stays uniform — a hash cutoff composes with
    hash ranking), then apply the exact window to the survivors. The
    planner below does that automatically when `prethin_rate_4096` — see
    capped_sample_with_prethin.
    """
    rank_key = F.md5(
        F.concat(F.lit(seed), F.col(order_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(tie_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def capped_sample_with_prethin(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    order_col: str,
    tie_col: str,
    seed: str = "",
    headroom: int = 8,
) -> DataFrame:
    """per_key_cap for corpora with strata far larger than the cap: thin
    each hot stratum with the hash cutoff FIRST (narrow filter, no
    shuffle), then run the exact window on the survivors.

    Equivalence: the window ranks by the same md5 digest the cutoff
    filters on, and a cutoff that retains >= cap rows necessarily retains
    the cap smallest digests — so the output is IDENTICAL to per_key_cap
    whenever the thinning keeps >= cap rows per stratum. headroom=8 makes
    the expected survivor count 8x the cap; the 3-hex cutoff granularity
    (1/4096) is the only source of slack. The stratum-count planning
    aggregate collects K rows (same planner shape as mixture_rates).

    At 100 TB this turns a billion-row hot-domain window sort into a
    ~8*cap-row one while keeping the draw bit-identical.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    rank_key = F.md5(F.concat(F.lit(seed), F.col(order_col).cast("string")))
    # ceil division; full rate when the stratum is small
    cut_rows = [
        (r[stratum_col], hash_cutoff(min(RATE_DENOM, -(-RATE_DENOM * headroom * cap // r["n"]))))
        for r in counts
    ]
    cuts = df.sparkSession.createDataFrame(
        cut_rows, [stratum_col, "__cutoff"]
    )
    thinned = (
        df.join(F.broadcast(cuts), stratum_col, "left")
        .filter(F.substring(rank_key, 1, 3) < F.coalesce("__cutoff", F.lit("g")))
        .drop("__cutoff")
    )
    return per_key_cap(thinned, stratum_col, cap, order_col, tie_col, seed)


def leakage_safe_split(
    docs: DataFrame,
    edges: DataFrame,
    train_4096: int = 3686,
    val_4096: int = 205,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the unit of assignment is the near-dup CLUSTER (connected
    component of the pair graph), not the document. Splitting by doc hash
    puts a doc and its 0.9-Jaccard twin in train and test respectively —
    the classic contamination that inflates eval scores; hashing the
    cluster's canonical id instead sends every member the same way.

    Mechanics: min-label connected components over ``edges`` label each
    paired doc with its cluster's smallest id; unpaired docs are their
    own singleton cluster (coalesce to own id — no join fan-out). The
    split decision is the engine-exact content-hash convention
    (md5 3-hex-prefix bands): prefix < train cutoff -> train, < train+val
    cutoff -> val, else test. Deterministic across runs, partitionings
    and engines; rates are in 1/4096 units like every sampler here.

    Returns (id_col, cluster BIGINT, split STRING).
    """
    from stream_cdc_spark.operators.dedup import connected_components

    if train_4096 + val_4096 > RATE_DENOM:
        raise ValueError("train + val rates exceed the 4096 denominator")
    comp = connected_components(edges)
    labeled = (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(comp, F.col(id_col) == F.col("vertex"), "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster"),
        )
    )
    prefix = F.substring(
        F.md5(F.concat(F.lit(seed), F.col("cluster").cast("string"))), 1, 3
    )
    split = (
        F.when(prefix < F.lit(hash_cutoff(train_4096)), F.lit("train"))
        .when(
            prefix < F.lit(hash_cutoff(train_4096 + val_4096)), F.lit("val")
        )
        .otherwise(F.lit("test"))
    )
    return labeled.withColumn("split", split)
