"""Temporal joins Spark lacks as primitives: as-of join and bounded range
join, in shuffle-bounded formulations.

As-of join (latest right-side row at-or-before each left row) is the
canonical CDC/timeseries lookup. The naive formulation — inequality join
then max per left row — explodes to |L|x|R| per key before aggregating.
The scalable formulation used here is the union trick: interleave both
sides into one (key, time)-ordered stream and carry the last right-side
value forward with a window — one shuffle on the key, zero join explosion,
state bounded by one row.

Bounded range join (pairs within `max_gap` of each other per key) uses
time bucketing: rows join only with their own and the adjacent bucket
(bucket width = max_gap), so the join fan-out is bounded by local density
instead of |L|x|R| per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_prior(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    right_filter: Column,
    left_filter: Column,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Self as-of join: for every left row, the latest strictly-prior right
    row's value (total order = (ts, seq); 'prior' excludes the row itself).

    Returns the left rows with `out_col` attached (NULL when no prior
    right row exists). One shuffle on `key_col`; the carry-forward window
    keeps O(1) state per key.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(seq_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = df.filter(right_filter | left_filter).withColumn(
        out_col,
        F.last(F.when(right_filter, F.col(value_col)), ignorenulls=True).over(w),
    )
    return carried.filter(left_filter)


def range_join_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    max_gap_us: int,
) -> DataFrame:
    """Per-key pairs (a, b) with seq_a < seq_b and 0 <= ts_b - ts_a <=
    max_gap_us. Bucketed: a pair within max_gap always lands in the same
    or adjacent time bucket, so each row joins against <= 2 buckets of its
    key — fan-out bounded by local event density.
    """
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(seq_col).alias("seq"),
        us.alias("us"),
        F.floor(us / F.lit(max_gap_us)).alias("bucket"),
    )
    # left side probes its own bucket and the next one
    probe = base.select(
        "k", F.col("seq").alias("seq_a"), F.col("us").alias("us_a"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("bucket"),
    )
    build = base.select(
        "k", F.col("seq").alias("seq_b"), F.col("us").alias("us_b"), "bucket"
    )
    return (
        probe.join(build, ["k", "bucket"])
        .filter(
            (F.col("seq_a") < F.col("seq_b"))
            & (F.col("us_b") >= F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= max_gap_us)
        )
        .select(
            F.col("k").alias(key_col),
            F.col("seq_a").alias("id_a"),
            F.col("seq_b").alias("id_b"),
            (F.col("us_b") - F.col("us_a")).alias("gap_us"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def bucket_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    seq_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Last observation per (key, time bucket): (key, bucket_ts, v), where
    'last' is by the total order (ts, seq) inside the bucket.

    One groupBy shuffle with map-side combine; the per-bucket winner is
    carried as a lexicographic struct max — no window over raw rows, so a
    bucket with millions of events still aggregates in one pass.
    """
    m = F.max(
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(seq_col).alias("s"),
            F.col(val_col).alias("v"),
        )
    ).alias("m")
    return (
        df.groupBy(
            F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket_ts")
        )
        .agg(m)
        .select(key_col, "bucket_ts", F.col("m.v").alias("v"))
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    seq_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Hypertable-style gap-fill with last-observation-carried-forward
    (TimescaleDB's time_bucket_gapfill + locf shape): a dense per-key time
    spine over the observed range, each bucket carrying the latest
    observation at-or-before it.

    Returns (key_col, bucket_ts, value_filled, observed) — value_filled is
    NULL before a key's first observation (no back-fill), observed is 1
    where the bucket had a real event.

    Plan shape, scale notes (100 TB):
      1. bucket_last collapses the raw stream to <= keys x buckets rows in
         ONE combine-enabled shuffle — the spine never touches raw events;
      2. the spine is distinct-keys x sequence(min,max) — the 2-row bounds
         relation is broadcast onto the key list, so spine generation is
         narrow and its size is output-sized, not input-sized;
      3. the LOCF window orders buckets per key: state is O(1) and the
         partition size is the bucket count (e.g. 8760 for a year of
         hours), never the event count — safe for arbitrarily hot keys.
    """
    bucketed = bucket_last(df, key_col, ts_col, val_col, seq_col, unit)
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("mn"),
        F.date_trunc(unit, F.max(ts_col)).alias("mx"),
    )
    spine = (
        df.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence("mn", "mx", F.expr(f"interval 1 {unit}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spine.join(bucketed, [key_col, "bucket_ts"], "left").select(
        key_col,
        "bucket_ts",
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNotNull().cast("bigint").alias("observed"),
    )
