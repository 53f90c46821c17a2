"""Sequential event analytics: funnel conversion and retention cohorts.

These are the canonical "did the user do A, then B, then C" questions a
CDC/event stream feeds (the reference's consumers run them downstream of
the queue it fills — stream_cdc/streams/sqs.py ships events precisely so
analytics like these can be computed; here they are first-class operators).

Funnel semantics are min-chaining: step 1 anchors at the user's earliest
step-1 event; step i+1 anchors at the earliest step-(i+1) event strictly
after the step-i anchor. The naive formulation is k chained self-joins
(k shuffles + k join explosions). The formulation here is a single
shuffle: group each user's step events, sort in event-time order, and run
the chain as a linear scan with `F.aggregate` — a JVM higher-order
function over the sorted array, no Python, no joins. A greedy first-match
scan over time-sorted events is exactly min-chaining: the first step-i
match after the previous anchor is the minimum qualifying timestamp.

State per user is that user's *step* events only (filtered before the
shuffle) — bounded by funnel activity, not total event volume. At 100 TB,
users with pathological event counts are the skew risk; cap per-user
events upstream if a hot key appears (the same mitigation as
operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def funnel_reached(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progress: (user_col, reached) where reached is the
    number of consecutive funnel steps completed in order (0..len(steps)).

    One shuffle on user_col; the chain scan is whole-stage-codegen'd
    array logic (sort_array + aggregate), never Python.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t"))
                )
            ).alias("evs")
        )
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("reached"),
        F.lit(None).cast("timestamp").alias("last_ts"),
    )

    def advance(acc: Column, e: Column) -> Column:
        hit = (
            (acc["reached"] < F.lit(k))
            & (e["t"] == F.element_at(steps_arr, acc["reached"] + 1))
            & ((acc["reached"] == F.lit(0)) | (e["ts"] > acc["last_ts"]))
        )
        return F.when(
            hit,
            F.struct(
                (acc["reached"] + 1).alias("reached"), e["ts"].alias("last_ts")
            ),
        ).otherwise(acc)

    return per_user.select(
        F.col(user_col),
        F.aggregate("evs", zero, advance)["reached"].alias("reached"),
    )


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table: (step, step_name, n_users) where n_users
    counts users whose ordered progress reached at least `step`.

    The per-user scan aggregates to <= len(steps)+1 rows before the final
    tiny cross join, so everything after the single user shuffle is
    negligible at any scale.
    """
    spark = df.sparkSession
    reached = funnel_reached(df, steps, user_col, ts_col, type_col)
    by_reach = reached.groupBy("reached").agg(F.count(F.lit(1)).alias("n"))
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        steps_df.join(by_reach, F.col("reached") >= F.col("step"))
        .groupBy("step", "step_name")
        .agg(F.sum("n").cast("bigint").alias("n_users"))
        .select(F.col("step").cast("bigint").alias("step"), "step_name", "n_users")
        .orderBy("step")
    )


def retention_cohorts(
    df: DataFrame,
    max_offset_days: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: (cohort_day, day_offset, n_active) —
    users grouped by first-seen day, counted distinct on each later day.

    Two shuffles, both on user_col (first-day aggregate, then the join
    back) — AQE co-partitions them; the distinct + final rollup operate
    on (cohort, offset, user), already collapsed to active-days per user.
    The cohort side is one row per user; at 100 TB it is the small side
    and the join stays a plain shuffled hash join keyed the same way as
    the aggregate that produced it.
    """
    day = F.to_date(F.col(ts_col))
    firsts = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    offset = F.datediff(day, F.col("cohort_day"))
    return (
        df.join(firsts, user_col)
        .select(
            F.col("cohort_day"),
            offset.alias("day_offset"),
            F.col(user_col),
        )
        .filter(
            (F.col("day_offset") >= 0) & (F.col("day_offset") <= max_offset_days)
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("bigint").alias("n_active"))
        .select(
            "cohort_day",
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "n_active",
        )
        .orderBy("cohort_day", "day_offset")
    )
