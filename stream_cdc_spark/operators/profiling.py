"""Column-level data profiling: the ANALYZE TABLE / data-quality audit
surface a curation pipeline runs before committing a corpus snapshot.

One aggregate pass produces per-column row/null/distinct counts and
min/max, emitted in long format (one row per column) so downstream
quality gates can diff profiles across snapshots without schema changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """Profile `cols` of df: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), min/max stringified.

    All statistics for all columns compute in ONE aggregate job. With
    `exact_distinct`, Spark plans the multi-column COUNT(DISTINCT) via an
    Expand (rows multiply by len(cols) before the partial aggregate) —
    exact but K-fold map work; at 100 TB profile with
    `exact_distinct=False`, which swaps in HyperLogLog
    (approx_count_distinct, one pass, no expand, ~2% error) — the same
    trade ANALYZE TABLE makes. Min/max/null counts are always exact and
    come from the same pass.
    """
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias("n_nulls"),
            nd(c).cast("bigint").alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ).alias(f"_p_{c}")
        for c in cols
    ]
    wide = df.agg(*structs)
    return wide.select(
        F.explode(F.array(*[F.col(f"_p_{c}") for c in cols])).alias("p")
    ).select("p.*")


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 8,
    tiebreak_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-group equi-depth histogram: k buckets holding ~n/k rows each —
    the statistic a query optimizer stores for selectivity estimation
    (ANALYZE histograms), and the right summary for skewed columns where
    equi-WIDTH buckets collapse into one bar.

    exact=True computes boundaries by rank selection (the q38 technique:
    row_number within group, keep rows at ranks ceil(i*n/k)) — actual
    data values, deterministic across engines, no interpolation float
    drift. The within-group sort bounds the window partition by the
    largest group (same scale contract as q38); exact=False swaps in
    approx_percentile boundaries (bounded-error GK, no per-group sort)
    for groups too large to sort — the 100 TB path.

    Bucket assignment is a broadcast join of the per-group boundary
    array + a JVM filter count (bucket = #boundaries strictly below the
    value); rows equal to a boundary fall in the lower bucket. Returns
    (group_col, bucket, n_rows).
    """
    if exact:
        order = [F.col(value_col)] + (
            [F.col(tiebreak_col)] if tiebreak_col else []
        )
        w = Window.partitionBy(group_col).orderBy(*order)
        wn = Window.partitionBy(group_col)
        r = df.select(
            group_col,
            value_col,
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        targets = F.transform(
            F.sequence(F.lit(1), F.lit(k - 1)),
            lambda i: F.ceil(i * F.col("n") / F.lit(float(k))).cast("bigint"),
        )
        bounds = (
            r.filter(F.array_contains(targets, F.col("rn")))
            .groupBy(group_col)
            .agg(F.sort_array(F.collect_list(value_col)).alias("bounds"))
        )
    else:
        bounds = df.groupBy(group_col).agg(
            F.sort_array(
                F.percentile_approx(
                    F.col(value_col),
                    F.array(*[F.lit(i / k) for i in range(1, k)]),
                    F.lit(10_000),
                )
            ).alias("bounds")
        )
    bucket = F.size(
        F.filter(F.col("bounds"), lambda b: b < F.col(value_col))
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .select(group_col, bucket.cast("bigint").alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier gate: rows whose value sits more than
    `threshold` sample standard deviations from their group's mean — the
    data-quality tripwire a curation pipeline runs on numeric telemetry
    (payload sizes, event values) before trusting a batch.

    Cross-engine determinism: values are quantized to integer cents
    per-row (ROUND(v*100) — one identical IEEE multiply, never near a
    .5 boundary for 2-decimal data), and the group moments are EXACT
    integer sums of cents and squared cents carried as DECIMAL(38,0)
    (order-insensitive; integer->double is correctly rounded in both
    engines, unlike fractional-decimal->double). Mean, variance, and
    each row's z are then one identical double sequence, making the
    >= threshold cut and the ppm-quantized output hash-stable.

    Plan shape at 100 TB: one groupBy shuffle with map-side combine
    collapses the corpus to |groups| moment rows, which broadcast back
    onto the stream — no window over raw rows, no sort, no second
    shuffle. Groups with fewer than 2 rows or zero variance emit nothing
    (no z is defined there).
    """
    vi = F.round(F.col(value_col) * F.lit(100.0)).cast("bigint")
    big = "decimal(38,0)"
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vi.cast(big)).alias("s1"),
        F.sum((vi * vi).cast(big)).alias("s2"),
    )
    # singleton groups have no sample variance: drop them BEFORE the
    # (n - 1) divisor so ANSI mode cannot raise DIVIDE_BY_ZERO on a
    # one-row key (plausible in real telemetry; the gate must gate, not
    # crash). Mirrored by HAVING count(*) >= 2 in the q126 oracle.
    stats = stats.filter(F.col("n") >= F.lit(2))
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - n * mean * mean) / (n - F.lit(1.0))
    moments = stats.select(
        key_col, mean.alias("mean"), var.alias("var")
    ).filter(F.col("var") > 0)
    z = (vi.cast("double") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        df.join(F.broadcast(moments), key_col)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= F.lit(float(threshold)))
        .select(
            id_col,
            key_col,
            F.col(value_col),
            F.floor(F.lit(1_000_000.0) * F.col("z")).cast("bigint").alias("z_ppm"),
        )
    )
