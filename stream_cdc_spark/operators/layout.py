"""Storage-layout operators: partitioned writes and Z-order clustering.

At 100 TB the cheapest byte is the one never read: writing fact tables
hive-partitioned by a low-cardinality predicate column (event date, event
type, tenant) lets Catalyst prune entire directories at planning time —
`PartitionFilters` in the scan, zero I/O for excluded partitions. This is
the storage-side complement to `bucketing.py` (which pre-shuffles for
joins); together they are the ingest-time layout contract a CDC pipeline
should write: partition by time/type, bucket by join key.

For point/range predicates on MULTIPLE numeric dimensions a single sort
order can only serve one of them; `write_zordered` interleaves the bits of
several columns into one Morton (Z-curve) key and range-partitions + sorts
by it, so every output file covers a small hyper-rectangle of the combined
key space and parquet row-group/file min-max statistics prune on EVERY
dimension at once (same idea as Delta OSS `OPTIMIZE ZORDER BY`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet (one directory per partition value).

    Keep partition columns low-cardinality (date, type) — thousands of
    partitions are fine, millions of tiny files are not; pair with
    `ensure_parallelism`/coalesce upstream to control file counts.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Append a Morton (bit-interleaved) Z-curve key over `cols`.

    Each column is min-max scaled into a `bits`-bit integer grid (one tiny
    agg pass collects the 2×k bounds to the driver), then the grids are
    bit-interleaved into a single BIGINT — entirely with built-in
    shiftleft/shiftright/bitwise expressions, so the whole key stays inside
    whole-stage codegen; no Python runs per row. `bits * len(cols)` must be
    ≤ 63. NULLs map to grid cell 0 (they sort first, same as NULLS FIRST).

    Returns (df_with_key, key_column_name).
    """
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds BIGINT")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    grid_max = (1 << bits) - 1
    cells: list[Column] = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(mn or 0.0)) / F.lit(span) * grid_max
        )
        cells.append(
            F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(grid_max)), F.lit(0))
        )
    z: Column = F.lit(0).cast("long")
    for b in range(bits):  # interleave: bit b of col i lands at b*k + i
        for i, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * len(cells) + i
                )
            )
    key = "_zorder_key"
    return df.withColumn(key, z), key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-curve of `cols`.

    repartitionByRange on the key gives each file a contiguous Z-range (a
    small hyper-rectangle in col-space); sortWithinPartitions tightens
    row-group min-max stats inside each file. Readers need no special API:
    plain predicates on any of `cols` prune via parquet statistics.
    """
    keyed, key = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Inventory a parquet directory's files and assign each to a
    compaction bin of ~target_file_bytes (first-fit on the size-ordered
    list, computed over the file listing — thousands of rows, not data).

    Small-file proliferation is the classic failure mode of streaming
    ingest (every micro-batch flush writes one file per partition; cf. the
    reference's per-batch SQS sends): a 100 TB table ingested in 1-minute
    batches accretes millions of KB-scale files and scan planning + footer
    reads come to dominate query time. Returns (file, bytes, bin) so the
    caller can audit before rewriting.
    """
    files = spark.read.format("binaryFile").load(path + "/*.parquet").select(
        F.col("path").alias("file"), F.col("length").alias("bytes")
    )
    # Greedy sequential packing in file order via a running-sum window:
    # bin = cumulative_bytes div target. One tiny shuffle of the listing.
    from pyspark.sql import Window

    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    return files.select(
        "file",
        "bytes",
        (F.coalesce(F.sum("bytes").over(w), F.lit(0)) / target_file_bytes)
        .cast("bigint")
        .alias("bin"),
    )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Rewrite a small-file parquet directory into ~target-size files.

    The output file count comes from the *measured* input bytes (listing
    only — no data scan), then one round-robin repartition balances rows
    across exactly that many files. Returns the number of files written.
    Contents are preserved row-for-row; layout-only operation (combine
    with write_zordered when clustering should be re-established).
    """
    import math

    total = (
        spark.read.format("binaryFile")
        .load(src_path + "/*.parquet")
        .agg(F.sum("length"))
        .first()[0]
        or 0
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode(mode).parquet(dst_path)
    return n_files
