"""Z-order clustering: Morton key correctness + multi-dimensional
file-skipping proof vs a single-column sort layout."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stream_cdc_spark.operators.layout import write_zordered, zorder_key
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def _morton(cells: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, c in enumerate(cells):
            z |= ((c >> b) & 1) << (b * len(cells) + i)
    return z


def test_zorder_key_is_morton_interleave(spark):
    bits, grid_max = 4, 15
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    keyed, key = zorder_key(df, ["x", "y"], bits=bits)
    got = {(r.x, r.y): r[key] for r in keyed.collect()}
    for x, y in rows:
        # same min-max scaling arithmetic as the engine (IEEE doubles)
        cx = min(max(math.floor((x - 0.0) / grid_max * grid_max), 0), grid_max)
        cy = min(max(math.floor((y - 0.0) / grid_max * grid_max), 0), grid_max)
        assert got[(x, y)] == _morton([cx, cy], bits), (x, y)


def test_zorder_key_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3, 5.0), (7, 5.0)], "x int, v double"
    )
    keyed, key = zorder_key(df, ["x", "v"], bits=8)
    vals = [r[key] for r in keyed.collect()]
    assert all(v is not None and v >= 0 for v in vals)


def _candidate_files(spark, path, lo1, hi1, lo2, hi2, c1, c2) -> int:
    """Files whose (min,max) bounding box intersects the query box — exactly
    what parquet min-max statistics let the reader skip."""
    stats = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min(c1).alias("mn1"),
            F.max(c1).alias("mx1"),
            F.min(c2).alias("mn2"),
            F.max(c2).alias("mx2"),
        )
        .collect()
    )
    assert len(stats) > 16, "layout did not produce enough files to compare"
    return sum(
        1
        for r in stats
        if r.mn1 <= hi1 and r.mx1 >= lo1 and r.mn2 <= hi2 and r.mx2 >= lo2
    )


def test_zorder_skips_files_on_both_dimensions(spark, tmp_path):
    li = load(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    n_files = 32
    z_path = str(tmp_path / "z")
    lin_path = str(tmp_path / "linear")
    write_zordered(li, z_path, ["l_orderkey", "l_partkey"], num_files=n_files)
    # baseline: classic single-column sort layout
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lin_path)
    )

    # nothing lost
    assert spark.read.parquet(z_path).count() == li.count()
    z_sum = spark.read.parquet(z_path).agg(F.sum("l_extendedprice")).first()[0]
    assert abs(z_sum - li.agg(F.sum("l_extendedprice")).first()[0]) < 1e-6

    b = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    # ~12.5%-wide box in each dimension
    lo1, hi1 = b[0], b[0] + (b[1] - b[0]) // 8
    lo2, hi2 = b[2], b[2] + (b[3] - b[2]) // 8

    z_cand = _candidate_files(spark, z_path, lo1, hi1, lo2, hi2,
                              "l_orderkey", "l_partkey")
    lin_cand = _candidate_files(spark, lin_path, lo1, hi1, lo2, hi2,
                                "l_orderkey", "l_partkey")
    # linear sort serves dim 1 only (dim-2 bounds span everything); the
    # Z-curve must beat it on the 2-D box, and prune most files outright
    assert z_cand < lin_cand, (z_cand, lin_cand)
    assert z_cand <= n_files // 2, z_cand

    # both layouts return identical query results
    pred = (
        (F.col("l_orderkey").between(lo1, hi1))
        & (F.col("l_partkey").between(lo2, hi2))
    )
    assert (
        spark.read.parquet(z_path).filter(pred).count()
        == spark.read.parquet(lin_path).filter(pred).count()
        == li.filter(pred).count()
    )


def test_plan_compaction_bins_are_monotone_and_bounded(spark, tmp_path):
    from stream_cdc_spark.operators import layout
    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    src = str(tmp_path / "tiny-files")
    load(spark, SF_SMALL, "events").repartition(20).write.parquet(src)
    target = 64 * 1024
    plan = layout.plan_compaction(spark, src, target_file_bytes=target).collect()
    assert len(plan) == 20
    bins = [r.bin for r in sorted(plan, key=lambda r: r.file)]
    assert bins == sorted(bins)  # sequential assignment is monotone
    # every bin's cumulative start is below its div boundary by construction;
    # a bin never holds more than target + one max-size file
    per_bin: dict[int, int] = {}
    for r in plan:
        per_bin[r.bin] = per_bin.get(r.bin, 0) + r.bytes
    max_file = max(r.bytes for r in plan)
    assert all(v <= target + max_file for v in per_bin.values())


def test_compact_files_preserves_rows_and_reduces_count(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from stream_cdc_spark.operators import layout
    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    ev = load(spark, SF_SMALL, "events")
    ev.repartition(40).write.parquet(src)
    n_before = len(glob.glob(src + "/*.parquet"))
    layout.compact_files(spark, src, dst, target_file_bytes=1 * 1024 * 1024)
    n_after = len(glob.glob(dst + "/*.parquet"))
    assert n_after < n_before
    fp = [
        F.count(F.lit(1)),
        F.sum("event_id"),
        # decimal accumulator: a BIGINT sum of xxhash64 overflows ANSI mode
        F.sum(F.xxhash64("props").cast("decimal(38,0)")),
    ]
    a = spark.read.parquet(src).agg(*fp).first()
    b = spark.read.parquet(dst).agg(*fp).first()
    assert a == b
