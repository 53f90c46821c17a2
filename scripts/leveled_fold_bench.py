#!/usr/bin/env python
"""Fold-cost microbench for the leveled state tier (statedir module doc):
single-level compaction re-reads O(total state) on every fold, the L1
delta fold reads only the pending batch dirs — O(recent). This isolates
that claim: build a snapshot of SNAP_ROWS rows plus PENDING batch dirs of
BATCH_ROWS rows each, then time compact_minor (delta fold) vs compact
(full fold) from identical starting layouts.

At 100 TB the admitted corpus dwarfs any micro-batch by 4-6 orders of
magnitude, so the full-fold wall here is a LOWER bound on the gap; the
leveled tier pays it only once per `major_every` folds.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stream_cdc_spark.session import get_spark  # noqa: E402
from stream_cdc_spark.streaming import statedir  # noqa: E402

SCHEMA = "id bigint, v bigint"
SNAP_ROWS = int(os.environ.get("SNAP_ROWS", "20000000"))
BATCH_ROWS = int(os.environ.get("BATCH_ROWS", "20000"))
PENDING = int(os.environ.get("PENDING", "16"))
# BUCKETS > 0: lay the starting snapshot out as an id-bucketed table and
# run the folds with bucket_cols=["id"] — measures the round-8 per-bucket
# merge (bucketed deltas + forced bucketed scans) instead of the plain
# rewrite
BUCKETS = int(os.environ.get("BUCKETS", "0"))


def _layout(spark, root: str) -> None:
    shutil.rmtree(root, ignore_errors=True)
    snap = spark.range(SNAP_ROWS).select(
        F.col("id"), (F.col("id") * 7).alias("v")
    )
    dest = os.path.join(root, "compact=000000100")
    if BUCKETS:
        name = statedir._default_table_name(root) + "_seed"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            snap.repartition(BUCKETS, "id")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(BUCKETS, "id")
            .sortBy("id")
            .option("path", dest)
            .saveAsTable(name)
        )
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        statedir._publish_manifest(
            statedir._DEFAULT_FS, dest, {"cols": ["id"], "n": BUCKETS}
        )
    else:
        snap.write.mode("overwrite").parquet(dest)
    for b in range(100, 100 + PENDING):
        rows = spark.range(BATCH_ROWS).select(
            (F.col("id") + b * BATCH_ROWS).alias("id"),
            (F.col("id") * 3).alias("v"),
        )
        rows.coalesce(1).write.mode("overwrite").parquet(
            statedir.batch_dir(root, b)
        )


def main() -> None:
    spark = get_spark(app_name="leveled-fold-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/leveled-fold-bench"
    head = 100 + PENDING
    out = {
        "metric": "leveled_fold_cost",
        "snap_rows": SNAP_ROWS,
        "batch_rows": BATCH_ROWS,
        "pending": PENDING,
    }

    bk = (
        {"bucket_cols": ["id"], "num_buckets": BUCKETS} if BUCKETS else {}
    )
    out["buckets"] = BUCKETS

    # Warm the write path first (committer/codegen class loading): a
    # continuous pipeline folds in a long-lived session, so steady-state
    # cost is what each trigger actually pays; the cold first fold is a
    # once-per-process constant. Timed folds below are therefore warm.
    warm = os.path.join(work, "warmup")
    _layout(spark, warm)
    statedir.compact_minor(spark, warm, SCHEMA, 100 + PENDING, **bk)
    _layout(spark, warm)
    statedir.compact(spark, warm, SCHEMA, 100 + PENDING, **bk)
    shutil.rmtree(warm, ignore_errors=True)

    root = os.path.join(work, "minor")
    _layout(spark, root)
    t0 = time.time()
    assert statedir.compact_minor(spark, root, SCHEMA, head, **bk)
    out["minor_fold_s"] = round(time.time() - t0, 2)
    rows_after_minor = statedir.read_state(spark, root, SCHEMA, head).count()

    root = os.path.join(work, "major")
    _layout(spark, root)
    t0 = time.time()
    assert statedir.compact(spark, root, SCHEMA, head, **bk)
    out["full_fold_s"] = round(time.time() - t0, 2)
    rows_after_full = statedir.read_state(spark, root, SCHEMA, head).count()

    assert rows_after_minor == rows_after_full, (rows_after_minor, rows_after_full)
    out["rows"] = rows_after_full
    out["full_over_minor"] = round(out["full_fold_s"] / max(out["minor_fold_s"], 1e-9), 1)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
