"""Batch-versioned parquet state with compaction — bounded-metadata
streaming state without sink transactions.

Both foreachBatch sinks (streaming/curation.py, streaming/lsh_snapshot.py)
persist their state as one parquet subdir per micro-batch:

    <root>/batch=<id>/        output of micro-batch <id> (OVERWRITE of its
                              own subdir, so replay is idempotent)

and read state for batch B as the union of subdirs with id < B — a
replayed batch sees exactly the state it saw the first time. That rule is
exactly-once, but unbounded: a continuous feed accumulates one subdir per
trigger forever, and driver listing + union planning grow linearly with
stream age. The reference's checkpoint state is O(1) forever (one
DynamoDB item — reference: stream_cdc/state/dynamodb.py:76-91); this
module gives the parquet layout the same bounded-metadata property.

Compaction folds the committed prefix into a snapshot dir:

    <root>/compact=<W>/       union of all state visible to batch W
                              (i.e. every batch id < W)

published ATOMICALLY: Spark writes to a dot-hidden temp dir (with its
_SUCCESS marker), then one os.rename() — POSIX/HDFS-atomic — moves it to
``compact=<W>``. A compact dir without _SUCCESS is ignored by readers and
deleted by the next compaction attempt, so a torn publish can never be
read. After publishing, the folded batch dirs and any older compact dirs
are deleted (crash between publish and delete is safe: the read rule
below already excludes them).

Read rule for batch B (``state_paths``): take the LARGEST valid compact
watermark W <= B (0 if none), then read ``compact=W`` plus every
``batch=i`` with W <= i < B. Invariants:

  * union(read set for B) == union(all committed batch=i, i < B) at every
    point in every crash/replay interleaving — compaction never changes
    what any batch observes, only how many dirs express it;
  * a replayed batch B after a compaction at watermark W <= B reads
    compact=W + batch dirs in [W, B): the same rows it read pre-compaction
    (streaming replays only the last in-flight batch, and compaction at
    the start of batch B folds only ids < B, so W > B never occurs);
  * batch dirs with id < W are invisible even if their deletion was
    interrupted — no double counting.

Compaction itself is replay-idempotent: re-running ``compact(root, B)``
when ``compact=B`` already exists folds {compact=B} + [B, B) = itself and
is skipped as a no-op (only the stale-dir cleanup reruns).

Scale notes: the fold is a single union-scan -> overwrite (optionally
bucketed — see ``bucket_cols`` — so the compacted snapshot doubles as the
shuffle-free join-side table of tests/test_bucketing.py). The fold cost
is O(total state) every ``every`` batches — single-level compaction,
amortized O(state/every) per trigger; at 100 TB the same watermark rule
supports leveled tiers (fold batch dirs into L1 deltas, L1 into the L0
snapshot less often) without changing any reader. Dir listing is one
os.listdir per state table per trigger, bounded by ``every`` + 1 entries
once compaction is running.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^batch=(\d+)$")
_COMPACT_RE = re.compile(r"^compact=(\d+)$")
_TMP_PREFIX = ".tmp-compact-"


def batch_dir(root: str, batch_id: int) -> str:
    # pre-compaction layouts wrote batch=<id> unpadded; a replayed batch
    # must OVERWRITE that dir, not create a padded sibling for the same id
    legacy = os.path.join(root, f"batch={batch_id}")
    if os.path.isdir(legacy):
        return legacy
    return os.path.join(root, f"batch={batch_id:09d}")


def _scan(root: str) -> tuple[dict[int, str], dict[int, str]]:
    """(compacts, batches) as {id: path}. Only compact dirs holding a
    _SUCCESS marker count — a markerless dir is a torn publish on a
    filesystem without atomic rename and must never be read."""
    compacts: dict[int, str] = {}
    batches: dict[int, str] = {}
    if not os.path.isdir(root):
        return compacts, batches
    for name in os.listdir(root):
        path = os.path.join(root, name)
        m = _BATCH_RE.match(name)
        if m:
            batches[int(m.group(1))] = path
            continue
        m = _COMPACT_RE.match(name)
        if m and os.path.exists(os.path.join(path, "_SUCCESS")):
            compacts[int(m.group(1))] = path
    return compacts, batches


def watermark(root: str, batch_id: int) -> int:
    """Largest valid compact watermark <= batch_id (0 if none)."""
    compacts, _ = _scan(root)
    eligible = [w for w in compacts if w <= batch_id]
    return max(eligible, default=0)


def state_paths(root: str, batch_id: int) -> list[str]:
    """The read set for batch ``batch_id``: the best compacted snapshot
    plus the batch dirs after its watermark (see module doc)."""
    compacts, batches = _scan(root)
    eligible = [w for w in compacts if w <= batch_id]
    w = max(eligible, default=0)
    out = [compacts[w]] if eligible else []
    out.extend(p for i, p in sorted(batches.items()) if w <= i < batch_id)
    return out


def read_state(
    spark: SparkSession, root: str, schema: str, batch_id: int
) -> DataFrame:
    """State visible to ``batch_id``. Reads WITHOUT a forced schema when
    files exist so column metadata written by the sink (e.g. the LSH
    parameter stamp of dedup.minhash_band_index) survives the round-trip
    — forcing the schema strips metadata, which silently disarmed the
    index-mismatch guard on the restart path. ``schema`` is only the
    empty-state fallback."""
    paths = state_paths(root, batch_id)
    if not paths:
        return spark.createDataFrame([], schema)
    try:
        return spark.read.parquet(*paths)
    except Exception:
        # every visible dir is file-less (legacy empty-batch commits):
        # schema inference has nothing to read
        return spark.read.schema(schema).parquet(*paths)


def compact(
    spark: SparkSession,
    root: str,
    schema: str,
    batch_id: int,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    bucket_cols: list[str] | None = None,
    num_buckets: int = 32,
    table_name: str | None = None,
) -> bool:
    """Fold the state visible to ``batch_id`` into ``compact=<batch_id>``
    and delete the folded dirs. Returns True if a fold was published.

    ``transform`` lets append-only increment logs shrink on fold (e.g.
    per-bucket count increments -> groupBy().sum()); it must be a
    read-equivalent reduction (readers already aggregate increments).

    ``bucket_cols`` writes the snapshot as a Spark-bucketed table (via an
    external saveAsTable at the compact path, registered as
    ``table_name``) so downstream joins on those columns read it without
    a snapshot-side Exchange (tests/test_bucketing.py). The bucketed
    publish is guarded by the same _SUCCESS-marker rule instead of the
    rename (saveAsTable fixes the table location at write time)."""
    compacts, batches = _scan(root)
    eligible = [w for w in compacts if w <= batch_id]
    w = max(eligible, default=0)
    fold = [p for i, p in sorted(batches.items()) if w <= i < batch_id]
    stale_batches = [p for i, p in batches.items() if i < w]
    stale_compacts = [p for i, p in compacts.items() if eligible and i < w]
    # torn publishes / leftover temps from a crashed attempt
    junk = [
        os.path.join(root, n)
        for n in (os.listdir(root) if os.path.isdir(root) else [])
        if n.startswith(_TMP_PREFIX)
        or (
            _COMPACT_RE.match(n)
            and not os.path.exists(os.path.join(root, n, "_SUCCESS"))
        )
    ]
    # Torn publishes must go BEFORE the new publish: a markerless
    # compact=<batch_id> leftover would collide with the rename target.
    for p in junk:
        shutil.rmtree(p, ignore_errors=True)
    junk = []
    # Note: a replay after a COMPLETED publish needs no special case —
    # compact=batch_id being valid makes w == batch_id, the fold set
    # empty, and the folded dirs fall into the stale cleanup below.
    published = False
    if fold:
        df = read_state(spark, root, schema, batch_id)
        if transform is not None:
            df = transform(df)
        dest = os.path.join(root, f"compact={batch_id:09d}")
        if bucket_cols:
            name = table_name or _default_table_name(root)
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(dest, ignore_errors=True)
            (
                df.write.mode("overwrite")
                .format("parquet")
                .bucketBy(num_buckets, *bucket_cols)
                .sortBy(*bucket_cols)
                .option("path", dest)
                .saveAsTable(name)
            )
        else:
            tmp = os.path.join(root, f"{_TMP_PREFIX}{batch_id:09d}")
            shutil.rmtree(tmp, ignore_errors=True)
            df.write.mode("overwrite").parquet(tmp)
            os.rename(tmp, dest)
        published = True
        stale_batches = fold + [p for i, p in batches.items() if i < w]
        stale_compacts = [compacts[i] for i in compacts if i < batch_id]
    for p in junk + stale_batches + stale_compacts:
        shutil.rmtree(p, ignore_errors=True)
    return published


def maybe_compact(
    spark: SparkSession,
    root: str,
    schema: str,
    batch_id: int,
    every: int,
    **kwargs,
) -> bool:
    """Compact iff at least ``every`` batch dirs sit above the current
    watermark — the per-trigger entry point (called at the START of
    foreach_batch, before the batch writes its own dirs, so a replayed
    batch re-folds the identical prefix)."""
    if every <= 0:
        return False
    compacts, batches = _scan(root)
    eligible = [w for w in compacts if w <= batch_id]
    w = max(eligible, default=0)
    pending = sum(1 for i in batches if w <= i < batch_id)
    if pending < every:
        return False
    return compact(spark, root, schema, batch_id, **kwargs)


def bucketed_relation(
    spark: SparkSession,
    root: str,
    schema: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    table_name: str | None = None,
) -> DataFrame | None:
    """The compacted snapshot as its catalog-registered bucketed table,
    re-registering after a session restart (the in-memory catalog does
    not survive one; the bucketed files — whose names carry the bucket
    ids Spark maps at scan time — do). Returns None when no bucketed
    snapshot exists. ``schema`` / ``bucket_cols`` / ``num_buckets`` must
    match what ``compact`` wrote (they are the sink's own constants)."""
    compacts, _ = _scan(root)
    if not compacts:
        return None
    latest = compacts[max(compacts)]
    name = table_name or _default_table_name(root)
    if spark.catalog.tableExists(name):
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
            .filter("col_name = 'Location'")
            .collect()
        )
        if loc and loc[0]["data_type"].rstrip("/").endswith(
            os.path.basename(latest)
        ):
            return spark.table(name)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    cols = ", ".join(bucket_cols)
    spark.sql(
        f"CREATE TABLE {name} ({schema}) USING PARQUET "
        f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
        f"INTO {num_buckets} BUCKETS LOCATION '{os.path.abspath(latest)}'"
    )
    return spark.table(name)


def _default_table_name(root: str) -> str:
    return "statedir_" + re.sub(r"[^A-Za-z0-9_]", "_", root.strip("/"))


def dir_counts(root: str) -> dict[str, int]:
    """Metadata-size observability: {'compact': n, 'batch': n, 'files': n}
    — the quantity compaction bounds (asserted flat in the long-horizon
    bench)."""
    compacts, batches = _scan(root)
    files = 0
    for _, _, fs in os.walk(root):
        files += len(fs)
    return {"compact": len(compacts), "batch": len(batches), "files": files}
