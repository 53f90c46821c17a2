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
shuffle-free join-side table of tests/test_bucketing.py). Single-level
compaction re-reads O(total state) every ``every`` batches; for state
that dwarfs a batch (the 100 TB admitted corpus) the LEVELED tier caps
the common fold at O(recent) instead:

    <root>/delta=<lo>-<hi>/   union of all batch ids in [lo, hi) —
                              an L1 fold, published atomically exactly
                              like compact= (temp dir + _SUCCESS +
                              os.rename)

Enabled by ``maybe_compact(..., major_every=K)``: every ``every``
batches the pending batch dirs fold into one delta (cost O(every
batches)); once K deltas sit on the chain, everything folds into a fresh
``compact=`` snapshot (cost O(total state), paid 1/K as often). The read
rule extends without changing any invariant: compact=W0, then the
maximal contiguous delta chain lo==W0 -> hi1 -> hi2 ... ending at cover
C, then batch=i with C <= i < B; anything below the cover (leftover
batch dirs, off-chain deltas) is invisible, so torn publishes and
interrupted deletes stay unreadable exactly as before. Dir listing is
one os.listdir per state table per trigger, bounded by ``every`` +
``major_every`` + 1 entries once compaction is running.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^batch=(\d+)$")
_COMPACT_RE = re.compile(r"^compact=(\d+)$")
_DELTA_RE = re.compile(r"^delta=(\d+)-(\d+)$")
_TMP_PREFIX = ".tmp-compact-"


def batch_dir(root: str, batch_id: int) -> str:
    # pre-compaction layouts wrote batch=<id> unpadded; a replayed batch
    # must OVERWRITE that dir, not create a padded sibling for the same id
    legacy = os.path.join(root, f"batch={batch_id}")
    if os.path.isdir(legacy):
        return legacy
    return os.path.join(root, f"batch={batch_id:09d}")


def _scan(
    root: str,
) -> tuple[dict[int, str], dict[int, str], dict[tuple[int, int], str]]:
    """(compacts, batches, deltas) as {id: path} / {(lo, hi): path}. Only
    compact/delta dirs holding a _SUCCESS marker count — a markerless dir
    is a torn publish on a filesystem without atomic rename and must
    never be read."""
    compacts: dict[int, str] = {}
    batches: dict[int, str] = {}
    deltas: dict[tuple[int, int], str] = {}
    if not os.path.isdir(root):
        return compacts, batches, deltas
    for name in os.listdir(root):
        path = os.path.join(root, name)
        m = _BATCH_RE.match(name)
        if m:
            batches[int(m.group(1))] = path
            continue
        m = _COMPACT_RE.match(name)
        if m:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                compacts[int(m.group(1))] = path
            continue
        m = _DELTA_RE.match(name)
        if m and os.path.exists(os.path.join(path, "_SUCCESS")):
            deltas[(int(m.group(1)), int(m.group(2)))] = path
    return compacts, batches, deltas


def _chain(
    compacts: dict[int, str],
    deltas: dict[tuple[int, int], str],
    batch_id: int,
) -> tuple[list[str], int]:
    """(snapshot + delta-chain paths, cover) for ``batch_id``: the best
    compact watermark W0 <= batch_id, then the maximal contiguous chain
    of deltas lo==W0 -> hi1, lo==hi1 -> hi2, ... with every hi <=
    batch_id. Returns the paths in read order and the cover C — batch
    dirs with id < C are invisible."""
    eligible = [w for w in compacts if w <= batch_id]
    w = max(eligible, default=0)
    out = [compacts[w]] if eligible else []
    cur = w
    while True:
        nxt = [(lo, hi) for (lo, hi) in deltas if lo == cur and hi <= batch_id]
        if not nxt:
            return out, cur
        lo, hi = max(nxt, key=lambda b: b[1])
        out.append(deltas[(lo, hi)])
        cur = hi


def watermark(root: str, batch_id: int) -> int:
    """Largest valid compact watermark <= batch_id (0 if none)."""
    compacts, _, _ = _scan(root)
    eligible = [w for w in compacts if w <= batch_id]
    return max(eligible, default=0)


def state_paths(root: str, batch_id: int) -> list[str]:
    """The read set for batch ``batch_id``: the best compacted snapshot,
    its delta chain, then the batch dirs above the cover (module doc)."""
    compacts, batches, deltas = _scan(root)
    out, cover = _chain(compacts, deltas, batch_id)
    out.extend(p for i, p in sorted(batches.items()) if cover <= i < batch_id)
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
    _clean_torn(root, batch_id)
    compacts, batches, deltas = _scan(root)
    chain, cover = _chain(compacts, deltas, batch_id)
    eligible = [w for w in compacts if w <= batch_id]
    w = max(eligible, default=0)
    fold_batches = [p for i, p in sorted(batches.items()) if cover <= i < batch_id]
    fold_deltas = chain[1:] if eligible else chain  # chain minus the snapshot
    stale_batches = [p for i, p in batches.items() if i < cover]
    stale_deltas = [
        p for (lo, hi), p in deltas.items() if p not in chain and hi <= cover
    ]
    stale_compacts = [p for i, p in compacts.items() if eligible and i < w]
    # Note: a replay after a COMPLETED publish needs no special case —
    # compact=batch_id being valid makes cover == batch_id, the fold set
    # empty, and the folded dirs fall into the stale cleanup below.
    published = False
    if fold_batches or fold_deltas:
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
        stale_batches = [p for i, p in batches.items() if i < batch_id]
        stale_deltas = [p for (lo, hi), p in deltas.items() if hi <= batch_id]
        stale_compacts = [compacts[i] for i in compacts if i < batch_id]
    for p in stale_batches + stale_deltas + stale_compacts:
        shutil.rmtree(p, ignore_errors=True)
    return published


def compact_minor(
    spark: SparkSession,
    root: str,
    schema: str,
    batch_id: int,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> bool:
    """L1 fold: publish ``delta=<cover>-<batch_id>`` holding exactly the
    batch dirs in [cover, batch_id), then delete them. Cost is O(those
    batches), never O(total state) — the compacted snapshot and earlier
    deltas are not re-read. Same atomic publish and read-exclusion rules
    as ``compact``; ``transform`` must be the same read-equivalent
    reduction (a delta holding partially-reduced increments still reads
    correctly because readers aggregate)."""
    _clean_torn(root, batch_id)
    compacts, batches, deltas = _scan(root)
    _, cover = _chain(compacts, deltas, batch_id)
    if cover >= batch_id:
        return False  # replay after a completed publish: chain already ends here
    fold = [(i, p) for i, p in sorted(batches.items()) if cover <= i < batch_id]
    if not fold:
        return False
    try:
        df = spark.read.parquet(*[p for _, p in fold])
    except Exception:
        # every fold dir is file-less (legacy empty-batch commits)
        df = spark.read.schema(schema).parquet(*[p for _, p in fold])
    if transform is not None:
        df = transform(df)
    dest = os.path.join(root, f"delta={cover:09d}-{batch_id:09d}")
    tmp = os.path.join(root, f"{_TMP_PREFIX}d{batch_id:09d}")
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, dest)
    for _, p in fold:
        shutil.rmtree(p, ignore_errors=True)
    return True


def _clean_torn(root: str, batch_id: int) -> None:
    """Remove leftover temp dirs and markerless (torn) compact/delta
    publishes — they are unreadable by rule, and a markerless dir at this
    batch's target name would collide with the rename."""
    for n in os.listdir(root) if os.path.isdir(root) else []:
        path = os.path.join(root, n)
        if n.startswith(_TMP_PREFIX) or (
            (_COMPACT_RE.match(n) or _DELTA_RE.match(n))
            and not os.path.exists(os.path.join(path, "_SUCCESS"))
        ):
            shutil.rmtree(path, ignore_errors=True)


def maybe_compact(
    spark: SparkSession,
    root: str,
    schema: str,
    batch_id: int,
    every: int,
    major_every: int = 0,
    **kwargs,
) -> bool:
    """Per-trigger entry point (called at the START of foreach_batch,
    before the batch writes its own dirs, so a replayed batch re-folds
    the identical prefix).

    ``major_every <= 0`` (default): single-level — full fold iff at
    least ``every`` batch dirs sit above the cover. ``major_every = K``:
    leveled — ``every`` pending batch dirs fold into one L1 delta
    (O(recent)); once K deltas sit on the chain everything folds into a
    fresh snapshot (O(total state), paid 1/K as often)."""
    if every <= 0:
        return False
    compacts, batches, deltas = _scan(root)
    chain, cover = _chain(compacts, deltas, batch_id)
    pending = sum(1 for i in batches if cover <= i < batch_id)
    if pending < every:
        return False
    if major_every <= 0:
        return compact(spark, root, schema, batch_id, **kwargs)
    n_deltas = len(chain) - (1 if any(w <= batch_id for w in compacts) else 0)
    if n_deltas + 1 >= major_every:
        # this fold would make the chain major_every long — fold it all
        return compact(spark, root, schema, batch_id, **kwargs)
    return compact_minor(
        spark, root, schema, batch_id, transform=kwargs.get("transform")
    )


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
    compacts, _, _ = _scan(root)
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
    """Metadata-size observability: {'compact': n, 'delta': n, 'batch':
    n, 'files': n} — the quantities compaction bounds (asserted flat in
    the long-horizon bench)."""
    compacts, batches, deltas = _scan(root)
    files = 0
    for _, _, fs in os.walk(root):
        files += len(fs)
    return {
        "compact": len(compacts),
        "delta": len(deltas),
        "batch": len(batches),
        "files": files,
    }
