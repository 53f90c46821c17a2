"""CDC log compaction and keyed last-position operators.

Reference semantics (citations into /root/reference/):
  - at-least-once delivery means consumers see duplicates and stale images;
    the canonical consumer computes "latest image per key"
    (coordinator flush barrier: stream_cdc/processing/coordinator.py:281-303)
  - checkpoint write-dedup keeps the last position per (type, source) key
    (stream_cdc/processing/coordinator.py:137-141, state/dynamodb.py:76-91)

Scale notes: latest-per-key is a single hash-shuffle on the key. Two
physical strategies:
  * window row_number + filter  — one shuffle, state = one row per key in
    the sort; what Catalyst picks for `latest_per_key`.
  * max_by aggregation          — one shuffle with map-side partial
    aggregation; strictly better when the payload is small, used by
    `last_position_per_key`. At 100 TB the partial-agg variant avoids
    sorting entire partitions, so prefer it when only a few columns are
    needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, desc: bool = True
) -> DataFrame:
    """Keep the newest row per key (CDC log compaction).

    Equivalent to `ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_col
    DESC) = 1`. One shuffle on `keys`; AQE handles skewed keys.
    """
    ordering = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def last_position_per_key(
    df: DataFrame, keys: Sequence[str], position_col: str
) -> DataFrame:
    """Last checkpoint position per key + event count.

    Reference: StateCheckpointManager.save_state keeps only the newest
    position per (type, source) (coordinator.py:110-159). Partial-agg
    friendly: max/count combine map-side before the shuffle.
    """
    return df.groupBy(*keys).agg(
        F.max(position_col).alias("last_" + position_col),
        F.count(F.lit(1)).alias("n_events"),
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    snapshot_key: str,
    change_key: str,
    seq_col: str,
    op_col: str,
    delete_label: str = "Delete",
) -> DataFrame:
    """MERGE-style CDC apply: fold a change log into a snapshot.

    Semantics (the consumer contract implied by the reference's
    at-least-once envelope stream, coordinator.py:281-303):
      - compact the log to the latest change per key (duplicates from
        redelivery collapse here, making the apply idempotent);
      - keys whose latest op is `delete_label` are removed;
      - all other keys keep their snapshot row, annotated with the latest
        sequence number (`last_<seq_col>`, NULL when never changed).

    Plan shape: one shuffle to compact the log, then a single left join
    against the snapshot (broadcast when the compacted log is small —
    typical for incremental batches). Equivalent to Delta/Iceberg MERGE
    for this envelope, expressed over plain DataFrames.
    """
    latest = latest_per_key(changes, [change_key], seq_col).select(
        F.col(change_key).alias("__k"),
        F.col(seq_col).alias(f"last_{seq_col}"),
        F.col(op_col).alias("__op"),
    )
    joined = snapshot.join(
        F.broadcast(latest), snapshot[snapshot_key] == F.col("__k"), "left"
    )
    return joined.filter(
        F.col("__op").isNull() | (F.col("__op") != delete_label)
    ).drop("__k", "__op")


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """At-least-once consumer dedup: suppress redelivered duplicates by
    deterministic id (fixes the reference's ephemeral `Id=str(id(msg))`,
    stream_cdc/streams/sqs.py:205-234). Hash-shuffle on keys; map-side
    combine makes redelivery storms cheap."""
    return df.dropDuplicates(list(keys))


def snapshot_as_of(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    order_col: str,
    as_of,
    op_col: str = "event_type",
    delete_label: str = "Delete",
) -> DataFrame:
    """Point-in-time snapshot reconstruction from a CDC change log: the
    state of the keyed table as of timestamp ``as_of``.

    Semantics: restrict the log to rows with ts <= as_of (partition-
    prunable predicate — at 100 TB the log is ts-partitioned and this is
    the pruning filter), compact to the latest row per key ordered by
    (ts, order_col) — order_col breaks same-timestamp ties exactly as the
    reference's monotonically increasing GTID does
    (stream_cdc/datasources/mysql.py:380-384) — then drop keys whose
    latest op is ``delete_label``. This is the time-travel read a CDC
    consumer materializes from the envelope stream; Delta calls it
    VERSION AS OF, re-expressed over a plain event-envelope table.

    One shuffle (the per-key compaction window); the as_of filter reaches
    the parquet scan.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col).desc(), F.col(order_col).desc()
    )
    return (
        changes.filter(F.col(ts_col) <= F.lit(as_of))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_label)
        .drop("__rn")
    )
