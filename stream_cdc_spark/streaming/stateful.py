"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only stateful construct is the offset checkpoint (O18-O20);
Spark's arbitrary-stateful API generalizes it: per-key state evolves across
micro-batches with exactly-once semantics from the checkpoint. Two
operators:

  position_tracker — per-key high-water mark + event count: the streaming
    generalization of the reference's (type, source) -> position record
    (stream_cdc/state/dynamodb.py:76-91), keyed arbitrarily and scaled
    across executors instead of one DynamoDB writer.

  session_tracker — per-key session accounting with an inactivity gap (the
    stateful twin of plans q31): emits running session counts as events
    arrive.

State is Arrow-transferred pandas per key-batch; at 100 TB keys shard
across executors and the state store should be RocksDB
(spark.sql.streaming.stateStore.providerClass) so state >> heap works.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

POSITION_OUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("last_seq", LongType(), True),
        StructField("n_events", LongType(), False),
    ]
)
POSITION_STATE = StructType(
    [
        StructField("last_seq", LongType(), True),
        StructField("n_events", LongType(), False),
    ]
)


def _track_position(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_seq, n_events = state.get
    else:
        last_seq, n_events = None, 0
    for pdf in pdfs:
        if len(pdf):
            batch_max = int(pdf["seq"].max())
            last_seq = batch_max if last_seq is None else max(last_seq, batch_max)
            n_events += len(pdf)
    state.update((last_seq, n_events))
    yield pd.DataFrame(
        {"key": [key[0]], "last_seq": [last_seq], "n_events": [n_events]}
    )


def position_tracker(
    envelopes: DataFrame, key_col: str = "event_type", seq_col: str = "seq"
) -> DataFrame:
    """Streaming per-key position high-water mark + count (update mode)."""
    keyed = envelopes.selectExpr(f"{key_col} AS key", f"{seq_col} AS seq")
    return keyed.groupBy("key").applyInPandasWithState(
        _track_position,
        outputStructType=POSITION_OUT,
        stateStructType=POSITION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)
SESSION_STATE = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _track_sessions(gap_us: int):
    def inner(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts_us, n_sessions, n_events = state.get
        else:
            last_ts_us, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts_us")
            for ts in pdf["ts_us"].astype("int64"):
                if last_ts_us is None or ts - last_ts_us > gap_us:
                    n_sessions += 1
                last_ts_us = int(ts)
                n_events += 1
        state.update((last_ts_us, n_sessions, n_events))
        yield pd.DataFrame(
            {"key": [str(key[0])], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return inner


def session_tracker(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization with an inactivity gap: the stateful twin
    of the batch q31 (same decision function over the same inputs)."""
    keyed = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"unix_micros({ts_col}) AS ts_us"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _track_sessions(gap_seconds * 1_000_000),
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
