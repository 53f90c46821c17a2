"""Custom streaming CDC source via the Spark 4 Python DataSource API.

This is the engine's parity implementation of the reference's datasource
surface (citations into /root/reference/):
  O1 CDC source scan      MySQLDataSource.listen(), mysql.py:367-402
  O4 offset tracking      GtidEvent -> current_position, mysql.py:380-384
  O5 offset seek/resume   set_start_position / auto_position, mysql.py:453-460
  O6 classification       _get_event_type, mysql.py:344-352
  O8 envelope projection  _create_event_dict, mysql.py:416-426
  O28 registry            format("cdc_replay") via spark.dataSource.register

Instead of tailing a MySQL socket (inherently single-consumer), the source
replays an append-only event log (the driver's events parquet) as CDC
envelopes. Offsets are {"seq": N} — the GTID-transaction-number analogue —
so checkpoint/resume semantics match the reference exactly: resume starts
after the last committed seq, and `startingSeq` is `set_start_position`.

Scale design: `partitions()` splits each micro-batch's seq range into
`readPartitions` slices; every slice is read executor-side via pyarrow
with a predicate-pushdown filter, so a batch fans out across the cluster
instead of funneling through one generator like the reference.
"""

from __future__ import annotations

import json
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ENVELOPE_DDL = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("gtid", StringType(), False),
        StructField("database", StringType(), False),
        StructField("table", StringType(), False),
        StructField("content", StringType(), True),  # serialized row image (O10)
        StructField("seq", LongType(), False),
    ]
)

# Stable stand-in for the source server uuid in GTIDs ("<uuid>:<txno>").
SERVER_UUID = str(_uuid.uuid5(_uuid.NAMESPACE_URL, "stream-cdc-spark"))

# event_type label -> binlog-style op classification (O6): the fixture's
# event stream maps onto CDC ops deterministically.
_OP_MAP = {"signup": "Insert", "purchase": "Insert", "click": "Update",
           "view": "Update", "error": "Delete"}


@dataclass
class _SeqRange(InputPartition):
    path: str
    start: int
    end: int


def validate_settings(options: dict) -> dict:
    """Fail-fast settings validation before streaming starts — the parity
    of the reference's MySQLSettingsValidator (O2, mysql.py:24-128): wrong
    source configuration must error at connect time, not mid-stream."""
    import os

    errors = []
    path = options.get("path")
    if not path:
        errors.append("required option 'path' is missing")
    elif not os.path.exists(path):
        errors.append(f"path does not exist: {path!r}")
    for key, lo in (("batchEvents", 1), ("readPartitions", 1), ("startingSeq", 0)):
        raw = options.get(key)
        if raw is not None:
            try:
                if int(raw) < lo:
                    errors.append(f"option {key!r} must be >= {lo}, got {raw}")
            except ValueError:
                errors.append(f"option {key!r} must be an integer, got {raw!r}")
    if errors:
        raise ValueError("cdc_replay settings invalid: " + "; ".join(errors))
    return options


class CdcReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        validate_settings(options)
        self.path = options["path"]
        self.batch_events = int(options.get("batchEvents", "10000"))
        self.start_seq = int(options.get("startingSeq", "0"))
        self.read_partitions = int(options.get("readPartitions", "4"))
        self._max_seq: int | None = None
        # High-water mark of offsets this reader has handed to Spark; the
        # rate limit advances from here (NOT in partitions() — whatever
        # latestOffset returns gets committed, so clamping later would
        # silently skip the clamped-off range).
        self._current: int | None = None

    # -- offset protocol (O4/O5 analogue; driver-side, tiny) ----------------

    def _max_event_seq(self) -> int:
        # Re-read on every call: the log is append-only, so a cached max
        # would make rows appended after reader construction invisible to
        # latestOffset forever. The read is footer statistics + one column
        # of the driver-side file — cheap relative to a micro-batch.
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(self.path, columns=["event_id"])
        self._max_seq = int(pc.max(t.column("event_id")).as_py()) + 1 if t.num_rows else 0
        return self._max_seq

    def initialOffset(self) -> dict:
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        # Rate limit: advance at most batch_events per micro-batch (the
        # reference's BATCH_SIZE pull cap, coordinator.py:244-264).
        base = self._current if self._current is not None else self.start_seq
        self._current = min(base + self.batch_events, self._max_event_seq())
        return {"seq": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        # Restart path: Spark replays [committed, end) from its offset log;
        # fast-forward the rate-limit high-water mark past it.
        self._current = max(self._current or 0, hi)
        hi = max(hi, lo)
        if hi == lo:
            return [_SeqRange(self.path, lo, lo)]
        n = min(self.read_partitions, max(1, hi - lo))
        step = (hi - lo + n - 1) // n
        return [
            _SeqRange(self.path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def commit(self, end: dict) -> None:
        # Offset durability is Spark's commit log (the reference's
        # save_state equivalent, coordinator.py:110-159).
        self._current = max(self._current or 0, end["seq"])

    # -- partition read (executor-side) ------------------------------------

    def read(self, partition: _SeqRange):
        import pyarrow.parquet as pq

        if partition.end <= partition.start:
            return
        t = pq.read_table(
            partition.path,
            filters=[
                ("event_id", ">=", partition.start),
                ("event_id", "<", partition.end),
            ],
        )
        cols = t.to_pydict()
        for i in range(t.num_rows):
            etype = cols["event_type"][i]
            seq = int(cols["event_id"][i])
            content = json.dumps(
                {
                    "after": {
                        "event_id": str(seq),
                        "user_id": str(cols["user_id"][i]),
                        "event_type": str(etype),
                        "value": str(cols["value"][i]),
                        "props": str(cols["props"][i]),
                    }
                }
            )
            yield (
                _OP_MAP.get(etype, "Insert"),
                f"{SERVER_UUID}:{seq}",
                "testdata",
                "events",
                content,
                seq,
            )


class CdcReplayDataSource(DataSource):
    """format("cdc_replay") — registry entry (O28 parity)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_replay"

    def schema(self) -> StructType:
        return ENVELOPE_DDL

    def streamReader(self, schema: StructType) -> CdcReplayStreamReader:
        return CdcReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdcReplayDataSource)
