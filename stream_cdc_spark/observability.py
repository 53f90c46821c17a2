"""Observability: per-query execution metrics and an engine logger.

Parity surface for the reference's profiling harness
(stream_cdc/profiling/profiler.py:66-100, profile_app.py:70-140) and
logger (stream_cdc/utils/logger.py:1-82), re-expressed for Spark: instead
of cProfile around single-process functions, pull the SQL metrics Spark
already aggregates per execution (shuffle bytes, scan bytes/files, spills,
output rows) out of the SQLAppStatusStore — works headless (spark.ui
disabled), no listener registration or event-log round-trip needed, and
the numbers are the executors' own, not a driver-side sample.
"""

from __future__ import annotations

import logging
import re
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(name: str = "stream_cdc_spark", level: int = logging.INFO) -> logging.Logger:
    """Engine logger with the reference's format (utils/logger.py:24-40):
    timestamp - name - level - message, single stream handler, no
    propagation doubling."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_LOG_FORMAT))
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(level)
    return logger


# SQL metric values arrive human-formatted ("26.5 KiB", "1,000",
# "1.0 s (0 ms, 2 ms, 5 ms)"); normalize to plain numbers (bytes / ms / count).
_SIZE = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}
_TIME = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}


def parse_metric_value(raw: str) -> float | None:
    head = raw.strip().split("(")[0].strip().replace(",", "")
    m = re.match(r"^(-?[0-9.]+)\s*([A-Za-z]*)$", head)
    if not m:
        return None
    num, unit = float(m.group(1)), m.group(2)
    if unit in _SIZE:
        return num * _SIZE[unit]
    if unit in _TIME:
        return num * _TIME[unit]
    return num if unit == "" else None


# metric display name -> output key; values summed over all plan nodes of
# every execution the measured action spawned
_CAPTURE = {
    "shuffle bytes written": "shuffle_bytes",
    "shuffle records written": "shuffle_records",
    "size of files read": "scan_bytes",
    "number of files read": "files_read",
    "spill size": "spill_bytes",
    "number of output rows": "operator_rows",
}


@dataclass
class QueryMetrics:
    name: str
    wall_s: float
    result_rows: int
    executions: int
    sums: dict[str, float] = field(default_factory=dict)

    def as_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "wall_s": round(self.wall_s, 3),
            "result_rows": self.result_rows,
            "executions": self.executions,
        }
        for k, v in sorted(self.sums.items()):
            out[k] = int(v)
        return out


class QueryMetricsCollector:
    """Measure a DataFrame action and attribute Spark's own SQL metrics to
    it: wall time, result rows, and summed shuffle/scan/spill counters for
    every SQL execution the action triggered."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._store = spark._jsparkSession.sharedState().statusStore()

    def _latest_execution_id(self) -> int:
        execs = self._store.executionsList()
        n = execs.size()
        return int(execs.apply(n - 1).executionId()) if n else -1

    def _metrics_between(self, lo: int, hi: int) -> tuple[dict[str, float], int]:
        sums: dict[str, float] = {}
        count = 0
        execs = self._store.executionsList()
        for i in range(execs.size()):
            e = execs.apply(i)
            eid = int(e.executionId())
            if not (lo < eid <= hi):
                continue
            count += 1
            values = self._store.executionMetrics(eid)
            mets = e.metrics()
            it = mets.iterator()
            while it.hasNext():
                m = it.next()
                key = _CAPTURE.get(m.name())
                if key is None:
                    continue
                opt = values.get(m.accumulatorId())
                if not opt.isDefined():
                    continue
                v = parse_metric_value(str(opt.get()))
                if v is not None:
                    sums[key] = sums.get(key, 0.0) + v
        return sums, count

    def measure(self, name: str, df: DataFrame) -> QueryMetrics:
        before = self._latest_execution_id()
        t0 = time.perf_counter()
        rows = df.collect()
        wall = time.perf_counter() - t0
        after = self._latest_execution_id()
        sums, count = self._metrics_between(before, after)
        return QueryMetrics(
            name=name,
            wall_s=wall,
            result_rows=len(rows),
            executions=count,
            sums=sums,
        )
