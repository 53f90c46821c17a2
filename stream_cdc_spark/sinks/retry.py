"""Retry with exponential backoff + jitter — sink/source client resilience.

Reference O3 (stream_cdc/datasources/mysql.py:279-332): 5 attempts,
exponential backoff (factor 2) with jitter, distinguishing retriable from
fatal errors. In the Spark engine, *task-level* retries are built in; this
helper exists for client-level transient errors inside foreachBatch (e.g.
throttling), where failing the whole task for a 429 would be wasteful.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class TransientError(Exception):
    """Marker for errors worth retrying (throttle, transient network)."""


def with_retries(
    fn: Callable[[], T],
    attempts: int = 5,
    base_delay: float = 0.1,
    factor: float = 2.0,
    max_delay: float = 5.0,
    jitter: float = 0.1,
    retriable: tuple[type[BaseException], ...] = (TransientError,),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run fn; on a retriable error back off (base * factor^i + jitter,
    capped) and try again, up to `attempts` total tries. Mirrors the
    reference's connect loop (mysql.py:287-323)."""
    last: BaseException | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except retriable as e:
            last = e
            if attempt == attempts - 1:
                break
            delay = min(base_delay * (factor**attempt), max_delay)
            sleep(delay + random.uniform(0, jitter * delay))
    raise last  # type: ignore[misc]
