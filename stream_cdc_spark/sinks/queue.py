"""Queue sink with SQS-style packing, claim-check and failure handling.

Re-expresses the reference's sink surface (citations into /root/reference/):
  O21 batching under hard limits   stream_cdc/streams/sqs.py:149-203, :22-29
  O22 oversized-message claim-check           sqs.py:250-302
  O23 recursive batch split on overflow error sqs.py:360-373
  O24 partial-failure handling                sqs.py:318-357
  O25 per-message id + attribute stamping     sqs.py:205-234
      (fixed: deterministic sha256 id instead of ephemeral CPython id(msg))

Architecture: the packing/claim-check/split logic is plain Python executed
*inside* ``foreachBatch`` per partition — exactly where Spark wants
sink-client code. Each executor partition packs its own greedy batches and
talks to its own client instance (connection-per-partition pattern), so the
sink scales horizontally with the stream instead of serializing through a
single consumer like the reference.
"""

from __future__ import annotations

import hashlib
import json
import threading
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any

# Hard limits mirroring stream_cdc/streams/sqs.py:22-29.
MAX_BATCH_SIZE = 10
MAX_BATCH_SIZE_BYTES = 262_000
MAX_MESSAGE_SIZE_BYTES = 245_760  # 240 KB effective


class BatchRequestTooLong(Exception):
    """Sink rejected the request for total size (sqs.py:360-373 trigger)."""


class StreamError(Exception):
    """Unrecoverable sink failure (mirrors stream_cdc/utils/exceptions.py)."""


def message_size(msg: str) -> int:
    """Byte size of a serialized message (sqs.py:236-248)."""
    return len(msg.encode("utf-8"))


def deterministic_id(msg: str) -> str:
    """Deterministic message id — replaces the reference's `str(id(msg))`
    (sqs.py:214), which changes across replays and breaks consumer dedup.
    sha256 of the payload makes at-least-once redelivery idempotent."""
    return hashlib.sha256(msg.encode("utf-8")).hexdigest()


def make_oversize_reference(
    msg: str, source: str = "stream-cdc-spark", store: Any = None
) -> str | None:
    """Claim-check reference for an oversized message (sqs.py:250-302).

    Keeps routing metadata from the original envelope when it parses as
    JSON; double-fallback to a minimal stub if even the reference is too
    big (sqs.py:284-296 second-chance path).

    When a claim-check ``store`` (sinks/claimcheck.py) is provided, the
    original payload is written there FIRST and the reference carries the
    recoverable ``uri`` — the reference repo's recoverability contract
    (simple_integration_test.py:25-49). Without a store the reference
    still routes, but carries no uri (documented routing-only tier).
    """
    meta: dict[str, Any] = {}
    try:
        parsed = json.loads(msg)
        if isinstance(parsed, dict):
            meta = {
                k: parsed.get(k)
                for k in ("event_type", "database", "table")
                if k in parsed
            }
    except (json.JSONDecodeError, TypeError):
        pass
    if store is not None:
        # write-before-reference: the payload must be durable before any
        # consumer can observe a uri pointing at it
        meta["uri"] = store.put_text(msg)
    mid = deterministic_id(msg)
    ref = {
        "original_size_exceeded": True,
        "message_type": "reference",
        "message_id": mid,
        "original_size": message_size(msg),
        "source": source,
        **meta,
    }
    out = json.dumps(ref)
    if message_size(out) > MAX_MESSAGE_SIZE_BYTES:
        out = json.dumps(
            {
                "original_size_exceeded": True,
                "message_type": "reference",
                "message_id": mid,
            }
        )
        if message_size(out) > MAX_MESSAGE_SIZE_BYTES:
            return None
    return out


def prepare_message(
    msg: str, source: str = "stream-cdc-spark", store: Any = None
) -> dict[str, Any] | None:
    """Entry preparation (sqs.py:205-234): id + body + attributes; oversize
    payloads are claim-checked first (trigger points sqs.py:190-196),
    offloaded to ``store`` when one is configured."""
    body = msg
    oversized = False
    if message_size(msg) > MAX_MESSAGE_SIZE_BYTES:
        ref = make_oversize_reference(msg, source, store)
        if ref is None:
            return None
        body, oversized = ref, True
    digest = deterministic_id(body)
    entry = {
        "Id": digest[:32],
        "MessageBody": body,
        # full content hash travels as an attribute so consumer-side dedup
        # survives the per-request Id uniquification in pack_entries
        "MessageAttributes": {"source": source, "content_sha256": digest},
    }
    if oversized:
        entry["MessageAttributes"]["oversized"] = "true"
    return entry


def entry_size(entry: dict[str, Any]) -> int:
    """Size of the whole serialized entry (Id + body + attributes), matching
    the reference's sizing (sqs.py:236-248) — counting only MessageBody
    would let ~50+ B/entry of attribute overhead blow past SQS's real
    262,144-byte request limit and trigger avoidable split-retries."""
    return message_size(json.dumps(entry, sort_keys=True))


def pack_entries(
    entries: Iterable[dict[str, Any]],
    max_batch: int = MAX_BATCH_SIZE,
    max_bytes: int = MAX_BATCH_SIZE_BYTES,
) -> Iterator[list[dict[str, Any]]]:
    """Greedy size-and-count-aware packing (sqs.py:169-203): flush the
    current batch when the next entry would overflow either cap.

    Ids are uniquified *within* each request: two identical payloads (an
    at-least-once redelivery artifact) share a content hash, and real SQS
    rejects the whole request on duplicate entry Ids
    (BatchEntryIdsNotDistinct). The first occurrence keeps the bare hash
    Id; repeats get an index suffix. Consumer dedup keys on the
    content_sha256 attribute, which is identical for both copies.
    """
    def _unique_ids(batch: list[dict[str, Any]]) -> list[dict[str, Any]]:
        seen: dict[str, int] = {}
        out = []
        for e in batch:
            base = e["Id"]
            n = seen.get(base, 0)
            seen[base] = n + 1
            out.append(e if n == 0 else {**e, "Id": f"{base[:28]}-{n}"})
        return out

    batch: list[dict[str, Any]] = []
    batch_bytes = 0
    for e in entries:
        size = entry_size(e)
        if batch and (len(batch) >= max_batch or batch_bytes + size > max_bytes):
            yield _unique_ids(batch)
            batch, batch_bytes = [], 0
        batch.append(e)
        batch_bytes += size
    if batch:
        yield _unique_ids(batch)


@dataclass
class InMemoryQueue:
    """Process-local queue double for tests/demos (the LocalStack stand-in).

    Optional failure injection mirrors the reference's unit-test matrix
    (tests/unit/streams/test_sqs.py): `fail_ids` marks entries as Failed,
    `too_long_above` raises BatchRequestTooLong for big requests.
    """

    messages: list[dict[str, Any]] = field(default_factory=list)
    requests: list[int] = field(default_factory=list)
    fail_ids: set[str] = field(default_factory=set)
    too_long_above: int | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def send_message_batch(self, entries: list[dict[str, Any]]) -> dict[str, Any]:
        ids = [e["Id"] for e in entries]
        if len(set(ids)) != len(ids):
            # real SQS rejects the whole request (BatchEntryIdsNotDistinct);
            # the double must enforce it or tests can't catch redelivery dups
            raise StreamError(f"BatchEntryIdsNotDistinct: {ids}")
        total = sum(message_size(e["MessageBody"]) for e in entries)
        if self.too_long_above is not None and total > self.too_long_above:
            raise BatchRequestTooLong(f"batch of {total} bytes rejected")
        failed = [
            {"Id": e["Id"], "Code": "InternalError", "SenderFault": False}
            for e in entries
            if e["Id"] in self.fail_ids
        ]
        ok = [e for e in entries if e["Id"] not in self.fail_ids]
        with self._lock:
            self.requests.append(len(entries))
            self.messages.extend(ok)
        return {"Successful": [{"Id": e["Id"]} for e in ok], "Failed": failed}


@dataclass
class FileQueue:
    """Durable queue double backed by a directory of JSON-lines files.

    Unlike InMemoryQueue this works from executor worker *processes* (the
    real foreachPartition execution context): every send_message_batch
    writes one uniquely-named file, so concurrent partitions never contend.
    Reading back (`drain`) is for tests/verification — a real deployment
    swaps in an SQS/Kafka client with the same send_message_batch shape.
    """

    path: str = ""

    def send_message_batch(self, entries: list[dict[str, Any]]) -> dict[str, Any]:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(fname, "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")
        return {"Successful": [{"Id": e["Id"]} for e in entries], "Failed": []}

    def drain(self) -> list[dict[str, Any]]:
        import glob
        import os

        out: list[dict[str, Any]] = []
        for fname in sorted(glob.glob(os.path.join(self.path, "batch-*.jsonl"))):
            with open(fname) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    def request_sizes(self) -> list[int]:
        import glob
        import os

        sizes = []
        for fname in sorted(glob.glob(os.path.join(self.path, "batch-*.jsonl"))):
            with open(fname) as f:
                sizes.append(sum(1 for line in f if line.strip()))
        return sizes


class QueueSink:
    """Sink façade: send(messages) with packing, split-retry and partial-
    failure semantics (the reference's Stream protocol, streams/base.py:14-38).
    """

    def __init__(
        self,
        client_factory: Callable[[], Any],
        source: str = "stream-cdc-spark",
        store: Any = None,
    ):
        self._client_factory = client_factory
        self._source = source
        self._store = store

    def send(self, messages: Iterable[str]) -> int:
        client = self._client_factory()
        entries = [
            e
            for m in messages
            if (e := prepare_message(m, self._source, self._store)) is not None
        ]
        sent = 0
        for batch in pack_entries(entries):
            sent += self._send_batch(client, batch)
        return sent

    def _send_batch(self, client: Any, batch: list[dict[str, Any]]) -> int:
        """Send with recursive halving on BatchRequestTooLong (sqs.py:360-373)
        and raise-only-if-all-failed partial handling (sqs.py:318-357)."""
        try:
            resp = client.send_message_batch(batch)
        except BatchRequestTooLong:
            if len(batch) <= 1:
                raise StreamError("single message exceeds request size cap")
            mid = len(batch) // 2
            return self._send_batch(client, batch[:mid]) + self._send_batch(
                client, batch[mid:]
            )
        failed = resp.get("Failed", [])
        if failed and len(failed) == len(batch):
            raise StreamError(f"all {len(batch)} entries failed: {failed[:3]}")
        if failed:
            from stream_cdc_spark.logging_utils import get_logger

            # partial failure is tolerated (retried via redelivery) but must
            # not be silent — reference logs each failed id (sqs.py:330-341)
            get_logger().warning(
                "queue batch partial failure: %d/%d entries failed",
                len(failed),
                len(batch),
            )
        return len(batch) - len(failed)

    def close(self) -> None:  # Stream protocol parity (streams/base.py:27-38)
        pass


def foreach_batch_writer(
    client_factory: Callable[[], Any],
    payload_col: str = "payload",
    source: str = "stream-cdc-spark",
    store: Any = None,
) -> Callable:
    """Build a foreachBatch function that packs+sends each micro-batch.

    Work happens on executors via foreachPartition — the driver never
    materializes the batch. Each partition builds its own client
    (connection-per-partition; reference caches one global client,
    sqs.py:119-147, which cannot scale past one node). A claim-check
    ``store`` (sinks/claimcheck.py) makes the oversize offload durable on
    the executor that hits it.
    """

    def _write(batch_df, batch_id: int) -> None:
        sink = QueueSink(client_factory, source, store)

        def _part(rows) -> None:
            sink.send(r[payload_col] for r in rows)

        batch_df.select(payload_col).foreachPartition(_part)

    return _write
