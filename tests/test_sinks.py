"""Queue-sink packing tests mirroring the reference's unit-test matrix
(tests/unit/streams/test_sqs.py in /root/reference/): batch split at 10,
size-driven splitting, oversize claim-check, BatchRequestTooLong recovery,
partial/total failure, deterministic ids."""

from __future__ import annotations

import json

import pytest

from stream_cdc_spark.sinks.queue import (
    MAX_MESSAGE_SIZE_BYTES,
    BatchRequestTooLong,
    InMemoryQueue,
    QueueSink,
    StreamError,
    deterministic_id,
    make_oversize_reference,
    pack_entries,
    prepare_message,
)


def _entries(n, body="x"):
    return [prepare_message(json.dumps({"i": i, "b": body})) for i in range(n)]


def test_batch_split_at_10():
    # 15 messages -> batches of 10 + 5 (reference test_sqs.py:200-217)
    batches = list(pack_entries(_entries(15)))
    assert [len(b) for b in batches] == [10, 5]


def test_size_driven_split():
    big = "y" * 100_000
    batches = list(pack_entries(_entries(5, big)))  # ~100KB each, 262KB cap
    assert [len(b) for b in batches] == [2, 2, 1]


def test_oversize_claim_check():
    msg = json.dumps({"event_type": "Insert", "table": "t", "blob": "z" * 300_000})
    entry = prepare_message(msg)
    assert entry["MessageAttributes"]["oversized"] == "true"
    body = json.loads(entry["MessageBody"])
    assert body["original_size_exceeded"] is True
    assert body["message_type"] == "reference"
    assert body["event_type"] == "Insert"  # routing metadata preserved
    assert body["original_size"] > MAX_MESSAGE_SIZE_BYTES


def test_under_threshold_not_claim_checked():
    msg = json.dumps({"blob": "z" * 1000})
    entry = prepare_message(msg)
    assert "oversized" not in entry["MessageAttributes"]
    assert entry["MessageBody"] == msg


def test_claim_check_boundary():
    # exactly at cap passes through; one over is claim-checked
    at = "a" * MAX_MESSAGE_SIZE_BYTES
    over = "a" * (MAX_MESSAGE_SIZE_BYTES + 1)
    assert prepare_message(at)["MessageBody"] == at
    assert json.loads(prepare_message(over)["MessageBody"])["original_size_exceeded"]


def test_non_json_oversize_still_referenced():
    ref = make_oversize_reference("not-json" * 50_000)
    assert json.loads(ref)["message_type"] == "reference"


def test_deterministic_ids_stable_across_replay():
    msg = json.dumps({"k": 1})
    assert deterministic_id(msg) == deterministic_id(msg)
    assert prepare_message(msg)["Id"] == prepare_message(msg)["Id"]


def test_recursive_split_on_too_long():
    q = InMemoryQueue(too_long_above=50_000)
    sink = QueueSink(lambda: q)
    sent = sink.send(json.dumps({"i": i, "b": "y" * 20_000}) for i in range(10))
    assert sent == 10
    assert len(q.messages) == 10
    assert max(q.requests) <= 2  # halved until under the cap


def test_partial_failure_tolerated_total_failure_raises():
    msgs = [json.dumps({"i": i}) for i in range(3)]
    ids = [prepare_message(m)["Id"] for m in msgs]
    # partial: one failed entry -> no raise, others delivered
    q = InMemoryQueue(fail_ids={ids[0]})
    assert QueueSink(lambda: q).send(msgs) == 2
    # total: all failed -> StreamError (sqs.py:342-357)
    q2 = InMemoryQueue(fail_ids=set(ids))
    with pytest.raises(StreamError):
        QueueSink(lambda: q2).send(msgs)


def test_single_oversized_request_raises():
    q = InMemoryQueue(too_long_above=10)
    with pytest.raises(StreamError):
        QueueSink(lambda: q).send([json.dumps({"b": "x" * 100})])


def test_duplicate_payloads_in_one_batch_get_distinct_ids():
    # at-least-once redelivery: identical payloads share a content hash,
    # but real SQS rejects a request with duplicate entry Ids — pack must
    # uniquify within the request while keeping content_sha256 for dedup
    msg = json.dumps({"k": "same"})
    q = InMemoryQueue()
    assert QueueSink(lambda: q).send([msg, msg, msg]) == 3
    ids = [e["Id"] for e in q.messages]
    assert len(set(ids)) == 3, ids
    hashes = {e["MessageAttributes"]["content_sha256"] for e in q.messages}
    assert len(hashes) == 1  # consumer dedup key unchanged


def test_inmemory_queue_rejects_duplicate_ids():
    e = prepare_message(json.dumps({"k": 1}))
    with pytest.raises(StreamError, match="BatchEntryIdsNotDistinct"):
        InMemoryQueue().send_message_batch([e, dict(e)])


def test_packing_counts_whole_entry_size():
    from stream_cdc_spark.sinks.queue import entry_size

    e = prepare_message(json.dumps({"k": 1}))
    overhead = entry_size(e) - len(e["MessageBody"])
    assert overhead > 40  # Id + attributes really counted
    # a batch that fits by body-bytes alone but overflows with overhead
    # must split: 262_000-cap, bodies of 26_100 B x 10 = 261_000 B fits,
    # + ~10x200 B overhead does not
    big = [prepare_message("z" * 26_100) for _ in range(10)]
    batches = list(pack_entries(big))
    assert len(batches) == 2, [len(b) for b in batches]
