"""Property-based tests (hypothesis) for the pure-Python sink logic — the
invariants the SQS caps demand must hold for arbitrary payload mixes, not
just the reference's example cases."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from stream_cdc_spark.sinks.queue import (
    MAX_BATCH_SIZE,
    MAX_BATCH_SIZE_BYTES,
    MAX_MESSAGE_SIZE_BYTES,
    InMemoryQueue,
    QueueSink,
    deterministic_id,
    message_size,
    pack_entries,
    prepare_message,
)

payloads = st.lists(
    st.text(min_size=0, max_size=2000).map(lambda s: json.dumps({"v": s})),
    min_size=0,
    max_size=60,
)


@given(payloads)
@settings(max_examples=50, deadline=None)
def test_packing_never_exceeds_caps(msgs):
    entries = [e for m in msgs if (e := prepare_message(m))]
    batches = list(pack_entries(entries))
    # caps hold for every batch (sqs.py:22-29 hard limits)
    for b in batches:
        assert 1 <= len(b) <= MAX_BATCH_SIZE
        assert sum(message_size(e["MessageBody"]) for e in b) <= MAX_BATCH_SIZE_BYTES
    # nothing lost, nothing duplicated, order preserved (bodies +
    # attributes; Ids may gain a per-request uniquifying suffix for
    # repeated payloads — SQS rejects duplicate Ids in one request)
    flat = [e for b in batches for e in b]
    assert [(e["MessageBody"], e["MessageAttributes"]) for e in flat] == [
        (e["MessageBody"], e["MessageAttributes"]) for e in entries
    ]
    for orig, packed in zip(entries, flat):
        assert packed["Id"].startswith(orig["Id"][:28])
    for b in batches:
        ids = [e["Id"] for e in b]
        assert len(set(ids)) == len(ids)


@given(payloads)
@settings(max_examples=30, deadline=None)
def test_send_delivers_everything(msgs):
    q = InMemoryQueue()
    sent = QueueSink(lambda: q).send(msgs)
    assert sent == len(msgs)
    assert [m["MessageBody"] for m in q.messages] == msgs


@given(st.binary(min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_deterministic_id_is_stable_and_distinct(blob):
    s = blob.hex()
    assert deterministic_id(s) == deterministic_id(s)
    assert deterministic_id(s) != deterministic_id(s + "x")


@given(st.integers(min_value=0, max_value=3 * MAX_MESSAGE_SIZE_BYTES))
@settings(max_examples=20, deadline=None)
def test_prepared_messages_always_fit(n):
    entry = prepare_message("y" * n)
    assert entry is not None
    assert message_size(entry["MessageBody"]) <= MAX_MESSAGE_SIZE_BYTES
    if n > MAX_MESSAGE_SIZE_BYTES:
        assert entry["MessageAttributes"].get("oversized") == "true"


token_lists = st.lists(st.integers(min_value=1, max_value=2000), max_size=200)


@given(token_lists)
@settings(max_examples=200, deadline=None)
def test_greedy_fill_invariants(tokens):
    from stream_cdc_spark.operators.packing import greedy_fill

    budget = 512
    seqs = greedy_fill(tokens, budget)
    assert len(seqs) == len(tokens)
    if not tokens:
        return
    # sequence ids are 0-based, contiguous, non-decreasing (order preserved)
    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    # each sequence fits the budget unless it is a single oversize doc
    totals: dict[int, list[int]] = {}
    for s, t in zip(seqs, tokens):
        totals.setdefault(s, []).append(t)
    for members in totals.values():
        assert sum(members) <= budget or len(members) == 1
    # greedy tightness: a sequence break is only taken when forced
    for a, b in zip(range(len(tokens) - 1), range(1, len(tokens))):
        if seqs[b] == seqs[a] + 1:
            assert sum(totals[seqs[a]]) + tokens[b] > budget


@given(st.integers(min_value=0, max_value=4096))
@settings(max_examples=300, deadline=None)
def test_hash_cutoff_monotone_and_rate_exact(rate):
    """The cutoff must keep exactly `rate` of the 4096 possible 3-hex-digit
    prefixes — the property that makes sampling rates exact, not
    approximate, over a uniform hash."""
    from stream_cdc_spark.operators.sampling import hash_cutoff

    cutoff = hash_cutoff(rate)
    kept = sum(1 for v in range(4096) if format(v, "03x") < cutoff)
    assert kept == rate
