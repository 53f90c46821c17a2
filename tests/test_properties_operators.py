"""Property-based tests (hypothesis) for round-4 operators: randomized
inputs through a shared Spark session, invariants checked against pure
Python references. Spark job submission per example is expensive, so
examples are capped and deadlines disabled."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window, functions as F

from stream_cdc_spark.operators.prefixsum import distributed_prefix_sum
from stream_cdc_spark.operators.text import chunk_documents

word = st.text(
    alphabet="abcdefgh", min_size=1, max_size=4
)
docs_strategy = st.lists(
    st.lists(word, min_size=1, max_size=40).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy, chunk=st.integers(2, 12), overlap=st.integers(0, 5))
def test_chunks_reconstruct_documents(spark, texts, chunk, overlap):
    """Dropping each chunk's leading overlap (except chunk 0) and
    concatenating in order must reproduce the document exactly — no token
    lost, duplicated, or reordered, for any (chunk, overlap) config."""
    if overlap >= chunk:
        return
    stride = chunk - overlap
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    rows = chunk_documents(df, chunk, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"])
        )
    for i, text in enumerate(texts):
        parts = [t for _, t in sorted(by_doc[i])]
        toks: list[str] = []
        for j, p in enumerate(parts):
            ptoks = p.split(" ") if p else []
            toks.extend(ptoks if j == 0 else ptoks[overlap:])
        # trailing chunks shorter than overlap contribute nothing new
        assert toks[: len(text.split(" "))] == text.split(" ")
        assert len(toks) == len(text.split(" ")), (chunk, overlap, text)
        # no chunk exceeds the window, and none is empty
        for _, p in sorted(by_doc[i]):
            assert 1 <= len(p.split(" ")) <= chunk


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-5, 5)),
        min_size=1,
        max_size=60,
    ),
    buckets=st.integers(2, 9),
)
def test_prefix_sum_matches_reference(spark, vals, buckets):
    """Random (key, value) pairs with ties: the bucketed prefix sum must
    equal the SQL RANGE-frame running total computed in Python."""
    df = spark.createDataFrame(vals, "k int, v int")
    got = {}
    for r in distributed_prefix_sum(df, "k", "v", "rs", buckets).collect():
        got.setdefault(r["k"], set()).add(r["rs"])
    # RANGE semantics: all rows of key k share one value = sum of v over
    # keys <= k
    import collections

    per_key = collections.defaultdict(int)
    for k, v in vals:
        per_key[k] += v
    running = 0
    want = {}
    for k in sorted(per_key):
        running += per_key[k]
        want[k] = running
    assert {k: s.pop() for k, s in got.items() if len(s) == 1} == want
    assert all(len(s) <= 1 for s in got.values())
