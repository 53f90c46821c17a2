"""Subword (BPE) tokenizer application (operators/bpe.py): exact merge
semantics by hand-computed example, table validation, and the wiring
into chunking and sequence packing (budget compliance in BPE units)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators import bpe
from stream_cdc_spark.operators.packing import pack_sequences, sequence_stats
from stream_cdc_spark.operators.text import chunk_documents, token_count


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id bigint, text string")


def test_hand_computed_merge_sequence(spark):
    """'the cat and the hat' under the default table: th+e -> the,
    a+t -> at, a+n then an+d -> and. Tokens: [the, c, at, and, the,
    h, at] = 7."""
    row = (
        _one(spark, "The Cat! and THE hat")
        .select(
            bpe.bpe_tokens(F.col("text")).alias("t"),
            bpe.bpe_token_count(F.col("text")).alias("n"),
            token_count(F.col("text"), tokenizer="bpe").alias("n2"),
        )
        .first()
    )
    assert row["t"] == ["the", "c", "at", "and", "the", "h", "at"]
    assert row["n"] == 7 == row["n2"]


def test_merges_apply_in_rank_order_all_occurrences(spark):
    """'tttt' with merge (t,t): replace is left-to-right non-overlapping,
    so [t,t,t,t] -> [tt,tt] — the BPE merge-all step, not a single
    substitution."""
    merges = [("t", "t")]
    row = _one(spark, "tttt").select(
        bpe.bpe_tokens(F.col("text"), merges).alias("t")
    ).first()
    assert row["t"] == ["tt", "tt"]


def test_token_ids_are_total_and_invertible(spark):
    """Every emitted token is a char or a merge result, so ids never
    null, and vocab[id] round-trips the token string."""
    voc = bpe.vocab()
    rows = (
        _one(spark, "the quick brown fox jumps over the lazy dog 123!")
        .select(
            bpe.bpe_tokens(F.col("text")).alias("t"),
            bpe.bpe_token_ids(F.col("text")).alias("i"),
        )
        .first()
    )
    assert None not in rows["i"]
    assert [voc[i] for i in rows["i"]] == rows["t"]


def test_validate_merges_rejects_malformed_tables():
    with pytest.raises(ValueError, match="neither a char nor"):
        bpe.validate_merges([("th", "e")])  # 'th' never produced
    with pytest.raises(ValueError, match="duplicate result"):
        bpe.validate_merges([("a", "b"), ("a", "b")])
    with pytest.raises(ValueError, match="non-\\[a-z\\]"):
        bpe.validate_merges([("a", "B")])
    # well-formed: operands are chars or strictly earlier results
    assert bpe.validate_merges([("a", "b"), ("ab", "c")]) == [
        ("a", "b"),
        ("ab", "c"),
    ]


def test_chunk_documents_bpe_mode_budgets_in_subword_tokens(spark):
    """Chunk windows must be sized in BPE tokens: every chunk's n_tok is
    <= chunk_tokens, boundaries follow the stride over the SUBWORD
    sequence, and re-counting each chunk_text's space-joined tokens
    agrees with n_tok."""
    text = " ".join(["the cat and the hat sat on a mat"] * 10)
    chunks = chunk_documents(
        _one(spark, text), chunk_tokens=16, overlap=4, tokenizer="bpe"
    ).orderBy("chunk_idx")
    rows = chunks.collect()
    n_bpe = (
        _one(spark, text)
        .select(bpe.bpe_token_count(F.col("text")).alias("n"))
        .first()["n"]
    )
    assert all(r["n_tok"] <= 16 for r in rows)
    stride = 16 - 4
    # chunk i starts at i*stride: window sizes reconstruct the corpus
    assert rows[0]["n_tok"] == 16
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    assert (len(rows) - 1) * stride < n_bpe <= (len(rows) - 1) * stride + 16
    # chunk_text is the window's token sequence, space-joined
    assert all(
        len(r["chunk_text"].split(" ")) == r["n_tok"] for r in rows
    )


def test_pack_sequences_budget_compliance_under_bpe_counts(spark):
    """The packing integration: count documents in exact BPE tokens,
    pack to a budget, and every packed training sequence must respect it
    (a doc alone may exceed — the documented oversize rule)."""
    from stream_cdc_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select(
        "doc_id", bpe.bpe_token_count(F.col("text")).alias("n_bpe")
    )
    budget = 600
    packed = pack_sequences(docs, "n_bpe", budget=budget, n_shards=4)
    stats = sequence_stats(packed, "n_bpe")
    bad = stats.filter(
        (F.col("total_tokens") > budget) & (F.col("n_docs") > 1)
    ).count()
    assert bad == 0
    # nothing lost: packed docs and token mass equal the input exactly
    total_in = docs.agg(F.sum("n_bpe")).first()[0]
    assert stats.agg(F.sum("total_tokens")).first()[0] == total_in
    assert packed.count() == docs.count()


def _py_train(texts, n_merges, min_count=2):
    """Reference BPE trainer: same spec as bpe.train_merges (count
    within-word adjacent pairs under merges-so-far, merge the argmax,
    count desc then pair text asc, skip result collisions)."""
    import re

    merges = []
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}

    def encode(word):
        toks = list(word)
        for left, right in merges:
            out = []
            i = 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == left
                    and toks[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    words = []
    for t in texts:
        words += [w for w in re.sub("[^a-z]+", " ", t.lower()).split() if w]
    for _ in range(n_merges):
        counts = {}
        for w in words:
            toks = encode(w)
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        picked = None
        for (a, b), c in ranked:
            if c >= min_count and a + b not in known:
                picked = (a, b)
                break
        if picked is None:
            break
        merges.append(picked)
        known.add(picked[0] + picked[1])
    return merges


def test_train_merges_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat with the hat",
        "the bat and the rat ran at the cat",
        "thin thick things think that the moth",
        "standing understanding outstanding stands",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe.train_merges(df, n_merges=8)
    want = _py_train(texts, 8)
    assert got == want
    # learned table is well-formed and actually compresses the corpus
    base = df.select(
        F.sum(bpe.bpe_token_count(F.col("text"), [])).alias("n")
    ).first()["n"]
    trained = df.select(
        F.sum(bpe.bpe_token_count(F.col("text"), got)).alias("n")
    ).first()["n"]
    assert trained < base
    assert bpe.validate_merges(got) == got


def test_train_merges_stops_when_pairs_go_rare(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    # every pair occurs once < min_count=2 -> no merges learned
    assert bpe.train_merges(df, n_merges=5, min_count=2) == []
    # with min_count=1 it learns something, deterministically
    got = bpe.train_merges(df, n_merges=2, min_count=1)
    assert got == _py_train(["ab cd ef"], 2, min_count=1)
