"""Token-budget sequence packing for LLM training pipelines.

Training examples are fixed-length token sequences; short documents are
concatenated ("packed") until the next one would overflow the budget.
Packing is inherently order-dependent — a greedy scan with carried state —
so it cannot be a pure window expression. The scale design splits it:

  1. Shard deterministically (doc_id % n_shards): a narrow, shuffle-keyed
     partition step. Shards are independent, so a 100 TB corpus packs in
     parallel across executors; n_shards controls the parallelism/
     fragmentation trade-off (each shard wastes < budget tokens at its
     tail).
  2. Pack each shard with `applyInPandas` (Arrow-batched, numpy-backed):
     the per-shard greedy fill is the sequential part, and it touches two
     int64 arrays — no strings, no per-row Python objects. This is the
     documented (b)-path for operators Spark's relational algebra cannot
     express (SURVEY §2: custom stateful operators).

Determinism: shard assignment and in-shard order (doc_id) are content-
derived, so the packing is reproducible run-to-run and verifiable by a
DuckDB recursive-CTE oracle (plans/queries.py q82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_fill(tokens, budget: int):
    """Greedy sequence assignment for one shard (doc order fixed by the
    caller). A document larger than the budget gets a sequence of its own.
    Returns (seq_no list, running-total list)."""
    seq, cur = 0, 0
    seqs = []
    for t in tokens:
        t = int(t)
        if cur > 0 and cur + t > budget:
            seq += 1
            cur = 0
        cur += t
        seqs.append(seq)
    return seqs


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign (shard, seq_no) to every document.

    Output schema: id_col bigint, shard bigint, seq_no bigint, tokens
    bigint. The shuffle is one hash partition on the shard key; each shard
    sorts locally by id (bounded by shard size, not corpus size).
    """
    import pandas as pd  # noqa: F401 — applyInPandas contract

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort")
        pdf = pdf.assign(seq_no=greedy_fill(pdf[token_col].to_numpy(), budget))
        return pdf[[id_col, "shard", "seq_no", token_col]]

    sharded = df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint").alias("shard"),
        F.col(token_col).cast("bigint").alias(token_col),
    )
    return sharded.groupBy("shard").applyInPandas(
        pack,
        schema=f"{id_col} bigint, shard bigint, seq_no bigint, {token_col} bigint",
    )


def sequence_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Roll packed documents up to one row per training sequence."""
    return packed.groupBy("shard", "seq_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("total_tokens"),
    )
