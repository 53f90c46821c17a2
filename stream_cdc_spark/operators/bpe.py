"""Subword (BPE) tokenizer application — exact token counts/ids from a
learned merge table, as pure JVM expressions.

Every token-denominated operator in the engine (text.token_count,
text.chunk_documents, packing.pack_sequences) counts whitespace/regex
tokens by default; a training-data pipeline budgets in SUBWORD tokens.
This module applies a byte-pair-encoding merge table so those budgets
are exact — and it does so without any Python in the data path: the
token sequence is carried as a delimiter-encoded string and each merge
is one substring ``replace``, so the whole tokenizer is a chain of
codegen'd string expressions (narrow, zero shuffle, scan-bandwidth).

Encoding (the delimiter trick that makes merges anchored):

    lower(text) -> non-letters collapsed to ' ' -> each letter wrapped
    as ``_c_``, so a word renders as ``_t__h__e_``: token boundaries
    inside a word are ``__`` (double), word edges are ``_`` (single),
    words are separated by a space that no merge pattern contains.

    Merge (l, r) is then the plain substring replacement
    ``_l__r_`` -> ``_lr_``: the single ``_`` on each flank anchors l and
    r to whole tokens (an inner ``__`` boundary can never half-match),
    and left-to-right non-overlapping replace() — identical semantics in
    Spark and DuckDB — is exactly BPE's merge-all-occurrences step.

Merges apply IN RANK ORDER, each exhaustively (subword-nmt style
re-pair application). For a well-formed table — each rule's operands
are single characters or the results of strictly earlier rules, and no
two rules produce the same string (any table produced by BPE training
satisfies both) — this yields the same segmentation as the classic
lowest-rank-pair-first encoder, because once rule k has been applied
exhaustively no later rule can manufacture a new (l_k, r_k) adjacency.

Token count falls out of the encoding for free: a word of k tokens
carries exactly 2k ``_`` characters, so

    n_tokens = (length(s) - length(replace(s, '_', ''))) / 2

The DuckDB oracle replays the SAME merge table with a recursive CTE
over merge ranks (``oracle_merge_values``/plans/queries.py q131) — the
match is exact, not statistical.

The reference has no text operators at all (its pipeline moves opaque
CDC envelopes — stream_cdc/processing/processor.py); this module is
part of the beyond-reference LLM-pipeline surface, next to
operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A deterministic demonstration merge table over lowercase English —
# well-formed per the module doc: operands are chars or earlier results,
# results unique. A production deployment passes its trained table in.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),      # -> th
    ("th", "e"),     # -> the
    ("i", "n"),      # -> in
    ("in", "g"),     # -> ing
    ("e", "r"),      # -> er
    ("a", "n"),      # -> an
    ("an", "d"),     # -> and
    ("o", "n"),      # -> on
    ("r", "e"),      # -> re
    ("a", "t"),      # -> at
    ("e", "n"),      # -> en
    ("o", "r"),      # -> or
    ("t", "i"),      # -> ti
    ("ti", "on"),    # -> tion
    ("s", "t"),      # -> st
    ("e", "s"),      # -> es
)


def validate_merges(merges) -> list[tuple[str, str]]:
    """Check the well-formedness contract the in-rank-order encoder
    relies on (module doc): operands are chars or earlier results,
    results unique, symbols lowercase ASCII letters only."""
    merges = [tuple(m) for m in merges]
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for i, (left, right) in enumerate(merges):
        for side in (left, right):
            if not side or not side.isascii() or not side.islower():
                raise ValueError(f"merge {i}: non-[a-z] symbol {side!r}")
            if side not in known:
                raise ValueError(
                    f"merge {i}: operand {side!r} is neither a char nor "
                    "the result of an earlier merge"
                )
        res = left + right
        if res in known:
            raise ValueError(f"merge {i}: duplicate result {res!r}")
        known.add(res)
    return merges


def bpe_string(text: Column, merges=DEFAULT_MERGES) -> Column:
    """The delimiter-encoded token sequence after all merges — the
    carrier every other expression here derives from. Pure chained
    string expressions; no UDF, no shuffle."""
    s = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(text), "[^a-z]+", " ")),
        "([a-z])",
        "_$1_",
    )
    for left, right in validate_merges(merges):
        s = F.replace(
            s, F.lit(f"_{left}__{right}_"), F.lit(f"_{left}{right}_")
        )
    return s


def bpe_token_count(text: Column, merges=DEFAULT_MERGES) -> Column:
    """Exact subword token count under the merge table (bigint)."""
    s = bpe_string(text, merges)
    return (
        (F.length(s) - F.length(F.replace(s, F.lit("_"), F.lit("")))) / 2
    ).cast("bigint")


def bpe_tokens(text: Column, merges=DEFAULT_MERGES) -> Column:
    """The subword token sequence as array<string>, in document order."""
    return F.regexp_extract_all(bpe_string(text, merges), F.lit("[a-z]+"), 0)


def vocab(merges=DEFAULT_MERGES) -> list[str]:
    """id -> token string: the 26 characters then each merge's result in
    rank order. Closed under encoding — every emitted token is a char or
    a merge result, so ids are total (no unk)."""
    return [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
        left + right for left, right in validate_merges(merges)
    ]


def bpe_token_ids(text: Column, merges=DEFAULT_MERGES) -> Column:
    """The subword token sequence as array<int> vocabulary ids."""
    pairs: list[Column] = []
    for i, tok in enumerate(vocab(merges)):
        pairs.extend((F.lit(tok), F.lit(i)))
    vmap = F.create_map(*pairs)
    return F.transform(bpe_tokens(text, merges), lambda t: vmap[t])


def bpe_token_stats(
    df: DataFrame,
    merges=DEFAULT_MERGES,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group exact BPE token accounting (q131): documents, total /
    max subword tokens — the budgeting numbers sequence packing consumes.
    One narrow projection then one aggregate (map-side combine); the
    merge chain rides the scan."""
    n = bpe_token_count(F.col(text_col), merges)
    return (
        df.select(F.col(group_col).alias("grp"), n.alias("n_bpe"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.max("n_bpe").cast("bigint").alias("max_bpe_tokens"),
        )
        .withColumnRenamed("grp", group_col)
    )


def train_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table FROM the corpus: ``n_merges`` iterations
    of (count adjacent token pairs) -> (merge the most frequent pair
    everywhere), the classic BPE training loop — distributed.

    Each iteration is ONE map-side-combined aggregate over the corpus:
    the token sequence is carried in the same delimiter-encoded string
    as ``bpe_string`` (so "apply the merges so far" is the chained
    replaces, all codegen), adjacent within-word pairs are derived by
    pure array expressions (split on the word separator, then a sliding
    zip — no pairs across words), and only (pair, count) rows ever
    shuffle. The driver pulls exactly ONE row per iteration (the argmax
    pair; ties broken by pair text, so training is deterministic and
    engine-independent). Cost: n_merges corpus scans — vocabulary
    building is an offline step; the scan is the irreducible part of
    counting, and nothing here is quadratic.

    Stops early when no pair reaches ``min_count`` (merging singletons
    only memorizes the corpus). The result always satisfies
    ``validate_merges`` — operands are chars or earlier results by
    construction; a candidate whose concatenation collides with an
    existing symbol is skipped (keeps the table well-formed, see module
    doc) by excluding it from the count.
    """
    merges: list[tuple[str, str]] = []
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for _ in range(n_merges):
        s = bpe_string(F.col(text_col), merges)
        # within-word adjacent pairs: words are ' '-separated, tokens
        # inside a word are the [a-z]+ runs of its encoded form
        words = F.split(s, " ")
        toks = F.transform(
            words, lambda w: F.regexp_extract_all(w, F.lit("[a-z]+"), 0)
        )
        pairs = F.flatten(
            F.transform(
                toks,
                # sequence(1, 0) would DESCEND in Spark — guard the
                # single-token word to an empty pair list instead
                lambda t: F.when(
                    F.size(t) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - F.lit(1)),
                        lambda i: F.concat_ws(
                            " ", F.get(t, i - 1), F.get(t, i)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
        top = (
            df.select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(50)
            .collect()
        )
        picked = None
        for r in top:
            left, right = r["pair"].split(" ", 1)
            if r["c"] >= min_count and left + right not in known:
                picked = (left, right, r["c"])
                break
        if picked is None:
            break
        left, right, _ = picked
        merges.append((left, right))
        known.add(left + right)
    return validate_merges(merges)


def oracle_merge_values(merges=DEFAULT_MERGES) -> str:
    """The merge table as a SQL VALUES list ``(rank, pat, rep)`` for the
    DuckDB recursive-CTE replay (plans/queries.py q131) — the oracle
    applies the IDENTICAL patterns with the identical replace()
    semantics, so the match is exact."""
    rows = [
        f"({i}, '_{left}__{right}_', '_{left}{right}_')"
        for i, (left, right) in enumerate(validate_merges(merges))
    ]
    return ", ".join(rows)
