"""Subword (BPE) tokenizer — exact token counts/ids from a learned
merge table, over a LETTER or BYTE alphabet, with two execution tiers.

Every token-denominated operator in the engine (text.token_count,
text.chunk_documents, packing.pack_sequences) counts whitespace/regex
tokens by default; a training-data pipeline budgets in SUBWORD tokens.
This module applies a byte-pair-encoding merge table so those budgets
are exact.

Encoding (the delimiter trick that makes merges anchored):

    The token sequence is carried as a delimiter-encoded string: each
    base symbol is wrapped ``_c_``, so a word renders as ``_t__h__e_``.
    Token boundaries inside a word are ``__`` (double), word edges are
    ``_`` (single), words are separated by a space that no merge
    pattern contains. Merge (l, r) is then the plain substring
    replacement ``_l__r_`` -> ``_lr_``: the single ``_`` on each flank
    anchors l and r to whole tokens, and left-to-right non-overlapping
    replace() — identical semantics in Spark and DuckDB — is exactly
    BPE's merge-all-occurrences step.

Alphabets:

    ``letter`` — lower(text), non-letters collapsed to ' ', symbols are
    [a-z]. Compact demos/oracles; lossy outside English letters.
    ``byte``   — GPT-2-style byte fallback: ASCII whitespace runs
    collapse to ' ' (the word separator), every other byte of the
    word's UTF-8 encoding becomes a 2-hex-digit symbol (``_68_`` for
    'h'). LOSSLESS for all non-whitespace content in any language —
    accents, CJK, emoji, digits, punctuation all survive as bytes, and
    a token's bytes are recoverable with ``bytes.fromhex``. Still pure
    ``replace`` semantics, still DuckDB-replayable (hex/encode exist in
    both engines with identical output).

Execution tiers:

    ``expr``  — one codegen'd string expression per merge, chained.
    Zero Python in the data path, narrow, scan-bandwidth — but the
    expression tree grows with |merges|, so a production-size table
    (32k merges) would blow past JVM codegen method limits long before
    it finished analyzing. Right for small/medium tables.
    ``arrow`` — one Arrow-batched pandas UDF holding the whole merge
    table as a rank dict; each batch tokenizes per DISTINCT word with
    the classic lowest-rank-pair-first encoder and a per-worker word
    cache. Cost is O(|word|·|applied merges|) per distinct word, NOT
    O(|merges|) expressions — flat in table size, so a 32k-merge
    production vocabulary is fine. Arrow transfer, no per-row Python.

    ``tier=None`` (default) auto-selects: expr up to
    ``ARROW_TIER_MIN_MERGES`` merges, arrow beyond. The two tiers are
    bit-identical (tests/test_bpe.py equality suite) because for a
    well-formed table rank-order-exhaustive application — what the
    replace chain does — equals classic lowest-rank-first: once rule k
    has been applied exhaustively, no later rule can manufacture a new
    (l_k, r_k) adjacency (later results are fresh unique symbols).

Merges apply IN RANK ORDER, each exhaustively (subword-nmt style).
Well-formed table: each rule's operands are single base symbols or the
results of strictly earlier rules, and no two rules produce the same
string — any table produced by BPE training satisfies both.

Token count falls out of the encoding for free: a word of k tokens
carries exactly 2k ``_`` characters, so

    n_tokens = (length(s) - length(replace(s, '_', ''))) / 2

The DuckDB oracle replays the SAME merge table with a recursive CTE
over merge ranks (plans/queries.py q131/q133/q134) — the match is
exact, not statistical.

Locale caveat (letter mode only): Spark's ``lower()`` delegates
non-ASCII code points to the JVM's default-locale lowercasing, while
the arrow tier uses Python's locale-independent ``str.lower()``. Under
a Turkish/Azeri default JVM locale ('I' -> dotless 'ı') the two tiers
could disagree on documents mixing 'I' with non-ASCII content — run
executors with a root/en locale (the norm) or use the byte alphabet,
which never lowercases. The tier-equality suite pins agreement under
the default locale.

Training (``train_merges``) is corpus-scan-free per merge: ONE
distributed aggregate collapses the corpus to its (word, count)
profile (Heaps's law keeps the profile tiny relative to the corpus —
vocabulary grows ~O(corpus^0.5)), then the merge loop runs over the
profile with incrementally-maintained pair counts and a lazy max-heap,
so per-merge cost is proportional to the words CONTAINING the merged
pair, independent of corpus row count. Candidates whose concatenation
collides with an existing symbol are excluded from CANDIDACY (their
counts remain; they are simply never picked), and ALL pairs are
considered — no top-K truncation.

The reference has no text operators at all (its pipeline moves opaque
CDC envelopes — stream_cdc/processing/processor.py); this module is
part of the beyond-reference LLM-pipeline surface, next to
operators/text.py.
"""

from __future__ import annotations

import heapq
import re

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StringType

# Auto-tier crossover, measured (scripts/bpe_tier_bench.py,
# SCALE_BENCH_r09.md §2): expr cost grows with table size (sf0.1:
# 0.76 s @16 -> 2.8 s @256 merges; memo-hostile corpus: 0.82 s @16 ->
# 6.9 s @512) while arrow stays flat (~0.33-0.78 s at every size, both
# corpora). The wall-clock crossover is ~16-32 merges even with a
# useless word cache; 32 keeps small/oracle tables on the pure-JVM
# codegen path (no Python workers, SQL-replayable plans) and routes
# everything larger to the flat tier.
ARROW_TIER_MIN_MERGES = 32

# ASCII whitespace, written as an explicit class so the Java (Spark),
# RE2 (DuckDB) and Python regex engines agree byte-for-byte. (\s is
# ASCII-only in Java/RE2 but Unicode in Python — never use it here.)
_WS = "[ \\t\\n\\x0b\\f\\r]+"

_LETTER_ALPHABET = frozenset(chr(c) for c in range(ord("a"), ord("z") + 1))
_BYTE_ALPHABET = frozenset(f"{b:02x}" for b in range(256))

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

# The byte-alphabet twin of DEFAULT_MERGES: the same English merges
# expressed as UTF-8 hex symbols (('74','68') merges bytes 't','h').
# Hex encoding preserves well-formedness — operands stay single base
# symbols or earlier results, results stay unique.
DEFAULT_BYTE_MERGES: tuple[tuple[str, str], ...] = tuple(
    (left.encode().hex(), right.encode().hex())
    for left, right in DEFAULT_MERGES
)


def _base_symbols(alphabet: str) -> frozenset:
    if alphabet == "letter":
        return _LETTER_ALPHABET
    if alphabet == "byte":
        return _BYTE_ALPHABET
    raise ValueError(f"alphabet must be 'letter' or 'byte', got {alphabet!r}")


def validate_merges(merges, alphabet: str = "letter") -> list[tuple[str, str]]:
    """Check the well-formedness contract the in-rank-order encoder
    relies on (module doc): operands are base symbols or earlier
    results, results unique. Letter mode: symbols are lowercase ASCII
    letters. Byte mode: symbols are even-length lowercase hex."""
    merges = [tuple(m) for m in merges]
    base = _base_symbols(alphabet)
    known = set(base)
    if alphabet == "letter":
        def well_typed(s):
            return s and s.isascii() and s.islower() and s.isalpha()
        bad = "non-[a-z] symbol"
    else:
        def well_typed(s):
            return (
                s
                and len(s) % 2 == 0
                and all(c in "0123456789abcdef" for c in s)
            )
        bad = "non-hex-byte symbol"
    for i, (left, right) in enumerate(merges):
        for side in (left, right):
            if not well_typed(side):
                raise ValueError(f"merge {i}: {bad} {side!r}")
            if side not in known:
                raise ValueError(
                    f"merge {i}: operand {side!r} is neither a base symbol "
                    "nor the result of an earlier merge"
                )
        res = left + right
        if res in known:
            raise ValueError(f"merge {i}: duplicate result {res!r}")
        known.add(res)
    return merges


def _tier_for(merges, tier: str | None) -> str:
    if tier is None:
        return "arrow" if len(merges) > ARROW_TIER_MIN_MERGES else "expr"
    if tier not in ("expr", "arrow"):
        raise ValueError(f"tier must be 'expr', 'arrow' or None, got {tier!r}")
    return tier


# ---------------------------------------------------------------------------
# base encoding (no merges applied yet)
# ---------------------------------------------------------------------------

def encode_expr(text: Column, alphabet: str = "letter") -> Column:
    """The delimiter-encoded BASE symbol sequence as a JVM expression —
    the string every merge chain starts from."""
    if alphabet == "letter":
        return F.regexp_replace(
            F.trim(F.regexp_replace(F.lower(text), "[^a-z]+", " ")),
            "([a-z])",
            "_$1_",
        )
    _base_symbols(alphabet)  # validate name
    return F.replace(
        F.regexp_replace(
            F.lower(
                F.hex(
                    F.encode(
                        F.trim(F.regexp_replace(text, _WS, " ")), "UTF-8"
                    )
                )
            ),
            "([0-9a-f]{2})",
            "_$1_",
        ),
        F.lit("_20_"),
        F.lit(" "),
    )


def oracle_encode_sql(col_sql: str, alphabet: str = "letter") -> str:
    """The DuckDB SQL replay of ``encode_expr`` — identical output
    byte-for-byte (both engines: left-to-right global regex/replace)."""
    if alphabet == "letter":
        return (
            "regexp_replace(trim(regexp_replace(lower("
            + col_sql
            + "), '[^a-z]+', ' ', 'g')), '([a-z])', '_\\1_', 'g')"
        )
    _base_symbols(alphabet)
    return (
        "replace(regexp_replace(lower(hex(encode(trim(regexp_replace("
        + col_sql
        + ", '"
        + _WS
        + "', ' ', 'g'))))), '([0-9a-f]{2})', '_\\1_', 'g'), '_20_', ' ')"
    )


def _normalize_py(text: str, alphabet: str) -> str:
    """Python twin of the expression normalization (arrow tier and the
    trainer's word profile share it)."""
    if alphabet == "letter":
        return re.sub("[^a-z]+", " ", text.lower()).strip(" ")
    return re.sub(_WS, " ", text).strip(" ")


def _word_parts(word: str, alphabet: str) -> list[str]:
    if alphabet == "letter":
        return list(word)
    h = word.encode("utf-8").hex()
    return [h[i:i + 2] for i in range(0, len(h), 2)]


# ---------------------------------------------------------------------------
# classic encoder (arrow tier core) — provably equal to the replace chain
# ---------------------------------------------------------------------------

def _classic_encode(parts: list[str], ranks: dict) -> tuple[str, ...]:
    """Lowest-rank-pair-first BPE with merge-all-occurrences per pick —
    for a well-formed table this equals applying every rule in rank
    order exhaustively (module doc), i.e. the replace chain."""
    while len(parts) > 1:
        best_rank = None
        best = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (parts[i], parts[i + 1])
        if best is None:
            break
        left, right = best
        merged = left + right
        out: list[str] = []
        i = 0
        n = len(parts)
        while i < n:
            if i + 1 < n and parts[i] == left and parts[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return tuple(parts)


_CACHE_CAP = 1 << 20  # per-worker distinct-word cache bound

# Uncapped profile collects beyond this are refused with a pointer to
# max_profile_words. Sized against what collect() actually materializes
# — pyspark Row objects (~150-250 B each, NOT the ~40 B of raw string
# bytes) plus the per-character parts tuples the trainer builds — so 5M
# words is ~1-2 GB of peak driver memory: safe on a normally-sized
# driver, and an offline trainer on a bigger driver can raise it or
# pass an explicit max_profile_words.
_PROFILE_SAFETY_LIMIT = 5_000_000


def _make_word_encoder(merges, alphabet: str):
    """(word -> tuple of tokens) with a per-worker memo — the pandas
    UDFs close over this; the merge table rides the closure (broadcast
    once per executor by Spark's task serialization)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    cache: dict[str, tuple[str, ...]] = {}

    def enc(word: str) -> tuple[str, ...]:
        got = cache.get(word)
        if got is None:
            if len(cache) >= _CACHE_CAP:
                cache.clear()
            got = _classic_encode(_word_parts(word, alphabet), ranks)
            cache[word] = got
        return got

    return enc


def _arrow_apply(text: Column, merges, alphabet: str, mode: str,
                 vocab_index: dict | None = None) -> Column:
    """One Arrow-batched pandas UDF computing the requested view of the
    tokenization. Null in -> null out, like the expression tier."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges = validate_merges(merges, alphabet)
    rtype = {
        "string": StringType(),
        "count": LongType(),
        "tokens": ArrayType(StringType()),
        "ids": ArrayType(IntegerType()),
    }[mode]

    # Built OUTSIDE run() so the ranks dict and word memo ride the
    # pickled closure: each Python worker deserializes its own copy once
    # and the cache then persists ACROSS Arrow batches within that
    # worker — rebuilding per batch would re-encode every high-frequency
    # word on every batch (code-review r9 finding).
    enc = _make_word_encoder(merges, alphabet)

    def run(batch):
        out = []
        for text in batch:
            if text is None:
                out.append(None)
                continue
            words = [w for w in _normalize_py(text, alphabet).split(" ") if w]
            if mode == "count":
                out.append(sum(len(enc(w)) for w in words))
            elif mode == "string":
                out.append(
                    " ".join(
                        "".join(f"_{t}_" for t in enc(w)) for w in words
                    )
                )
            elif mode == "tokens":
                out.append([t for w in words for t in enc(w)])
            else:
                out.append(
                    [vocab_index[t] for w in words for t in enc(w)]
                )
        return pd.Series(out, dtype=object)

    return pandas_udf(run, rtype)(text)


# ---------------------------------------------------------------------------
# public application surface
# ---------------------------------------------------------------------------

def bpe_string(
    text: Column,
    merges=DEFAULT_MERGES,
    alphabet: str = "letter",
    tier: str | None = None,
) -> Column:
    """The delimiter-encoded token sequence after all merges — the
    carrier every other view derives from."""
    if _tier_for(merges, tier) == "arrow":
        return _arrow_apply(text, merges, alphabet, "string")
    s = encode_expr(text, alphabet)
    for left, right in validate_merges(merges, alphabet):
        s = F.replace(
            s, F.lit(f"_{left}__{right}_"), F.lit(f"_{left}{right}_")
        )
    return s


def bpe_token_count(
    text: Column,
    merges=DEFAULT_MERGES,
    alphabet: str = "letter",
    tier: str | None = None,
) -> Column:
    """Exact subword token count under the merge table (bigint)."""
    if _tier_for(merges, tier) == "arrow":
        return _arrow_apply(text, merges, alphabet, "count")
    s = bpe_string(text, merges, alphabet, tier="expr")
    return (
        (F.length(s) - F.length(F.replace(s, F.lit("_"), F.lit("")))) / 2
    ).cast("bigint")


def _token_runs(alphabet: str) -> str:
    return "[a-z]+" if alphabet == "letter" else "[0-9a-f]+"


def bpe_tokens(
    text: Column,
    merges=DEFAULT_MERGES,
    alphabet: str = "letter",
    tier: str | None = None,
) -> Column:
    """The subword token sequence as array<string>, in document order.
    Byte-mode token strings are lowercase hex of the token's bytes
    (``bytes.fromhex(tok)`` recovers them)."""
    if _tier_for(merges, tier) == "arrow":
        return _arrow_apply(text, merges, alphabet, "tokens")
    return F.regexp_extract_all(
        bpe_string(text, merges, alphabet, tier="expr"),
        F.lit(_token_runs(alphabet)),
        0,
    )


def vocab(merges=DEFAULT_MERGES, alphabet: str = "letter") -> list[str]:
    """id -> token string: the base alphabet (26 letters / 256 bytes,
    sorted) then each merge's result in rank order. Closed under
    encoding — every emitted token is a base symbol or a merge result,
    so ids are total (no unk)."""
    return sorted(_base_symbols(alphabet)) + [
        left + right for left, right in validate_merges(merges, alphabet)
    ]


def bpe_token_ids(
    text: Column,
    merges=DEFAULT_MERGES,
    alphabet: str = "letter",
    tier: str | None = None,
) -> Column:
    """The subword token sequence as array<int> vocabulary ids."""
    voc = vocab(merges, alphabet)
    if _tier_for(merges, tier) == "arrow":
        index = {t: i for i, t in enumerate(voc)}
        return _arrow_apply(text, merges, alphabet, "ids", vocab_index=index)
    pairs: list[Column] = []
    for i, tok in enumerate(voc):
        pairs.extend((F.lit(tok), F.lit(i)))
    vmap = F.create_map(*pairs)
    return F.transform(
        bpe_tokens(text, merges, alphabet, tier="expr"), lambda t: vmap[t]
    )


def bpe_token_stats(
    df: DataFrame,
    merges=DEFAULT_MERGES,
    text_col: str = "text",
    group_col: str = "lang",
    alphabet: str = "letter",
    tier: str | None = None,
) -> DataFrame:
    """Per-group exact BPE token accounting (q131/q134): documents,
    total / max subword tokens — the budgeting numbers sequence packing
    consumes. One narrow projection then one aggregate (map-side
    combine); the merge chain (or one Arrow batch pass) rides the
    scan."""
    n = bpe_token_count(F.col(text_col), merges, alphabet, tier)
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


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def word_profile(
    df: DataFrame,
    text_col: str = "text",
    alphabet: str = "letter",
) -> DataFrame:
    """Collapse the corpus to its distinct-word profile ``(word, wc)``
    — the ONE corpus-wide aggregate training needs. Heaps's law keeps
    the profile sublinear in corpus size (vocabulary ~O(n^0.5)), and
    only (word, count) rows ever shuffle — map-side combined, never
    document text."""
    if alphabet == "letter":
        norm = F.trim(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
        )
    else:
        _base_symbols(alphabet)
        norm = F.trim(F.regexp_replace(F.col(text_col), _WS, " "))
    return (
        df.select(F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )


def _train_from_profile(
    word_counts: list[tuple[list[str], int]],
    n_merges: int,
    min_count: int,
    alphabet: str,
) -> list[tuple[str, str]]:
    """The merge loop over a (parts, count) profile: incrementally
    maintained pair counts + a lazy max-heap, so each merge touches
    only the words that CONTAIN the merged pair — per-merge cost is
    independent of corpus row count AND of profile words that don't
    participate. Determinism: ties break on the pair's ``"l r"`` text
    ascending, matching the distributed aggregate's ordering."""
    known = set(_base_symbols(alphabet))
    words = [list(parts) for parts, _ in word_counts]
    wcs = [wc for _, wc in word_counts]

    counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for i, parts in enumerate(words):
        wc = wcs[i]
        for pair in zip(parts, parts[1:]):
            counts[pair] = counts.get(pair, 0) + wc
            occ.setdefault(pair, set()).add(i)

    # lazy max-heap of (-count, "l r", pair); stale entries are skipped
    # by re-checking the live count at pop time. Collisions with known
    # symbols are excluded from candidacy (never from the counts) —
    # `known` only grows, so a skipped collision can never become valid.
    heap = [(-c, f"{p[0]} {p[1]}", p) for p, c in counts.items()]
    heapq.heapify(heap)

    def push(pair):
        c = counts.get(pair, 0)
        if c > 0:
            heapq.heappush(heap, (-c, f"{pair[0]} {pair[1]}", pair))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        picked = None
        while heap:
            negc, _key, pair = heapq.heappop(heap)
            if counts.get(pair, 0) != -negc:
                continue  # stale
            if -negc < min_count:
                break  # fresh max below threshold -> training is done
            if pair[0] + pair[1] in known:
                continue  # collision: not a candidate, keep its count
            picked = pair
            break
        if picked is None:
            break
        left, right = picked
        merged = left + right
        merges.append(picked)
        known.add(merged)

        touched: set[tuple[str, str]] = set()
        for i in sorted(occ.get(picked, ())):
            old = words[i]
            new: list[str] = []
            j = 0
            n = len(old)
            while j < n:
                if j + 1 < n and old[j] == left and old[j + 1] == right:
                    new.append(merged)
                    j += 2
                else:
                    new.append(old[j])
                    j += 1
            wc = wcs[i]
            old_pairs = list(zip(old, old[1:]))
            new_pairs = list(zip(new, new[1:]))
            for p in old_pairs:
                counts[p] -= wc
                touched.add(p)
            for p in new_pairs:
                counts[p] = counts.get(p, 0) + wc
                touched.add(p)
            old_set, new_set = set(old_pairs), set(new_pairs)
            for p in old_set - new_set:
                s = occ.get(p)
                if s is not None:
                    s.discard(i)
            for p in new_set - old_set:
                occ.setdefault(p, set()).add(i)
            words[i] = new
        occ.pop(picked, None)
        for p in touched:
            if counts.get(p, 0) <= 0:
                counts.pop(p, None)
            else:
                push(p)
    return merges


def train_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    alphabet: str = "letter",
    max_profile_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table FROM the corpus: ``n_merges`` iterations
    of (count adjacent token pairs) -> (merge the most frequent pair
    everywhere), the classic BPE training loop.

    Corpus-scan-free per merge: ONE distributed aggregate collapses the
    corpus to its (word, count) profile (``word_profile``), the profile
    is pulled to the driver (Heaps's law — vocabulary is sublinear in
    corpus size; at 100 TB a deduplicated [a-z]-word profile is tens of
    millions of rows ≈ a driver-feasible few hundred MB, and
    ``max_profile_words`` caps it by frequency for adversarial corpora),
    and every merge iteration
    then runs over the profile with incrementally-maintained pair
    counts — per-merge cost proportional to the words containing the
    merged pair, independent of corpus rows. Counts weight each
    distinct word by its corpus frequency and count EVERY adjacent
    position (a word 'aaa' contributes (a,a) twice per occurrence),
    identical to counting over raw occurrences.

    What the frequency cap costs, bounded (round-10 verdict task 5):
    dropping the sub-cap tail changes any pair's count by at most
    tail_bound = sum over dropped words of (len(word)-1)*wc, so capped
    training PROVABLY reproduces every leading uncapped merge whose
    selection margin (picked count minus runner-up count) exceeds
    tail_bound — and any divergence can only begin at the first merge
    whose margin dips under it. For Zipf-shaped corpora the head
    dominates pair counts, so a generous cap leaves the useful prefix
    intact. Property-tested, including a genuine divergence case located
    exactly at the bound: tests/test_bpe.py::
    test_profile_cap_agreement_bound and
    ::test_profile_cap_divergence_is_margin_located.

    Deterministic and engine-independent: argmax pair, ties broken by
    the pair's ``"l r"`` text ascending (ASCII — Python and UTF8-binary
    orderings agree). Stops early when no pair reaches ``min_count``
    (merging singletons only memorizes the corpus). Candidates whose
    concatenation collides with an existing symbol are excluded from
    candidacy — ALL pairs are considered, no top-K truncation. The
    result always satisfies ``validate_merges``.
    """
    profile = word_profile(df, text_col, alphabet)
    if max_profile_words is not None:
        rows = profile.orderBy(
            F.desc("wc"), F.asc("word")
        ).limit(max_profile_words).collect()
    else:
        # Heaps's law bounds the profile for whitespace-delimited text,
        # but NOT for scripts written without spaces (CJK/Thai under the
        # byte alphabet: every distinct line is a distinct "word") — an
        # uncapped collect there would OOM the driver. Guard with ONE
        # action: limit(N+1) bounds the collect itself by construction
        # (no separate count() re-running the corpus aggregate), and one
        # extra row proves the overflow. Training is insensitive to the
        # profile's row order (pair counts are commutative sums; picks
        # tie-break on pair text), so limit() is safe when under the
        # bound (code-review r9 findings).
        rows = profile.limit(_PROFILE_SAFETY_LIMIT + 1).collect()
        if len(rows) > _PROFILE_SAFETY_LIMIT:
            raise ValueError(
                f"word profile exceeds {_PROFILE_SAFETY_LIMIT:,} distinct "
                "words; pass max_profile_words= to cap it by frequency "
                "(BPE merges are frequency-dominated, so a generous cap "
                "does not change the learned table in practice)"
            )
    word_counts = [
        (_word_parts(r["word"], alphabet), r["wc"]) for r in rows
    ]
    merges = _train_from_profile(word_counts, n_merges, min_count, alphabet)
    return validate_merges(merges, alphabet)


# ---------------------------------------------------------------------------
# oracle replay
# ---------------------------------------------------------------------------

def oracle_merge_values(merges=DEFAULT_MERGES, alphabet: str = "letter") -> str:
    """The merge table as a SQL VALUES list ``(rank, pat, rep)`` for the
    DuckDB recursive-CTE replay (plans/queries.py q131/q133/q134) — the
    oracle applies the IDENTICAL patterns with the identical replace()
    semantics, so the match is exact."""
    rows = [
        f"({i}, '_{left}__{right}_', '_{left}{right}_')"
        for i, (left, right) in enumerate(validate_merges(merges, alphabet))
    ]
    return ", ".join(rows)
