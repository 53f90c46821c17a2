"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (whole-stage codegen, zero Python in the hot
path) over the `documents` table (doc_id, text, lang, source, n_chars).
Each operator is deterministic and engine-neutral so a DuckDB oracle can
check it bit-for-bit (plans/queries.py).

Scale notes: every operator here is a narrow map — no shuffle at all; at
100 TB these run at full scan bandwidth with parquet column pruning (only
`text` + id columns are read; verified via ReadSchema in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny stopword list shared with the oracle SQL; enough for ratio features.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization. The testdata corpus is single-space
    separated; a BPE-ish regex split is available via tokens_regex."""
    return F.split(text, " ")


def tokens_regex(text: Column) -> Column:
    """BPE-ish tokenization: words, numbers, or single non-space symbols."""
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def token_count(
    text: Column,
    tokenizer: str = "whitespace",
    merges=None,
    alphabet: str = "letter",
) -> Column:
    """Token count of ``text``. ``tokenizer='whitespace'`` (default) is
    the split-on-space count every existing oracle pins; ``'bpe'``
    counts exact subword tokens under a merge table (operators/bpe.py;
    ``merges=None`` uses the demonstration DEFAULT_MERGES — production
    callers pass their trained table, which auto-routes to the Arrow
    tier past the measured size threshold) — the unit a training-data
    pipeline budgets in. ``alphabet='byte'`` selects the lossless
    byte-fallback alphabet."""
    if tokenizer == "bpe":
        from stream_cdc_spark.operators import bpe

        return bpe.bpe_token_count(
            text, bpe.DEFAULT_MERGES if merges is None else merges, alphabet
        )
    return F.size(tokens(text))


def stopword_count(text: Column) -> Column:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, average token
    length, stopword ratio, alpha ratio. All double-typed with explicit
    casts so the DuckDB oracle computes identical IEEE values."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(t).cast("double")
    no_space = F.length(F.regexp_replace(t, " ", "")).cast("double")
    n_stop = stopword_count(t).cast("double")
    return df.withColumns(
        {
            "n_chars_q": n_char.cast("bigint"),
            "n_tokens": F.size(toks).cast("bigint"),
            "avg_token_len": no_space / n_tok,
            "stopword_ratio": n_stop / n_tok,
        }
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword presence.
    Heuristic mirrors common pretraining-data filters (C4-style)."""
    length_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    score = (
        length_ok.cast("double") * F.lit(0.5)
        + (F.col("stopword_ratio") > 0.0).cast("double") * F.lit(0.25)
        + ((F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)).cast(
            "double"
        )
        * F.lit(0.25)
    )
    return df.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic heuristic language ID from surface statistics
    (stopword ratio + average token length). Intentionally simple — the
    point is a fully-declarative, shuffle-free classifier whose decision
    function is identical in the SQL oracle. Returns `lang_pred`."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    no_space = F.length(F.regexp_replace(t, " ", "")).cast("double")
    stop_ratio = stopword_count(t).cast("double") / n_tok
    avg_len = no_space / n_tok
    pred = (
        F.when(stop_ratio >= 0.08, F.lit("en"))
        .when(avg_len >= 5.2, F.lit("de"))
        .when(avg_len <= 4.1, F.lit("zh"))
        .otherwise(F.lit("es"))
    )
    return df.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over normalized text (lowercase,
    collapsed whitespace, trimmed). Deterministic across engines; the
    building block for exact dedup at scale (hash-groupBy on `fp`)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return df.withColumn("fp", F.md5(norm))


def _empty_longs() -> Column:
    return F.array().cast("array<long>")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fps",
    k: int = 5,
    w: int = 4,
    base: int = 31,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm) as a chain of narrow per-row array stages.

    Pipeline: lowercase + strip ALL whitespace -> char codepoints ->
    k-gram Horner hashes (base 31; max value 255*31^4 so BIGINT-exact,
    no modular arithmetic to drift) -> sliding window of w consecutive
    hashes -> min per window -> distinct. Guarantees of winnowing: any
    shared substring of length >= k+w-1 yields at least one shared
    fingerprint; density ~ 2/(w+1).

    No shuffle and no Python per row — at 100 TB this runs at parquet
    scan bandwidth. Each stage is a separate `withColumn` ON PURPOSE:
    higher-order functions (transform/aggregate) are CodegenFallback, so
    they are interpreted with NO common-subexpression elimination — if
    the normalized string were left as an expression, CollapseProject
    would inline the regexp_replace into every per-element lambda
    reference and the scan becomes O(len^2 * k) regexp evaluations per
    document (measured: a 500-row sf0.001 batch went from minutes to
    milliseconds). Multiple references to a materialized non-cheap alias
    block the collapse, so each stage evaluates exactly once per row.
    The same arithmetic is expressible in DuckDB list comprehensions, so
    it is value-level oracle-checkable (q66).
    """
    s_col, codes_col, hs_col = "__wn_s", "__wn_codes", "__wn_hs"
    staged = df.withColumn(
        s_col, F.regexp_replace(F.lower(F.col(text_col)), "\\s+", "")
    )
    codes = F.transform(
        F.sequence(F.lit(1), F.length(s_col)),
        lambda i: F.ascii(F.col(s_col).substr(i, F.lit(1))).cast("long"),
    )
    staged = staged.withColumn(
        codes_col,
        F.when(F.length(s_col) >= 1, codes).otherwise(_empty_longs()),
    ).drop(s_col)

    n_grams = F.size(codes_col) - F.lit(k - 1)
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.aggregate(
            F.slice(codes_col, i, k),
            F.lit(0).cast("long"),
            lambda acc, c: acc * base + c,
        ),
    )
    staged = staged.withColumn(
        hs_col, F.when(n_grams >= 1, hs).otherwise(_empty_longs())
    ).drop(codes_col)

    n_wins = F.greatest(F.size(hs_col) - F.lit(w - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda p: F.array_min(F.slice(hs_col, p, w)),
    )
    return staged.withColumn(
        out_col,
        F.array_distinct(
            F.when(F.size(hs_col) >= 1, wins).otherwise(_empty_longs())
        ),
    ).drop(hs_col)


def winnow_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document winnowing summary: fingerprint count, min, exact sum
    (order-insensitive BIGINT arithmetic — oracle-comparable)."""
    fdf = winnow_fingerprints(df.select(id_col, text_col), text_col)
    fps = F.col("fps")
    return fdf.select(
        F.col(id_col),
        F.size(fps).cast("bigint").alias("n_fps"),
        F.array_min(fps).alias("fp_min"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "fp_sum"
        ),
    )


def winnow_stats_vectorized(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    base: int = 31,
) -> DataFrame:
    """Arrow-vectorized twin of winnow_stats: same algorithm, same output,
    computed with numpy sliding windows inside mapInPandas.

    The expression variant is zero-Python but its higher-order array
    functions are CodegenFallback (interpreted); this one pays one Arrow
    batch transfer and then does O(len) numpy work per document
    (correlate for the Horner k-gram hashes, sliding_window_view minima).
    Still a narrow zero-shuffle map — partitioning and scale shape are
    identical; only the per-core constant differs. Kept value-identical
    to winnow_stats (equivalence-tested + same q66 oracle).
    """
    import re as _re

    import numpy as np
    import pandas as pd

    weights = (base ** np.arange(k - 1, -1, -1)).astype(np.int64)
    ws_re = _re.compile(r"\s+")

    def _batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            n_fps = np.zeros(len(pdf), dtype=np.int64)
            fp_min = np.full(len(pdf), np.nan, dtype=np.float64)
            fp_sum = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].astype(str)):
                s = ws_re.sub("", text.lower())
                if len(s) < k:
                    continue
                codes = np.frombuffer(
                    s.encode("latin-1", "replace"), dtype=np.uint8
                ).astype(np.int64)
                hs = np.correlate(codes, weights, mode="valid")
                if len(hs) <= w - 1:
                    fps = np.unique(hs.min(keepdims=True))
                else:
                    fps = np.unique(
                        np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
                    )
                n_fps[i] = len(fps)
                fp_min[i] = fps.min()
                fp_sum[i] = int(fps.sum())
            out = pd.DataFrame(
                {
                    id_col: ids,
                    "n_fps": n_fps,
                    "fp_min": pd.array(
                        [None if np.isnan(v) else int(v) for v in fp_min],
                        dtype="Int64",
                    ),
                    "fp_sum": fp_sum,
                }
            )
            yield out

    from stream_cdc_spark.operators.util import ensure_parallelism

    src = ensure_parallelism(df.select(id_col, text_col))
    return src.mapInPandas(
        _batches, schema=f"{id_col} bigint, n_fps bigint, fp_min bigint, fp_sum bigint"
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction, top-word
    fraction, and top-bigram fraction per document (quantized to permille
    so a DuckDB oracle compares exactly; Rae et al. 2021 use these to drop
    boilerplate/low-quality web text before LLM training).

    Plan shape: one explode keyed by document, then combiner-friendly
    (id, token) -> id aggregations — bigrams come from an array transform
    on the token array, not a window, so there is no per-doc sort. Every
    shuffle key includes the doc id: at 100 TB this is embarrassingly
    parallel and AQE-coalescible, with no global hot key (a document's
    rows all fit one task by construction).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("toks"))
    words = base.select(id_col, F.explode("toks").alias("tok"))
    # bigram strings via arrays_zip of shifted slices with the concat
    # deferred past the explode — codegen all the way, no interpreted
    # per-element transform (r15, guide §4.1; values identical)
    n_t = F.size("toks")
    bigram_zip = F.when(
        n_t >= 2,
        F.arrays_zip(
            F.slice("toks", 1, n_t - 1), F.slice("toks", 2, n_t - 1)
        ),
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))
    bigrams = base.select(
        id_col, F.explode(bigram_zip).alias("__bg")
    ).select(
        id_col,
        F.concat_ws(" ", F.col("__bg")["0"], F.col("__bg")["1"]).alias("tok"),
    )

    def top_counts(exploded: DataFrame, total: str, top: str) -> DataFrame:
        return (
            exploded.groupBy(id_col, "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(
                F.sum("c").cast("bigint").alias(total),
                F.count(F.lit(1)).cast("bigint").alias(f"{total}_distinct"),
                F.max("c").cast("bigint").alias(top),
            )
        )

    wstat = top_counts(words, "n_words", "top_word_count")
    bstat = top_counts(bigrams, "n_bigrams", "top_bigram_count").drop(
        "n_bigrams_distinct"
    )
    permille = lambda num, den: F.floor(  # noqa: E731
        1000.0 * num / F.greatest(den, F.lit(1))
    ).cast("bigint")
    return (
        # Left join: a single-word doc explodes zero bigrams, so it has no
        # bstat row — an inner join would silently drop it from the report.
        wstat.join(bstat, id_col, "left")
        .select(
            id_col,
            "n_words",
            F.col("n_words_distinct").alias("n_distinct_words"),
            permille(
                F.col("n_words") - F.col("n_words_distinct"), F.col("n_words")
            ).alias("dup_word_permille"),
            permille(F.col("top_word_count"), F.col("n_words")).alias(
                "top_word_permille"
            ),
            permille(
                F.coalesce(F.col("top_bigram_count"), F.lit(0)),
                F.coalesce(F.col("n_bigrams"), F.lit(0)),
            ).alias("top_bigram_permille"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking of documents against a fixed bag of query terms, with
    k1 = 1.2, b = 0.75 — the classic Okapi retrieval scorer a training-data
    pipeline uses for relevance filtering or hard-negative mining.

    Determinism design: idf is quantized once per term
    (FLOOR(1e6 * LN(1 + (N - df + 0.5)/(df + 0.5))) as BIGINT); the
    tf/length part is then *exact 64-bit integer arithmetic* — with
    k1 = 6/5 and b = 3/4, multiplying the classic formula through by 10*L
    (L = total corpus token count) gives

        term_score = idf_q * 22*L*tf div (10*L*tf + 3*L + 9*dl*N)

    so the only floating-point op in the whole score is the single LN per
    term. Scores are order-insensitively summed BIGINTs, hash-checkable
    against an oracle running the identical recurrence.

    Scale shape: the word explode filters to the query-term set *before*
    the tf shuffle (a tiny isin() pushed into the scan stage), so the only
    shuffled data is O(matching docs x |query|). df/N/L enter as broadcast
    one-row or |query|-row aggregates; nothing driver-side, fully lazy.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    )
    dl = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"))
    corpus = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.size("t")).cast("bigint").alias("l"),
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("word"))
        .filter(F.col("word").isin(list(query_terms)))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return bm25_topk_from_postings(tf.join(dl, "doc_id"), corpus, top_k)


def bm25_topk_from_postings(
    postings: DataFrame, corpus: DataFrame, top_k: int = 15
) -> DataFrame:
    """The BM25 scoring body shared by the one-shot scorer above and the
    incremental retrieval index (streaming/retrieval_index.py) — equality
    between the two paths is by construction because both route through
    this exact integer recurrence.

    ``postings``: (doc_id, word, tf, dl) already restricted to the query
    terms. ``corpus``: one-row (n, l) — broadcast into the score.
    """
    df_ = postings.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = df_.join(F.broadcast(corpus)).select(
        "word",
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
        )
        .cast("bigint")
        .alias("idf_q"),
    )
    scored = (
        postings.join(F.broadcast(idf), "word")
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("(idf_q * 22 * l * tf) div (10 * l * tf + 3 * l + 9 * dl * n)")
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.col("score").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )


def tfidf_top_terms_from_tf(tf: DataFrame, n_docs: DataFrame) -> DataFrame:
    """TF-IDF argmax-term-per-doc scoring body shared by the q54 one-shot
    query and the incremental retrieval index. ``tf``: (doc_id, tok, tf)
    with one row per distinct (doc, term); ``n_docs``: one-row (n_docs).
    idf is ppm-floor-quantized so the score is hash-checkable."""
    dfreq = tf.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.floor(
                F.lit(1000000.0)
                * F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                )
            )
            .cast("bigint")
            .alias("tfidf_ppm"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_ppm").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "tok", "tfidf_ppm")
        .orderBy("doc_id")
    )

def bigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram language-model table: (w1, w2, n, p_q) where n counts
    bigram occurrences (all occurrences, not per-document) and p_q is the
    MLE conditional probability P(w2 | w1) quantized to parts-per-million
    with integer division, so it is bit-identical across engines.

    The n-gram count table is the classic MapReduce workload (and the
    substrate for perplexity filtering / KenLM-style scoring of training
    corpora). Plan shape: narrow bigram explode, one hash-shuffle on the
    (w1, w2) pair with map-side combine, then a window sum over w1 for the
    denominator — the second pass shuffles only the collapsed vocab^2
    table, not the corpus. At 100 TB the pair aggregate dominates; hot
    head words (e.g. "the") are absorbed by partial aggregation, which a
    join-based denominator would instead re-shuffle.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # bigrams via arrays_zip of two shifted slices — codegen expressions
    # instead of the interpreted per-element transform fold (r15, guide
    # §4.1; measured ~2x on the gram build at sf0.1, values identical)
    n_t = F.size(toks)
    bigrams = F.when(
        n_t >= 2,
        F.arrays_zip(F.slice(toks, 1, n_t - 1), F.slice(toks, 2, n_t - 1)),
    ).otherwise(F.array().cast("array<struct<`0`:string,`1`:string>>"))
    counts = (
        df.select(F.explode(bigrams).alias("bg"))
        .select(F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("w1"))
    return counts.select(
        "w1",
        "w2",
        "n",
        F.expr("1000000 * n").cast("bigint").alias("_num"),
        total.alias("_den"),
    ).select(
        "w1", "w2", "n", F.expr("_num div _den").cast("bigint").alias("p_q")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "whitespace",
    merges=None,
    alphabet: str = "letter",
) -> DataFrame:
    """Context-window chunking: split each document into token windows of
    ``chunk_tokens`` with ``overlap`` tokens carried between consecutive
    chunks — the preprocessing step between curation and sequence packing
    (operators/packing.py consumes the chunks).

    Stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens), truncated at the document end.
    Pure narrow computation (split -> sequence -> explode -> slice): no
    shuffle, scales at scan bandwidth, and every boundary is a
    deterministic function of the token count, so a SQL oracle reproduces
    the chunking exactly.

    ``tokenizer='bpe'`` windows over exact subword tokens
    (operators/bpe.py) instead of whitespace words, so ``n_tok`` is the
    unit the training budget is denominated in; ``chunk_text`` is then
    the window's subword tokens space-joined (the token sequence, not a
    substring of the original text). Same plan shape — the merge chain
    is more string expressions riding the scan.

    Returns (id_col, chunk_idx, n_tok, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    if tokenizer == "bpe":
        from stream_cdc_spark.operators import bpe

        toks = bpe.bpe_tokens(
            F.col(text_col),
            bpe.DEFAULT_MERGES if merges is None else merges,
            alphabet,
        )
    else:
        toks = F.split(F.col(text_col), " ")
    # Materialize the token array ONCE per document in a Project BELOW the
    # explode. Inlining `toks` into both the generator's sequence bound and
    # the post-explode slice projection (the old single-select shape) made
    # the tokenizer re-evaluate once per CHUNK plus once per doc — for the
    # BPE tier that is the whole merge chain per window, O(len^2) work per
    # document (q133's before-plan carries the 16-replace chain in both
    # Generate (3) and the post-Generate Project (4)). Catalyst does not
    # collapse a Project into a Generate, so the alias is evaluated once
    # and the generator/slices read the materialized column.
    base = df.select(F.col(id_col), toks.alias("_t"))
    n = F.size(F.col("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
    )
    d = base.select(
        F.col(id_col),
        F.col("_t"),
        F.explode(starts).alias("_s"),
    )
    piece = F.slice(F.col("_t"), F.col("_s") + F.lit(1), F.lit(chunk_tokens))
    return d.select(
        id_col,
        (F.col("_s") / F.lit(stride)).cast("bigint").alias("chunk_idx"),
        F.size(piece).cast("bigint").alias("n_tok"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    sizes: tuple[int, ...] = (100, 1000, 10000),
) -> DataFrame:
    """Corpus coverage of the top-N token vocabulary, for each N in
    ``sizes`` — the tokenizer-design question (how big must a vocab be to
    cover X% of the token stream?) answered exactly.

    Rank is deterministic: count desc, then token text (engines agree on
    ties). Plan shape: one token-count aggregate (map-side combine), then
    per-N TakeOrdered top-k — the classic distributed top-k, per-partition
    partial heaps merged once, never a global sort — and an integer-exact
    coverage ratio (covered * 1e6 is far inside the double mantissa, so
    the single division is bit-identical across engines).

    Returns (n_vocab, covered_tokens, total_tokens, coverage_ppm) rows,
    all BIGINT.
    """
    from stream_cdc_spark.operators.util import ensure_parallelism

    vocab = (
        ensure_parallelism(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("total_tokens"))
    outs = []
    for n in sizes:
        covered = (
            vocab.orderBy(F.col("cnt").desc(), F.col("tok"))
            .limit(n)
            .agg(F.sum("cnt").cast("bigint").alias("covered_tokens"))
        )
        outs.append(
            covered.crossJoin(F.broadcast(total)).select(
                F.lit(n).cast("bigint").alias("n_vocab"),
                "covered_tokens",
                "total_tokens",
                F.floor(
                    F.lit(1_000_000.0)
                    * F.col("covered_tokens")
                    / F.col("total_tokens")
                )
                .cast("bigint")
                .alias("coverage_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def quality_percentile_gate(
    df: DataFrame,
    top_p: float = 0.5,
    by: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top-`top_p` fraction of documents by quality score WITHIN
    each group (FineWeb-style per-language thresholding: an absolute score
    cutoff over-prunes low-resource languages, so the gate is a percentile
    per group).

    Selection is exact and deterministic: rank by (quality_score DESC,
    id) — the id tiebreak totalizes the order so both engines pick the
    identical document set — and keep rank <= ceil(top_p * group size).

    Plan shape: the score is pure per-row expressions (no shuffle), then
    ONE hash-partition exchange on `by` serves both window functions
    (the ordered row_number and the unordered group count share the
    partitioning). Group cardinality is languages — tiny — so skew is
    bounded by corpus imbalance, which percentile gating is precisely
    the tool for. No join, no second pass over the corpus.
    """
    scored = quality_score(quality_features(df))
    w = Window.partitionBy(by).orderBy(
        F.col("quality_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_group", F.count(F.lit(1)).over(Window.partitionBy(by)))
        .filter(
            F.col("rn") <= F.ceil(F.lit(float(top_p)) * F.col("n_group"))
        )
        .select(by, id_col, "quality_score")
    )


def token_distribution_drift(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group distribution drift: KL divergence (nats) of each group's
    unigram token distribution from the corpus-wide mixture — the
    monitoring primitive for "did source X's content shift?" and "which
    source is least like the blend we train on?".

    Cross-engine determinism: every KL term is computed per (group,
    token) row from exact integer counts through an identical IEEE
    sequence (two divisions, one ln, two multiplies), floor-quantized to
    parts-per-billion BIGINT, then INTEGER-summed — so aggregation order
    cannot perturb the result (the q103 all-integer-after-quantization
    rule).

    Plan shape at 100 TB: the corpus is touched once by the (group,
    token) count — one shuffle with map-side combine, output |groups| x
    |vocab| rows, orders of magnitude smaller than the token stream.
    Everything after runs on that collapsed relation: two window sums
    (group totals, global token totals) and a broadcast one-row grand
    total. No corpus-sized join or second scan.
    """
    from stream_cdc_spark.operators.util import ensure_parallelism

    counts = (
        ensure_parallelism(df)
        .select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return drift_from_token_counts(counts, group_col=group_col)


def drift_from_token_counts(
    counts: DataFrame, group_col: str = "source"
) -> DataFrame:
    """The divergence math of ``token_distribution_drift`` over an
    already-collapsed exact count relation (grp, tok, c) — shared by the
    batch operator and the streaming twin (streaming/stateful.py
    token_count_stream maintains the identical counts in the state
    store; because they are EXACT integers, drift over the drained
    stream is bit-equal to batch, unlike the rank-band sketches)."""
    grand = counts.agg(F.sum("c").cast("double").alias("n_all"))
    enriched = (
        counts.withColumn("t_grp", F.sum("c").over(Window.partitionBy("grp")))
        .withColumn("g_tok", F.sum("c").over(Window.partitionBy("tok")))
        .crossJoin(F.broadcast(grand))
    )
    p = F.col("c").cast("double") / F.col("t_grp").cast("double")
    q = F.col("g_tok").cast("double") / F.col("n_all")
    term = F.floor(F.lit(1_000_000_000.0) * p * F.log(p / q)).cast("bigint")
    return (
        enriched.withColumn("term_ppb", term)
        .groupBy("grp")
        .agg(
            F.max("t_grp").cast("bigint").alias("n_tokens"),
            F.sum("term_ppb").cast("bigint").alias("kl_ppb"),
        )
        .withColumnRenamed("grp", group_col)
    )
