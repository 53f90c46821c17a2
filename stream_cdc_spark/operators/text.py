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

from pyspark.sql import Column, DataFrame
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


def token_count(text: Column) -> Column:
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
