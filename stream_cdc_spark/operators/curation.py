"""End-to-end corpus curation decisions: the capstone composition of the
quality / repetition / dedup / decontamination operator family into one
keep-or-drop table with reason codes.

This is the shape a production training-data pipeline actually runs — not
five separate reports, but one decision per document with an audit trail
of WHICH filters fired (so curation changes can be diffed corpus-wide).
Every signal is an existing proven operator; this module only wires the
DAG:

    documents ─┬─ text.quality_features/quality_score   (narrow)
               ├─ text.repetition_features              (doc-keyed aggs)
               ├─ exact-dup fingerprint window          (fp-keyed window)
               ├─ dedup.contamination_flags             (broadcast probe)
               └─ lang allow-list                       (narrow)
                         └── join on doc_id → flags → keep/reasons

All component shuffles key on doc_id (or the tiny fp/shingle domains),
so the composition adds only doc_id-keyed joins that AQE co-partitions;
nothing in the DAG is new shuffle shape beyond its parts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from stream_cdc_spark.operators import dedup, text


def curation_decisions(
    docs: DataFrame,
    allowed_langs: Sequence[str] = ("en", "de", "es"),
    eval_set: DataFrame | None = None,
    quality_min: float = 1.0,
    dup_word_permille_max: int = 599,
    contamination_k: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document curation decision: (doc_id, keep, reasons).

    `reasons` is a comma-joined, fixed-order subset of
    {exact_dup, lang, quality, repetition, contamination}; `keep` is true
    iff no filter fired. Thresholds are caller-set policy: a document is
    dropped when quality_score < quality_min, when dup_word_permille
    exceeds `dup_word_permille_max`, when its lang is outside
    `allowed_langs`, when it is a non-canonical exact duplicate (same
    normalized-text fingerprint as an earlier doc), or when it shares any
    word-k-gram with `eval_set` (benchmark decontamination; skipped when
    eval_set is None).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    w = Window.partitionBy("_fp")
    base = (
        docs.withColumn("_fp", F.md5(norm))
        .withColumn("_keep_id", F.min(id_col).over(w))
        .drop("_fp")
    )
    q = text.quality_score(text.quality_features(docs)).select(
        id_col, "quality_score"
    )
    rep = text.repetition_features(docs, id_col=id_col).select(
        id_col, "dup_word_permille"
    )
    joined = base.join(q, id_col).join(rep, id_col)
    if eval_set is not None:
        contam = dedup.contamination_flags(
            docs, eval_set, id_col=id_col, k=contamination_k
        ).select(F.col("id").alias(id_col), F.lit(True).alias("_contam"))
        joined = joined.join(contam, id_col, "left")
    else:
        joined = joined.withColumn("_contam", F.lit(None).cast("boolean"))

    flag = lambda cond, name: F.when(cond, F.lit(name))  # noqa: E731
    reasons = F.concat_ws(
        ",",
        flag(F.col(id_col) != F.col("_keep_id"), "exact_dup"),
        flag(~F.col("lang").isin(list(allowed_langs)), "lang"),
        flag(F.col("quality_score") < quality_min, "quality"),
        flag(F.col("dup_word_permille") > dup_word_permille_max, "repetition"),
        flag(F.coalesce(F.col("_contam"), F.lit(False)), "contamination"),
    )
    return joined.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def multimodal_curation_decisions(
    docs: DataFrame,
    media: DataFrame,
    allowed_langs: Sequence[str] = ("en", "de", "es"),
    eval_set: DataFrame | None = None,
    quality_min: float = 1.0,
    dup_word_permille_max: int = 599,
    contamination_k: int = 4,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    grid_w: int = 9,
    grid_h: int = 8,
    max_hamming: int = 4,
    n_bands: int = 8,
) -> DataFrame:
    """`curation_decisions` for a multimodal corpus: one more reason,
    ``media_dup`` — the document's thumbnail is a perceptual near-dup
    (dHash Hamming <= ``max_hamming``, multimodal.dhash_near_duplicates)
    of an EARLIER-id document's. Min-id-representative
    canonicalization, exactly like the ``exact_dup`` fingerprint window,
    so the decision table stays batch-deterministic and SQL-replayable
    (q132). ``media`` is (id_col, blob_col); documents absent from it
    (text-only rows) can never fire media_dup.

    Plan shape: the media signal adds one pandas-UDF signature pass and
    the banded pair join of q129 (pixel bytes never shuffle, no
    all-pairs), then one doc_id-keyed left join onto the text decision
    table — AQE co-partitions it with the existing doc_id joins."""
    from stream_cdc_spark.operators import multimodal

    base = curation_decisions(
        docs,
        allowed_langs=allowed_langs,
        eval_set=eval_set,
        quality_min=quality_min,
        dup_word_permille_max=dup_word_permille_max,
        contamination_k=contamination_k,
        id_col=id_col,
    )
    pairs = multimodal.dhash_near_duplicates(
        media,
        id_col=id_col,
        blob_col=blob_col,
        grid_w=grid_w,
        grid_h=grid_h,
        max_hamming=max_hamming,
        n_bands=n_bands,
    )
    # id_b is always the LATER id (dhash_near_duplicates normalizes
    # id_a < id_b), so the dup side of any pair is media_dup
    mdup = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_mdup", F.lit(True))
    )
    out = base.join(mdup, id_col, "left")
    reasons = F.concat_ws(
        ",",
        F.nullif(F.col("reasons"), F.lit("")),
        F.when(F.coalesce(F.col("_mdup"), F.lit(False)), F.lit("media_dup")),
    )
    return out.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def apply_curation(docs: DataFrame, decisions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize the kept corpus: semi-join against keep decisions (the
    decisions side carries only ids, so this is a plain co-keyed join)."""
    keep_ids = decisions.filter(F.col("keep")).select(id_col)
    return docs.join(keep_ids, id_col, "left_semi")
