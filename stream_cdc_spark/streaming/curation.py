"""Continuous corpus curation — the streaming capstone.

Composes the proven batch pieces into the pipeline a training-data team
actually runs against a CDC document feed: every micro-batch is quality-
gated (stateless Column predicates, identical decision functions to the
batch path) and then admitted against the accumulated deduped corpus via
the persisted MinHash band index (dedup.incremental_verified_dedup), with
decisions, admitted docs, and index increments all written durably.

State layout under ``state_dir`` (parquet, batch-versioned with
compaction — streaming/statedir.py):

    decisions/batch=<id>/   (doc_id, keep, reason, dup_of)
    kept/batch=<id>/        admitted documents (the curated corpus)
    index/batch=<id>/       (id, band, key) band-key increments
    */compact=<w>/          compacted snapshot of all batches < w

Exactly-once without sink transactions: every write is an OVERWRITE of
the current batch's own subdirectory, and state reads exclude subdirs
with batch id >= the executing batch. A replayed micro-batch therefore
sees exactly the state it saw the first time (its own partial output is
invisible to itself) and idempotently rewrites the same subdirs — the
classic batch-versioned foreachBatch pattern, the same guarantee the
reference gets from its offset-after-flush ordering
(stream_cdc/coordinator.py:281-303), generalized to three state tables.

Every ``compact_every`` committed batches the per-batch subdirs are
folded into an atomically-published compact=<w> snapshot (the read rule
is unchanged, so replay idempotence survives the fold — see
streaming/statedir.py for the crash-interleaving proof), keeping driver
listing and union planning O(compact_every) instead of O(stream age);
``major_every=K`` enables the leveled tier (L1 delta folds of only the
pending batch dirs, full O(total state) folds 1/K as often — the shape
for a kept-corpus that dwarfs any micro-batch). This is the parquet
analogue of the reference's O(1)-forever checkpoint item (reference:
stream_cdc/state/dynamodb.py:76-91).

At 100 TB the kept/ and index/ tables compact into bucketed tables (see
tests/test_bucketing.py: the (band, key)-bucketed index joins without an
index-side shuffle — statedir.compact(bucket_cols=...) writes exactly
that layout); the read-exclusion rule is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

from stream_cdc_spark.operators import dedup
from stream_cdc_spark.streaming import statedir

KEPT_SCHEMA = "doc_id bigint, text string"
INDEX_SCHEMA = "id bigint, band int, key bigint"
DECISIONS_SCHEMA = "doc_id bigint, keep boolean, reason string, dup_of bigint"


def _subdirs_before(root: str, batch_id: int) -> list[str]:
    """Back-compat shim for pre-compaction callers: the read set for
    ``batch_id`` (now including the compacted snapshot)."""
    return statedir.state_paths(root, batch_id)


class CurationPipeline:
    """foreachBatch curation sink over a (doc_id, text) document stream.

    ``quality_predicate`` defaults to a minimum token count; callers pass
    any deterministic Column predicate (lang allow-lists, length bounds —
    the same expressions operators/curation.py composes in batch).

    ``k`` / ``num_hashes`` / ``bands`` are the LSH parameters; they are
    stamped onto the persisted index (column metadata, preserved by
    statedir.read_state's schema-inferring read AND by compaction), so a
    restart with drifted parameters fails loudly in
    incremental_verified_dedup instead of silently admitting every
    near-dup against a mismatched index.
    """

    def __init__(
        self,
        state_dir: str,
        quality_predicate: Column | None = None,
        min_tokens: int = 5,
        threshold_ppm: int = 800_000,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        compact_every: int = 16,
        major_every: int = 0,
        commit_files: int = 1,
        fs: statedir.LocalFS | None = None,
    ):
        self.state_dir = state_dir
        # protocol-metadata filesystem for the statedir commit protocol
        # (None = local/HDFS default; inject an object-store client for
        # S3/GCS state roots — statedir module doc)
        self.fs = fs
        self.decisions_dir = os.path.join(state_dir, "decisions")
        self.kept_dir = os.path.join(state_dir, "kept")
        self.index_dir = os.path.join(state_dir, "index")
        self.id_col = id_col
        self.text_col = text_col
        self.threshold_ppm = threshold_ppm
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.compact_every = compact_every
        # major_every=K enables the leveled tier: pending batch dirs fold
        # into L1 deltas (O(recent)); a full O(total state) fold only
        # every K deltas — the shape for a kept-corpus that dwarfs any
        # micro-batch (statedir module doc)
        self.major_every = major_every
        # micro-batch commits are single-file by default (a batch is
        # small by construction; multi-file commits balloon long-horizon
        # file counts and per-trigger write latency)
        self.commit_files = commit_files
        # Column construction needs an active SparkContext; defer the
        # default predicate so the pipeline can be built config-first
        # (sink_registry) before any session exists.
        self._quality_predicate = quality_predicate
        self._min_tokens = min_tokens

    @property
    def quality_predicate(self) -> Column:
        if self._quality_predicate is not None:
            return self._quality_predicate
        return F.size(F.split(F.col(self.text_col), " ")) >= self._min_tokens

    # -- state ------------------------------------------------------------
    def _read(self, spark, root: str, schema: str, batch_id: int) -> DataFrame:
        return statedir.read_state(spark, root, schema, batch_id, fs=self.fs)

    def corpus(self, spark) -> DataFrame:
        """The curated corpus accumulated so far (all committed batches)."""
        return self._read(spark, self.kept_dir, KEPT_SCHEMA, 1 << 62)

    def decisions(self, spark) -> DataFrame:
        return self._read(spark, self.decisions_dir, DECISIONS_SCHEMA, 1 << 62)

    def _compact(self, spark, batch_id: int) -> None:
        for root, schema in (
            (self.decisions_dir, DECISIONS_SCHEMA),
            (self.kept_dir, KEPT_SCHEMA),
            (self.index_dir, INDEX_SCHEMA),
        ):
            statedir.maybe_compact(
                spark, root, schema, batch_id, every=self.compact_every,
                major_every=self.major_every, fs=self.fs,
            )

    # -- the sink ---------------------------------------------------------
    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Compact FIRST (before this batch writes anything): a replayed
        # batch then re-folds the identical committed prefix, so the fold
        # is itself covered by the idempotence rule.
        self._compact(spark, batch_id)
        # Pin the batch: it feeds the quality gate, the dedup admission
        # (itself a multi-branch plan) and three commit writes — without
        # the eager localCheckpoint each action re-reads the source and
        # re-computes the projection (measured 18 source re-reads per
        # micro-batch via StreamingMetricsListener, ~5x the sink wall).
        docs = (
            batch_df.select(
                F.col(self.id_col).cast("long").alias("doc_id"),
                F.col(self.text_col).alias("text"),
            )
            .dropDuplicates(["doc_id"])
            .localCheckpoint(eager=True)
        )
        if not docs.take(1):
            return
        qual_ok = docs.filter(self.quality_predicate)
        qual_bad = docs.join(qual_ok, "doc_id", "left_anti")

        corpus = self._read(spark, self.kept_dir, KEPT_SCHEMA, batch_id)
        # NOTE: no forced schema on the index read — the LSH parameter
        # stamp rides column metadata, and forcing INDEX_SCHEMA stripped
        # it, disarming the mismatch guard exactly on the restart path
        # where parameter drift happens (round-5 advice).
        index = self._read(spark, self.index_dir, INDEX_SCHEMA, batch_id)
        # Pin the admission verdicts too: one row per batch doc, consumed
        # by the decisions write AND the admitted semi-join — unpinned, the
        # second consumer replays the whole candidate+verify join tree.
        adm = dedup.incremental_verified_dedup(
            qual_ok, corpus, index=index, threshold_ppm=self.threshold_ppm,
            k=self.k, num_hashes=self.num_hashes, bands=self.bands,
            pin=True,
        ).localCheckpoint(eager=True)

        decisions = qual_bad.select(
            "doc_id",
            F.lit(False).alias("keep"),
            F.lit("quality").alias("reason"),
            F.lit(None).cast("bigint").alias("dup_of"),
        ).unionByName(
            adm.select(
                "doc_id",
                "keep",
                F.when(~F.col("keep"), F.lit("near_dup")).alias("reason"),
                "dup_of",
            )
        )
        decisions.coalesce(self.commit_files).write.mode("overwrite").parquet(
            statedir.batch_dir(self.decisions_dir, batch_id)
        )
        admitted = qual_ok.join(
            adm.filter("keep").select("doc_id"), "doc_id", "left_semi"
        )
        admitted.coalesce(self.commit_files).write.mode("overwrite").parquet(
            statedir.batch_dir(self.kept_dir, batch_id)
        )
        dedup.minhash_band_index(
            admitted, k=self.k, num_hashes=self.num_hashes, bands=self.bands
        ).coalesce(self.commit_files).write.mode("overwrite").parquet(
            statedir.batch_dir(self.index_dir, batch_id)
        )

    def sink(self):
        """The foreachBatch callable for writeStream."""
        return self.foreach_batch
