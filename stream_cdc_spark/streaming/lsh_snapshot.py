"""Bulk-drain twin of lsh_dedup_stream: foreachBatch snapshot joins.

stateful.lsh_dedup_stream keeps each (band, key) bucket's membership in
the streaming state store and pays one Python group invocation per
touched bucket per micro-batch — the right shape for continuous
admission (small batches, sub-second), but a wall for backlogs: draining
N docs costs ~bands * N mostly-singleton Python groups under the
applyInPandasWithState fallback (measured 284 docs/s on the 10x corpus
in round 4).

This module restructures the SAME admission semantics as JVM-side joins
against a batch-versioned parquet snapshot — the q110 incremental-
admission shape applied inside foreachBatch, so a micro-batch costs a
handful of joins regardless of how many buckets it touches, and no per-
row Python runs anywhere. The reference's continuous coordinator loop
(reference: stream_cdc/processing/worker.py:26-77) is the production
mode this accelerates.

State layout under ``state_dir`` (parquet, batch-versioned with
compaction — exactly-once by the same overwrite + read-exclusion rule as
streaming/statedir.py, which also holds the crash-interleaving proof):

    sigs/batch=<id>/    (doc_id, signature)       every PROCESSED doc
    index/batch=<id>/   (doc_id, band, key)       ADMITTED band keys only
    counts/batch=<id>/  (band, key, cnt)          per-bucket admit increments
    matches/batch=<id>/ (doc_id, dup_of, agree_ppm)
    clusters/{members,parents}/batch=<id>/  (cluster_state=True only)
                        incremental union-find forest over the match
                        graph — continuous cluster membership + min-id
                        survivorship representative (streaming/
                        components.py)
    */compact=<w>/      compacted snapshot of all batches < w

Every ``compact_every`` committed batches each table's subdirs fold into
one atomically-published snapshot (counts additionally re-aggregate on
fold — readers sum increments, so the reduction is read-equivalent),
bounding dir listing and union planning at O(compact_every) regardless
of stream age (``major_every=K`` switches to the leveled tier: cheap L1
delta folds of just the pending batch dirs, with the O(total state) full
fold paid only every K deltas — the shape for a corpus that dwarfs any
micro-batch; statedir module doc); an effectively-empty micro-batch
commits NOTHING (the
read-exclusion rule makes the skipped dirs unobservable — a replay of
the empty batch sees the same pre-batch state either way).

Semantics (matches _bucket_matches):
  - every arriving doc is compared against all bucket residents, emits a
    match per resident with signature agreement >= min_agree (normalized
    to doc_id = max id, dup_of = min id);
  - a doc joins a bucket only while the bucket holds < max_bucket
    residents (hot-boilerplate guard — capped docs still match against
    residents and against in-batch peers that WERE admitted);
  - redelivered docs (any doc_id already in sigs/) are dropped before
    matching, so nothing re-emits across batches — a stronger guard than
    the state-store path's bounded seen-list, because sigs/ is the full
    processed-doc registry.

Emission granularity: one row per distinct (doc_id, dup_of) pair per
micro-batch (the state-store path emits once per colliding band;
consumers dropDuplicates either way).

Scale notes: the batch side of every join is broadcast (a micro-batch is
small by construction); index/ and sigs/ are streamed, never shuffled.
With ``bucketed=True`` compaction publishes index/ as a (band, key)-
bucketed table and sigs/ as a doc_id-bucketed table (the layout
tests/test_bucketing.py proves joins with no snapshot-side Exchange), so
at 100 TB a probe too large to broadcast still joins without shuffling
the corpus, and downstream batch consumers (incremental_verified_dedup)
read the same tables in place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F

from stream_cdc_spark.streaming import statedir

SIGS_SCHEMA = "doc_id bigint, signature array<bigint>"
INDEX_SCHEMA = "doc_id bigint, band int, key bigint"
COUNTS_SCHEMA = "band int, key bigint, cnt bigint"
MATCHES_SCHEMA = "doc_id bigint, dup_of bigint, agree_ppm bigint"


class LshDedupSnapshot:
    """foreachBatch sink over a (doc_id, text) document stream emitting
    near-dup matches and maintaining the admitted-corpus LSH snapshot."""

    def __init__(
        self,
        state_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
        min_agree: float = 0.8,
        max_bucket: int = 64,
        compact_every: int = 16,
        major_every: int = 0,
        bucketed: bool = False,
        num_buckets: int = 32,
        commit_files: int = 1,
        cluster_state: bool = False,
        fs: statedir.LocalFS | None = None,
    ):
        self.state_dir = state_dir
        # protocol-metadata filesystem for the statedir commit protocol
        # (None = local/HDFS default; inject an object-store client for
        # S3/GCS state roots — statedir module doc)
        self.fs = fs
        self.sigs_dir = os.path.join(state_dir, "sigs")
        self.index_dir = os.path.join(state_dir, "index")
        self.counts_dir = os.path.join(state_dir, "counts")
        self.matches_dir = os.path.join(state_dir, "matches")
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.min_agree = min_agree
        self.max_bucket = max_bucket
        self.compact_every = compact_every
        # major_every=K: leveled compaction — pending batch dirs fold
        # into L1 deltas (O(recent)); the full O(total state) fold runs
        # only every K deltas (statedir module doc)
        self.major_every = major_every
        self.bucketed = bucketed
        self.num_buckets = num_buckets
        # A micro-batch is small by construction (the same premise that
        # lets every batch-side join broadcast), so its commit is a
        # single file per table by default — without this each trigger
        # writes up to <shuffle partitions> part files per dir, and the
        # long-horizon file count (and per-batch write latency) balloons.
        self.commit_files = commit_files
        # cluster_state=True maintains dedup-CLUSTER membership (and the
        # min-id survivorship representative) continuously: each batch's
        # committed matches feed the incremental union-find forest under
        # clusters/ in the same foreachBatch pass, so a curation loop
        # reads clusters() instead of re-rolling connected components
        # over the accumulated pair log per decision.
        self._components = None
        if cluster_state:
            from stream_cdc_spark.streaming.components import (
                IncrementalComponentsSnapshot,
            )

            self._components = IncrementalComponentsSnapshot(
                os.path.join(state_dir, "clusters"),
                id_a="dup_of",
                id_b="doc_id",
                compact_every=compact_every,
                major_every=major_every,
                commit_files=commit_files,
                fs=fs,
            )

    # -- state ------------------------------------------------------------
    def _read(self, spark, root: str, schema: str, batch_id: int) -> DataFrame:
        return statedir.read_state(spark, root, schema, batch_id, fs=self.fs)

    def matches(self, spark) -> DataFrame:
        """All matches emitted by committed batches."""
        return self._read(spark, self.matches_dir, MATCHES_SCHEMA, 1 << 62)

    def processed(self, spark) -> DataFrame:
        return self._read(spark, self.sigs_dir, SIGS_SCHEMA, 1 << 62)

    def clusters(self, spark) -> DataFrame:
        """(vertex, component) cluster membership over every committed
        match — component = min doc_id in the near-dup cluster, i.e. the
        survivorship representative. Requires cluster_state=True."""
        if self._components is None:
            raise ValueError(
                "cluster membership requires LshDedupSnapshot("
                "cluster_state=True); without it, roll up matches() with "
                "dedup.connected_components instead"
            )
        return self._components.labels(spark)

    def bucketed_index(self, spark) -> DataFrame | None:
        """The compacted admitted-corpus band index as its registered
        (band, key)-bucketed table — the shuffle-free join side for batch
        consumers; None until the first bucketed compaction ran."""
        if not self.bucketed:
            return None
        return statedir.bucketed_relation(
            spark, self.index_dir, INDEX_SCHEMA, ["band", "key"],
            self.num_buckets, fs=self.fs,
        )

    def _compact(self, spark, batch_id: int) -> None:
        sum_counts = lambda df: df.groupBy("band", "key").agg(  # noqa: E731
            F.sum("cnt").alias("cnt")
        )
        plans = [
            (self.matches_dir, MATCHES_SCHEMA, None, None),
            (self.counts_dir, COUNTS_SCHEMA, sum_counts, None),
            (self.sigs_dir, SIGS_SCHEMA, None, ["doc_id"]),
            (self.index_dir, INDEX_SCHEMA, None, ["band", "key"]),
        ]
        for root, schema, transform, bucket_cols in plans:
            statedir.maybe_compact(
                spark, root, schema, batch_id,
                every=self.compact_every,
                major_every=self.major_every,
                transform=transform,
                bucket_cols=bucket_cols if self.bucketed else None,
                num_buckets=self.num_buckets,
                fs=self.fs,
            )

    # -- the sink ---------------------------------------------------------
    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # fold committed prefix first — a replayed batch re-folds the
        # identical prefix, so compaction inherits replay idempotence
        self._compact(spark, batch_id)
        built = self._build(spark, batch_df, batch_id)
        if built is None:
            # nothing to commit: the read-exclusion rule makes a missing
            # batch dir indistinguishable from an empty one, so skipping
            # the write keeps replay exact AND stops metadata growth on
            # idle triggers (round-5: 4 empty dirs per empty batch)
            return
        batch_sigs, admitted_bk, matches = built

        # -- commit: overwrite this batch's own subdirs -------------------
        def commit(df: DataFrame, root: str) -> None:
            df.coalesce(self.commit_files).write.mode("overwrite").parquet(
                statedir.batch_dir(root, batch_id)
            )

        commit(matches, self.matches_dir)
        commit(batch_sigs, self.sigs_dir)
        commit(admitted_bk.select("doc_id", "band", "key"), self.index_dir)
        commit(
            admitted_bk.groupBy("band", "key").agg(
                F.count(F.lit(1)).alias("cnt")
            ),
            self.counts_dir,
        )
        if self._components is not None:
            # Fold this batch's matches into the cluster forest — read
            # the just-COMMITTED rows back (no recompute of the match
            # plan) and let the components sink run its own compaction
            # and replay-idempotent batch-dir overwrite under clusters/.
            # A replayed batch re-reads identical matches, so cluster
            # state inherits the exactly-once rule.
            edges = spark.read.parquet(
                statedir.batch_dir(self.matches_dir, batch_id)
            ).select("dup_of", "doc_id")
            if self._components.is_empty(batch_id):
                # cluster_state enabled AFTER matches history accrued:
                # without a backfill, clusters() would silently ignore
                # historical pairs and report wrong survivorship roots
                # (review finding). Fold the whole committed history
                # with this batch — a one-time O(total matches) cost,
                # replay-exact because a replayed batch's own forest
                # dirs are invisible at its read bound, so it recomputes
                # the identical union.
                history = self._read(
                    spark, self.matches_dir, MATCHES_SCHEMA, batch_id
                ).select("dup_of", "doc_id")
                edges = history.unionByName(edges)
            self._components.foreach_batch(edges, batch_id)

    def _build(self, spark, batch_df: DataFrame, batch_id: int):
        """Build (batch_sigs, admitted_bk, matches) for one micro-batch, or
        None for an effectively-empty batch. Separated from the commit so
        plan-shape tests can assert the scale properties (index side never
        rides a shuffle join) on the exact relations foreach_batch writes."""
        from stream_cdc_spark.operators.dedup import (
            band_buckets,
            minhash_signatures,
        )

        docs = batch_df.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        ).dropDuplicates(["doc_id"])

        state_sigs = self._read(spark, self.sigs_dir, SIGS_SCHEMA, batch_id)
        # redelivery guard: anything already processed is dropped whole
        docs = docs.join(
            state_sigs.select("doc_id"), "doc_id", "left_anti"
        )

        # Signatures via the BATCH operator (explode + groupBy with 64
        # map-side-combined mins) — a foreachBatch body works on a plain
        # batch DataFrame, so the streaming path's narrow-expression
        # constraint doesn't apply and the proven-fastest shape does.
        # Values are identical (min over xxhash64(shingle, i)), so
        # emissions still line up with the batch LSH family and the
        # state-store stream. Emptiness is decided on the LAZY plan
        # (take(1) early-exits) BEFORE the eager pin, so an idle trigger
        # never pays a full materialization; the pin then serves the four
        # downstream joins (a micro-batch is small).
        batch_sigs = minhash_signatures(
            docs, "text", "doc_id", self.k, self.num_hashes
        ).withColumnRenamed("id", "doc_id")
        if not batch_sigs.take(1):
            return None
        batch_sigs = batch_sigs.localCheckpoint(eager=True)
        keyed = band_buckets(
            batch_sigs.withColumnRenamed("doc_id", "id"),
            self.num_hashes,
            self.bands,
        ).withColumnRenamed("id", "doc_id")

    # -- candidate generation: slim (band, key) joins, batch side broadcast
        bk = keyed.select("band", "key", "doc_id")
        state_index = self._read(spark, self.index_dir, INDEX_SCHEMA, batch_id)
        cand_corpus = (
            state_index.withColumnRenamed("doc_id", "other_id")
            .join(F.broadcast(bk), ["band", "key"])
            .select("doc_id", "other_id")
        )

        # admission (cap) decision — needed before in-batch matching so a
        # capped earlier arrival does not match later in-batch peers,
        # mirroring _bucket_matches' members-only comparison. The counts
        # relation is corpus-wide, so prune it to the batch's buckets
        # (broadcast semi-join) BEFORE aggregating/broadcasting — the
        # shuffle and the broadcast are then both bounded by the batch.
        batch_buckets = bk.select("band", "key").dropDuplicates()
        state_counts = (
            self._read(spark, self.counts_dir, COUNTS_SCHEMA, batch_id)
            .join(F.broadcast(batch_buckets), ["band", "key"], "left_semi")
            .groupBy("band", "key")
            .agg(F.sum("cnt").alias("resident_cnt"))
        )
        rn = F.row_number().over(
            Window.partitionBy("band", "key").orderBy("doc_id")
        )
        slots = (
            bk.withColumn("rn", rn)
            .join(F.broadcast(state_counts), ["band", "key"], "left")
            .withColumn(
                "admitted",
                F.col("rn") + F.coalesce(F.col("resident_cnt"), F.lit(0))
                <= F.lit(self.max_bucket),
            )
        )
        # pinned: three consumers (in-batch candidates, index commit,
        # counts commit) would each replay the row_number window shuffle
        admitted_bk = (
            slots.filter("admitted")
            .select("band", "key", "doc_id")
            .localCheckpoint(eager=True)
        )

        cand_batch = (
            admitted_bk.withColumnRenamed("doc_id", "other_id")
            .join(F.broadcast(bk), ["band", "key"])
            .filter(F.col("other_id") < F.col("doc_id"))
            .select("doc_id", "other_id")
        )

        cand = (
            cand_corpus.unionByName(cand_batch)
            .select(
                F.greatest("doc_id", "other_id").alias("hi"),
                F.least("doc_id", "other_id").alias("lo"),
            )
            .dropDuplicates(["hi", "lo"])
        )

        # -- verification: signature agreement, JVM-side zip_with ---------
        # candidates << corpus, so both sig attachments broadcast the pair
        # side; with ``bucketed`` compaction sigs/ is a doc_id-bucketed
        # table and these become pruned probes instead of scans
        sigs_all = state_sigs.unionByName(batch_sigs)
        # both attachment joins must build the PAIR side (hint each stage
        # explicitly — the hint on cand does not survive through the first
        # join, and a static SortMergeJoin here would sort the corpus-wide
        # sigs relation every micro-batch)
        half = F.broadcast(cand).join(
            sigs_all.select(
                F.col("doc_id").alias("hi"),
                F.col("signature").alias("sig_hi"),
            ),
            "hi",
        )
        pairs = F.broadcast(half).join(
            sigs_all.select(
                F.col("doc_id").alias("lo"),
                F.col("signature").alias("sig_lo"),
            ),
            "lo",
        )
        agree = F.size(
            F.filter(
                F.zip_with(F.col("sig_hi"), F.col("sig_lo"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        matches = (
            pairs.withColumn("agree", agree)
            .filter(
                F.col("agree") >= F.lit(int_ceil(self.min_agree, self.num_hashes))
            )
            .select(
                F.col("hi").alias("doc_id"),
                F.col("lo").alias("dup_of"),
                (F.lit(1_000_000) * F.col("agree") / F.lit(self.num_hashes))
                .cast("bigint")
                .alias("agree_ppm"),
            )
        )
        return batch_sigs, admitted_bk, matches

    @property
    def sink(self):
        return self.foreach_batch


def int_ceil(min_agree: float, num_hashes: int) -> int:
    """Smallest integer agreement count satisfying agree/num_hashes >=
    min_agree — keeps the JVM filter integer-exact instead of re-deriving
    the float ratio per row."""
    import math

    return math.ceil(min_agree * num_hashes - 1e-9)
