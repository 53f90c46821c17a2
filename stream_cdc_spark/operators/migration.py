"""Offline index migration — the rebuild path the stamp guards point at.

The persisted indexes are self-describing and refuse mismatched probes
(streaming/ann_index.py centroid digest + storage tier + SQ ranges;
operators/dedup.py LSH parameter/scheme stamp; streaming/
retrieval_index.py tokenizer scheme) with "rebuild" guidance — this
module IS that rebuild. Each operator reads the old state, re-derives
what the new parameters need, and writes a FRESH statedir that passes
the new stamp guard, never mutating the source (an in-place migration
that crashes halfway would leave a state that passes neither stamp).

What can be migrated without the original corpus:

  - ANN index → new centroids and/or a different storage tier: the
    admitted vectors are in the state (sq8 codes dequantize through the
    stamped affine map — a rebuild FROM the sq8 tier re-assigns cells
    from the reconstructed vectors, documented loss ≤ half a
    quantization step per element).
  - LSH dedup snapshot → a different band count: band keys are hashes
    of signature slices, and the signatures are in the state, so
    re-banding recomputes (band, key) from sigs/ alone.

  - Retrieval index → vacuum: physically drop tombstoned docs (the
    erasure half of the right-to-be-forgotten path — tombstones hide a
    doc from every probe instantly; vacuum reclaims the bytes and hard-
    erases the content) by rewriting only the LIVE rows of docs/ and
    postings/ plus a re-aggregated stats partial into a fresh statedir
    with an empty tombstone set.

What CANNOT: anything that changes the underlying sketch — LSH k /
num_hashes / hash-scheme version, a different ANN assignment scheme, a
different retrieval tokenizer. Those need the original corpus replayed
through a fresh sink; the operators below refuse with that guidance
rather than writing an index that looks valid and scores garbage.

Scale shape: both rebuilds are one distributed pass over the source
state (optionally sliced into several commits to bound any single
write), routed through the destination sink's own foreach_batch — so
cell-sorting, word-sorting, stamping, admission caps and the statedir
commit protocol are the production code paths, not re-implementations,
and equality to a from-scratch build is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from stream_cdc_spark.streaming import statedir


def rebuild_ann_index(spark, src, dst, slices: int = 1) -> int:
    """Rebuild the persisted ANN index at ``src`` (an AnnIndexSnapshot)
    into the fresh statedir of ``dst`` (another AnnIndexSnapshot — new
    centroids, new storage tier, or both). Returns the number of vectors
    migrated.

    The LIVE vectors are read from the source state (tombstoned ids
    excluded — a same-parameter rebuild is therefore also the vacuum
    that physically erases deleted vectors; dequantized through the
    stamped affine map when the source is the sq8 tier), split into
    ``slices`` deterministic batches (vec_id mod slices) to bound any
    single commit, and fed through ``dst.foreach_batch`` — the
    destination assigns cells against ITS centroids, quantizes for ITS
    tier, stamps ITS digests, so the result is bit-equal to a
    from-scratch drain of the same vectors (tests assert it) and passes
    ``dst``'s stamp guard by construction.

    ``dst`` must be empty (a partial previous migration must be swept,
    not silently unioned into) and must not share ``src``'s state dir.
    """
    if src.state_dir == dst.state_dir:
        raise ValueError(
            "rebuild_ann_index: src and dst share a state dir — a "
            "migration writes a FRESH statedir (in-place rebuild would "
            "mix assignments from two quantizers under one stamp)"
        )
    if dst.vectors(spark).take(1):
        raise ValueError(
            f"rebuild_ann_index: destination {dst.state_dir!r} is not "
            f"empty — sweep it (or pick a fresh dir) before migrating"
        )
    vecs = src._probe_relation(spark).select(
        F.col("vec_id").alias(dst.id_col),
        F.col("vv").alias(dst.vec_col),
    )
    n = vecs.count()
    for i in range(max(1, slices)):
        dst.foreach_batch(
            vecs.filter(F.col(dst.id_col) % max(1, slices) == i), i
        )
    return n


def rebuild_lsh_snapshot(spark, src, dst) -> int:
    """Re-band the persisted LSH dedup snapshot at ``src`` (an
    LshDedupSnapshot) into the fresh statedir of ``dst`` under a NEW
    band count. Returns the number of documents migrated.

    Band keys are hashes of signature slices, so a band-count change is
    recomputable from sigs/ alone — no corpus text needed. Everything
    else about the sketch is NOT: ``k``, ``num_hashes`` and the hash
    scheme are baked into the signature values themselves, so a
    mismatch there refuses with replay guidance instead of silently
    producing an index whose probes share no keys with its residents.

    Semantics of the rebuilt state: sigs/ copies over verbatim (same
    sketch); index/ and counts/ are recomputed under ``dst.bands`` with
    ``dst.max_bucket`` admission applied in deterministic doc_id order —
    exactly what a from-scratch one-batch drain of the admitted corpus
    would produce (the equality the tests assert). The matches/ emission
    log is NOT migrated: historical emissions are a consumer-facing
    stream, not index state, and a different banding would have
    surfaced a different candidate set — consumers keep their own copy.
    """
    from stream_cdc_spark.operators.dedup import band_buckets

    if src.state_dir == dst.state_dir:
        raise ValueError(
            "rebuild_lsh_snapshot: src and dst share a state dir — a "
            "migration writes a FRESH statedir"
        )
    for attr in ("k", "num_hashes"):
        if getattr(src, attr) != getattr(dst, attr):
            raise ValueError(
                f"rebuild_lsh_snapshot: {attr} differs (src "
                f"{getattr(src, attr)}, dst {getattr(dst, attr)}) — "
                f"signature values bake in k/num_hashes/scheme, so this "
                f"migration needs the original corpus replayed through a "
                f"fresh LshDedupSnapshot, not a re-banding"
            )
    if dst.num_hashes % dst.bands != 0:
        raise ValueError(
            f"rebuild_lsh_snapshot: num_hashes {dst.num_hashes} not "
            f"divisible by dst bands {dst.bands}"
        )
    if dst.processed(spark).take(1):
        raise ValueError(
            f"rebuild_lsh_snapshot: destination {dst.state_dir!r} is not "
            f"empty — sweep it (or pick a fresh dir) before migrating"
        )
    sigs = src.processed(spark).localCheckpoint(eager=True)
    n = sigs.count()
    keyed = band_buckets(
        sigs.withColumnRenamed("doc_id", "id"), dst.num_hashes, dst.bands
    ).withColumnRenamed("id", "doc_id")
    # dst's admission cap, in deterministic doc_id order — identical to
    # what dst._build computes for a single batch holding the corpus
    rn = F.row_number().over(
        Window.partitionBy("band", "key").orderBy("doc_id")
    )
    admitted = (
        keyed.withColumn("rn", rn)
        .filter(F.col("rn") <= dst.max_bucket)
        .select("doc_id", "band", "key")
        .localCheckpoint(eager=True)
    )

    def commit(df: DataFrame, root: str) -> None:
        df.coalesce(dst.commit_files).write.mode("overwrite").parquet(
            statedir.batch_dir(root, 0)
        )

    commit(sigs.select("doc_id", "signature"), dst.sigs_dir)
    commit(admitted, dst.index_dir)
    commit(
        admitted.groupBy("band", "key").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        ),
        dst.counts_dir,
    )
    return n


def vacuum_retrieval_index(spark, src, dst) -> int:
    """Physically remove tombstoned documents from the retrieval index at
    ``src`` (a RetrievalIndexSnapshot) by rewriting only the LIVE rows
    into the fresh statedir of ``dst``. Returns the number of live docs.

    Tombstones make a deleted doc invisible to every probe instantly but
    its postings stay on disk; vacuum is the erasure/reclaim half —
    docs/ and postings/ are anti-joined against the tombstone set (one
    distributed pass, postings re-sorted by word so row-group pruning
    survives), stats/ is re-aggregated from the live ledger, and the
    destination starts with an empty tombstone set. Probes against the
    vacuumed index are bit-equal to the tombstone-aware probes of the
    source (tests assert it).

    ``dst`` must share ``src``'s scheme stamp (a vacuum is not a
    re-tokenization — that path is a corpus replay), must be a different
    state dir, and must be empty.
    """
    if src.state_dir == dst.state_dir:
        raise ValueError(
            "vacuum_retrieval_index: src and dst share a state dir — a "
            "vacuum writes a FRESH statedir (an in-place rewrite that "
            "crashes halfway would drop admitted documents)"
        )
    if src._stamp != dst._stamp:
        raise ValueError(
            f"vacuum_retrieval_index: scheme mismatch (src "
            f"{src._stamp!r}, dst {dst._stamp!r}) — a vacuum preserves "
            f"the index scheme; re-tokenization needs a corpus replay"
        )
    if dst.docs(spark).take(1):
        raise ValueError(
            f"vacuum_retrieval_index: destination {dst.state_dir!r} is "
            f"not empty — sweep it (or pick a fresh dir) before vacuuming"
        )
    dead = src.tombstones(spark).localCheckpoint(eager=True)
    live_docs = (
        src.docs(spark).join(dead, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    live_postings = src.postings(spark).join(dead, "doc_id", "left_anti")

    def commit(df: DataFrame, root: str) -> None:
        df.coalesce(dst.commit_files).write.mode("overwrite").parquet(
            statedir.batch_dir(root, 0)
        )

    commit(live_docs.select("doc_id", "dl"), dst.docs_dir)
    commit(
        live_postings.sortWithinPartitions("word"), dst.postings_dir
    )
    commit(
        live_docs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("l"),
        ),
        dst.stats_dir,
    )
    return live_docs.count()
