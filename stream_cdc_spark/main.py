"""Runnable pipeline entrypoint — the engine's `python -m stream_cdc.main`.

Reference main() (stream_cdc/main.py:16-66) wires components from env and
runs the worker loop until SIGINT/SIGTERM. Same contract here, resolved
through the registries (O28) from the same env names (O29):

  DS_TYPE=cdc_replay|events_replay   source (default cdc_replay)
  DS_PATH=<events parquet path>      source path
  STREAM_TYPE=memory_queue           sink (FileQueue dir via QUEUE_DIR)
  CHECKPOINT_DIR=<dir>               offset/state checkpoint (O18-O20)
  BATCH_SIZE / FLUSH_INTERVAL        rate cap / trigger (O15)
  DRAIN_AND_EXIT=1                   availableNow mode (backfill/replay)

Curation mode (PIPELINE=curation): stream a (doc_id, text) document feed
through the continuous-curation sink instead — quality gates +
incremental near-dup admission with durable batch-versioned state:

  PIPELINE=curation DOCS_PATH=<documents parquet dir>
  CURATION_STATE_DIR=<dir>           decisions/kept/index state tables
  MIN_TOKENS=<n>                     quality gate (default 5)
  COMPACT_EVERY=<n>                  fold state dirs every n batches
                                     (default 16; 0 disables)
  COMPACT_MAJOR_EVERY=<K>            leveled: minor L1 delta folds,
                                     full fold every K deltas
                                     (default 0 = single-level)
  LSH_BUCKETED=1                     lsh_dedup mode: compact into
                                     bucketed snapshot tables
  CLUSTER_STATE=1                    lsh_dedup mode: maintain dedup-
                                     cluster membership continuously
                                     (incremental union-find forest)

ANN index mode (PIPELINE=ann_index): stream a (vec_id, embedding) feed
into the persisted IVF index (streaming/ann_index.py) — continuous
similarity-search admission against a fixed offline-trained quantizer:

  PIPELINE=ann_index EMB_PATH=<embeddings parquet dir>
  CENTROIDS_PATH=<parquet of (cid bigint, cv array<float>)>  REQUIRED
  ANN_STATE_DIR=<dir>                vectors/ state table
  COMPACT_EVERY / COMPACT_MAJOR_EVERY  same fold knobs as curation

Retrieval index mode (PIPELINE=retrieval_index): stream a (doc_id,
text) feed into the persisted inverted index (streaming/
retrieval_index.py) — continuous BM25/TF-IDF corpus-statistics
maintenance:

  PIPELINE=retrieval_index DOCS_PATH=<documents parquet dir>
  RETR_STATE_DIR=<dir>               docs/ postings/ stats/ state tables
  COMPACT_EVERY / COMPACT_MAJOR_EVERY  same fold knobs as curation

Versioned retrieval mode (PIPELINE=retrieval_index_versioned): the
CDC-native variant over a (doc_id, version, text) UPSERT feed — updates
supersede prior images under the version-max read rule
(RETR_VERSION_COL overrides the version column name; explicitly empty
opts a version-less feed in as version 0).

Versioned ANN mode (PIPELINE=ann_index_versioned): the CDC-native
variant over a (vec_id, version, embedding) UPSERT feed — re-embeddings
supersede prior vectors under the version-max read rule
(EMB_VERSION_COL mirrors RETR_VERSION_COL).

Knobs shared by the index modes (ann_index, ann_index_versioned,
retrieval_index, retrieval_index_versioned):

  DELETES_PATH=<parquet dir of ids>  right-to-be-forgotten feed: a
                                     second query draining ids into the
                                     index's TombstoneLog (DELETES_GLOB
                                     filters files)
  STATE_BUCKETED=1                   fold the admission ledger into a
                                     bucketed snapshot — the 100 TB
                                     shape: the per-trigger redelivery
                                     anti-join reads the ledger side
                                     Exchange-free past broadcast size
  STATE_NUM_BUCKETS=<n>              bucket count (default 32)

SIGINT/SIGTERM stop the query gracefully (O27): the in-flight epoch
commits, the buffer is never lost, resume continues from the checkpoint.

Run:  python -m stream_cdc_spark.main
"""

from __future__ import annotations

import os
import re
import signal
import sys

from pyspark.sql import functions as F

from stream_cdc_spark.config import AppConfig
from stream_cdc_spark.filters import FilterChain
from stream_cdc_spark.session import get_spark
from stream_cdc_spark.sinks.queue import FileQueue, foreach_batch_writer
from stream_cdc_spark.sources import datasource_registry
from stream_cdc_spark.streaming.pipeline import CdcPipeline


def _curation_main(cfg, pipeline: str = "curation") -> int:
    """PIPELINE=curation | lsh_dedup: a continuous document-feed pipeline
    over a parquet directory — quality-gated dedup admission (curation)
    or near-dup match emission via the snapshot-join LSH sink
    (lsh_dedup). Same streaming scaffold, sink chosen by registry name."""
    from stream_cdc_spark.sources import sink_registry

    spark = get_spark(app_name=f"stream-cdc-spark-{pipeline}")
    spark.sparkContext.setLogLevel(cfg.log_level)
    docs_path = os.environ.get("DOCS_PATH", "/root/testdata/sf0.001")
    state_dir = os.environ.get(
        "CURATION_STATE_DIR", f"/tmp/stream-cdc-spark-{pipeline}"
    )
    ckpt = os.environ.get("CHECKPOINT_DIR", state_dir + "-ckpt")
    drain = os.environ.get("DRAIN_AND_EXIT", "0") == "1"
    min_tokens = int(os.environ.get("MIN_TOKENS", "5"))
    # state-layer knobs: COMPACT_EVERY=<n batch dirs before a fold; 0
    # disables>, COMPACT_MAJOR_EVERY=<K deltas before a full fold; 0 =
    # single-level>, LSH_BUCKETED=1 publishes compacted LSH snapshots as
    # bucketed tables (lsh_dedup mode only)
    sink_kw = {
        "compact_every": int(os.environ.get("COMPACT_EVERY", "16")),
        "major_every": int(os.environ.get("COMPACT_MAJOR_EVERY", "0")),
    }
    if pipeline == "lsh_dedup" and os.environ.get("LSH_BUCKETED", "0") == "1":
        sink_kw["bucketed"] = True
    # CLUSTER_STATE=1 (lsh_dedup mode): also maintain dedup-cluster
    # membership — each batch's matches fold into the incremental
    # union-find forest under clusters/, and the min-id representative
    # is the survivorship pick (streaming/components.py)
    if pipeline == "lsh_dedup" and os.environ.get("CLUSTER_STATE", "0") == "1":
        sink_kw["cluster_state"] = True
    # MEDIA_BLOB_COL=<col>: multimodal curation — the feed also carries a
    # thumbnail blob column and the sink runs the q132 perceptual
    # admission between the quality gate and text dedup
    media_blob = os.environ.get("MEDIA_BLOB_COL", "")
    if pipeline == "curation" and media_blob:
        # the value is spliced verbatim into a readStream DDL schema
        # string and select(); anything but a simple identifier would
        # surface as a confusing parse error (or an unintended extra
        # column) far from the env var — fail loudly here instead
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", media_blob):
            raise ValueError(
                f"MEDIA_BLOB_COL must be a simple column identifier "
                f"([A-Za-z_][A-Za-z0-9_]*), got {media_blob!r}"
            )
        sink_kw["media_blob_col"] = media_blob

    sink = sink_registry.create(
        pipeline, state_dir=state_dir, min_tokens=min_tokens, **sink_kw
    )
    # DOCS_PATH may be an sf dir (documents.parquet file inside, next to
    # other tables with different schemas) or a directory of document
    # parquet files (part-*.parquet). The streaming file source needs a
    # directory, so glob-filter within the parent — but only narrow to
    # 'documents.parquet' when the sf-dir layout is actually present;
    # otherwise default to '*.parquet' so arbitrary feed layouts stream.
    # DOCS_GLOB overrides either default.
    default_glob = (
        "documents.parquet"
        if os.path.exists(os.path.join(docs_path, "documents.parquet"))
        else "*.parquet"
    )
    docs_glob = os.environ.get("DOCS_GLOB", default_glob)
    feed_schema = "doc_id bigint, text string"
    feed_cols = ["doc_id", "text"]
    if pipeline == "curation" and media_blob:
        feed_schema += f", {media_blob} binary"
        feed_cols.append(media_blob)
    stream = (
        spark.readStream.schema(feed_schema)
        .option("pathGlobFilter", docs_glob)
        .parquet(docs_path)
        .select(*feed_cols)
    )
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
    )
    query = (
        writer.trigger(availableNow=True) if drain else writer
    ).start()

    def _stop(signum, frame):
        print(f"signal {signum}: stopping curation", file=sys.stderr)
        query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    query.awaitTermination()
    print(f"{pipeline} stopped; state at {state_dir}, checkpoint at {ckpt}")
    return 0


def _bucketed_kw() -> dict:
    """STATE_BUCKETED=1 folds the index's admission ledger into a
    bucketed snapshot (STATE_NUM_BUCKETS, default 32) — the 100 TB
    admission shape: the per-trigger redelivery anti-join reads the
    corpus-sized ledger side with zero Exchange past broadcast size
    (streaming/ann_index.py, streaming/retrieval_index.py docs)."""
    if os.environ.get("STATE_BUCKETED", "0") != "1":
        return {}
    return {
        "bucketed": True,
        "num_buckets": int(os.environ.get("STATE_NUM_BUCKETS", "32")),
    }


def _maybe_delete_stream(spark, state_dir: str, id_col: str, ckpt: str,
                         drain: bool, sink_fn=None):
    """The optional right-to-be-forgotten feed of the index pipeline
    modes: DELETES_PATH names a parquet dir of id rows (column name =
    the index's id column; DELETES_ID_COL overrides), streamed into the
    index's TombstoneLog as a SECOND query with its own checkpoint (its
    batch ids never collide with the admit stream's — separate state
    root, reads-only tombstones). ``sink_fn`` overrides the sink body
    (the composed cdc_full mode fans one feed into BOTH indexes'
    tombstone logs); it receives (df with the ids as ``id_col``,
    batch_id). Returns the started query, or None when no feed is
    configured."""
    from stream_cdc_spark.streaming.statedir import TombstoneLog

    deletes_path = os.environ.get("DELETES_PATH", "")
    if not deletes_path:
        return None
    src_col = os.environ.get("DELETES_ID_COL", id_col)
    glob = os.environ.get("DELETES_GLOB", "*.parquet")
    # fail LOUDLY on a misnamed id column: the forced streaming schema
    # would otherwise fill a missing column with nulls, tombstone
    # nothing, and exit 0 — a silent no-op on a compliance path. Best
    # effort: only checkable once the feed has files (a not-yet-written
    # feed dir is legitimate in continuous mode).
    try:
        avail = (
            spark.read.option("pathGlobFilter", glob)
            .parquet(deletes_path)
            .columns
        )
    except Exception:
        avail = None  # no files yet: nothing to contradict
    if avail is not None and src_col not in avail:
        raise ValueError(
            f"DELETES_PATH feed at {deletes_path!r} has columns {avail} "
            f"but the deletion id column is {src_col!r} (the index's id "
            f"column; override with DELETES_ID_COL). A forced schema "
            f"would read the missing column as all-null and delete "
            f"nothing."
        )
    if sink_fn is not None:
        def fb(df, bid, _fn=sink_fn, _src=src_col, _id=id_col):
            _fn(df.select(F.col(_src).cast("long").alias(_id)), bid)
    else:
        tomb = TombstoneLog(
            os.path.join(state_dir, "tombstones"),
            store_col=id_col,
            source_col=src_col,
            compact_every=int(os.environ.get("COMPACT_EVERY", "16")),
            major_every=int(os.environ.get("COMPACT_MAJOR_EVERY", "0")),
        )
        fb = tomb.append
    stream = (
        spark.readStream.schema(f"{src_col} bigint")
        .option("pathGlobFilter", glob)
        .parquet(deletes_path)
        .select(src_col)
    )
    writer = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt + "-deletes")
    )
    return (writer.trigger(availableNow=True) if drain else writer).start()


def _require_version_column(
    spark, path: str, glob: str, ver: str, env_name: str, consequence: str
) -> None:
    """The versioned feed modes' shared silent-no-op guard: a missing
    version column would read as all-null under the forced streaming
    schema, coalesce every row to (id, 0), and first-wins admission
    would drop every update as a redelivery — stale images served
    forever with exit 0. Best effort: only checkable once the feed has
    files (a not-yet-written feed dir is legitimate in continuous
    mode)."""
    try:
        avail = (
            spark.read.option("pathGlobFilter", glob).parquet(path).columns
        )
    except Exception:
        return  # no files yet: nothing to contradict
    if ver not in avail:
        raise ValueError(
            f"versioned feed at {path!r} has columns {avail} but the "
            f"version column is {ver!r} (override with {env_name}; set "
            f"{env_name}= empty to opt a version-less feed into "
            f"versioned mode as version 0). A forced schema would read "
            f"the missing column as all-null and {consequence}."
        )


def _await_streams(spark, queries, drain: bool) -> None:
    """Await the mode's streaming queries. Drain mode: every
    availableNow query must complete — await each (completion order is
    irrelevant). Continuous mode with more than one query: a dead feed
    must FAIL THE PIPELINE, not die silently behind the healthy one —
    await ANY termination, stop the survivors, then re-await each so a
    failed query's exception propagates (exit != 0). Without this, a
    crashed DELETES_PATH stream would stop applying legally-required
    deletions while admission kept running and looked healthy."""
    qs = [q for q in queries if q is not None]
    if drain or len(qs) == 1:
        for q in qs:
            q.awaitTermination()
        return
    # resetTerminated() runs AFTER the queries started, so a query that
    # died in that window is invisible to awaitAnyTermination (it would
    # block forever on the healthy survivor — the exact silent-dead-feed
    # hang this function exists to prevent). Poll each query's isActive
    # alongside the bounded await so an already-terminated feed is
    # noticed on the first loop iteration.
    spark.streams.resetTerminated()
    try:
        while True:
            if spark.streams.awaitAnyTermination(5):
                break
            if any(not q.isActive for q in qs):
                break
    finally:
        for q in qs:
            if q.isActive:
                q.stop()
    for q in qs:
        q.awaitTermination()


def _ann_index_main(cfg, versioned: bool = False) -> int:
    """PIPELINE=ann_index: continuous IVF index admission over a
    (vec_id, embedding) parquet feed — same streaming scaffold as the
    curation modes, embedding-feed schema and a required centroid set.
    PIPELINE=ann_index_versioned: the CDC-native variant over a
    (vec_id, version, embedding) UPSERT feed — re-embeddings supersede
    prior vectors under the version-max read rule. A feed missing the
    version column FAILS LOUDLY (best-effort column check, like the
    DELETES_PATH guard); EMB_VERSION_COL= (explicitly empty) opts a
    version-less feed in as version 0.
    DELETES_PATH adds the deletion feed (_maybe_delete_stream)."""
    from stream_cdc_spark.sources import sink_registry

    mode = "ann_index_versioned" if versioned else "ann_index"
    spark = get_spark(app_name="stream-cdc-spark-" + mode.replace("_", "-"))
    spark.sparkContext.setLogLevel(cfg.log_level)
    emb_path = os.environ.get("EMB_PATH", "/root/testdata/sf0.001")
    state_dir = os.environ.get("ANN_STATE_DIR", "/tmp/stream-cdc-spark-ann")
    ckpt = os.environ.get("CHECKPOINT_DIR", state_dir + "-ckpt")
    drain = os.environ.get("DRAIN_AND_EXIT", "0") == "1"
    sink = sink_registry.create(
        mode,
        state_dir=state_dir,
        centroids_path=os.environ.get("CENTROIDS_PATH", ""),
        compact_every=int(os.environ.get("COMPACT_EVERY", "16")),
        major_every=int(os.environ.get("COMPACT_MAJOR_EVERY", "0")),
        **_bucketed_kw(),
    )
    default_glob = (
        "embeddings.parquet"
        if os.path.exists(os.path.join(emb_path, "embeddings.parquet"))
        else "*.parquet"
    )
    emb_glob = os.environ.get("EMB_GLOB", default_glob)
    ver = os.environ.get("EMB_VERSION_COL", "version")
    versionless = versioned and not ver
    if versioned and not versionless:
        _require_version_column(
            spark, emb_path, emb_glob, ver, "EMB_VERSION_COL",
            "drop every re-embedding as a redelivery",
        )
    feed_schema = (
        f"vec_id bigint, {ver} bigint, embedding array<float>"
        if versioned and not versionless
        else "vec_id bigint, embedding array<float>"
    )
    stream = (
        spark.readStream.schema(feed_schema)
        .option("pathGlobFilter", emb_glob)
        .parquet(emb_path)
    )
    if versioned and not versionless:
        stream = stream.select(
            "vec_id",
            F.coalesce(F.col(ver).cast("long"), F.lit(0)).alias("version"),
            "embedding",
        )
    elif versioned:
        stream = stream.select(
            "vec_id", F.lit(0).cast("long").alias("version"), "embedding"
        )
    else:
        stream = stream.select("vec_id", "embedding")
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
    )
    # the deletion feed (and its loud column validation) starts FIRST:
    # a validation failure after the admit query started would leak a
    # running orphan query into the session — it keeps admitting while
    # main() has already failed, and a retry trips over its half-written
    # checkpoint. Tombstones are reads-only exclusion, so the relative
    # start order never changes the final state.
    del_query = _maybe_delete_stream(spark, state_dir, "vec_id", ckpt, drain)
    query = (writer.trigger(availableNow=True) if drain else writer).start()

    def _stop(signum, frame):
        print(f"signal {signum}: stopping {mode}", file=sys.stderr)
        query.stop()
        if del_query is not None:
            del_query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    _await_streams(spark, [query, del_query], drain)
    print(f"{mode} stopped; state at {state_dir}, checkpoint at {ckpt}")
    return 0


def _retrieval_index_main(cfg, versioned: bool = False) -> int:
    """PIPELINE=retrieval_index: continuous inverted-index (BM25/TF-IDF)
    admission over a (doc_id, text) parquet feed — same streaming
    scaffold as the ann_index mode (streaming/retrieval_index.py).
    PIPELINE=retrieval_index_versioned: the CDC-native variant over a
    (doc_id, version, text) UPSERT feed (updates supersede prior images
    under the version-max read rule). A feed missing the version column
    FAILS LOUDLY (best-effort column check, like the DELETES_PATH
    guard); RETR_VERSION_COL= (explicitly empty) opts a version-less
    feed in as version 0 (insert-only until updates appear).
    DELETES_PATH adds the deletion feed (_maybe_delete_stream)."""
    from stream_cdc_spark.sources import sink_registry

    mode = "retrieval_index_versioned" if versioned else "retrieval_index"
    spark = get_spark(app_name="stream-cdc-spark-" + mode.replace("_", "-"))
    spark.sparkContext.setLogLevel(cfg.log_level)
    docs_path = os.environ.get("DOCS_PATH", "/root/testdata/sf0.001")
    state_dir = os.environ.get("RETR_STATE_DIR", "/tmp/stream-cdc-spark-retr")
    ckpt = os.environ.get("CHECKPOINT_DIR", state_dir + "-ckpt")
    drain = os.environ.get("DRAIN_AND_EXIT", "0") == "1"
    sink = sink_registry.create(
        mode,
        state_dir=state_dir,
        compact_every=int(os.environ.get("COMPACT_EVERY", "16")),
        major_every=int(os.environ.get("COMPACT_MAJOR_EVERY", "0")),
        **_bucketed_kw(),
    )
    default_glob = (
        "documents.parquet"
        if os.path.exists(os.path.join(docs_path, "documents.parquet"))
        else "*.parquet"
    )
    # RETR_VERSION_COL= (explicitly empty) opts a version-less feed into
    # versioned mode: every row admits as version 0 (insert-only
    # first-wins); otherwise the shared guard fails loudly on a feed
    # missing the version column (_require_version_column doc).
    ver = os.environ.get("RETR_VERSION_COL", "version")
    versionless = versioned and not ver
    docs_glob = os.environ.get("DOCS_GLOB", default_glob)
    if versioned and not versionless:
        _require_version_column(
            spark, docs_path, docs_glob, ver, "RETR_VERSION_COL",
            "drop every update as a redelivery",
        )
    feed_schema = (
        f"doc_id bigint, {ver} bigint, text string"
        if versioned and not versionless
        else "doc_id bigint, text string"
    )
    stream = (
        spark.readStream.schema(feed_schema)
        .option("pathGlobFilter", docs_glob)
        .parquet(docs_path)
    )
    if versioned and not versionless:
        stream = stream.select(
            "doc_id",
            F.coalesce(F.col(ver).cast("long"), F.lit(0)).alias("version"),
            "text",
        )
    elif versioned:
        stream = stream.select(
            "doc_id", F.lit(0).cast("long").alias("version"), "text"
        )
    else:
        stream = stream.select("doc_id", "text")
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
    )
    # deletion feed first — orphan-query rule, see _ann_index_main
    del_query = _maybe_delete_stream(spark, state_dir, "doc_id", ckpt, drain)
    query = (writer.trigger(availableNow=True) if drain else writer).start()

    def _stop(signum, frame):
        print(f"signal {signum}: stopping {mode}", file=sys.stderr)
        query.stop()
        if del_query is not None:
            del_query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    _await_streams(spark, [query, del_query], drain)
    print(f"{mode} stopped; state at {state_dir}, checkpoint at {ckpt}")
    return 0


def _cdc_full_main(cfg) -> int:
    """PIPELINE=cdc_full: the composed production pipeline — one typed
    CDC envelope feed (event_type, gtid_seq, content struct with
    doc_id/text/embedding) driving the curation quality gate, the
    versioned retrieval index AND the versioned ANN index under ONE
    checkpoint (streaming/cdc_full.py). DELETES_PATH adds an
    out-of-band deletion feed applied to both indexes.

      EVENTS_PATH=<envelope parquet dir>   (EVENTS_GLOB filters files)
      CDC_STATE_DIR=<root>                 sub-roots retr/ and ann/
      CENTROIDS_PATH=<(cid, cv) parquet>   REQUIRED (IVF quantizer)
      MIN_TOKENS=<n>                       quality gate (default 5)
      COMPACT_EVERY / COMPACT_MAJOR_EVERY / STATE_BUCKETED /
      STATE_NUM_BUCKETS                    shared state knobs
    """
    from stream_cdc_spark.sources import sink_registry
    from stream_cdc_spark.streaming.cdc_full import CDC_FULL_FEED_SCHEMA

    spark = get_spark(app_name="stream-cdc-spark-cdc-full")
    spark.sparkContext.setLogLevel(cfg.log_level)
    events_path = os.environ.get("EVENTS_PATH", "/root/testdata/sf0.001")
    state_dir = os.environ.get(
        "CDC_STATE_DIR", "/tmp/stream-cdc-spark-cdc-full"
    )
    ckpt = os.environ.get("CHECKPOINT_DIR", state_dir + "-ckpt")
    drain = os.environ.get("DRAIN_AND_EXIT", "0") == "1"
    # the registry-created sink is the pipeline OBJECT's foreach_batch;
    # keep the object for the deletion feed's two-index fan-out
    pipe = sink_registry.create(
        "cdc_full",
        state_dir=state_dir,
        centroids_path=os.environ.get("CENTROIDS_PATH", ""),
        min_tokens=int(os.environ.get("MIN_TOKENS", "5")),
        compact_every=int(os.environ.get("COMPACT_EVERY", "16")),
        major_every=int(os.environ.get("COMPACT_MAJOR_EVERY", "0")),
        _return_pipeline=True,
        **_bucketed_kw(),
    )
    events_glob = os.environ.get("EVENTS_GLOB", "*.parquet")
    # loud startup guard (best effort, like _require_version_column): a
    # feed missing any envelope column reads all-null under the forced
    # schema; the sink ALSO fails per-batch on null upsert versions
    try:
        feed_schema = (
            spark.read.option("pathGlobFilter", events_glob)
            .parquet(events_path)
            .schema
        )
    except Exception:
        feed_schema = None  # no files yet: nothing to contradict
    if feed_schema is not None:
        avail = set(feed_schema.names)
        missing = {"event_type", "gtid_seq", "content"} - avail
        if missing:
            raise ValueError(
                f"cdc_full feed at {events_path!r} has columns "
                f"{sorted(avail)} but the envelope schema needs "
                f"{sorted(missing)} — a forced schema would read them "
                f"as all-null (upserts with null versions break "
                f"exactly-once admission and vanish from probes)."
            )
        # the CONTENT STRUCT's fields too (ADVICE r13): a feed whose
        # content struct lacks embedding (or doc_id/text) reads that
        # field as all-null under the forced schema — the gate still
        # passes on text while the ANN leg admits null vectors whose
        # first-wins slots a corrected redelivery can never reclaim.
        # The sink ALSO fails per-batch on null ids/embeddings.
        from pyspark.sql.types import StructType

        content_t = feed_schema["content"].dataType
        content_fields = (
            set(content_t.names)
            if isinstance(content_t, StructType)
            else set()
        )
        cmissing = {"doc_id", "text", "embedding"} - content_fields
        if cmissing:
            raise ValueError(
                f"cdc_full feed at {events_path!r} has content fields "
                f"{sorted(content_fields)} but the envelope schema "
                f"needs {sorted(cmissing)} — a forced schema would "
                f"read them as all-null (null doc_ids/embeddings "
                f"would permanently occupy first-wins admission slots "
                f"and surface null-cosine candidates, silently)."
            )
    stream = (
        spark.readStream.schema(CDC_FULL_FEED_SCHEMA)
        .option("pathGlobFilter", events_glob)
        .parquet(events_path)
    )
    writer = (
        stream.writeStream.foreachBatch(pipe.foreach_batch)
        .option("checkpointLocation", ckpt)
    )
    # deletion feed first — orphan-query rule, see _ann_index_main
    del_query = _maybe_delete_stream(
        spark, state_dir, "doc_id", ckpt, drain, sink_fn=pipe.delete_batch
    )
    query = (writer.trigger(availableNow=True) if drain else writer).start()

    def _stop(signum, frame):
        print(f"signal {signum}: stopping cdc_full", file=sys.stderr)
        query.stop()
        if del_query is not None:
            del_query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    _await_streams(spark, [query, del_query], drain)
    print(f"cdc_full stopped; state at {state_dir}, checkpoint at {ckpt}")
    return 0


def main() -> int:
    cfg = AppConfig.load()
    pipeline = os.environ.get("PIPELINE", "cdc")
    if pipeline in ("curation", "lsh_dedup"):
        return _curation_main(cfg, pipeline)
    if pipeline == "cdc_full":
        return _cdc_full_main(cfg)
    if pipeline == "ann_index":
        return _ann_index_main(cfg)
    if pipeline == "ann_index_versioned":
        return _ann_index_main(cfg, versioned=True)
    if pipeline == "retrieval_index":
        return _retrieval_index_main(cfg)
    if pipeline == "retrieval_index_versioned":
        return _retrieval_index_main(cfg, versioned=True)
    spark = get_spark(app_name="stream-cdc-spark-pipeline")
    spark.sparkContext.setLogLevel(cfg.log_level)

    ds_type = os.environ.get("DS_TYPE", "cdc_replay")
    ds_path = os.environ.get(
        "DS_PATH", "/root/testdata/sf0.001/events.parquet"
    )
    queue_dir = os.environ.get("QUEUE_DIR", "/tmp/stream-cdc-spark-queue")
    ckpt = os.environ.get("CHECKPOINT_DIR", "/tmp/stream-cdc-spark-ckpt")
    drain = os.environ.get("DRAIN_AND_EXIT", "0") == "1"

    if ds_type == "cdc_replay":
        source = datasource_registry.create(
            ds_type, spark=spark, path=ds_path, batchEvents=cfg.batch_size * 1000
        )
    else:
        source = datasource_registry.create(
            ds_type, spark=spark, sf_dir=os.path.dirname(ds_path)
        )

    pipe = CdcPipeline(
        spark,
        source,
        foreach_batch_writer(lambda: FileQueue(queue_dir)),
        checkpoint_dir=ckpt,
        config=cfg,
        filters=FilterChain(),
    )
    query = pipe.start(available_now=drain)

    def _stop(signum, frame):  # O27 graceful shutdown
        print(f"signal {signum}: stopping query", file=sys.stderr)
        query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)

    pipe.await_and_stop()
    print(f"pipeline stopped; queue at {queue_dir}, checkpoint at {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
