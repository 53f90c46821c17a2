"""The composed production pipeline (streaming/cdc_full.py
CdcFullPipeline): ONE typed CDC envelope feed — interleaved insert/
update/delete events with out-of-order versions, redeliveries, a
mid-stream restart and a quality-gated UPDATE — drives the curation
gate, the versioned retrieval index and the versioned ANN index in a
single foreachBatch. Final probes must be bit-equal to the batch
references on both index surfaces, with deletions applied from both the
in-band Delete envelopes and the out-of-band DELETES_PATH feed.
Reference anchor: the one wired object graph of the reference's main()
(stream_cdc/main.py:16-66)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators import similarity, text
from stream_cdc_spark.streaming.cdc_full import CdcFullPipeline
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL

TERMS = ["stream", "vector", "join"]
MIN_TOKENS = 5


def _base(spark):
    """(doc_id, text, embedding) — the enriched row image."""
    d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    e = load(spark, SF_SMALL, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    return d.join(e, "doc_id")


def _centroids_df(spark):
    return load(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id") % 100 == 0
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<float>").alias("cv"),
    )


def _centroids(spark):
    return [(r["cid"], list(r["cv"])) for r in _centroids_df(spark).collect()]


def _queries(spark):
    return load(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 5)


def _upsert_env(df, etype):
    """(doc_id, version, text, embedding) rows -> typed envelopes."""
    return df.select(
        F.lit(etype).alias("event_type"),
        F.col("version").cast("long").alias("gtid_seq"),
        F.struct(
            F.col("doc_id"), F.col("text"), F.col("embedding")
        ).alias("content"),
    )


DELETE_SEQ = 2  # in-band kill watermark: kills versions 1 and 2


def _delete_env(ids):
    return ids.select(
        F.lit("Delete").alias("event_type"),
        F.lit(DELETE_SEQ).cast("long").alias("gtid_seq"),
        F.struct(
            F.col("doc_id"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("array<float>").alias("embedding"),
        ).alias("content"),
    )


def _v1(spark):
    return _base(spark).select(
        "doc_id", F.lit(1).cast("long").alias("version"), "text", "embedding"
    )


def _v2(spark):
    """Good updates: %4==1 docs get version 2 with two query terms
    appended and the REVERSED embedding — both surfaces move."""
    return _base(spark).filter(F.col("doc_id") % 4 == 1).select(
        "doc_id",
        F.lit(2).cast("long").alias("version"),
        F.concat(F.col("text"), F.lit(" vector stream")).alias("text"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )


def _v2_bad(spark):
    """Low-quality updates: %4==2 docs get a version-2 image BELOW the
    token gate — neither index may admit it; the version-max read keeps
    serving version 1 (the last image that PASSED the gate)."""
    return _base(spark).filter(F.col("doc_id") % 4 == 2).select(
        "doc_id",
        F.lit(2).cast("long").alias("version"),
        F.lit("tiny doc").alias("text"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )


def _dead_ids(spark):
    return _base(spark).filter(F.col("doc_id") % 10 == 3).select("doc_id")


def _v3_reborn(spark):
    """Delete-then-RECREATE: half the deleted docs (%20==3) come back
    as a version-3 re-insert with a sequence ABOVE the in-band delete's
    kill watermark — live again on both surfaces (the reference's
    routine Delete-then-Insert row re-creation; ADVICE r13). The other
    half (%20==13) stays dead, proving the killed prefix is permanent."""
    return _base(spark).filter(F.col("doc_id") % 20 == 3).select(
        "doc_id",
        F.lit(3).cast("long").alias("version"),
        F.concat(F.col("text"), F.lit(" reborn stream")).alias("text"),
        "embedding",
    )


def _event_batches(spark):
    v1, v2, v2b = _v1(spark), _v2(spark), _v2_bad(spark)
    dead = _dead_ids(spark)
    return [
        _upsert_env(v1.filter(F.col("doc_id") % 3 != 2), "Insert"),
        # good + bad updates; v2 precedes v1 for %3==2 docs; redelivered
        # v1 rows (%7==0)
        _upsert_env(v2.unionByName(v2b), "Update").unionByName(
            _upsert_env(
                v1.filter(
                    (F.col("doc_id") % 3 != 2) & (F.col("doc_id") % 7 == 0)
                ),
                "Insert",
            )
        ),
        _delete_env(dead),
        # late v1 images + redelivered v2 rows (%7==1)
        _upsert_env(v1.filter(F.col("doc_id") % 3 == 2), "Insert")
        .unionByName(
            _upsert_env(v2.filter(F.col("doc_id") % 7 == 1), "Update")
        ),
        # delete replay + the RECREATE slice in ONE envelope batch:
        # a redelivered delete must not kill the version-3 re-insert
        # (3 > the kill watermark 2), regardless of intra-batch order
        _delete_env(dead).unionByName(
            _upsert_env(_v3_reborn(spark), "Insert")
        ),
    ]


def _latest_gated(spark, extra_dead=None):
    """The batch reference corpus: the max-version image per doc among
    GATE-PASSING versions, minus dead versions. In-band deletes are
    VERSIONED: %10==3 docs were deleted at sequence DELETE_SEQ, killing
    versions <= it — the %20==3 half is recreated at version 3 (live),
    the %20==13 half stays dead. ``extra_dead`` is the out-of-band
    doc-level channel (permanent, every version)."""
    allv = (
        _v1(spark)
        .unionByName(_v2(spark))
        .unionByName(_v2_bad(spark))
        .unionByName(_v3_reborn(spark))
    ).filter(F.size(F.split(F.col("text"), " ")) >= MIN_TOKENS)
    allv = allv.filter(
        ~((F.col("doc_id") % 10 == 3) & (F.col("version") <= DELETE_SEQ))
    )
    w_max = allv.groupBy("doc_id").agg(F.max("version").alias("version"))
    latest = allv.join(w_max, ["doc_id", "version"])
    if extra_dead is not None:
        latest = latest.join(extra_dead, "doc_id", "left_anti")
    return latest


def _retr_ref(spark, extra_dead=None):
    return sorted(
        map(
            tuple,
            text.bm25_topk(
                _latest_gated(spark, extra_dead).select("doc_id", "text"),
                TERMS,
                top_k=15,
            ).collect(),
        )
    )


def _ann_ref(spark, extra_dead=None):
    corpus = _latest_gated(spark, extra_dead).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    return sorted(
        map(
            tuple,
            similarity.ivf_ann_topk(
                corpus, _queries(spark), _centroids_df(spark),
                k=5, nprobe=2, quantize_bp=10000,
            ).collect(),
        )
    )


def _probe(pipe, spark):
    retr = sorted(
        map(tuple, pipe.retr.bm25_topk(spark, TERMS, top_k=15).collect())
    )
    ann = sorted(
        map(tuple, pipe.ann.topk(spark, _queries(spark)).collect())
    )
    return retr, ann


@pytest.mark.slow
def test_composed_drain_with_restart_matches_batch_on_both_surfaces(
    spark, tmp_path
):
    """The headline e2e: interleaved envelopes through the composed
    sink, a replayed batch, a mid-stream RESTART (fresh pipeline object
    over the same state — the checkpoint-resume shape), folds crossing
    the stream — then both probes equal their batch references over the
    latest live GATED images."""
    batches = _event_batches(spark)
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), _centroids(spark),
        min_tokens=MIN_TOKENS, compact_every=2,
    )
    for i, b in enumerate(batches[:3]):
        pipe.foreach_batch(b, i)
    pipe.foreach_batch(batches[1], 1)  # replay of the in-flight batch
    pipe2 = CdcFullPipeline(  # mid-stream restart
        str(tmp_path / "s"), _centroids(spark),
        min_tokens=MIN_TOKENS, compact_every=2,
    )
    for i, b in enumerate(batches[3:], start=3):
        pipe2.foreach_batch(b, i)
    retr, ann = _probe(pipe2, spark)
    assert retr == _retr_ref(spark)
    assert ann == _ann_ref(spark)
    # the gate blocked every bad update on BOTH surfaces: no %4==2 doc
    # carries version 2 anywhere
    assert pipe2.retr.docs(spark).filter(
        (F.col("doc_id") % 4 == 2) & (F.col("version") == 2)
    ).count() == 0
    assert pipe2.ann.ledger(spark).filter(
        (F.col("vec_id") % 4 == 2) & (F.col("version") == 2)
    ).count() == 0


def test_gated_update_keeps_serving_last_good_version(spark, tmp_path):
    """Explicit tiny case: v2 fails the gate -> probes serve v1; a
    gate-passing v3 then supersedes."""
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), cents, min_tokens=MIN_TOKENS
    )
    mk = lambda ver, txt, emb: spark.createDataFrame(
        [(1, ver, txt, emb)],
        "doc_id bigint, version bigint, text string, "
        "embedding array<float>",
    )
    pipe.foreach_batch(
        _upsert_env(mk(1, "stream join vector query engine", [0.9, 0.1]),
                    "Insert"), 0,
    )
    pipe.foreach_batch(_upsert_env(mk(2, "tiny doc", [-0.9, 0.1]),
                                   "Update"), 1)
    latest = pipe.retr._latest_live(spark).collect()
    assert [(r["doc_id"], r["version"]) for r in latest] == [(1, 1)]
    assert [
        tuple(r) for r in pipe.ann._latest_live(spark).collect()
    ] == [(1, 1)]
    pipe.foreach_batch(
        _upsert_env(mk(3, "stream engines join vectors fast now",
                       [-0.8, 0.2]), "Update"), 2,
    )
    assert [
        tuple(r) for r in pipe.ann._latest_live(spark).collect()
    ] == [(1, 3)]


@pytest.mark.slow
def test_out_of_band_delete_feed_hits_both_indexes(spark, tmp_path):
    """delete_batch (the DELETES_PATH leg) tombstones the id on BOTH
    surfaces — the two-channel right-to-be-forgotten story."""
    batches = _event_batches(spark)
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), _centroids(spark), min_tokens=MIN_TOKENS
    )
    for i, b in enumerate(batches):
        pipe.foreach_batch(b, i)
    extra = _base(spark).filter(F.col("doc_id") % 10 == 7).select("doc_id")
    pipe.delete_batch(extra, 0)
    retr, ann = _probe(pipe, spark)
    assert retr == _retr_ref(spark, extra_dead=extra)
    assert ann == _ann_ref(spark, extra_dead=extra)


def test_deletes_only_batch_commits_no_index_rows(spark, tmp_path):
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), _centroids(spark), min_tokens=MIN_TOKENS
    )
    pipe.foreach_batch(_delete_env(_dead_ids(spark)), 0)
    from stream_cdc_spark.streaming import statedir

    assert not statedir.state_paths(pipe.retr.docs_dir, 1 << 62)
    assert not statedir.state_paths(pipe.ann.vectors_dir, 1 << 62)
    # in-band Deletes land in the VERSIONED tombstone channel (kill
    # watermark = the delete's gtid_seq), not the permanent doc-level
    # log — that one is the out-of-band DELETES_PATH contract
    n = _dead_ids(spark).count()
    assert pipe.retr.versioned_tombstones(spark).count() == n
    assert pipe.ann.versioned_tombstones(spark).count() == n
    assert pipe.retr.tombstones(spark).count() == 0
    assert pipe.ann.tombstones(spark).count() == 0


@pytest.mark.slow
def test_cdc_full_cli_drains_envelopes_and_delete_feed(
    spark, tmp_path, monkeypatch
):
    """PIPELINE=cdc_full entrypoint: one availableNow drain of the
    envelope feed (inserts + good/bad updates + in-band Deletes) AND an
    out-of-band DELETES_PATH feed; both probes equal the batch
    references with both delete channels applied."""
    from stream_cdc_spark import main as M
    from stream_cdc_spark.streaming.cdc_full import CdcFullPipeline as P

    feed = (
        _upsert_env(_v1(spark), "Insert")
        .unionByName(_upsert_env(_v2(spark), "Update"))
        .unionByName(_upsert_env(_v2_bad(spark), "Update"))
        .unionByName(_delete_env(_dead_ids(spark)))
        .unionByName(_upsert_env(_v3_reborn(spark), "Insert"))
    )
    feed_dir = str(tmp_path / "feed")
    feed.coalesce(1).write.mode("overwrite").parquet(feed_dir)
    extra = _base(spark).filter(F.col("doc_id") % 10 == 7).select("doc_id")
    deletes_dir = str(tmp_path / "deletes")
    extra.coalesce(1).write.mode("overwrite").parquet(deletes_dir)
    cents_path = str(tmp_path / "centroids.parquet")
    _centroids_df(spark).toPandas().to_parquet(cents_path)
    state = str(tmp_path / "cli-state")
    monkeypatch.setenv("PIPELINE", "cdc_full")
    monkeypatch.setenv("DRAIN_AND_EXIT", "1")
    monkeypatch.setenv("EVENTS_PATH", feed_dir)
    monkeypatch.setenv("DELETES_PATH", deletes_dir)
    monkeypatch.setenv("CENTROIDS_PATH", cents_path)
    monkeypatch.setenv("CDC_STATE_DIR", state)
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "cli-ckpt"))
    monkeypatch.setenv("MIN_TOKENS", str(MIN_TOKENS))
    assert M.main() == 0
    pipe = P(state, _centroids(spark), min_tokens=MIN_TOKENS)
    retr, ann = _probe(pipe, spark)
    assert retr == _retr_ref(spark, extra_dead=extra)
    assert ann == _ann_ref(spark, extra_dead=extra)


def test_null_upsert_version_fails_loudly(spark, tmp_path):
    """An upsert envelope with a NULL gtid_seq (a feed file missing the
    column reads all-null under the forced schema, or a malformed
    envelope) must fail the batch loudly: null versions match neither
    the admission anti-join (every redelivery re-admits) nor the
    version-max equi-join (the doc vanishes from probes) — the silent
    no-op class the versioned CLI guards close at startup, caught here
    row-wise."""
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), [(0, [1.0, 0.0])], min_tokens=1
    )
    bad = spark.createDataFrame(
        [("Insert", None, (1, "some text here", [0.5, 0.5]))],
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string, "
        "embedding array<float>>",
    )
    with pytest.raises(ValueError, match="NULL 'gtid_seq'"):
        pipe.foreach_batch(bad, 0)
    # nothing committed on any leg
    from stream_cdc_spark.streaming import statedir

    assert not statedir.state_paths(pipe.retr.docs_dir, 1 << 62)
    assert not statedir.state_paths(pipe.ann.vectors_dir, 1 << 62)


def test_null_content_fields_on_gated_upserts_fail_loudly(spark, tmp_path):
    """A content struct missing its embedding (or doc_id) field reads
    all-null under the forced feed schema while the quality gate still
    passes on text — the ANN leg would admit null vectors whose
    first-wins slots a corrected redelivery can never reclaim (ADVICE
    r13). The sink must fail the batch loudly instead, committing
    nothing."""
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), [(0, [1.0, 0.0])], min_tokens=1
    )
    null_emb = spark.createDataFrame(
        [("Insert", 1, (1, "good text that passes the gate", None))],
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string, "
        "embedding array<float>>",
    )
    with pytest.raises(ValueError, match="NULL 'doc_id' or 'embedding'"):
        pipe.foreach_batch(null_emb, 0)
    null_id = spark.createDataFrame(
        [("Insert", 1, (None, "good text that passes the gate",
                        [0.5, 0.5]))],
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string, "
        "embedding array<float>>",
    )
    with pytest.raises(ValueError, match="NULL 'doc_id' or 'embedding'"):
        pipe.foreach_batch(null_id, 1)
    from stream_cdc_spark.streaming import statedir

    assert not statedir.state_paths(pipe.retr.docs_dir, 1 << 62)
    assert not statedir.state_paths(pipe.ann.vectors_dir, 1 << 62)
    # null TEXT is the gate's job, not an error: the image fails the
    # quality predicate and is skipped on both surfaces
    null_text = spark.createDataFrame(
        [("Insert", 1, (1, None, [0.5, 0.5]))],
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string, "
        "embedding array<float>>",
    )
    pipe.foreach_batch(null_text, 2)
    assert not statedir.state_paths(pipe.ann.vectors_dir, 1 << 62)


def test_cli_startup_guard_refuses_feed_missing_content_fields(
    spark, tmp_path, monkeypatch
):
    """The cdc_full CLI startup guard checks the CONTENT STRUCT's
    fields, not just the top-level envelope columns (ADVICE r13): a
    feed whose content struct lacks `embedding` would read it all-null
    under the forced schema and silently poison the ANN leg."""
    from stream_cdc_spark import main as M

    feed = spark.createDataFrame(
        [("Insert", 1, (1, "text without an embedding field"))],
        "event_type string, gtid_seq bigint, "
        "content struct<doc_id bigint, text string>",
    )
    feed_dir = str(tmp_path / "feed")
    feed.coalesce(1).write.mode("overwrite").parquet(feed_dir)
    cents_path = str(tmp_path / "centroids.parquet")
    _centroids_df(spark).toPandas().to_parquet(cents_path)
    monkeypatch.setenv("PIPELINE", "cdc_full")
    monkeypatch.setenv("DRAIN_AND_EXIT", "1")
    monkeypatch.setenv("EVENTS_PATH", feed_dir)
    monkeypatch.setenv("CENTROIDS_PATH", cents_path)
    monkeypatch.setenv("CDC_STATE_DIR", str(tmp_path / "s"))
    monkeypatch.setenv("CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    monkeypatch.delenv("DELETES_PATH", raising=False)
    with pytest.raises(ValueError, match="content fields"):
        M.main()


@pytest.mark.slow
def test_inband_delete_then_recreate_restores_doc(spark, tmp_path):
    """The in-band Delete channel is VERSIONED (ADVICE r13): a Delete
    envelope kills only versions at or below its CDC sequence, so the
    reference's routine Delete-then-Insert row re-creation works — the
    re-insert (higher sequence) is live on BOTH surfaces, the killed
    versions stay dead forever, and a replayed delete cannot kill the
    recreate. The out-of-band channel stays permanent."""
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    pipe = CdcFullPipeline(
        str(tmp_path / "s"), cents, min_tokens=MIN_TOKENS
    )
    mk = lambda ver, txt, emb: spark.createDataFrame(
        [(1, ver, txt, emb)],
        "doc_id bigint, version bigint, text string, "
        "embedding array<float>",
    )
    dead = spark.createDataFrame([(1,)], "doc_id bigint")

    def dele(seq):
        return dead.select(
            F.lit("Delete").alias("event_type"),
            F.lit(seq).cast("long").alias("gtid_seq"),
            F.struct(
                F.col("doc_id"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("array<float>").alias("embedding"),
            ).alias("content"),
        )

    pipe.foreach_batch(
        _upsert_env(mk(1, "stream join vector query engine", [0.9, 0.1]),
                    "Insert"), 0,
    )
    pipe.foreach_batch(dele(5), 1)  # kills versions <= 5
    assert pipe.retr._latest_live(spark).count() == 0
    assert pipe.ann._latest_live(spark).count() == 0
    # a LATE version below the watermark admits but stays dead
    pipe.foreach_batch(
        _upsert_env(mk(4, "stale image arriving after the delete wins",
                       [0.8, 0.2]), "Update"), 2,
    )
    assert pipe.retr._latest_live(spark).count() == 0
    # the RECREATE (sequence 7 > watermark 5) is live again
    pipe.foreach_batch(
        _upsert_env(mk(7, "stream engines join vectors reborn now",
                       [-0.8, 0.2]), "Insert"), 3,
    )
    assert [
        (r["doc_id"], r["version"])
        for r in pipe.retr._latest_live(spark).collect()
    ] == [(1, 7)]
    assert [
        tuple(r) for r in pipe.ann._latest_live(spark).collect()
    ] == [(1, 7)]
    # a replayed delete (same watermark) cannot kill the recreate
    pipe.foreach_batch(dele(5), 4)
    assert [
        tuple(r) for r in pipe.ann._latest_live(spark).collect()
    ] == [(1, 7)]
    # the OUT-OF-BAND channel stays doc-level and permanent: it kills
    # the recreate too, and no future version resurrects it
    pipe.delete_batch(dead, 0)
    assert pipe.retr._latest_live(spark).count() == 0
    pipe.foreach_batch(
        _upsert_env(mk(9, "no resurrection after right to be forgotten",
                       [0.7, 0.3]), "Update"), 5,
    )
    assert pipe.ann._latest_live(spark).count() == 0
