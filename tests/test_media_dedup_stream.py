"""Continuous perceptual media dedup: the accumulated streamed match set
must equal the batch operator's output exactly (candidate recall is the
pigeonhole theorem on both sides), across a checkpoint restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_cdc_spark.operators.multimodal import dhash_near_duplicates
from stream_cdc_spark.plans.queries import _media_thumbs
from stream_cdc_spark.streaming.media_dedup import MediaDedupSnapshot
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL
import pytest


def _thumbs(spark):
    d = load(spark, SF_SMALL, "documents").select("doc_id", "text")
    return _media_thumbs(d)


def _slices(spark, n):
    t = _thumbs(spark)
    parts = (
        t.repartition(n)
        .rdd.mapPartitionsWithIndex(lambda i, it: ((i, list(it)),))
        .collect()
    )
    return [
        spark.createDataFrame(rows, "media_id bigint, blob binary")
        for _, rows in sorted(parts)
    ]


def _streamed(snap, spark):
    return sorted(
        (r["dup_of"], r["media_id"], r["hamming"])
        for r in snap.matches(spark).distinct().collect()
    )


def _batch(spark):
    return sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_duplicates(_thumbs(spark)).collect()
    )


def test_streamed_matches_equal_batch_operator(spark, tmp_path):
    snap = MediaDedupSnapshot(str(tmp_path / "s"), compact_every=2)
    for i, b in enumerate(_slices(spark, 5)):
        snap.foreach_batch(b, i)
    assert _streamed(snap, spark) == _batch(spark)


@pytest.mark.slow
def test_replay_and_restart_do_not_change_matches(spark, tmp_path):
    """Replaying the fold-performing batch (torn-write crash model) and
    continuing afterwards leaves the match set identical to batch."""
    slices = _slices(spark, 5)
    snap = MediaDedupSnapshot(str(tmp_path / "s"), compact_every=2)
    for i, b in enumerate(slices[:4]):
        snap.foreach_batch(b, i)
    snap.foreach_batch(slices[3], 3)  # replay of the last in-flight batch
    # "restart": a fresh sink object over the same state dir
    snap2 = MediaDedupSnapshot(str(tmp_path / "s"), compact_every=2)
    snap2.foreach_batch(slices[4], 4)
    assert _streamed(snap2, spark) == _batch(spark)


def test_empty_batch_commits_nothing(spark, tmp_path):
    snap = MediaDedupSnapshot(str(tmp_path / "s"))
    slices = _slices(spark, 5)
    snap.foreach_batch(slices[0], 0)
    empty = spark.createDataFrame([], "media_id bigint, blob binary")
    snap.foreach_batch(empty, 1)
    from stream_cdc_spark.streaming import statedir

    for sub in ("sigs", "index", "matches"):
        c = statedir.dir_counts(os.path.join(str(tmp_path / "s"), sub))
        assert c["batch"] == 1, (sub, c)


def test_plan_index_side_never_shuffles(spark, tmp_path):
    """The corpus-side band index must not ride an exchange in the
    candidate join — the batch side broadcasts."""
    slices = _slices(spark, 3)
    snap = MediaDedupSnapshot(str(tmp_path / "s"))
    snap.foreach_batch(slices[0], 0)
    built = snap._build(spark, slices[1], 1)
    assert built is not None
    _, _, matches = built
    matches.collect()
    plan = matches._sc._jvm.PythonSQLUtils.explainString(
        matches._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_recall_guard():
    import pytest

    with pytest.raises(ValueError, match="recall guarantee"):
        MediaDedupSnapshot("/tmp/x", max_hamming=8, n_bands=8)


@pytest.mark.slow
def test_cluster_state_matches_batch_rollup(spark, tmp_path):
    """cluster_state=True: the sink folds each batch's committed matches
    into the incremental union-find forest — clusters() equals batch
    connected_components over the accumulated match set (the continuous
    q130 rollup), with the min-id component as the survivorship
    representative; replay moves nothing."""
    from stream_cdc_spark.operators import dedup

    snap = MediaDedupSnapshot(
        str(tmp_path / "s"), compact_every=2, cluster_state=True
    )
    slices = _slices(spark, 4)
    for i, b in enumerate(slices):
        snap.foreach_batch(b, i)
    got = {
        (r["vertex"], r["component"])
        for r in snap.clusters(spark).collect()
    }
    want = {
        (r["vertex"], r["component"])
        for r in dedup.connected_components(
            snap.matches(spark).select(
                F.col("dup_of").alias("id_a"),
                F.col("media_id").alias("id_b"),
            )
        ).collect()
    }
    assert got == want and len(want) > 0
    snap.foreach_batch(slices[-1], len(slices) - 1)  # torn-write replay
    assert {
        (r["vertex"], r["component"])
        for r in snap.clusters(spark).collect()
    } == got
