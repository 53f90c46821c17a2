"""Offline index migration (operators/migration.py): the rebuild path
the stamp guards point at. Equality contracts: a migrated ANN index is
bit-equal to a from-scratch drain of the same vectors under the new
parameters (and passes the new stamp guard); a re-banded LSH snapshot's
index state equals a from-scratch one-batch drain under the new band
count, and subsequent admission behaves identically from either state.
Sketch-level changes refuse with replay guidance."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators.migration import (
    rebuild_ann_index,
    rebuild_lsh_snapshot,
)
from stream_cdc_spark.streaming.ann_index import AnnIndexSnapshot
from stream_cdc_spark.streaming.lsh_snapshot import LshDedupSnapshot
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def _emb(spark):
    return load(spark, SF_SMALL, "embeddings")


def _cents(spark, mod):
    return [
        (r["vec_id"], list(r["embedding"]))
        for r in _emb(spark).filter(F.col("vec_id") % mod == 0).collect()
    ]


def _queries(spark):
    return _emb(spark).filter(F.col("vec_id") < 5)


def _emb_slices(spark):
    emb = _emb(spark)
    return [
        emb.filter((F.col("vec_id") % 3 == i) | (F.col("vec_id") % 7 == i))
        for i in range(3)
    ]


def _topk(snap, spark):
    return sorted(map(tuple, snap.topk(spark, _queries(spark)).collect()))


@pytest.mark.slow
def test_ann_rebuild_under_new_centroids_equals_fresh_drain(spark, tmp_path):
    """Migrate a float32 index (with folds in its history) to a NEW
    centroid set: the destination must pass its own stamp guard and be
    bit-equal (state and probe) to a from-scratch sink fed the same
    vectors."""
    old_c, new_c = _cents(spark, 100), _cents(spark, 50)
    src = AnnIndexSnapshot(str(tmp_path / "src"), old_c, compact_every=2)
    for i, b in enumerate(_emb_slices(spark)):
        src.foreach_batch(b, i)
    dst = AnnIndexSnapshot(str(tmp_path / "dst"), new_c)
    n = rebuild_ann_index(spark, src, dst)
    assert n == _emb(spark).count()
    fresh = AnnIndexSnapshot(str(tmp_path / "fresh"), new_c)
    fresh.foreach_batch(_emb(spark).select("vec_id", "embedding"), 0)
    assert _topk(dst, spark) == _topk(fresh, spark)
    assert (
        sorted(map(tuple, dst.vectors(spark).collect()))
        == sorted(map(tuple, fresh.vectors(spark).collect()))
    )
    # the old probe refuses the migrated state; the new one works
    stale = AnnIndexSnapshot(str(tmp_path / "dst"), old_c)
    with pytest.raises(ValueError, match="parameter mismatch"):
        stale.topk(spark, _queries(spark))


@pytest.mark.slow
def test_migrated_state_survives_a_stream_resuming_at_batch_zero(
    spark, tmp_path
):
    """THE migration-publish hazard: a stream resumed into the
    destination with a fresh checkpoint runs its first trigger at
    batch_id 0, whose read bound excludes every batch dir — state
    published as batch dirs would be invisible to the first-wins guard
    (everything re-admitted) and then OVERWRITTEN by the trigger's own
    batch=0 commit. The compact=0 publish must make the migrated state
    visible to that very first trigger and survive its commit."""
    cents = _cents(spark, 100)
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    src = AnnIndexSnapshot(str(tmp_path / "src"), cents)
    src.foreach_batch(old.select("vec_id", "embedding"), 0)
    dst = AnnIndexSnapshot(str(tmp_path / "dst"), cents)
    rebuild_ann_index(spark, src, dst)
    # resumed stream, batch 0: redelivers half the migrated ids plus
    # the genuinely-new odd ids
    incoming = emb.filter(
        (F.col("vec_id") % 2 == 1) | (F.col("vec_id") % 4 == 0)
    )
    dst.foreach_batch(incoming.select("vec_id", "embedding"), 0)
    vecs = dst.vectors(spark)
    assert vecs.count() == emb.count()  # nothing lost, nothing doubled
    assert vecs.select("vec_id").distinct().count() == emb.count()
    fresh = AnnIndexSnapshot(str(tmp_path / "fresh"), cents)
    fresh.foreach_batch(emb.select("vec_id", "embedding"), 0)
    assert _topk(dst, spark) == _topk(fresh, spark)


@pytest.mark.slow
def test_ann_rebuild_migrates_storage_tier_both_ways(spark, tmp_path):
    """float32 -> sq8 equals a fresh sq8 drain bit-for-bit (same floats
    in, same codes out); sq8 -> float32 reconstructs through the stamped
    affine map and is probe-deterministic."""
    from stream_cdc_spark.streaming.ann_index import train_sq_ranges

    cents, ranges = _cents(spark, 100), train_sq_ranges(_emb(spark))
    src = AnnIndexSnapshot(str(tmp_path / "src"), cents, compact_every=2)
    for i, b in enumerate(_emb_slices(spark)):
        src.foreach_batch(b, i)
    to_sq8 = AnnIndexSnapshot(
        str(tmp_path / "sq8"), cents, storage="sq8", sq_ranges=ranges
    )
    rebuild_ann_index(spark, src, to_sq8)
    fresh_sq8 = AnnIndexSnapshot(
        str(tmp_path / "fresh-sq8"), cents, storage="sq8", sq_ranges=ranges
    )
    fresh_sq8.foreach_batch(_emb(spark).select("vec_id", "embedding"), 0)
    assert _topk(to_sq8, spark) == _topk(fresh_sq8, spark)
    # and back: sq8 -> float32 (lossy by <= half a step, documented);
    # the round-trip equals rebuilding from the dequantized vectors
    back = AnnIndexSnapshot(str(tmp_path / "back"), cents)
    rebuild_ann_index(spark, to_sq8, back)
    assert _topk(back, spark) == _topk(to_sq8, spark)


@pytest.mark.slow
def test_ann_rebuild_refuses_unsafe_destinations(spark, tmp_path):
    cents = _cents(spark, 100)
    src = AnnIndexSnapshot(str(tmp_path / "src"), cents)
    src.foreach_batch(_emb_slices(spark)[0], 0)
    with pytest.raises(ValueError, match="share a state dir"):
        rebuild_ann_index(spark, src, AnnIndexSnapshot(str(tmp_path / "src"), cents))
    dst = AnnIndexSnapshot(str(tmp_path / "dst"), cents)
    dst.foreach_batch(_emb_slices(spark)[1], 0)
    with pytest.raises(ValueError, match="not\\s+empty"):
        rebuild_ann_index(spark, src, dst)


def _docs_slices(spark):
    d = load(spark, SF_SMALL, "documents")
    return [
        d.filter((F.col("doc_id") % 3 == i) | (F.col("doc_id") % 7 == i))
        for i in range(3)
    ]


def _lsh_state(snap, spark):
    index = sorted(
        map(tuple, snap._read(spark, snap.index_dir, "doc_id bigint, band int, key bigint", 1 << 62).collect())
    )
    counts = sorted(
        map(
            tuple,
            snap._read(spark, snap.counts_dir, "band int, key bigint, cnt bigint", 1 << 62)
            .groupBy("band", "key")
            .agg(F.sum("cnt").alias("cnt"))
            .collect(),
        )
    )
    sigs = sorted(
        (r["doc_id"], tuple(r["signature"]))
        for r in snap.processed(spark).collect()
    )
    return index, counts, sigs


@pytest.mark.slow
def test_lsh_rebanding_equals_fresh_one_batch_drain(spark, tmp_path):
    """Re-band a drained bands=16 snapshot to bands=8: sigs copy over
    verbatim, index/counts equal what a from-scratch bands=8 sink
    computes for the whole corpus in one batch, and a subsequent
    admission batch emits identical matches from either state."""
    slices = _docs_slices(spark)
    src = LshDedupSnapshot(
        str(tmp_path / "src"), bands=16, compact_every=2
    )
    for i, b in enumerate(slices[:2]):  # partial corpus; slice 2 arrives later
        src.foreach_batch(b, i)
    # re-band UP (bands=32, rows=2): higher candidate recall, so future
    # admission from the migrated state has matches to emit
    dst = LshDedupSnapshot(str(tmp_path / "dst"), bands=32)
    n = rebuild_lsh_snapshot(spark, src, dst)
    assert n == src.processed(spark).count()
    fresh = LshDedupSnapshot(str(tmp_path / "fresh"), bands=32)
    fresh.foreach_batch(slices[0].unionByName(slices[1]), 0)
    di, dc, ds = _lsh_state(dst, spark)
    fi, fc, fs = _lsh_state(fresh, spark)
    assert di and (di, dc, ds) == (fi, fc, fs)
    # continue admission from both states: identical future emissions.
    # dst resumes at batch_id 0 — the fresh-checkpoint shape — so this
    # also proves the compact=0 publish is visible to (and survives)
    # the destination's very first trigger. dst's matches log starts
    # empty (migration does not copy history), so after one batch it
    # holds exactly that batch's emissions; fresh's are its log minus
    # the pre-existing snapshot.
    m0 = sorted(map(tuple, fresh.matches(spark).collect()))
    dst.foreach_batch(slices[2], 0)
    fresh.foreach_batch(slices[2], 1)
    m_dst = sorted(map(tuple, dst.matches(spark).collect()))
    m_all = sorted(map(tuple, fresh.matches(spark).collect()))
    m_fresh = sorted((Counter(m_all) - Counter(m0)).elements())
    assert m_dst == m_fresh and m_dst


@pytest.mark.slow
def test_lsh_rebanding_refuses_sketch_changes(spark, tmp_path):
    src = LshDedupSnapshot(str(tmp_path / "src"), bands=16)
    src.foreach_batch(_docs_slices(spark)[0], 0)
    with pytest.raises(ValueError, match="num_hashes"):
        rebuild_lsh_snapshot(
            spark, src,
            LshDedupSnapshot(str(tmp_path / "a"), num_hashes=32, bands=8),
        )
    with pytest.raises(ValueError, match="k differs"):
        rebuild_lsh_snapshot(
            spark, src, LshDedupSnapshot(str(tmp_path / "b"), k=5, bands=8)
        )
    with pytest.raises(ValueError, match="divisible"):
        rebuild_lsh_snapshot(
            spark, src, LshDedupSnapshot(str(tmp_path / "c"), bands=7)
        )
    with pytest.raises(ValueError, match="share a state dir"):
        rebuild_lsh_snapshot(
            spark, src, LshDedupSnapshot(str(tmp_path / "src"), bands=8)
        )
    occupied = LshDedupSnapshot(str(tmp_path / "d"), bands=8)
    occupied.foreach_batch(_docs_slices(spark)[1], 0)
    with pytest.raises(ValueError, match="not\\s+empty"):
        rebuild_lsh_snapshot(spark, src, occupied)
