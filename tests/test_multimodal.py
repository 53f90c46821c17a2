"""Multimodal plumbing tests: the Spark-side schema/partitioning/UDF wiring
is real; the decode itself is a clearly-marked stub (no media libs in this
container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_spark.operators import multimodal


def _media(spark, n=20):
    rows = [
        (i, "image", "image/png", bytes([i % 256]) * (100 + i), None)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "media_id LONG, kind STRING, content_type STRING, blob BINARY, duration_ms LONG"
    )
    return df


def test_decode_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"abc")


def test_fake_decode_deterministic():
    a = multimodal.decode_image(b"hello", fake=True)
    b = multimodal.decode_image(b"hello", fake=True)
    assert a == b and 64 <= a["width"] < 128


def test_attach_metadata(spark):
    out = multimodal.attach_metadata(_media(spark)).collect()
    for r in out:
        assert r.n_bytes == len(r.blob)
        assert len(r.sha) == 64


def test_extract_features_mapinpandas(spark):
    df = _media(spark, 50)
    feats = multimodal.extract_features(df, fake=True)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "n_bytes", "sha", "feat_mean",
    ]
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and len(r.sha) == 64 for r in rows)


def test_repartition_by_bytes(spark):
    df = multimodal.attach_metadata(_media(spark, 40))
    out = multimodal.repartition_by_bytes(df, target_partition_bytes=500)
    assert out.count() == 40
    assert out.rdd.getNumPartitions() > 1


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, 900), (3, None)], "media_id LONG, duration_ms LONG"
    )
    out = multimodal.frame_sample_plan(df, every_ms=1000)
    frames = {(r.media_id, r.frame_ts_ms) for r in out.collect()}
    assert {(1, 0), (1, 1000), (1, 2000)} <= frames
    assert (2, 0) in frames
    assert all(m != 3 for m, _ in frames)  # null duration filtered


def test_audio_fake_decode_and_frame_plan_integration(spark):
    # audio: deterministic fake decode derives duration from byte length
    meta = multimodal.decode_audio(b"\x00" * 64000, fake=True)
    assert meta == {"sample_rate": 16000, "duration_ms": 2000}
    # plumb the decoded duration into the frame-sampling plan
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 64000))], "media_id LONG, blob BINARY"
    )
    with_dur = df.withColumn(
        "duration_ms", (F.octet_length("blob") * 1000 / 32000).cast("long")
    )
    frames = multimodal.frame_sample_plan(with_dur, every_ms=500)
    assert frames.count() == 4  # 2000ms @ 500ms steps


def test_multimodal_edge_cases(spark):
    # empty blob and null blob must not break metadata or features
    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, None)], "media_id LONG, blob BINARY"
    )
    meta = {r.media_id: r for r in multimodal.attach_metadata(df).collect()}
    assert meta[1].n_bytes == 0
    assert meta[2].n_bytes is None
    feats = {r.media_id: r for r in multimodal.extract_features(df, fake=True).collect()}
    assert feats[1].n_bytes == 0 and feats[2].n_bytes == 0


def test_resize_images_fake_path(spark):
    from stream_cdc_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"defghij"), (3, None)], "media_id long, blob binary"
    )
    out = {r.media_id: r for r in multimodal.resize_images(df, 8, 6).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r.width == 8 and r.height == 6
        assert len(r.resized) == 8 * 6 * 3  # fixed-dim RGB byte budget
    # deterministic: same input blob -> same synthetic pixels
    again = {r.media_id: r for r in multimodal.resize_images(df, 8, 6).collect()}
    assert all(again[k].resized == out[k].resized for k in out)
    # distinct inputs produce distinct outputs (digest-derived, not constant)
    assert out[1].resized != out[2].resized


def test_resize_images_real_path_raises(spark):
    import pytest

    from stream_cdc_spark.operators import multimodal

    df = spark.createDataFrame([(1, b"abc")], "media_id long, blob binary")
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        multimodal.resize_images(df, 8, 6, fake=False).collect()


def test_real_decode_used_when_library_present(monkeypatch):
    """The optional-import tier: when a PIL-compatible module is
    importable, decode_image uses it instead of raising."""
    import sys
    import types

    class _Im:
        width, height = 320, 200

        def load(self):
            return None

        def tobytes(self):
            return b"\x00" * 12

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_mod = types.ModuleType("PIL.Image")
    fake_mod.open = lambda bio: _Im()
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_mod)
    out = multimodal.decode_image(b"not-a-real-png")
    assert (out["width"], out["height"]) == (320, 200)
    assert out["pixels"] == b"\x00" * 12


def test_real_audio_decode_used_when_library_present(monkeypatch):
    import sys
    import types

    fake_sf = types.ModuleType("soundfile")
    fake_sf.read = lambda bio: ([0.0] * 32000, 16000)
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)
    out = multimodal.decode_audio(b"not-a-real-wav")
    assert out == {"sample_rate": 16000, "duration_ms": 2000}


def test_decode_raises_naming_missing_dependency():
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_image(b"x")
    with pytest.raises(NotImplementedError, match="soundfile"):
        multimodal.decode_audio(b"x")


# -- perceptual-hash near-dup (round 7) -------------------------------------


def _raster(seed: int, n: int = 72) -> bytes:
    # deterministic pseudo-random 9x8 grayscale raster
    out = bytearray()
    x = seed * 2654435761 % (1 << 32)
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x & 0xFF)
    return bytes(out)


def _thumbs(spark, rows):
    return spark.createDataFrame(rows, "media_id bigint, blob binary")


def test_dhash_recall_on_planted_perturbed_copies(spark):
    """Planted near-dups (a few pixels nudged) MUST all surface — recall
    is the pigeonhole theorem, so a miss is a protocol bug, not tuning.
    Unrelated rasters must not pair up."""
    base = _raster(1)
    pert = bytearray(base)
    pert[5] += 40        # flips at most 2 dHash bits
    pert[40] = 0         # at most 2 more
    rows = [(1, base), (2, bytes(pert))]
    rows += [(10 + i, _raster(100 + i)) for i in range(20)]
    out = multimodal.dhash_near_duplicates(_thumbs(spark, rows)).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in got
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert ham[(1, 2)] <= 4
    # no unrelated pair sneaks in (64 random bits at hamming<=4 ~ 1e-13)
    assert all(p == (1, 2) for p in got)


def test_dhash_identical_rasters_hamming_zero(spark):
    rows = [(1, _raster(7)), (2, _raster(7)), (3, _raster(8))]
    out = multimodal.dhash_near_duplicates(_thumbs(spark, rows)).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_dhash_null_and_short_blobs_do_not_crash(spark):
    rows = [(1, None), (2, b"\x01\x02"), (3, _raster(3))]
    out = multimodal.dhash_near_duplicates(_thumbs(spark, rows)).collect()
    # null and zero-padded-short blobs hash deterministically; nothing throws
    assert all(r["hamming"] >= 0 for r in out)


def test_dhash_recall_guarantee_guard():
    with pytest.raises(ValueError, match="recall guarantee"):
        multimodal.dhash_near_duplicates(None, max_hamming=8, n_bands=8)


def test_dhash_plan_bands_join_never_all_pairs(spark):
    """The executed plan must be the banded candidate join + id verify —
    no cartesian/broadcast-nested-loop all-pairs anywhere."""
    rows = [(i, _raster(i)) for i in range(50)]
    df = multimodal.dhash_near_duplicates(_thumbs(spark, rows))
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
