"""Multimodal (image/audio/video) column handling.

Media are opaque `binary` columns with a typed metadata struct alongside —
the same pattern as the reference's claim-check for oversized payloads
(stream_cdc/streams/sqs.py:250-302): large blobs ride as bytes or as
storage URIs, metadata stays queryable.

The container has no image/audio libraries, so the actual decode is a
clearly-marked stub (`decode_image`/`decode_audio` raise NotImplementedError
unless `fake=True` yields a deterministic synthetic decode). Everything
Spark-side — schema, Arrow batch shape, mapInPandas plumbing, partition
sizing — is real and tested (tests/test_multimodal.py).

Scale notes: media rows are large and variable — repartition by byte budget
(`repartition_by_bytes`) before a decode pass so one Arrow batch never
exceeds executor memory; keep maxRecordsPerBatch low for 10 MB+ blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("content_type", StringType(), True),
        StructField("blob", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("storage_uri", StringType(), True),  # claim-check path
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha", StringType(), True),
        StructField("feat_mean", StringType(), True),
    ]
)


def attach_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap metadata derivable without decoding: byte size + digest.
    Pure expressions — runs in codegen, no Python."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length(F.col(blob_col)).cast("bigint"),
            "sha": F.sha2(F.col(blob_col), 256),
        }
    )


def _optional_import(name: str):
    """Import a media library if the cluster image ships it; None if not.
    Resolved at call time (executor-side), not import time, so the module
    stays importable on lib-less driver images."""
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError:
        return None


def decode_image(blob: bytes, fake: bool = False) -> dict:
    """Decode an image blob -> {width, height, pixels}.

    Three tiers:
      - `fake=True`: deterministic synthetic decode keyed on the blob
        contents, so pipelines are testable end-to-end anywhere;
      - Pillow present (`PIL.Image`): real decode;
      - neither: NotImplementedError naming the missing dependency (this
        test container ships no media libraries).
    """
    if fake:
        h = sum(blob[:16]) if blob else 0
        return {"width": 64 + h % 64, "height": 64 + (h // 64) % 64, "pixels": None}
    pil_image = _optional_import("PIL.Image")
    if pil_image is not None:
        import io

        with pil_image.open(io.BytesIO(blob)) as im:
            im.load()
            return {"width": im.width, "height": im.height, "pixels": im.tobytes()}
    raise NotImplementedError(
        "image decoding requires Pillow (PIL.Image), which this environment "
        "does not ship; install pillow on the cluster image or run with "
        "fake=True for the deterministic test path"
    )


def decode_audio(blob: bytes, fake: bool = False) -> dict:
    """Decode an audio blob -> {sample_rate, duration_ms}; tiers as in
    decode_image (real path: the `soundfile` library)."""
    if fake:
        return {"sample_rate": 16000, "duration_ms": (len(blob) * 1000) // 32000}
    sf = _optional_import("soundfile")
    if sf is not None:
        import io

        data, rate = sf.read(io.BytesIO(blob))
        return {"sample_rate": int(rate), "duration_ms": int(len(data) * 1000 / rate)}
    raise NotImplementedError(
        "audio decoding requires the soundfile library, which this "
        "environment does not ship; install soundfile on the cluster image "
        "or run with fake=True for the deterministic test path"
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extraction pass over media blobs via mapInPandas.

    The UDF iterates Arrow record batches (never whole partitions in
    memory); per-batch pandas ops stay vectorized where possible. The
    'model' is the deterministic fake decode — swap the inner function for
    a real encoder on a cluster with the libs installed.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["blob"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "sha": blobs.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feat_mean": blobs.map(
                        lambda b: str(decode_image(b or b"", fake=fake)["width"])
                    ),
                }
            )
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, bytes_col: str = "n_bytes", target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition media rows so each partition holds ~target bytes.

    Uses a running estimate from the table's total byte count; at scale
    this is the difference between a stable decode pass and OOM on a
    partition that happens to hold many 100 MB videos.
    """
    total = df.agg(F.sum(bytes_col)).collect()[0][0] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode a frame-timestamp sequence from
    duration metadata (no decode needed to *plan* the sample). The decode
    of each sampled frame is the stubbed mapInPandas pass."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return df.filter(F.col("duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Batch image resize via mapInPandas: (media_id, blob) -> fixed-dim
    blobs ready for an encoder.

    The Spark plumbing is real — Arrow record-batch iteration, explicit
    output schema, byte-budget-friendly (pair with repartition_by_bytes
    upstream so a partition of large images cannot OOM the worker). The
    pixel work itself is the environment-stubbed part (decode_image):
    `fake=True` emits a deterministic width*height-shaped synthetic blob
    derived from the input digest, so sizing/partitioning/schema behavior
    is testable end-to-end; swap the inner kernel for PIL/opencv on a
    cluster image that ships the libs.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        pil_image = None if fake else _optional_import("PIL.Image")

        for pdf in batches:
            blobs = pdf["blob"]

            def one(b) -> bytes:
                if pil_image is not None:
                    import io

                    with pil_image.open(io.BytesIO(b or b"")) as im:
                        return im.resize((width, height)).tobytes()
                decode_image(b or b"", fake=fake)  # raises unless fake
                seed = hashlib.sha256(b or b"").digest()
                reps = (width * height * 3) // len(seed) + 1
                return (seed * reps)[: width * height * 3]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": blobs.map(one),
                }
            )

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


# -- perceptual-hash near-duplicate detection (round 7) ---------------------

DHASH_SCHEMA = StructType(
    [
        StructField("id_a", LongType(), True),
        StructField("id_b", LongType(), True),
        StructField("hamming", LongType(), True),
    ]
)


def dhash_bands(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    grid_w: int = 9,
    grid_h: int = 8,
    n_bands: int = 8,
) -> DataFrame:
    """Difference-hash (dHash) signatures over grayscale thumbnail blobs,
    pre-split into LSH bands: (id, bands array<int>).

    The blob is a ``grid_h x grid_w`` row-major 8-bit grayscale raster —
    the deterministic raw tier of the multimodal decode stack (produce it
    with ``resize_images`` upstream on a cluster with real image libs; a
    raw byte raster needs no library at all, which is what makes the
    operator fully testable here). dHash bit (r, c) = pixel[r][c+1] >
    pixel[r][c]: ``grid_h * (grid_w - 1)`` bits total, split into
    ``n_bands`` equal bands, each band packed into one small int.

    Executor-side cost is one Arrow-vectorized pandas UDF (numpy reshape
    + adjacent compare + bit-pack — no per-row Python beyond the byte
    buffer concat); everything downstream is JVM expressions.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_bits = grid_h * (grid_w - 1)
    if n_bits % n_bands:
        raise ValueError(f"{n_bits} dHash bits not divisible into {n_bands} bands")
    band_bits = n_bits // n_bands
    n_px = grid_w * grid_h

    def _bands(blobs: pd.Series) -> pd.Series:
        zero = b"\x00" * n_px
        buf = b"".join(
            (b or zero)[:n_px].ljust(n_px, b"\x00") for b in blobs
        )
        px = np.frombuffer(buf, dtype=np.uint8).reshape(-1, grid_h, grid_w)
        bits = (px[:, :, 1:] > px[:, :, :-1]).reshape(-1, n_bands, band_bits)
        weights = 1 << np.arange(band_bits - 1, -1, -1)
        vals = (bits * weights).sum(axis=2).astype("int32")
        return pd.Series(list(vals))

    bands_udf = pandas_udf(_bands, ArrayType(IntegerType()))
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        bands_udf(F.col(blob_col)).alias("bands"),
    )


def dhash_near_duplicates(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    grid_w: int = 9,
    grid_h: int = 8,
    max_hamming: int = 4,
    n_bands: int = 8,
) -> DataFrame:
    """Perceptual near-duplicate pairs over thumbnail blobs:
    (id_a, id_b, hamming) for every pair with dHash Hamming distance <=
    ``max_hamming``.

    Candidate-then-verify, like dedup.minhash_lsh_verified_pairs — but
    here the band join is EXACT, not probabilistic: with ``n_bands`` >
    ``max_hamming``, any pair within the threshold differs in at most
    ``max_hamming`` bands, so by pigeonhole at least one band matches
    exactly and the pair MUST surface as a candidate. 100% recall is a
    theorem, which is what makes a value-exact SQL oracle possible
    (q129: the oracle computes all-pairs exact Hamming; a hash match
    proves both the recall argument and the hash pipeline).

    Plan shape at 100 TB: one pandas-UDF pass computes signatures (bands
    of ints — the corpus' pixel data never shuffles); the band self-join
    shuffles (band_idx, band_val) key groups; candidates (tiny) join
    back to the signature relation on id for the exact verify; no
    all-pairs anywhere. A pathological hot band (e.g. millions of
    all-black thumbnails) is the same failure mode as a hot LSH bucket —
    cap it upstream by exact-dedup first (q19), which removes identical
    rasters before banding.
    """
    if n_bands <= max_hamming:
        raise ValueError(
            f"recall guarantee needs n_bands > max_hamming "
            f"(got {n_bands} bands, threshold {max_hamming})"
        )
    sigs = dhash_bands(df, id_col, blob_col, grid_w, grid_h, n_bands)
    b = sigs.select(
        "id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    cands = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("bands").alias("ba"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("bands").alias("bb"))
    hamming = F.aggregate(
        F.zip_with(
            F.col("ba"), F.col("bb"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id_a", "id_b", "hamming")
    )
