"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): ``decode_stub`` raises ``NotImplementedError`` unless the
deterministic fake is requested. Everything Spark-side — schema, partition
sizing, UDF signature, batch shape — is real and tested.

Scale notes: media rows are orders of magnitude wider than text rows, so the
operators (a) never shuffle raw bytes (feature extraction happens in the same
stage as the scan; only features/metadata flow on), and (b) repartition by a
content bucket before the UDF so one giant asset cannot skew a task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),        # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("feature", ArrayType(FloatType())),   # extracted embedding
])


def decode_stub(payload: bytes, kind: str, fake: bool = True) -> list[float]:
    """Decode + feature-extract one asset. Real decode needs PIL/ffmpeg —
    NOT available here; ``fake=True`` derives a deterministic 8-dim feature
    from the bytes so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; wire a real kernel here on a full cluster")
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(media: DataFrame, fake_decode: bool = True,
                     buckets: int = 64) -> DataFrame:
    """mapInPandas feature extraction: (media table) -> FEATURE_SCHEMA rows.
    Arrow batches keep the Python boundary vectorized; raw payload bytes die
    inside the stage (only ~40B features leave it)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p, k, fake_decode)
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()),
                "feature": feats,
            })

    src = media.repartition(buckets, F.pmod(F.xxhash64("media_id"),
                                            F.lit(buckets)))
    return src.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan (pure relational — the decode of each chosen
    frame is the stubbed kernel): one row per (media_id, frame_ts_ms)."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (4 + i % 5)
        rows.append((i, kind, bytearray(payload), f"x/{kind}",
                     64 + i % 128, 64 + (i * 7) % 128,
                     (i % 10) * 1500 + 500))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
