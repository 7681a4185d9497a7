"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not available in this container, so
the *decode* step is stubbed (deterministic fake pixels/features behind
``fake=True``, ``NotImplementedError`` otherwise) while the Spark-side
plumbing is real and tested: binary payload columns, typed metadata,
Arrow batch shape, frame-sampling explode semantics, and the
``mapInPandas`` signatures are exactly what a production decoder
(PIL / librosa / ffmpeg) would drop into.

Operations (training-data pipeline surface):
  * :func:`extract_features` — payload -> feature vector
  * :func:`resize_images`    — payload -> payload' with new dimensions
  * :func:`sample_frames`    — video row -> one row per sampled frame
    (frame positions are pure Column algebra; only the per-frame decode
    is Python)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque bytes
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),  # audio/video, else 0
    StructField("fps", IntegerType()),          # video, else 0
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("feature_str", StringType()),   # canonical (hashable) form
    StructField("n_bytes", LongType()),
])

RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FRAME_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("feature_str", StringType()),   # canonical (hashable) form
])


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = digest bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3).cast("int") + 1).alias("kind"),
        F.unhex(F.sha2(F.col("id").cast("string"), 256)).alias("payload"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
        F.when(F.col("id") % 3 == 0, 0)
        .otherwise((F.col("id") % 20 + 1) * 1000).cast("int")
        .alias("duration_ms"),
        F.when(F.col("id") % 3 == 2, 25).otherwise(0).cast("int")
        .alias("fps"),
    )


def _decode_stub(payload: bytes, dim: int, salt: bytes = b"") -> np.ndarray:
    """Deterministic fake 'decoder': hash-seeded milli-feature vector
    (integers 0..999; callers divide by 1000 for the float view).  A real
    deployment swaps this for PIL/librosa/ffmpeg — the batch shape and
    signature stay identical.  The digest covers the *hex* encoding of
    the payload so a plain-SQL oracle (sha256 over VARCHAR) can reproduce
    the values bit-for-bit."""
    h = hashlib.sha256(salt + payload.hex().encode()).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype="<u4")
    return raw % 1000


def _feature_cols(milli: np.ndarray) -> tuple[list, str]:
    """(float feature list, canonical comma-joined milli string)."""
    return ((milli.astype(np.float32) / 1000.0).tolist(),
            ",".join(str(int(v)) for v in milli))


def _require_fake(fake: bool):
    if not fake:
        raise NotImplementedError(
            "real decoders (PIL/librosa/ffmpeg) are not available in this "
            "environment; run with fake=True for the plumbing path")


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """media -> one feature vector per payload via Arrow-batched
    mapInPandas."""
    _require_fake(fake)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_feature_cols(_decode_stub(bytes(p), dim))
                       for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [d[0] for d in decoded],
                "feature_str": [d[1] for d in decoded],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
            })

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int,
                  fake: bool = True) -> DataFrame:
    """image rows -> resized payloads.  The non-image filter and the
    metadata rewrite are Column algebra; only the pixel op is Python
    (stub: payload' = sha256(payload || 'WxH'), the deterministic stand-
    in for an interpolating resampler)."""
    _require_fake(fake)
    salt = f"{target_w}x{target_h}".encode()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": [hashlib.sha256(bytes(p) + salt).digest()
                            for p in pdf["payload"]],
                "width": np.full(len(pdf), target_w, dtype=np.int32),
                "height": np.full(len(pdf), target_h, dtype=np.int32),
            })

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(batches, schema=RESIZED_SCHEMA))


def sample_frames(media: DataFrame, every_ms: int = 1000, dim: int = 16,
                  fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame with a per-frame feature.

    Frame positions (``ts_ms = 0, every_ms, ...`` up to duration) are
    generated with ``sequence`` + ``explode`` — pure Column algebra, so
    Catalyst sizes the fan-out and only the per-frame decode crosses
    into Python."""
    _require_fake(fake)

    frames = (media
              .filter((F.col("kind") == "video") & (F.col("fps") > 0))
              .select("media_id", "payload",
                      F.posexplode(
                          F.sequence(F.lit(0),
                                     F.greatest(F.col("duration_ms") - 1,
                                                F.lit(0)),
                                     F.lit(every_ms)))
                      .alias("frame_idx", "ts_ms")))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _feature_cols(_decode_stub(bytes(p), dim,
                                           salt=str(ts).encode()))
                for p, ts in zip(pdf["payload"], pdf["ts_ms"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_idx": pdf["frame_idx"].astype("int32"),
                "ts_ms": pdf["ts_ms"].astype("int32"),
                "feature": [d[0] for d in decoded],
                "feature_str": [d[1] for d in decoded],
            })

    return frames.mapInPandas(batches, schema=FRAME_FEATURE_SCHEMA)
