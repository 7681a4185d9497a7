"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not available in this container, so
the *decode* step is stubbed (deterministic fake features behind
``fake=True``, ``NotImplementedError`` otherwise) while the Spark-side
plumbing is real and tested: schema, Arrow batch shape, partitioning,
and the ``mapInPandas`` signature are exactly what a production decoder
would drop into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", StringType()),     # binary in prod; hex here
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
])


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated digest bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3).cast("int") + 1).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
    )


def _decode_stub(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': hash-seeded feature vector.  A real
    deployment swaps this for PIL/librosa/ffmpeg frame sampling — the
    batch shape and signature stay identical."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """media -> feature vectors via Arrow-batched mapInPandas."""
    if not fake:
        raise NotImplementedError(
            "real decoders (PIL/librosa/ffmpeg) are not available in this "
            "environment; run with fake=True for the plumbing path")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p.encode(), k, dim).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": pdf["payload"].str.len().astype("int64"),
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
