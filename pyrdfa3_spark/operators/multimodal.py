"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode LIBRARIES are not available in this container,
but PNG needs none of them: :func:`png_decode` / :func:`png_encode` /
:func:`png_features` implement a real pure-stdlib (struct + zlib) PNG
codec — 8-bit non-interlaced color types 0/2/3/4/6, all five scanline
filters — so ``fake=False`` on :func:`extract_features` /
:func:`resize_images` is a REAL pixel path for PNG payloads
(byte-exact, tested against an independent encoder in
tests/test_operators.py).  Audio/video and non-PNG images stay behind
the deterministic hash stub (``fake=True``) or raise
``NotImplementedError`` — honest refusal, never fake data on the real
path.  The Spark-side plumbing is identical either way: binary payload
columns, typed metadata, Arrow batch shape, frame-sampling explode
semantics, and ``mapInPandas`` signatures a production decoder
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


# ------------------------------------------------------------------ #
# real PNG path (pure stdlib: struct + zlib) — no PIL in this
# environment, but PNG is fully decodable without it.  Production
# swaps these for PIL/libpng for speed; the semantics are identical.
# ------------------------------------------------------------------ #

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}  # type 3 maps via PLTE


def png_info(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse the PNG signature + IHDR (pure stdlib): returns
    ``(width, height, bit_depth, color_type, interlace)``.  Raises
    ``ValueError`` on non-PNG input."""
    import struct

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ln, typ = struct.unpack(">I4s", payload[8:16])
    if typ != b"IHDR" or ln != 13:
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    w, h, depth, ctype, comp, filt, inter = struct.unpack(
        ">IIBBBBB", payload[16:29])
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    return w, h, depth, ctype, inter


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an ``(H, W, C)`` uint8 array.  Supports
    8-bit depth, color types 0/2/3/4/6, non-interlaced — the common
    web-corpus shapes; anything else raises ``NotImplementedError``
    (honest refusal, never a wrong image).  The filter reconstruction
    runs a per-scanline Python loop for the sequential filters
    (Sub/Average/Paeth) — fine for fixture-scale payloads; a real
    deployment swaps in PIL for throughput, not for correctness."""
    import struct
    import zlib

    w, h, depth, ctype, inter = png_info(payload)
    if depth != 8 or inter != 0 or ctype not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color_type={ctype} interlace={inter}: "
            "only 8-bit non-interlaced types 0/2/3/4/6 are decoded here")
    idat, palette, pos = [], None, 8
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    ch = 1 if ctype == 3 else _PNG_CHANNELS[ctype]
    bpp, stride = ch, w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos2 = 0
    for y in range(h):
        f = raw[pos2]
        line = np.frombuffer(raw, np.uint8, stride, pos2 + 1) \
            .astype(np.int64)
        pos2 += stride + 1
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    pred = _paeth(int(a), int(b), int(c))
                rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape(h, w, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def png_encode(px: np.ndarray) -> bytes:
    """Encode an ``(H, W, C)`` uint8 array (C in {1, 2, 3, 4}) as a
    minimal valid PNG (filter 0 scanlines, one IDAT) — the re-encode
    half of the real resize path."""
    import struct
    import zlib

    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def png_features(payload: bytes, dim: int) -> np.ndarray:
    """REAL feature extraction for PNG payloads: decode, grayscale
    (mean over color channels), flatten row-major, mean-pool into
    ``dim`` buckets via ``np.array_split``, scale to milli-units
    (``round(mean * 1000 / 255)``).  Deterministic and hand-checkable;
    same (milli ints -> float/1000) output convention as the stub."""
    px = png_decode(payload)
    gray = (px[:, :, :3].mean(axis=2) if px.shape[2] >= 3
            else px[:, :, 0].astype(np.float64))
    flat = np.asarray(gray, dtype=np.float64).ravel()
    buckets = np.array_split(flat, dim)
    return np.array([round(float(b.mean()) * 1000 / 255) if b.size else 0
                     for b in buckets], dtype=np.int64)


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
    mapInPandas.

    ``fake=True`` runs the deterministic hash-stub decoder (any
    payload, any kind — the oracle-checkable plumbing path).
    ``fake=False`` runs the REAL decode: PNG payloads go through the
    pure-stdlib :func:`png_decode` -> :func:`png_features` pipeline
    (grayscale mean-pool, milli-unit convention identical to the
    stub); any non-PNG payload or non-image kind raises
    ``NotImplementedError`` inside the task — honest refusal, never a
    silently fake feature on the real path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                decoded = [_feature_cols(_decode_stub(bytes(p), dim))
                           for p in pdf["payload"]]
            else:
                decoded = []
                for k, p in zip(pdf["kind"], pdf["payload"]):
                    if k != "image":
                        raise NotImplementedError(
                            f"real decode for kind={k!r} needs "
                            "librosa/ffmpeg (absent); only PNG images "
                            "decode in-env")
                    decoded.append(
                        _feature_cols(png_features(bytes(p), dim)))
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
    metadata rewrite are Column algebra; only the pixel op is Python.

    ``fake=True``: payload' = sha256(payload || 'WxH') — the
    deterministic stand-in.  ``fake=False``: REAL nearest-neighbor
    resample of PNG payloads (pure-stdlib decode -> index-map ->
    re-encode via :func:`png_encode`); non-PNG payloads raise."""
    salt = f"{target_w}x{target_h}".encode()

    def _resize_png(p: bytes) -> bytes:
        px = png_decode(p)
        h, w = px.shape[:2]
        ys = (np.arange(target_h) * h) // target_h
        xs = (np.arange(target_w) * w) // target_w
        return png_encode(px[ys][:, xs])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                payloads = [hashlib.sha256(bytes(p) + salt).digest()
                            for p in pdf["payload"]]
            else:
                payloads = [_resize_png(bytes(p))
                            for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
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
