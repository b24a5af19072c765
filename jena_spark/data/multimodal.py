"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-friendly batching,
Arrow-batched UDF signatures, output shapes) is real and tested.
Decoders, by format:

* **images — REAL decode for binary netpbm (P6 PPM / P5 PGM)**:
  header parse + ``np.frombuffer``, pure numpy (no codec library
  needed); the synthetic media table carries genuine P6 payloads, so
  the real path is what's exercised end-to-end. Non-netpbm image
  payloads (PNG/JPEG — codec libs absent in this container) fall back
  to a clearly-marked deterministic fake.
* **audio — REAL decode for RIFF/WAVE PCM16**: chunk walk +
  ``np.frombuffer``; synthetic audio is genuine WAV.
* **video — STUB** (no pure-numpy container format): the sampling
  schedule is real JVM-side planning; the frame decode seam is the
  same ``mapInPandas`` a real ffmpeg-backed decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes (header built by
    hand — the format is 44 fixed bytes)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_image(content: bytes) -> np.ndarray | None:
    """REAL image decode for binary netpbm: P6 (RGB) / P5 (gray).
    Returns (h, w) uint8 grayscale (RGB averaged), or None when the
    payload is not netpbm (caller falls back)."""
    if not content.startswith((b"P6", b"P5")):
        return None
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(content) and content[i:i + 1].isspace():
            i += 1
        if content[i:i + 1] == b"#":
            while i < len(content) and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(content) and not content[j:j + 1].isspace():
            j += 1
        vals.append(int(content[i:j]))
        i = j
    i += 1  # single whitespace byte before raster data
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("netpbm: 16-bit maxval unsupported")
    if content.startswith(b"P6"):
        raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
        return raster.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h, offset=i)
    return raster.reshape(h, w)


def decode_audio(content: bytes) -> tuple[np.ndarray, int] | None:
    """REAL audio decode for RIFF/WAVE PCM16 mono: returns (samples
    int16, sample_rate), or None when not a WAV payload."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    i, rate = 12, 0
    while i + 8 <= len(content):
        cid = content[i:i + 4]
        (size,) = struct.unpack_from("<I", content, i + 4)
        if cid == b"fmt ":
            fmt, _ch, rate = struct.unpack_from("<HHI", content, i + 8)
            if fmt != 1:
                raise ValueError("WAV: only PCM (fmt=1) supported")
        elif cid == b"data":
            samples = np.frombuffer(content, dtype="<i2",
                                    count=size // 2, offset=i + 8)
            return samples, rate
        i += 8 + size + (size & 1)
    raise ValueError("WAV: no data chunk")


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL P6 PPM images and PCM16 WAV
    audio (seeded noise), opaque video payloads (stub format)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 64 + i % 32, 48 + i % 32
            payload = encode_ppm(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
            mime, dur = "image/x-portable-pixmap", None
        elif kind == "audio":
            dur = 1000 + 10 * i
            samples = rng.integers(-2000, 2000, size=16 * dur, dtype=np.int16)
            payload = encode_wav_pcm16(samples)
            mime, w, h = "audio/wav", None, None
        else:
            payload = rng.integers(0, 256, size=128 + (i % 64),
                                   dtype=np.uint8).tobytes()
            mime, dur = "video/mp4", 1000 + 10 * i
            w, h = 64 + i % 32, 48 + i % 32
        rows.append((i, kind, bytearray(payload), mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB fallback for non-netpbm image payloads (PNG/JPEG need codec
    libs this container lacks): tile the payload bytes into (h, w)
    grayscale — deterministic, clearly fake."""
    arr = np.frombuffer(content, dtype=np.uint8)
    need = width * height
    tiled = np.resize(arr, need)
    return tiled.reshape(height, width)


def _decode_or_fake(content: bytes, width, height) -> np.ndarray:
    img = decode_image(content)
    if img is not None:
        return img
    import pandas as pd  # noqa: F401  (pd.notna used by callers)

    w = int(width) if width is not None else 16
    h = int(height) if height is not None else 16
    return _fake_decode_image(content, w, h)


FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_intensity double, feature_hash string"
)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch decodes in Python (decode is library-bound
    by nature); the Spark plan stays a narrow map — no shuffle,
    partition-parallel, which is the whole game at 100 TB of media
    bytes. Netpbm images and WAV audio decode for REAL (pure numpy);
    other payloads take the documented deterministic fallback.
    ``mean_intensity`` doubles as mean |sample| scaled to 0..255 for
    audio payloads.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
            }
            means, hashes = [], []
            for content, w, h in zip(pdf["content"], pdf["width"], pdf["height"]):
                content = bytes(content)
                audio = decode_audio(content) if content[:4] == b"RIFF" else None
                if audio is not None:
                    samples, _rate = audio
                    means.append(float(np.abs(samples).mean()) / 128.0)
                    hashes.append(
                        hashlib.sha256(samples.tobytes()).hexdigest()[:16])
                    continue
                img = _decode_or_fake(
                    content,
                    w if pd.notna(w) else None, h if pd.notna(h) else None)
                means.append(float(img.mean()))
                hashes.append(hashlib.sha256(img.tobytes()).hexdigest()[:16])
            out["mean_intensity"] = means
            out["feature_hash"] = hashes
            yield pd.DataFrame(out)

    return media.mapInPandas(op, FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, thumb binary"


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Nearest-neighbor thumbnailer over the REAL netpbm decode (fake
    fallback for non-netpbm payloads) — numpy index-grid sampling, the
    same mapInPandas seam a PIL-backed resizer would use."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                img = _decode_or_fake(bytes(content), int(w), int(h))
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                thumb = img[np.ix_(ys, xs)]
                rows.append((int(mid), out_w, out_h, bytearray(thumb.tobytes())))
            yield pd.DataFrame(rows, columns=["media_id", "out_width", "out_height", "thumb"])

    return media.mapInPandas(op, RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    The decode is NOT implemented (no ffmpeg in the container) — this
    materializes the sampling schedule JVM-side; a real decoder plugs
    into the downstream mapInPandas."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
