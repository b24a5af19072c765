"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-friendly batching,
Arrow-batched UDF signatures, output shapes) is real and tested; the
actual media decode is STUBBED — codec libraries are not in this
container. Every stub is a deterministic fake clearly marked as such,
behind the same ``mapInPandas`` seams a real decoder would use, so
swapping in PIL/librosa/ffmpeg later changes one inner function, not
the pipeline.
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


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append(
            (
                i, kind, bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                48 + i % 32 if kind != "audio" else None,
                (1000 + 10 * i) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB: a real implementation would `PIL.Image.open(BytesIO(content))`.

    Deterministic fake: tile the payload bytes into (h, w) grayscale.
    """
    arr = np.frombuffer(content, dtype=np.uint8)
    need = width * height
    tiled = np.resize(arr, need)
    return tiled.reshape(height, width)


FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_intensity double, feature_hash string"
)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch decodes vectorized-ish in Python (the real
    decode is library-bound anyway); the Spark plan stays a narrow map —
    no shuffle, partition-parallel, which is the whole game at 100 TB of
    media bytes. NOTE decode itself is a deterministic STUB (see
    _fake_decode_image).
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
                w = int(w) if pd.notna(w) else 16
                h = int(h) if pd.notna(h) else 16
                img = _fake_decode_image(bytes(content), w, h)
                means.append(float(img.mean()))
                hashes.append(hashlib.sha256(img.tobytes()).hexdigest()[:16])
            out["mean_intensity"] = means
            out["feature_hash"] = hashes
            yield pd.DataFrame(out)

    return media.mapInPandas(op, FEATURES_SCHEMA)


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, thumb binary"


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """STUBBED resize (nearest-neighbor over the fake decode) — same
    mapInPandas seam as a real thumbnailer."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                img = _fake_decode_image(bytes(content), int(w), int(h))
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
