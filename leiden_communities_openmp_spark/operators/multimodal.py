"""Multimodal column operators (training-data pipeline ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schemas, Arrow batch shapes, UDF
signatures, partition sizing — is real and tested; the actual media decode
is STUBBED behind ``_decode_image``/``_decode_audio`` (codec libraries are
not in this container) with a deterministic fake so pipelines are testable
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame binary"


try:  # real codec path when the environment provides it (feature-gated;
    # this container ships no imaging libs, so tests run the fake)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None


def _decode_image(payload: bytes) -> np.ndarray:
    """Image decode behind a feature gate: PIL grayscale decode when the
    library is importable, else a deterministic fake (bytes → pseudo-pixel
    grid, 16x16 grayscale) so the Spark-side plumbing — schema, Arrow batch
    shape, UDF signature — is exercised end-to-end either way."""
    if payload is None:
        raise NotImplementedError("image decode requires a payload")
    if _PILImage is not None:
        import io
        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        except Exception:
            pass  # not a decodable image (synthetic fixture) → fake path
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return arr.reshape(16, 16)


def image_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over image rows: width/height echo,
    mean luminance, and a 16-float row-profile feature vector. Arrow batch
    shape: one pandas batch per ~batch_hint rows (spark.sql.execution.arrow
    .maxRecordsPerBatch governs; set by caller for large payloads)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            imgs = [_decode_image(p) for p in b["payload"]]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "width": b["width"],
                "height": b["height"],
                "mean_luma": [float(i.mean()) for i in imgs],
                "feature": [i.mean(axis=1).astype(np.float32).tolist() for i in imgs],
            })

    return media.filter(F.col("kind") == "image").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: plumbing only — passes payload through and rewrites
    metadata (real path: vectorized decode-resize-encode per Arrow batch)."""
    return (
        media.filter(F.col("kind") == "image")
        .withColumn("width", F.lit(width))
        .withColumn("height", F.lit(height))
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (frame decode STUBBED — emits the payload's leading bytes per frame)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, dur in zip(b["media_id"], b["payload"], b["duration_ms"]):
                n = max(int((dur or 0) // every_ms), 0)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(payload[:16]) if payload is not None else b"")
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


def gen_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64))
        rows.append((i, kind, payload, f"application/x-{kind}", 16, 16,
                     1000 * (1 + i % 5)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
