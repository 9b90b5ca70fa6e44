"""Multimodal binary-column plumbing: decode / feature / resize / sample.

Images, audio and video ride as opaque ``binary`` columns with typed
metadata structs. The Spark-side machinery here is REAL and tested —
schemas, Arrow batch shapes, ``mapInPandas`` partitioning, deterministic
fake features — while the actual codec calls are STUBBED (this container
ships no image/audio libraries): each ``_decode_*`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic md5-derived stand-in so the distributed plumbing can be
exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, format string"
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, format string, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_no int, frame binary"


def _decode_image(payload: bytes, fake: bool) -> tuple[int, int, str]:
    """Stub: real impl would use PIL/opencv. ``fake`` derives deterministic
    metadata from the payload hash."""
    if not fake:
        raise NotImplementedError("image decoding requires PIL/opencv (not in container)")
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 1920, 64 + h[1] % 1080, ["jpeg", "png", "webp"][h[2] % 3]


def _image_feature(payload: bytes, dim: int, fake: bool) -> np.ndarray:
    """Stub embedding: real impl would run a vision encoder. ``fake``
    produces a deterministic unit vector from md5 expansion."""
    if not fake:
        raise NotImplementedError("feature extraction requires a vision model")
    out = np.empty(dim, dtype=np.float32)
    for i in range(0, dim, 4):
        h = hashlib.md5(payload + i.to_bytes(4, "big")).digest()
        for j in range(min(4, dim - i)):
            out[i + j] = int.from_bytes(h[j * 4 : j * 4 + 4], "big") / 2**32 - 0.5
    n = float(np.linalg.norm(out))
    return out / n if n else out


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "html",
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """binary column → (metadata, feature vector) via Arrow-batched
    ``mapInPandas``. Column pruning matters at scale: only (id, binary)
    are selected, so the parquet scan never reads anything else."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch[id_col], batch[binary_col]):
                payload = bytes(payload) if payload is not None else b""
                w, h, fmt = _decode_image(payload, fake)
                feat = _image_feature(payload, dim, fake)
                rows.append((int(doc_id), w, h, fmt, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "format", "feature"]
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "html",
    every_n: int = 4,
    max_frames: int = 3,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling stub: emits every_n-th "frame" (deterministic
    slices of the payload when ``fake``). Output is exploded one row per
    frame — the 1→N ``mapInPandas`` batch shape."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[binary_col]):
                if not fake:
                    raise NotImplementedError("video decoding requires ffmpeg")
                payload = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(payload) // 64)
                for fi in range(0, min(n_frames, every_n * max_frames), every_n):
                    ids.append(int(doc_id))
                    frame_nos.append(fi)
                    frames.append(payload[fi * 64 : (fi + 1) * 64])
            yield pd.DataFrame({"doc_id": ids, "frame_no": frame_nos, "frame": frames})

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        _sample, schema=FRAME_SAMPLE_SCHEMA
    )
