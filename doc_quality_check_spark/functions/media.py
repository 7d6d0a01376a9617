"""Multimodal binary-column plumbing: image / video payloads.

Audio is this engine's first-class modality (functions/audio.py, fully real).
A training-data pipeline also carries image/video columns; this module
provides the Spark-side plumbing — typed metadata schema, Arrow-batched
``mapInPandas`` decode, batch-shape discipline — with the codec-specific
decode step STUBBED (no image/video libraries exist in this environment):

- ``decode_image_stub`` raises NotImplementedError for real formats and
  handles one deterministic fake format (``FAKEIMG``: magic + width + height
  + raw grayscale bytes) so the plumbing is testable end-to-end.
- Swap ``_decode_one`` with a real decoder (PIL/ffmpeg) in production; the
  Spark plan (schema, partitioning, per-batch decode, bytes-column pruning)
  does not change.

Reference parity: payload decode + per-page metrics is exactly the shape of
/root/reference/utils/document_processor.py:92-207 (extract_page_data) —
in-band error rows (test_readability.py:262-271), empty-input default row
(document_processor.py:126-134).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FAKEIMG_MAGIC = b"FIMG"

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ink_ratio", DoubleType()),
        StructField("error", StringType()),
    ]
)


def encode_fake_image(seed: int, width: int, height: int) -> bytes:
    """Deterministic fake grayscale image (fixtures only)."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return FAKEIMG_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def _decode_one(buf: bytes) -> tuple[int, int, np.ndarray]:
    """bytes → (width, height, grayscale array). Real formats are stubbed."""
    if buf is None or len(buf) == 0:
        return 0, 0, np.zeros(0, dtype=np.uint8)  # empty-input default row
    b = bytes(buf)
    if b[:4] == FAKEIMG_MAGIC:
        w, h = struct.unpack_from("<II", b, 4)
        px = np.frombuffer(b[12 : 12 + w * h], dtype=np.uint8)
        if px.size < w * h:
            raise ValueError("truncated FAKEIMG payload")
        return int(w), int(h), px
    if b[:8] == b"\x89PNG\r\n\x1a\n" or b[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG decode requires an image library not present in this "
            "environment — plug a real decoder into _decode_one"
        )
    raise ValueError("unrecognized image container")


def image_metrics(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "bytes",
    batch_size_hint: int = 64,
) -> DataFrame:
    """mapInPandas decode → typed metadata rows; the payload never leaves
    the scan stage (ink_ratio = fraction of pixels above the mean — the
    reference's clarity metric shape, checks/clarity_check.py:11-38)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_META_SCHEMA.fields}
            for mid, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, px = _decode_one(buf)
                    ink = float((px > px.mean()).mean()) if px.size else 0.0
                    ok, err = True, None
                except NotImplementedError as exc:
                    w = h = 0
                    ink, ok, err = 0.0, False, f"stub: {exc}"
                except Exception as exc:  # in-band error row
                    w = h = 0
                    ink, ok, err = 0.0, False, str(exc)
                out["media_id"].append(mid)
                out["decode_ok"].append(ok)
                out["width"].append(w)
                out["height"].append(h)
                out["ink_ratio"].append(ink)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(gen, IMAGE_META_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", DoubleType()),
        StructField("decode_ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def video_frame_sample(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "bytes",
    fps_meta_col: str = "fps",
    dur_ms_col: str = "dur_ms",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled timestamp from the
    declared metadata (fps/duration); the actual frame decode is stubbed —
    rows carry decode_ok=false + a stub error, but the fan-out shape,
    schema, and batch discipline are real and tested."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for mid, dur in zip(pdf[id_col], pdf[dur_ms_col]):
                n = max(1, int(dur) // every_ms) if dur and dur > 0 else 1
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["t_ms"].append(float(i * every_ms))
                    out["decode_ok"].append(False)
                    out["error"].append(
                        "stub: video frame decode requires ffmpeg/av, "
                        "absent in this environment"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col, dur_ms_col).mapInPandas(
        gen, VIDEO_FRAME_SCHEMA
    )
