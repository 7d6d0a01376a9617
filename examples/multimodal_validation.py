"""Multimodal table validation: audio + image + video columns in ONE suite.

A training-data table rarely carries a single modality. This example
validates a table with an audio payload column, an image payload column,
and a video column — every check DECLARED in a CheckSuite (nothing called
by hand), each capability pinned individually by the test suite:

  1. AUDIO    — payload decode/energy row checks + a ``payload_neardup``
                table check bounding the near-duplicate rate (spectral
                fingerprints + pigeonhole LSH + connected components;
                violations list every non-kept cluster member).
  2. IMAGE    — ``payload_image_decode`` / ``image_luma_range`` row kinds
                over a PNG/JPEG bytes column (both decoders are real,
                from-scratch, stdlib-only: functions/media.py decode_png,
                functions/jpeg.py decode_jpeg), plus a generic ``in_range``
                on the derived ``img_ink_ratio`` metric.
  3. VIDEO    — ``payload_video_decode`` / ``video_frame_rate`` /
                ``video_luma_range`` row kinds over a video column mixing
                YUV4MPEG2 and COMPRESSED MJPEG-in-AVI payloads (both
                decode for real, stdlib-only; the AVI container is
                indexed, so only sampled frames are JPEG-decoded), plus
                frame-level detail via ``video_frame_sample``.

Mixed-modality plan note: the audio decode and the image decode are
separate mapInPandas passes, so each binary column crosses exactly one
Arrow boundary; a very wide media table should split modalities into
separate suites/tables to keep each binary inside its own scan (the
runner docstring states the same rule).

Run: python examples/multimodal_validation.py [out_dir]
(default ./multimodal_out). Prints a verdict summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def _media_rows():
    """Deterministic fixture rows: 2 near-dup audio takes + 1 unique, a
    good PNG, a too-dark JPEG, and a 2-frame Y4M clip."""
    from doc_quality_check_spark.functions.audio import (
        encode_wav_pcm16,
        synth_speechlike_pcm,
    )
    from doc_quality_check_spark.functions.jpeg import encode_jpeg_gray
    from doc_quality_check_spark.functions.media import (
        encode_png_gray,
        encode_y4m,
    )

    def pcm(seed, gain=1.0):
        x = synth_speechlike_pcm(seed, 8000, 400).astype(np.float64) * gain
        return np.clip(x, -1, 1).astype(np.float32)

    from doc_quality_check_spark.functions.media import encode_avi_mjpeg

    grad = (np.add.outer(np.arange(16) * 8, np.arange(16) * 4) % 200 + 30
            ).astype(np.uint8)
    dark = np.full((8, 8), 3, dtype=np.uint8)
    y4m = encode_y4m(
        [np.full((16, 16), 90, np.uint8), np.full((16, 16), 150, np.uint8)],
        fps=(2, 1),
    )
    # COMPRESSED video: real JPEG frames in a RIFF/AVI container
    avi = encode_avi_mjpeg(
        [np.full((16, 16), 90, np.uint8), np.full((16, 16), 150, np.uint8)],
        fps=(2, 1),
    )
    rows = [
        ("m0", bytearray(encode_wav_pcm16(pcm(7), 8000)),
         bytearray(encode_png_gray(grad)), bytearray(y4m), "pcm_s16le"),
        ("m1", bytearray(encode_wav_pcm16(pcm(7, gain=0.5), 8000)),  # near-dup of m0
         bytearray(encode_jpeg_gray(grad, quality=90)), bytearray(avi),
         "pcm_s16le"),
        ("m2", bytearray(encode_wav_pcm16(pcm(21), 8000)),
         bytearray(encode_jpeg_gray(dark, quality=90)), bytearray(y4m),
         "pcm_s16le"),
    ]
    return rows


def run_multimodal(spark, out_dir: str):
    """Build the table, run the declarative suite, sample video frames.
    Returns (RunResult, frame DataFrame) so tests can assert on both."""
    from doc_quality_check_spark.functions.media import video_frame_sample
    from doc_quality_check_spark.suite.runner import SuiteRunner
    from doc_quality_check_spark.suite.spec import Check, CheckSuite

    media = spark.createDataFrame(
        _media_rows(),
        "clip_id string, bytes binary, img binary, video binary, codec string",
    )

    suite = CheckSuite(
        name="multimodal_v1",
        checks=[
            # audio: payload decodes, not silent
            Check("audio_decodes", "payload_decode", "bytes", priority=1),
            Check("audio_energy", "payload_energy", "bytes",
                  {"min": 1e-6}, priority=2),
            # audio near-dup rate: tight bound -> m1 (re-leveled copy of
            # m0) is flagged as a redundant cluster member
            Check("audio_dup_rate", "payload_neardup", "bytes",
                  {"max_dup_rate": 0.2, "max_hamming": 7}),
            # image: decodes + luma sanity + a generic metric-column check
            Check("img_decodes", "payload_image_decode", "img", priority=3),
            Check("img_luma", "image_luma_range", "img",
                  {"min": 10.0, "max": 245.0}, priority=4),
            Check("img_ink", "in_range", "img_ink_ratio",
                  {"min": 0.0, "max": 1.0}, priority=5),
            # video: Y4M and compressed MJPEG-AVI both decode for real;
            # fps and sampled-frame luma bounded declaratively (round 5)
            Check("vid_decodes", "payload_video_decode", "video",
                  priority=6),
            Check("vid_fps", "video_frame_rate", "video",
                  {"min": 1.0, "max": 60.0}, priority=7),
            Check("vid_luma", "video_luma_range", "video",
                  {"min": 10.0, "max": 245.0}, priority=8),
        ],
    )
    res = SuiteRunner(suite).run(media, payload=True)

    # video: frame-level metrics as a plain DataFrame (Y4M decodes for
    # real; a generic bound over luma_mean is one filter away)
    frames = video_frame_sample(
        media.select("clip_id", "video", F.lit(1000).alias("dur_ms")),
        id_col="clip_id", payload_col="video", every_ms=500,
    )
    os.makedirs(out_dir, exist_ok=True)
    res.verdicts.toPandas().to_json(
        os.path.join(out_dir, "verdicts.json"), orient="records")
    return res, frames


def main() -> None:
    from doc_quality_check_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "./multimodal_out"
    spark = get_spark(cores=8, shuffle_partitions=8)
    res, frames = run_multimodal(spark, out_dir)
    print("verdicts:")
    for r in res.verdicts.orderBy("constraint_id", "part_key").collect():
        print(f"  {r['constraint_id']:>14s} part={r['part_key']} "
              f"passed={r['passed']} violations={r['n_violations']}")
    print("video frames:")
    for r in frames.orderBy("media_id", "t_ms").collect():
        print(f"  {r['media_id']} t={r['t_ms']}ms decode_ok={r['decode_ok']} "
              f"luma={r['luma_mean']}")
    res.unpersist()


if __name__ == "__main__":
    main()
