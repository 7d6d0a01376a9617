"""Fan-out / segmentation operators (SURVEY.md §2.8, UDTF-shaped).

Reference parity: one payload row fans out into N segment rows —
page → sub-documents (/root/reference/modules/document_segmentation.py:20-140
contour segmentation, :514-566 per-page pipeline, "never zero segments"
fallback :138) and file → pages (/root/reference/utils/
document_processor.py:92-207). Two engine forms:

- :func:`chunk_fanout` — relational fan-out for text: fixed-size character
  chunks via ``sequence`` + ``posexplode`` + ``substring`` — pure Catalyst,
  oracle-checkable, and the pattern scales (no Python, no driver loop).
- :func:`clip_frames` — payload fan-out for audio: decode once inside an
  Arrow-batched pandas UDF, emit an array of per-frame structs (frame index,
  start/end ms, energy ratio), then ``posexplode``. The audio analog of
  page→segment contour fan-out; the "never zero segments" invariant holds —
  an undecodable/empty clip still yields one whole-clip frame row with zero
  energy (document_segmentation.py:138 whole-page fallback).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from doc_quality_check_spark.functions.audio import decode_payload, energy_ratio


def chunk_fanout(
    df: DataFrame, id_col: str, text_col: str, chunk_chars: int = 100
) -> DataFrame:
    """doc → one row per fixed-size character chunk:
    (id, chunk_idx, chunk_text, chunk_len). Empty text still yields one empty
    chunk (never-zero-segments)."""
    n = F.greatest(
        F.ceil(F.length(F.col(text_col)) / F.lit(chunk_chars)).cast("int"), F.lit(1)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(text_col).alias("_t"),
            F.posexplode(F.sequence(F.lit(1), n)).alias("chunk_idx", "_one"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.substring(F.col("_t"), F.col("chunk_idx") * chunk_chars + 1, chunk_chars).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


# ---------------------------------------------------------------------------
# Python UDTF form of the same fan-out (Spark's table-function surface,
# SURVEY.md §2.10): one input row → N output rows via LATERAL join. The
# relational chunk_fanout above is the preferred (codegen'd) form; the UDTF
# exists for fan-outs whose row expansion needs imperative Python.
# ---------------------------------------------------------------------------

def register_chunk_udtf(spark, chunk_chars: int = 100, name: str = "chunk_udtf"):
    """Register a chunking UDTF usable as
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_udtf(d.text) c``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, chunk_len int")
    class ChunkEmitter:
        def eval(self, text: str):
            if text is None:
                text = ""
            n = max(-(-len(text) // chunk_chars), 1)
            for i in range(n):
                piece = text[i * chunk_chars : (i + 1) * chunk_chars]
                yield i, piece, len(piece)

    spark.udtf.register(name, ChunkEmitter)
    return ChunkEmitter


FRAME_SCHEMA = ArrayType(
    StructType(
        [
            StructField("frame_idx", IntegerType()),
            StructField("start_ms", DoubleType()),
            StructField("end_ms", DoubleType()),
            StructField("energy_ratio", DoubleType()),
        ]
    )
)


def _frames_for_clip(buf, codec: str, frame_ms: int) -> list[dict]:
    try:
        sr, pcm = decode_payload(buf, codec or "")
    except Exception:
        sr, pcm = 0, np.zeros(0, dtype=np.float32)
    if sr <= 0 or pcm.size == 0:
        # never-zero-segments fallback: one whole-clip frame, zero energy
        return [{"frame_idx": 0, "start_ms": 0.0, "end_ms": 0.0, "energy_ratio": 0.0}]
    spf = max(1, int(sr * frame_ms / 1000))
    out = []
    for i in range(0, pcm.size, spf):
        seg = pcm[i : i + spf]
        out.append(
            {
                "frame_idx": i // spf,
                "start_ms": 1000.0 * i / sr,
                "end_ms": 1000.0 * min(i + spf, pcm.size) / sr,
                "energy_ratio": energy_ratio(seg),
            }
        )
    return out


def clip_frames(
    df: DataFrame,
    payload_col: str = "bytes",
    codec_col: str = "codec",
    id_col: str = "clip_id",
    frame_ms: int = 500,
) -> DataFrame:
    """clip → per-frame rows (clip_id, frame_idx, start_ms, end_ms,
    energy_ratio). Decode happens once per clip inside an Arrow batch; only
    the tiny frame structs fan out — the binary column never leaves the scan
    stage."""

    @F.pandas_udf(FRAME_SCHEMA)
    def frames_udf(payloads: pd.Series, codecs: pd.Series) -> pd.Series:
        return pd.Series(
            [_frames_for_clip(b, c, frame_ms) for b, c in zip(payloads, codecs)]
        )

    exploded = df.select(
        F.col(id_col),
        F.posexplode(frames_udf(F.col(payload_col), F.col(codec_col))).alias("_i", "f"),
    )
    return exploded.select(
        id_col,
        F.col("f.frame_idx").alias("frame_idx"),
        F.col("f.start_ms").alias("start_ms"),
        F.col("f.end_ms").alias("end_ms"),
        F.col("f.energy_ratio").alias("energy_ratio"),
    )


def deoverlap_segments(
    df: DataFrame,
    id_col: str = "clip_id",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """W2 neighbor-adjust: per group, sort segments by start and split every
    overlap between consecutive segments at its midpoint — the reference's
    bbox overlap fix (/root/reference/modules/document_segmentation.py:231-300:
    sort by y, for each consecutive pair set the shared boundary to the
    overlap midpoint), done relationally with lag/lead instead of a mutable
    loop. Adds ``adj_start``/``adj_end``."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.asc(start_col), F.asc(end_col))
    prev_end = F.lag(end_col).over(w)
    next_start = F.lead(start_col).over(w)
    adj_start = F.when(
        prev_end > F.col(start_col), (prev_end + F.col(start_col)) / 2
    ).otherwise(F.col(start_col))
    adj_end = F.when(
        (next_start < F.col(end_col)) & next_start.isNotNull(),
        (F.col(end_col) + next_start) / 2,
    ).otherwise(F.col(end_col))
    return df.withColumn("adj_start", adj_start).withColumn("adj_end", adj_end)


def voiced_segments(
    frames: DataFrame,
    id_col: str = "clip_id",
    energy_threshold: float = 0.05,
) -> DataFrame:
    """Merge consecutive above-threshold frames into voiced segments — the
    run-length trick (row_number difference) over the frame table; the
    relational form of the reference's projection-profile splitting
    (document_segmentation.py:405-510: 1-D profile → runs below threshold →
    split)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    voiced = frames.filter(F.col("energy_ratio") >= energy_threshold)
    runs = voiced.withColumn(
        "_grp", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "_grp")
        .agg(
            F.min("start_ms").alias("seg_start_ms"),
            F.max("end_ms").alias("seg_end_ms"),
            F.count("*").alias("n_frames"),
            F.round(F.avg("energy_ratio"), 6).alias("avg_energy"),
        )
        .drop("_grp")
    )


def iou_dedupe_segments(
    df: DataFrame,
    id_col: str = "clip_id",
    start_col: str = "seg_start_ms",
    end_col: str = "seg_end_ms",
    iou_threshold: float = 0.3,
    drop_touching: bool = True,
) -> DataFrame:
    """O2: greedy largest-first overlap removal for arbitrarily overlapping
    segment sets — the 1-D interval analog of the reference's
    remove_overlapping_contours (/root/reference/modules/
    document_segmentation.py:143-228): sort candidates by size descending,
    keep a candidate only if, against every already-kept segment, IoU ≤
    ``iou_threshold`` AND (when ``drop_touching``, the reference's
    separation rule) the intervals neither overlap nor touch.

    The greedy loop is inherently sequential *per group* but groups (segments
    of one clip) are tiny, so this runs as ``applyInPandas`` over Arrow
    batches — per-partition Python on grouped data, never a driver loop; the
    only shuffle is the groupBy(id_col) co-location. Sort ties break on
    (start, end) so the result is deterministic under any partitioning.
    Returns only the surviving rows, schema unchanged.
    """
    schema = df.schema
    s, e = start_col, end_col

    def _dedupe(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf
        order = pdf.assign(_sz=pdf[e] - pdf[s]).sort_values(
            ["_sz", s, e], ascending=[False, True, True], kind="mergesort"
        )
        kept: list[tuple[float, float]] = []
        idxs = []
        for row_i, row in order.iterrows():
            a0, a1 = float(row[s]), float(row[e])
            ok = True
            for b0, b1 in kept:
                inter = max(0.0, min(a1, b1) - max(a0, b0))
                union = (a1 - a0) + (b1 - b0) - inter
                iou = inter / union if union > 0 else 0.0
                gap = max(b0 - a1, a0 - b1)  # <=0 → overlapping or touching
                if iou > iou_threshold or (drop_touching and gap <= 0):
                    ok = False
                    break
            if ok:
                kept.append((a0, a1))
                idxs.append(row_i)
        return pdf.loc[sorted(idxs)]

    return df.groupBy(id_col).applyInPandas(_dedupe, schema=schema)
