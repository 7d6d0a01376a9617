"""Fan-out operators: relational chunking + payload frame segmentation."""

import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.operators.segmentation import (
    chunk_fanout,
    clip_frames,
    voiced_segments,
)
from doc_quality_check_spark.sources.clips import load_clips


def test_chunk_fanout_covers_text(spark, sf01_dir):
    d = spark.read.parquet(f"{sf01_dir}/documents.parquet").limit(50)
    chunks = chunk_fanout(d, "doc_id", "text", chunk_chars=100)
    agg = (
        chunks.groupBy("doc_id").agg(
            F.sum("chunk_len").alias("total"), F.count("*").alias("n")
        )
        .join(d.select("doc_id", F.length("text").alias("len")), "doc_id")
        .collect()
    )
    for r in agg:
        assert r["total"] == r["len"]
        assert r["n"] == max(-(-r["len"] // 100), 1)


def test_chunk_udtf_matches_relational_fanout(spark, sf01_dir):
    """The UDTF lateral-join form produces exactly the relational
    chunk_fanout rows."""
    from doc_quality_check_spark.operators.segmentation import register_chunk_udtf

    register_chunk_udtf(spark, chunk_chars=100)
    d = spark.read.parquet(f"{sf01_dir}/documents.parquet").limit(40)
    d.createOrReplaceTempView("docs_udtf_test")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.chunk_len "
        "FROM docs_udtf_test d, LATERAL chunk_udtf(d.text) c"
    )
    via_rel = chunk_fanout(d, "doc_id", "text", chunk_chars=100).select(
        "doc_id", "chunk_idx", "chunk_text", "chunk_len"
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_rel.collect()))
    assert a == b


def test_clip_frames_fanout(spark, clips_dir):
    clips = load_clips(spark, clips_dir).filter(F.col("category") == "valid").limit(20)
    frames = clip_frames(clips, frame_ms=200).cache()
    rows = frames.collect()
    assert rows
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], []).append(r)
    for cid, fs in by_clip.items():
        fs.sort(key=lambda r: r["frame_idx"])
        assert fs[0]["start_ms"] == 0.0
        for a, b in zip(fs, fs[1:]):
            assert b["start_ms"] == pytest.approx(a["end_ms"])
        assert all(0.0 <= f["energy_ratio"] <= 1.0 for f in fs)


def test_clip_frames_never_zero_segments(spark, clips_dir):
    """Corrupt/silent clips still yield at least one frame row (the
    reference's whole-page fallback, document_segmentation.py:138)."""
    clips = load_clips(spark, clips_dir).filter(
        F.col("category").isin("corrupt", "silent")
    ).limit(10)
    n_clips = clips.count()
    frames = clip_frames(clips, frame_ms=200)
    per = frames.groupBy("clip_id").count().collect()
    assert len(per) == n_clips
    assert all(r["count"] >= 1 for r in per)


def test_voiced_segments_merge_runs(spark, clips_dir):
    clips = load_clips(spark, clips_dir).filter(F.col("category") == "valid").limit(10)
    frames = clip_frames(clips, frame_ms=100)
    segs = voiced_segments(frames, energy_threshold=0.05).collect()
    assert segs
    for s in segs:
        assert s["seg_end_ms"] > s["seg_start_ms"]
        assert s["avg_energy"] >= 0.05
