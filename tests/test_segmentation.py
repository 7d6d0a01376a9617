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


def test_deoverlap_segments(spark):
    """W2: consecutive overlaps split at the midpoint; neighbors meet exactly
    and no adjusted overlap remains."""
    from doc_quality_check_spark.operators.segmentation import deoverlap_segments

    rows = [
        ("c1", 0.0, 120.0), ("c1", 100.0, 220.0), ("c1", 300.0, 400.0),
        ("c2", 0.0, 50.0), ("c2", 50.0, 90.0),
    ]
    df = spark.createDataFrame(rows, "clip_id string, start_ms double, end_ms double")
    out = {
        (r["clip_id"], r["start_ms"]): r
        for r in deoverlap_segments(df).collect()
    }
    # c1 overlap [100,120] → midpoint 110
    assert out[("c1", 0.0)]["adj_end"] == 110.0
    assert out[("c1", 100.0)]["adj_start"] == 110.0
    assert out[("c1", 100.0)]["adj_end"] == 220.0   # no overlap with next
    assert out[("c1", 300.0)]["adj_start"] == 300.0
    # c2 touches but does not overlap → unchanged
    assert out[("c2", 0.0)]["adj_end"] == 50.0
    assert out[("c2", 50.0)]["adj_start"] == 50.0


def test_count_min_sketch_bounds(spark, sf01_dir):
    """Sketch path for heavy hitters (A10 at 10^12 scale): count_min
    estimates never undercount and stay within eps*N of the exact counts."""
    from doc_quality_check_spark.operators.aggregates import heavy_hitters

    d = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    toks = d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    n_total = toks.count()
    exact = {r["value"]: r["cnt"] for r in heavy_hitters(toks, "tok", 1).collect()}
    eps = 0.001
    raw = bytes(
        toks.agg(
            F.expr(f"count_min_sketch(tok, {eps}d, 0.99d, 42)").alias("cms")
        ).first()["cms"]
    )
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(raw)
    for tok, cnt in exact.items():
        est = cms.estimateCount(tok)
        assert est >= cnt                      # one-sided error
        assert est <= cnt + eps * n_total + 1  # eps*N bound


def test_voiced_segments_merge_runs(spark, clips_dir):
    clips = load_clips(spark, clips_dir).filter(F.col("category") == "valid").limit(10)
    frames = clip_frames(clips, frame_ms=100)
    segs = voiced_segments(frames, energy_threshold=0.05).collect()
    assert segs
    for s in segs:
        assert s["seg_end_ms"] > s["seg_start_ms"]
        assert s["avg_energy"] >= 0.05


def test_iou_dedupe_segments(spark):
    """O2: greedy largest-first IoU/overlap removal
    (document_segmentation.py:143-228, 1-D analog)."""
    from doc_quality_check_spark.operators.segmentation import iou_dedupe_segments

    rows = [
        # clip A: big (0,100); (50,120) overlaps it; (200,300) disjoint;
        # (300,310) touches 300 → dropped under the separation rule
        ("A", 0.0, 100.0), ("A", 50.0, 120.0), ("A", 200.0, 300.0), ("A", 300.0, 310.0),
        # clip B: single segment survives
        ("B", 10.0, 20.0),
        # clip C: identical sizes → deterministic tie-break on start
        ("C", 0.0, 50.0), ("C", 25.0, 75.0),
    ]
    df = spark.createDataFrame(rows, "clip_id string, seg_start_ms double, seg_end_ms double")

    kept = {(r["clip_id"], r["seg_start_ms"], r["seg_end_ms"])
            for r in iou_dedupe_segments(df).collect()}
    assert kept == {("A", 0.0, 100.0), ("A", 200.0, 300.0), ("B", 10.0, 20.0),
                    ("C", 0.0, 50.0)}

    # pure-IoU mode: touching segments survive, high-IoU overlaps do not
    kept2 = {(r["clip_id"], r["seg_start_ms"], r["seg_end_ms"])
             for r in iou_dedupe_segments(df, drop_touching=False).collect()}
    assert ("A", 300.0, 310.0) in kept2           # touch → IoU 0 → kept
    assert ("A", 50.0, 120.0) not in kept2        # IoU 50/120 > 0.3 → dropped
    # C: IoU 25/75 = 0.33 > 0.3 → second one dropped even without touching rule
    assert ("C", 25.0, 75.0) not in kept2


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 14),
    groups=st.integers(1, 3),
)
def test_iou_dedupe_invariants_property(seed, n, groups, spark):
    """Property gate for the rows-only iou_dedupe query (r4 verdict #7):
    over random interval sets, every surviving pair within a group has
    IoU <= threshold (and no touching under drop_touching), and every
    dropped segment conflicts with some LARGER-OR-EQUAL kept segment —
    the greedy largest-first contract."""
    import numpy as np

    from doc_quality_check_spark.operators.segmentation import (
        iou_dedupe_segments,
    )

    rng = np.random.default_rng(seed)
    rows = []
    for g in range(groups):
        for _ in range(n):
            s = float(rng.integers(0, 500))
            rows.append((f"c{g}", s, s + float(rng.integers(10, 200))))
    df = spark.createDataFrame(
        rows, "clip_id string, seg_start_ms double, seg_end_ms double"
    )
    thr = 0.3
    kept = iou_dedupe_segments(df, iou_threshold=thr).collect()
    by_group: dict[str, list[tuple[float, float]]] = {}
    for r in kept:
        by_group.setdefault(r["clip_id"], []).append(
            (r["seg_start_ms"], r["seg_end_ms"])
        )

    def conflict(a, b):
        inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
        union = (a[1] - a[0]) + (b[1] - b[0]) - inter
        iou = inter / union if union > 0 else 0.0
        touching = min(a[1], b[1]) >= max(a[0], b[0])  # overlap OR touch
        return iou > thr or touching

    for segs in by_group.values():
        for i in range(len(segs)):
            for j in range(i + 1, len(segs)):
                assert not conflict(segs[i], segs[j]), (segs[i], segs[j])

    # every dropped segment conflicts with a kept one at least as large
    kept_set = {(r["clip_id"], r["seg_start_ms"], r["seg_end_ms"])
                for r in kept}
    for cid, s, e in rows:
        if (cid, s, e) in kept_set:
            continue
        assert any(
            conflict((s, e), k) and (k[1] - k[0]) >= (e - s)
            for k in by_group.get(cid, [])
        ), (cid, s, e)
