"""Robustness: empty inputs (ANSI div-by-zero guards), sketch error bounds,
threshold-sweep monotonicity, hypothesis-based codec roundtrips, AQE skew."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from doc_quality_check_spark.functions.audio import (
    decode_payload,
    synth_clip_bytes,
    synth_pcm,
)
from doc_quality_check_spark.sources.clips import load_clips
from doc_quality_check_spark.suite.runner import SuiteRunner
from doc_quality_check_spark.suite.spec import Check, CheckSuite


def test_suite_on_empty_input(spark, clips_dir):
    """A zero-row partition/table must produce verdicts, not crash (ANSI
    division guards — try_divide everywhere a denominator can be 0)."""
    clips = load_clips(spark, clips_dir).limit(0)
    suite = CheckSuite(
        name="empty", partition_by=["part_key"],
        checks=[
            Check("nn", "not_null", "clip_id", priority=1),
            Check("uni", "unique", "clip_id"),
            Check("comp", "completeness_min", "transcript", {"min_ratio": 0.9}),
        ],
    )
    res = SuiteRunner(suite).run(clips, payload=True)
    assert res.violations.count() == 0
    verdicts = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert verdicts["uni"]["passed"] is True
    assert verdicts["comp"]["passed"] is True  # vacuous completeness passes
    assert res.summary.first()["n_rows"] == 0
    res.unpersist()


def test_drift_snapshot_roundtrip(spark, clips_dir):
    """A12 lifecycle: snapshot_histograms of run N is run N+1's baseline;
    unchanged data → zero drift → the drift check passes."""
    from doc_quality_check_spark.operators.aggregates import snapshot_histograms

    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    snap = snapshot_histograms(clips, ["sr_hz", "codec"])
    suite = CheckSuite(
        name="drift_rt", partition_by=["part_key"],
        checks=[
            Check("sr_drift", "drift_psi", "sr_hz",
                  {"baseline_table": "snap", "max_psi": 0.01}),
            Check("codec_drift", "drift_ks", "codec",
                  {"baseline_table": "snap", "max_ks": 0.001}),
        ],
    )
    res = SuiteRunner(suite).run(clips, baseline=snap, payload=False)
    verdicts = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert verdicts["sr_drift"]["passed"] and verdicts["sr_drift"]["metric_value"] < 1e-9
    assert verdicts["codec_drift"]["passed"] and verdicts["codec_drift"]["metric_value"] < 1e-9
    res.unpersist()


def test_drift_w1_closed_form(spark):
    from doc_quality_check_spark.operators.aggregates import drift_w1

    def hist(d):
        return spark.createDataFrame(
            [(str(k), v) for k, v in d.items()], "bucket string, count long"
        )

    # point mass moved distance 3 -> W1 = 3
    assert drift_w1(hist({0: 1}), hist({3: 1})).first()["w1"] == pytest.approx(3.0)
    # split masses: move 0.5 from 0->1 and 0.5 from 2->1 -> W1 = 1.0
    assert drift_w1(hist({0: 1, 2: 1}), hist({1: 2})).first()["w1"] == pytest.approx(1.0)
    # identical single-point support -> 0, not NULL
    assert drift_w1(hist({5: 7}), hist({5: 3})).first()["w1"] == 0.0
    # no numeric support -> NULL (bound cannot be attested)
    assert drift_w1(hist({"pcm": 1}), hist({"flac": 1})).first()["w1"] is None
    # ONE-sided numeric support (current drifted to non-numeric/NULL) is
    # NOT zero drift -> NULL, so the suite check fails instead of passing
    assert drift_w1(hist({"pcm": 5}), hist({3: 4})).first()["w1"] is None
    assert drift_w1(hist({3: 4}), hist({"pcm": 5})).first()["w1"] is None


def test_drift_chi2_closed_form(spark):
    from doc_quality_check_spark.operators.aggregates import drift_chi2

    def hist(d):
        return spark.createDataFrame(
            [(str(k), v) for k, v in d.items()], "bucket string, count long"
        )

    # 2x2 table: (30,10) vs (10,30) -> chi2 = 20, V = sqrt(20/80) = 0.5
    r = drift_chi2(hist({"a": 30, "b": 10}), hist({"a": 10, "b": 30})).first()
    assert r["chi2"] == pytest.approx(20.0)
    assert r["cramers_v"] == pytest.approx(0.5)
    assert r["dof"] == 1
    r0 = drift_chi2(hist({"a": 4, "b": 6}), hist({"a": 4, "b": 6})).first()
    assert r0["chi2"] == pytest.approx(0.0)
    assert r0["cramers_v"] == pytest.approx(0.0)
    # one-sided mass degenerates chi2 to 0 identically — that is NOT 'zero
    # drift': NULL, so the suite check fails (same rule as drift_w1)
    r1 = drift_chi2(
        hist({"a": 4, "b": 6}),
        hist({"a": 1}).filter("count < 0"),  # empty baseline side
    ).first()
    assert r1["chi2"] is None and r1["cramers_v"] is None


def test_drift_psi_by_group_matches_global_per_group(spark):
    """Per-group PSI from the single-plan grouped operator equals running
    the global drift_psi once per group."""
    from doc_quality_check_spark.operators.aggregates import (
        drift_psi,
        drift_psi_by_group,
    )

    rng = np.random.default_rng(11)
    rows_c = [(int(g), str(rng.integers(0, 6)), int(rng.integers(1, 40)))
              for g in range(3) for _ in range(12)]
    rows_b = [(int(g), str(rng.integers(0, 6)), int(rng.integers(1, 40)))
              for g in range(3) for _ in range(12)]
    cur = spark.createDataFrame(rows_c, "grp int, bucket string, count long")
    base = spark.createDataFrame(rows_b, "grp int, bucket string, count long")
    got = {r["grp"]: r["psi"]
           for r in drift_psi_by_group(cur, base, "grp").collect()}
    assert set(got) == {0, 1, 2}
    for g in range(3):
        want = drift_psi(
            cur.filter(F.col("grp") == g).select("bucket", "count"),
            base.filter(F.col("grp") == g).select("bucket", "count"),
        ).first()["psi"]
        assert got[g] == pytest.approx(want, rel=1e-9)
    # identical grouped histograms -> zero drift in every group
    z = drift_psi_by_group(cur, cur, "grp").collect()
    assert all(abs(r["psi"]) < 1e-12 for r in z)

    # grouped chi2 equals the global operator per group
    from doc_quality_check_spark.operators.aggregates import (
        drift_chi2,
        drift_chi2_by_group,
    )

    gc = {r["grp"]: r for r in drift_chi2_by_group(cur, base, "grp").collect()}
    for g in range(3):
        want = drift_chi2(
            cur.filter(F.col("grp") == g).select("bucket", "count"),
            base.filter(F.col("grp") == g).select("bucket", "count"),
        ).first()
        assert gc[g]["chi2"] == pytest.approx(want["chi2"], rel=1e-9)
        assert gc[g]["cramers_v"] == pytest.approx(want["cramers_v"], rel=1e-9)
        assert gc[g]["dof"] == want["dof"]

    # grouped KS and W1 equal the global operators per group
    from doc_quality_check_spark.operators.aggregates import (
        drift_ks,
        drift_ks_by_group,
        drift_w1,
        drift_w1_by_group,
    )

    gk = {r["grp"]: r["ks"] for r in drift_ks_by_group(cur, base, "grp").collect()}
    gw = {r["grp"]: r["w1"] for r in drift_w1_by_group(cur, base, "grp").collect()}
    for g in range(3):
        c_g = cur.filter(F.col("grp") == g).select("bucket", "count")
        b_g = base.filter(F.col("grp") == g).select("bucket", "count")
        assert gk[g] == pytest.approx(drift_ks(c_g, b_g).first()["ks"], rel=1e-9)
        assert gw[g] == pytest.approx(drift_w1(c_g, b_g).first()["w1"], rel=1e-9)


def test_entropy_range_check(spark, clips_dir):
    """entropy_range: bits of the column distribution; a constant column
    scores 0 and fails a min bound, a k-valued column scores in (0, log2 k]."""
    import math

    clips = load_clips(spark, clips_dir).drop("bytes").limit(600)
    k = clips.select("codec").distinct().count()
    suite = CheckSuite(
        name="entropy", partition_by=["part_key"],
        checks=[
            Check("codec_entropy", "entropy_range", "codec",
                  {"min": 0.1, "max": math.log2(k) + 1e-9}),
            Check("const_entropy", "entropy_range", "codec",
                  {"min": 0.5}),
        ],
    )
    res = SuiteRunner(suite).run(clips, payload=False)
    v = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert v["codec_entropy"]["passed"] is True
    assert 0.1 < v["codec_entropy"]["metric_value"] <= math.log2(k)
    res.unpersist()

    const = clips.withColumn("codec", F.lit("pcm_s16le"))
    res2 = SuiteRunner(suite).run(const, payload=False)
    v2 = {r["constraint_id"]: r for r in res2.verdicts.collect()}
    assert v2["const_entropy"]["passed"] is False
    assert v2["const_entropy"]["metric_value"] == 0.0
    res2.unpersist()


def test_per_partition_drift_verdicts(spark, clips_dir):
    """drift_psi with per_partition=true: one verdict row per part_key from
    ONE grouped plan; only the partition whose distribution shifted fails."""
    from doc_quality_check_spark.operators.aggregates import snapshot_histograms

    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    snap = snapshot_histograms(clips, ["sr_hz"], group_col="part_key")
    parts = sorted(r["part_key"] for r in clips.select("part_key").distinct().collect())
    assert len(parts) >= 3
    bad = parts[0]
    cur = clips.withColumn(
        "sr_hz",
        F.when(F.col("part_key") == bad, F.lit(99999)).otherwise(F.col("sr_hz")),
    )
    suite = CheckSuite(
        name="pp_drift", partition_by=["part_key"],
        checks=[
            Check("nn", "not_null", "clip_id", priority=1),
            Check("sr_drift_pp", "drift_psi", "sr_hz",
                  {"baseline_table": "snap", "max_psi": 0.05,
                   "per_partition": True}),
            Check("sr_chi2_pp", "drift_chi2", "sr_hz",
                  {"baseline_table": "snap", "max_v": 0.05,
                   "per_partition": True}),
            Check("sr_w1_pp", "drift_w1", "sr_hz",
                  {"baseline_table": "snap", "max_w1": 100.0,
                   "per_partition": True}),
        ],
    )
    res = SuiteRunner(suite).run(cur, baseline=snap, payload=False)
    rows = {r["part_key"]: r for r in res.verdicts.collect()
            if r["constraint_id"] == "sr_drift_pp"}
    assert set(rows) == set(parts)  # one drift verdict per data partition
    assert rows[bad]["passed"] is False and rows[bad]["metric_value"] > 0.05
    for pk in parts[1:]:
        assert rows[pk]["passed"] is True and rows[pk]["metric_value"] < 1e-9
    chi = {r["part_key"]: r for r in res.verdicts.collect()
           if r["constraint_id"] == "sr_chi2_pp"}
    assert set(chi) == set(parts)
    assert chi[bad]["passed"] is False and chi[bad]["metric_value"] > 0.05
    for pk in parts[1:]:
        assert chi[pk]["passed"] is True and chi[pk]["metric_value"] < 1e-9
    w1v = {r["part_key"]: r for r in res.verdicts.collect()
           if r["constraint_id"] == "sr_w1_pp"}
    assert set(w1v) == set(parts)
    # the corrupted partition moved some mass to 99999 — huge W1
    assert w1v[bad]["passed"] is False and w1v[bad]["metric_value"] > 100.0
    for pk in parts[1:]:
        assert w1v[pk]["passed"] is True and w1v[pk]["metric_value"] < 1e-9
    res.unpersist()

    # baseline without part_key -> clear error
    flat = snapshot_histograms(clips, ["sr_hz"])
    with pytest.raises(ValueError, match="part_key"):
        SuiteRunner(suite).run(cur, baseline=flat, payload=False)


def test_per_partition_completeness_verdicts(spark, clips_dir):
    """completeness_min with per_partition=true: one verdict per part_key
    from one grouped aggregate; only the partition whose column was nulled
    fails, and global completeness still passes (dilution hides it)."""
    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    parts = sorted(r["part_key"] for r in clips.select("part_key").distinct().collect())
    bad = parts[0]
    cur = clips.withColumn(
        "transcript",
        F.when(F.col("part_key") == bad, F.lit(None)).otherwise(F.col("transcript")),
    )
    suite = CheckSuite(
        name="pp_completeness", partition_by=["part_key"],
        checks=[
            Check("tr_complete_pp", "completeness_min", "transcript",
                  {"min_ratio": 0.5, "per_partition": True}),
            Check("tr_complete_global", "completeness_min", "transcript",
                  {"min_ratio": 0.5}),
        ],
    )
    res = SuiteRunner(suite).run(cur, payload=False)
    rows = {r["part_key"]: r for r in res.verdicts.collect()
            if r["constraint_id"] == "tr_complete_pp"}
    assert set(rows) >= set(parts)
    assert rows[bad]["passed"] is False and rows[bad]["metric_value"] == 0.0
    assert rows[bad]["n_rows"] > 0
    for pk in parts[1:]:
        assert rows[pk]["passed"] is True
    g = [r for r in res.verdicts.collect()
         if r["constraint_id"] == "tr_complete_global"]
    assert len(g) == 1 and g[0]["passed"] is True  # dilution: global blind
    res.unpersist()


def test_drift_w1_chi2_suite_roundtrip(spark, clips_dir):
    """drift_w1/drift_chi2 as declarative check kinds: self-baseline → zero
    drift passes; a baseline missing one codec → chi2 drift fails."""
    from doc_quality_check_spark.operators.aggregates import snapshot_histograms

    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    snap = snapshot_histograms(clips, ["sr_hz", "codec"])
    suite = CheckSuite(
        name="drift_w1_chi2", partition_by=["part_key"],
        checks=[
            Check("sr_w1", "drift_w1", "sr_hz",
                  {"baseline_table": "snap", "max_w1": 0.01}),
            Check("codec_chi2", "drift_chi2", "codec",
                  {"baseline_table": "snap", "max_v": 0.01}),
        ],
    )
    res = SuiteRunner(suite).run(clips, baseline=snap, payload=False)
    v = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert v["sr_w1"]["passed"] and v["sr_w1"]["metric_value"] < 1e-9
    assert v["codec_chi2"]["passed"] and v["codec_chi2"]["metric_value"] < 1e-9
    res.unpersist()

    shifted = snapshot_histograms(
        clips.filter(F.col("codec") != "flac"), ["codec"]
    )
    res2 = SuiteRunner(
        CheckSuite(name="drift_fail", partition_by=["part_key"], checks=[
            Check("codec_chi2", "drift_chi2", "codec",
                  {"baseline_table": "snap", "max_v": 0.01}),
        ])
    ).run(clips, baseline=shifted, payload=False)
    r = {x["constraint_id"]: x for x in res2.verdicts.collect()}["codec_chi2"]
    assert r["passed"] is False and r["metric_value"] > 0.01
    res2.unpersist()


def test_multi_column_partition_verdicts(spark, clips_dir):
    """partition_by with several columns collapses into one '/'-joined
    part_key rather than silently dropping columns."""
    clips = load_clips(spark, clips_dir).drop("bytes").limit(400)
    suite = CheckSuite(
        name="mc", partition_by=["part_key", "codec"],
        checks=[Check("nn", "not_null", "clip_id", priority=1)],
    )
    res = SuiteRunner(suite).run(clips, payload=False)
    parts = [r["part_key"] for r in res.verdicts.collect()]
    assert any("/" in p for p in parts)
    expected = clips.select(
        F.concat_ws("/", "part_key", "codec").alias("pk")).distinct().count()
    assert len(set(parts)) == expected
    res.unpersist()


# ---------------------------------------------------------------------------
# codec roundtrip invariants (per-row invariant: decoded-PCM allclose at
# SNR>=30dB — BASELINE.json input_hint)
# ---------------------------------------------------------------------------

def _snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    n = min(ref.size, dec.size)
    err = ref[:n].astype(np.float64) - dec[:n].astype(np.float64)
    p_sig = float(np.mean(ref[:n].astype(np.float64) ** 2)) + 1e-20
    p_err = float(np.mean(err**2)) + 1e-20
    return 10.0 * np.log10(p_sig / p_err)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    sr=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    dur=st.integers(20, 800),
    codec=st.sampled_from(["pcm_s16le", "pcm_u8", "flac"]),
)
def test_codec_roundtrip_snr(seed, sr, dur, codec):
    pcm = synth_pcm(seed, sr, dur)
    raw = synth_clip_bytes(seed, sr, dur, codec)
    got_sr, dec = decode_payload(raw, codec)
    assert got_sr == sr
    assert dec.size == pcm.size
    min_snr = 30.0 if codec != "pcm_u8" else 20.0  # 8-bit floor ~48dB SNR on
    # full-scale; low-amplitude mixtures can dip — still far above noise
    assert _snr_db(pcm, dec) >= min_snr


@settings(max_examples=20, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_decode_never_crashes_on_junk(junk):
    """Arbitrary bytes either decode or raise ValueError — no other failure
    mode (the UDF converts ValueError into in-band error rows)."""
    try:
        sr, pcm = decode_payload(junk, "pcm_s16le")
        assert sr >= 0 and pcm.ndim == 1
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# sketch error bounds + sweep monotonicity (SURVEY.md §5 sweep tests)
# ---------------------------------------------------------------------------

def test_approx_sketches_within_bounds(spark, sf01_dir):
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("ad"),
        F.countDistinct("l_orderkey").alias("ed"),
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("aq"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("eq"),
    ).first()
    assert abs(row["ad"] - row["ed"]) / row["ed"] < 0.05   # HLL default ~2%
    assert abs(row["aq"] - row["eq"]) / row["eq"] < 0.02   # quantile sketch


def test_threshold_sweep_monotone(spark, sf01_dir):
    from doc_quality_check_spark.operators.aggregates import threshold_sweep

    ev = spark.read.parquet(f"{sf01_dir}/events.parquet")
    ts = [5.0, 10.0, 15.0, 20.0, 30.0, 50.0]
    row = threshold_sweep(ev, "value", ts).first()
    counts = [row[f"ge_{str(t).replace('.', '_')}"] for t in ts]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] <= row["n_rows"]


# ---------------------------------------------------------------------------
# AQE skew-join handling on the fixtures' hot key
# ---------------------------------------------------------------------------

def test_aqe_skew_join_splits_hot_partition(spark, clips_dir):
    """The fixture's hot duplicate clip_id (~0.5% of all rows on ONE key)
    joined without broadcast triggers AQE's skew-join split."""
    clips = load_clips(spark, clips_dir).select("clip_id", "dur_ms")
    other = load_clips(spark, clips_dir).select("clip_id", "sr_hz")
    # thresholds scaled down to the test fixture's size so the hot partition
    # crosses the skew bar; production relies on the defaults
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        j = clips.join(other, "clip_id")
        rows = j.collect()  # same QueryExecution → final adaptive plan below
        assert len(rows) > clips.count()  # hot key fans out quadratically
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, plan[:800]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_count_min_never_underestimates(spark):
    """CMS invariant: est >= true count for every value; overestimate bounded
    by ~N/width in expectation (loose 5x check here)."""
    from doc_quality_check_spark.operators.aggregates import count_min_estimates

    rows = [(f"v{i % 50}",) for i in range(5000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "value string")
    truth = {r["value"]: r["cnt"] for r in
             df.groupBy("value").agg(F.count("*").alias("cnt")).collect()}
    est = {r["value"]: r["est"] for r in
           count_min_estimates(df, "value", width=256, depth=4).collect()}
    assert set(est) == set(truth)
    n = sum(truth.values())
    for v, t in truth.items():
        assert est[v] >= t, (v, est[v], t)
        assert est[v] <= t + 5 * n / 256
    assert est["hot"] >= 500


def test_tdigest_quantiles_accuracy_and_mergeability(spark, sf01_dir):
    """t-digest quantiles: within tight error of exact quantiles, and the
    result is stable under repartitioning (mergeable partial digests)."""
    from doc_quality_check_spark.operators.aggregates import tdigest_quantiles

    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    probs = [0.01, 0.1, 0.5, 0.9, 0.99]
    exact = {
        p: v for p, v in zip(
            probs,
            li.selectExpr(
                "percentile(l_extendedprice, array(0.01,0.1,0.5,0.9,0.99)) AS q"
            ).first()["q"],
        )
    }
    got = tdigest_quantiles(li, "l_extendedprice", probs, delta=100)
    spread = exact[0.99] - exact[0.01]
    for p in probs:
        assert abs(got[p] - exact[p]) <= 0.02 * spread, (p, got[p], exact[p])

    # mergeability: different partitioning → nearly identical digest output
    got2 = tdigest_quantiles(li.repartition(17), "l_extendedprice", probs, delta=100)
    for p in probs:
        assert abs(got2[p] - exact[p]) <= 0.02 * spread, (p, got2[p], exact[p])


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
    fseed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, color_type, fseed):
    """Any 8-bit PNG we can encode decodes to the exact pixels, for random
    dimensions, color types, and per-row filter choices."""
    import numpy as np

    from doc_quality_check_spark.functions.media import decode_png
    from tests.test_media_png import encode_png

    rng = np.random.default_rng(fseed)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    filters = list(rng.integers(0, 5, size=h))
    pal = None
    if color_type == 3:
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        px = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
    elif ch == 1:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    else:
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    got_w, got_h, gray = decode_png(
        encode_png(px, color_type, filters=filters, palette=pal))
    assert (got_w, got_h) == (w, h) and gray.size == w * h
    if color_type == 0:
        np.testing.assert_array_equal(gray.reshape(h, w), px)
    elif color_type == 4:
        np.testing.assert_array_equal(gray.reshape(h, w), px[:, :, 0])


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    sr=st.sampled_from([8000, 16000, 44100]),
    dur=st.integers(80, 900),
    codec=st.sampled_from(["pcm_s16le", "pcm_u8", "flac"]),
    target_db=st.floats(-40.0, -6.0),
)
def test_transform_normalize_property(seed, sr, dur, codec, target_db):
    """For any synthesizable clip: the normalized payload re-decodes, its
    RMS is within 0.5 dB of the target OR the reported gain hit the peak
    cap, and metadata stays consistent with the payload."""
    import numpy as np

    from doc_quality_check_spark.functions.audio import (
        curation_metrics, decode_payload, synth_clip_bytes,
    )
    from doc_quality_check_spark.functions.audio_transform import (
        _encode, _resample,
    )

    buf = synth_clip_bytes(seed, sr, dur, codec)
    sr0, pcm = decode_payload(buf, codec)
    assert sr0 == sr
    # direct numpy reimplementation of the UDF body (per-row check without
    # a Spark session — the Spark path is pinned in test_audio_transform)
    rms = float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64))))
    gain = 10.0 ** ((target_db - 20.0 * np.log10(max(rms, 1e-6))) / 20.0)
    peak = float(np.max(np.abs(pcm))) if pcm.size else 0.0
    capped = peak > 0 and gain > 1.0 / peak
    gain = min(gain, 1.0 / peak) if peak > 0 else gain
    out = _encode((pcm * gain).astype(np.float32), sr, codec)
    sr2, pcm2 = decode_payload(out, codec)
    assert sr2 == sr
    rms_db = curation_metrics(pcm2, sr2)[0]
    # quantization (pcm_u8 is 8-bit) adds up to ~0.6 dB of error
    tol = 1.0 if codec == "pcm_u8" else 0.5
    assert capped or abs(rms_db - target_db) <= tol
    # resample preserves sample count proportionally
    res = _resample(pcm, sr, 16000)
    assert abs(res.size - pcm.size * 16000 / sr) <= 2


def test_prefix_sum_exact_across_partitionings(spark):
    """Distributed two-phase scan == sequential cumsum, bit-exact, for any
    partition count (incl. more partitions than rows), negative values,
    and non-contiguous keys."""
    import random

    from doc_quality_check_spark.operators.aggregates import prefix_sum

    rng = random.Random(7)
    keys = sorted(rng.sample(range(10_000), 500))
    vals = [rng.randint(-1000, 1000) for _ in keys]
    expected, acc = {}, 0
    for k, v in zip(keys, vals):
        acc += v
        expected[k] = acc
    rows = list(zip(keys, vals))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k", "v"])
    for n in (1, 3, 7, 1000):
        got = {
            r["k"]: r["cum"]
            for r in prefix_sum(
                df.repartition(5), ["k"], "v", num_partitions=n
            ).collect()
        }
        assert got == expected, f"num_partitions={n}"


def test_prefix_sum_preserves_columns(spark):
    from doc_quality_check_spark.operators.aggregates import prefix_sum

    df = spark.createDataFrame(
        [(2, 10, "b"), (1, 5, "a"), (3, 1, "c")], ["k", "v", "tag"]
    )
    out = prefix_sum(df, ["k"], "v", out_col="running")
    assert out.columns == ["k", "v", "tag", "running"]
    assert {(r["k"], r["running"]) for r in out.collect()} == {
        (1, 5), (2, 15), (3, 16)
    }


def test_corr_range_check(spark):
    """corr_range: Pearson correlation between two columns bounded by the
    suite; perfectly correlated, anti-correlated, independent, and
    degenerate (constant) columns all verdict correctly — and the exact
    integer-sum formula matches numpy."""
    n = 400
    rows = [(f"r{i}",
             i,                       # x
             2 * i + 7,               # y: corr +1
             -3 * i,                  # z: corr -1
             (i * 2654435761) % 997,  # w: hash-scrambled ~ independent
             5)                       # c: constant -> corr undefined
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "clip_id string, x long, y long, z long, w long, c long")
    suite = CheckSuite(
        name="corr",
        checks=[
            Check("xy_pos", "corr_range", "x", {"col2": "y", "min": 0.999}),
            Check("xz_neg", "corr_range", "x",
                  {"col2": "z", "max": -0.999}),
            Check("xw_none", "corr_range", "x",
                  {"col2": "w", "min": -0.2, "max": 0.2}),
            Check("xc_degenerate", "corr_range", "x", {"col2": "c"}),
        ],
    )
    res = SuiteRunner(suite).run(df, payload=False)
    v = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert v["xy_pos"]["passed"] and v["xy_pos"]["metric_value"] == 1.0
    assert v["xz_neg"]["passed"] and v["xz_neg"]["metric_value"] == -1.0
    assert v["xw_none"]["passed"]
    xs = np.array([r[1] for r in rows], dtype=np.float64)
    ws = np.array([r[4] for r in rows], dtype=np.float64)
    assert v["xw_none"]["metric_value"] == pytest.approx(
        float(np.corrcoef(xs, ws)[0, 1]), abs=1e-6)
    # constant column: correlation undefined -> NULL metric, cannot attest
    assert v["xc_degenerate"]["passed"] is False
    assert v["xc_degenerate"]["metric_value"] is None
    res.unpersist()


def test_corr_range_large_magnitude_stability(spark):
    """The general (non-exact) corr path uses stable co-moments: epoch-millis
    scale values — where the closed n*Sxx - Sx^2 formula catastrophically
    cancels in DOUBLE (can even go negative) — still score corr == 1."""
    base = 1_700_000_000_000
    rows = [(f"r{i}", base + i * 60_000, float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "clip_id string, ts long, v double")
    suite = CheckSuite(
        name="bigmag",
        checks=[Check("ts_v", "corr_range", "ts",
                      {"col2": "v", "min": 0.999})],
    )
    res = SuiteRunner(suite).run(df, payload=False)
    v = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert v["ts_v"]["passed"] and v["ts_v"]["metric_value"] == 1.0
    res.unpersist()

    # exact mode refuses non-integral columns instead of truncating
    from doc_quality_check_spark.operators.aggregates import pearson_corr

    with pytest.raises(ValueError, match="integral"):
        pearson_corr(df, "ts", "v", exact_integers=True)

    # corr_range without col2 fails upfront with a clean error
    bad = CheckSuite(
        name="nocol2", checks=[Check("c", "corr_range", "ts", {})])
    with pytest.raises(ValueError, match="col2"):
        SuiteRunner(bad).run(df, payload=False)


def test_binned_drift_continuous_column(spark, clips_dir):
    """bin_width keeps a continuous column's drift histogram tiny (the
    10^12-row premise) and still detects a real shift: same data scores
    ~0 PSI, a +800ms shift fails, and the binned histogram has orders of
    magnitude fewer buckets than the raw distinct count."""
    from doc_quality_check_spark.operators.aggregates import (
        histogram,
        snapshot_histograms,
    )

    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    raw_distinct = clips.select("dur_ms").distinct().count()
    binned = histogram(clips, "dur_ms", bin_width=200)
    assert binned.count() * 10 < raw_distinct  # binning actually collapses

    baseline = snapshot_histograms(
        clips, ["dur_ms"], bin_width={"dur_ms": 200})
    suite = CheckSuite(
        name="binned_drift",
        checks=[Check("dur_drift", "drift_psi", "dur_ms",
                      {"max_psi": 0.1, "bin_width": 200})],
    )
    same = SuiteRunner(suite).run(clips, payload=False, baseline=baseline)
    v = {r["constraint_id"]: r for r in same.verdicts.collect()}
    assert v["dur_drift"]["passed"] and v["dur_drift"]["metric_value"] < 1e-9
    same.unpersist()

    shifted = clips.withColumn("dur_ms", F.col("dur_ms") + F.lit(800))
    moved = SuiteRunner(suite).run(shifted, payload=False, baseline=baseline)
    v2 = {r["constraint_id"]: r for r in moved.verdicts.collect()}
    assert v2["dur_drift"]["passed"] is False
    assert v2["dur_drift"]["metric_value"] > 0.1
    moved.unpersist()


def test_suggest_drift_spec_roundtrip(spark, clips_dir):
    """suggest_drift_spec: continuous columns get a stable 1-2-5 width,
    categoricals get None, binary is skipped — and the spec plugs straight
    into snapshot_histograms + a binned drift check that passes on the
    profiled data."""
    from doc_quality_check_spark.operators.aggregates import (
        snapshot_histograms,
    )
    from doc_quality_check_spark.suite.suggest import suggest_drift_spec

    clips = load_clips(spark, clips_dir).limit(800)
    spec = suggest_drift_spec(clips.drop("bytes"))
    assert "bytes" not in spec
    assert spec["codec"] is None              # low-cardinality categorical
    w = spec["dur_ms"]                        # continuous
    assert w is not None and w > 0
    import math
    mant = w / (10 ** math.floor(math.log10(w)))
    assert round(mant, 6) in (1.0, 2.0, 5.0)  # human-stable width
    # same profile -> same width (stability against re-profiling)
    assert suggest_drift_spec(clips.drop("bytes"))["dur_ms"] == w

    meta = clips.drop("bytes")
    baseline = snapshot_histograms(meta, ["dur_ms"], bin_width={"dur_ms": w})
    suite = CheckSuite(
        name="suggested_drift",
        checks=[Check("dur_drift", "drift_psi", "dur_ms",
                      {"max_psi": 0.05, "bin_width": w})],
    )
    res = SuiteRunner(suite).run(meta, payload=False, baseline=baseline)
    v = {r["constraint_id"]: r for r in res.verdicts.collect()}
    assert v["dur_drift"]["passed"]  # self-drift ~ 0 under the same width
    res.unpersist()
