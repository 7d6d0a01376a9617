"""Audio spectral-fingerprint near-dup (operators/audio_dedup.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.functions.audio import (
    encode_wav_pcm16,
    synth_speechlike_pcm,
)
from doc_quality_check_spark.operators.audio_dedup import (
    AFP_BITS,
    audio_fingerprint_pcm,
    audio_fingerprints,
    audio_neardup_pairs,
)

SR = 8000
DUR_MS = 500


def _pcm(seed, noise=0.0, gain=1.0):
    # non-stationary (speech-like) fixture — see synth_speechlike_pcm and
    # the conditioning caveat in operators/audio_dedup.py
    x = synth_speechlike_pcm(seed, SR, DUR_MS).astype(np.float64) * gain
    if noise:
        nrng = np.random.default_rng(10_000 + seed)
        x = x + noise * nrng.standard_normal(x.size)
    return np.clip(x, -1, 1).astype(np.float32)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_deterministic_and_gain_invariant():
    fp1 = audio_fingerprint_pcm(_pcm(3), SR)
    assert fp1 == audio_fingerprint_pcm(_pcm(3), SR)
    # global gain scales every band energy by the same factor; only bits
    # whose statistic sits at float32-quantization scale may flip
    assert _hamming(fp1, audio_fingerprint_pcm(_pcm(3, gain=0.4), SR)) <= 2
    assert AFP_BITS == 64


def test_fingerprint_noise_robust_and_discriminative():
    base = audio_fingerprint_pcm(_pcm(7), SR)
    noisy = audio_fingerprint_pcm(_pcm(7, noise=0.004), SR)
    assert _hamming(base, noisy) <= 7
    # distinct sine mixtures land far apart
    other = audio_fingerprint_pcm(_pcm(8), SR)
    assert _hamming(base, other) > 7


def test_fingerprint_degenerate_inputs():
    assert audio_fingerprint_pcm(np.zeros(SR // 2, np.float32), SR) == 0
    assert audio_fingerprint_pcm(np.zeros(4, np.float32), SR) is None
    assert audio_fingerprint_pcm(_pcm(1), 0) is None


@pytest.fixture(scope="module")
def neardup_df(spark):
    # 4 content groups x 3 takes (one clean, one re-leveled, one noised),
    # plus one corrupt payload and one silent clip
    rows = []
    for g, seed in enumerate([11, 22, 33, 44]):
        for take, (noise, gain) in enumerate(
            [(0.0, 1.0), (0.0, 0.5), (0.003, 1.0)]
        ):
            rows.append(
                (f"g{g}_t{take}",
                 bytearray(encode_wav_pcm16(_pcm(seed, noise, gain), SR)),
                 "pcm_s16le")
            )
    rows.append(("corrupt", bytearray(b"XXnotawav"), "pcm_s16le"))
    rows.append(
        ("silent",
         bytearray(encode_wav_pcm16(np.zeros(SR // 2, np.float32), SR)),
         "pcm_s16le")
    )
    return spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")


def test_neardup_pairs_groups_and_excludes(neardup_df):
    pairs = audio_neardup_pairs(neardup_df, max_hamming=7).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for g in range(4):  # every same-content pair found
        for a in range(3):
            for b in range(a + 1, 3):
                assert (f"g{g}_t{a}", f"g{g}_t{b}") in got
    for id_a, id_b in got:  # nothing across groups, nothing undecodable
        assert "corrupt" not in (id_a, id_b)
        assert id_a.split("_")[0] == id_b.split("_")[0] or "silent" in (id_a, id_b)
    assert all(r["hamming"] <= 7 for r in pairs)


def test_fingerprints_null_for_undecodable(neardup_df):
    fps = {r["clip_id"]: r["afp"] for r in audio_fingerprints(neardup_df).collect()}
    assert fps["corrupt"] is None
    assert fps["silent"] == 0
    # re-leveled copy: same fp up to float32-quantization-marginal bits
    assert _hamming(fps["g0_t0"], fps["g0_t1"]) <= 2


def test_audio_pairs_compose_with_cluster_and_keep_first(neardup_df):
    """The audio pair table feeds the existing text-dedup machinery
    unchanged: connected components cluster each content group, and
    dedup_keep_first retains exactly one take per group."""
    from doc_quality_check_spark.operators.dedup import (
        connected_components,
        dedup_keep_first,
    )

    pairs = audio_neardup_pairs(neardup_df, max_hamming=7)
    comps = {r["id"]: r["comp"]
             for r in connected_components(pairs).collect()}
    for g in range(4):  # all takes of one content group share a component
        assert comps[f"g{g}_t0"] == comps[f"g{g}_t1"] == comps[f"g{g}_t2"]
    assert len(set(comps.values())) >= 4

    kept = {r["clip_id"]
            for r in dedup_keep_first(pairs, neardup_df, "clip_id").collect()}
    for g in range(4):  # exactly one surviving take per group
        assert len(kept & {f"g{g}_t0", f"g{g}_t1", f"g{g}_t2"}) == 1
    assert "corrupt" in kept  # undecodable rows are never dropped by dedup


def test_neardup_plan_no_cartesian(neardup_df):
    plan = audio_neardup_pairs(neardup_df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_audio_neardup_golden_pairs(spark, sf01_dir):
    """Quantitative gate for the rows-only driver query (r4 verdict #7):
    the EXACT (id_a, id_b, hamming) set at sf0.01 is deterministic (seeded
    synth, integer fingerprints) — pin it as a golden so any fingerprint /
    LSH / banding regression shows as a set diff, not a row-count drift."""
    import json
    import os

    from doc_quality_check_spark.queries import QUERIES

    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "golden_audio_neardup_sf001.json",
    )
    with open(golden_path) as fh:
        golden = {(a, b, h) for a, b, h in json.load(fh)}
    got = {
        (r["id_a"], r["id_b"], int(r["hamming"]))
        for r in QUERIES["audio_neardup"](spark, sf01_dir).collect()
    }
    assert len(golden) == 278
    assert got == golden


def test_neardup_wide_block_keys_same_pairs(neardup_df):
    """Manku-style block-combination keys (round-5 review): raising
    n_blocks widens the join key so buckets fill by similarity instead of
    volume at scale — and the exact bit_count post-filter means the pair
    set is IDENTICAL to the classic one-block scheme."""
    base = {tuple(r) for r in
            audio_neardup_pairs(neardup_df, max_hamming=7).collect()}
    wide = {tuple(r) for r in
            audio_neardup_pairs(neardup_df, max_hamming=7,
                                n_blocks=10).collect()}
    assert base == wide
    assert base, "fixture must contain near-dup pairs"
