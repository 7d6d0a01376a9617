"""Baseline JPEG codec (functions/jpeg.py) + its Spark wiring.

Roundtrip invariant (the image analog of the north rule's decoded-PCM
allclose at SNR>=30 dB): decode(encode(luma)) matches the source luma
above 30 dB SNR for smooth content at quality>=75, across grayscale and
interleaved 4:2:0 frames and restart intervals.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)
from doc_quality_check_spark.functions.media import image_metrics


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        (128 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0))
        .clip(0, 255)
        .astype(np.uint8)
    )


def _snr_db(ref: np.ndarray, rec: np.ndarray) -> float:
    err = rec.astype(np.float64) - ref.astype(np.float64)
    return 10 * np.log10(
        (ref.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-12)
    )


@pytest.mark.parametrize("chroma420", [False, True])
@pytest.mark.parametrize("quality", [95, 75])
def test_jpeg_roundtrip_snr(chroma420, quality):
    img = _smooth(40, 56)
    buf = encode_jpeg_gray(img, quality=quality, chroma420=chroma420)
    w, h, luma = decode_jpeg(buf)
    assert (w, h) == (56, 40)
    assert _snr_db(img, luma.reshape(40, 56)) >= 30.0


@pytest.mark.parametrize("chroma420", [False, True])
def test_jpeg_restart_markers(chroma420):
    img = _smooth(40, 56)
    plain = encode_jpeg_gray(img, quality=90, chroma420=chroma420)
    for ri in (1, 3):
        buf = encode_jpeg_gray(
            img, quality=90, chroma420=chroma420, restart_interval=ri
        )
        assert buf != plain  # DRI + RSTn actually emitted
        w, h, luma = decode_jpeg(buf)
        # restart resets predictors — the decode must be IDENTICAL to the
        # no-restart decode, not merely close
        assert np.array_equal(luma, decode_jpeg(plain)[2])


def test_jpeg_odd_sizes_and_padding():
    rng = np.random.default_rng(3)
    for (h, w) in ((1, 1), (7, 13), (17, 9), (8, 8), (16, 16)):
        img = (rng.integers(0, 256, size=(h, w)) // 2).astype(np.uint8)
        for chroma420 in (False, True):
            buf = encode_jpeg_gray(img, quality=95, chroma420=chroma420)
            ww, hh, luma = decode_jpeg(buf)
            assert (ww, hh) == (w, h)
            assert luma.size == w * h


def test_jpeg_flat_block_is_exact():
    # a flat 8x8 block quantizes to DC-only and must reconstruct exactly
    img = np.full((8, 8), 77, dtype=np.uint8)
    w, h, luma = decode_jpeg(encode_jpeg_gray(img, quality=90))
    assert (w, h) == (8, 8)
    assert int(np.abs(luma.astype(int) - 77).max()) <= 1


def test_jpeg_error_paths():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    img = _smooth(16, 16)
    buf = bytearray(encode_jpeg_gray(img, quality=90))
    # flip SOF0 (FFC0) to SOF11 (FFCB): arithmetic-lossless stays a
    # declared stub (every Huffman mode + both DCT-arithmetic modes are
    # real now)
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xCB
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))
    # a baseline stream merely RELABELED SOF2/SOF10/SOF3 is malformed for
    # that mode (progressive: single scan spans Ss=0..Se=63; lossless:
    # Ss=0 is an invalid predictor): clear error, not garbage pixels
    for relabel in (0xC2, 0xCA, 0xC3):
        buf[i + 1] = relabel
        with pytest.raises(ValueError):
            decode_jpeg(bytes(buf))
    # truncation mid-entropy-data -> in-band error, not a hang
    with pytest.raises(Exception):
        decode_jpeg(bytes(encode_jpeg_gray(img))[:40])


def test_jpeg_through_spark_image_metrics(spark):
    """End-to-end: a JPEG bytes column decodes inside the Arrow batch pass
    (no stub rows), metrics match a local decode."""
    img_a = _smooth(24, 32)
    img_b = np.full((8, 8), 200, dtype=np.uint8)
    rows = [
        ("jpg_a", bytearray(encode_jpeg_gray(img_a, quality=90))),
        ("jpg_b", bytearray(encode_jpeg_gray(img_b, chroma420=True))),
        ("bad", bytearray(b"\xff\xd8garbage-after-soi")),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    got = {r["media_id"]: r for r in image_metrics(df).collect()}
    assert got["jpg_a"]["decode_ok"] and got["jpg_a"]["width"] == 32
    assert got["jpg_a"]["height"] == 24
    assert got["jpg_b"]["decode_ok"] and got["jpg_b"]["width"] == 8
    # flat bright block: no pixel above the mean => ink_ratio ~ 0
    assert got["jpg_b"]["ink_ratio"] <= 0.51
    assert not got["bad"]["decode_ok"] and got["bad"]["error"]
    # real JPEGs are no longer stubs
    assert not str(got["bad"]["error"]).startswith("stub:")


def test_jpeg_in_declarative_suite(spark):
    """The round-4 image check kinds accept JPEG payloads: luma bounds
    verdict on a JPEG column through the suite runner."""
    from doc_quality_check_spark.suite.runner import SuiteRunner
    from doc_quality_check_spark.suite.spec import Check, CheckSuite

    rows = [
        ("ok", bytearray(encode_jpeg_gray(_smooth(16, 16), quality=90))),
        ("white", bytearray(
            encode_jpeg_gray(np.full((8, 8), 255, np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    suite = CheckSuite(
        name="jpeg_suite",
        checks=[
            Check("decodes", "payload_image_decode", "bytes", priority=1),
            Check("luma", "image_luma_range", "bytes",
                  {"min": 5.0, "max": 250.0}, priority=2),
        ],
    )
    res = SuiteRunner(suite).run(df, payload=True)
    viols = {(r["clip_id"], r["constraint_id"])
             for r in res.violations.collect()}
    assert viols == {("white", "luma")}
    res.unpersist()


def test_jpeg_dqt_is_zigzag_ordered():
    """T.81 B.2.4.1: DQT stores Qk in zigzag order. A raster-ordered table
    would still roundtrip against this repo's decoder (the errors cancel)
    but the emitted file would be garbled by any real decoder — pin the
    on-wire ordering itself."""
    from doc_quality_check_spark.functions.jpeg import (
        QUANT_LUMA,
        ZIGZAG,
        _scale_quant,
    )

    buf = encode_jpeg_gray(_smooth(16, 16), quality=90)
    i = buf.find(b"\xff\xdb")
    stored = np.frombuffer(buf[i + 5 : i + 5 + 64], dtype=np.uint8)
    assert np.array_equal(stored.astype(np.int64),
                          _scale_quant(QUANT_LUMA, 90)[ZIGZAG])


def test_jpeg_fill_bytes_tolerated():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes — in the
    header stream and before RST markers inside entropy data."""
    img = _smooth(24, 24)
    plain = encode_jpeg_gray(img, quality=90)
    ref = decode_jpeg(plain)[2]
    # fill bytes before a header marker (DQT)
    j = plain.find(b"\xff\xdb")
    padded = plain[:j] + b"\xff\xff" + plain[j:]
    assert np.array_equal(decode_jpeg(padded)[2], ref)
    # fill byte before a restart marker
    rst = encode_jpeg_gray(img, quality=90, restart_interval=2)
    k = rst.find(b"\xff\xd0")
    assert k > 0
    padded_rst = rst[:k] + b"\xff" + rst[k:]
    assert np.array_equal(decode_jpeg(padded_rst)[2], decode_jpeg(rst)[2])


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    chroma420=st.booleans(),
)
def test_jpeg_roundtrip_property(h, w, seed, chroma420):
    """Property: ANY uint8 image roundtrips at q=95 with bounded per-pixel
    error — the worst case (white noise) stays within the quantization
    bound, and dimensions are always preserved exactly."""
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)
    buf = encode_jpeg_gray(img, quality=95, chroma420=chroma420)
    ww, hh, luma = decode_jpeg(buf)
    assert (ww, hh) == (w, h)
    err = np.abs(luma.reshape(h, w).astype(int) - img.astype(int)).max()
    # q=95 luma quant steps are <= 6; DCT-domain rounding of step s bounds
    # the spatial error well under 8*s — 24 is a loose, stable ceiling
    assert err <= 24, (h, w, seed, chroma420, err)


@pytest.mark.parametrize("quality", [90, 75, 50])
def test_jpeg_progressive_bit_exact(quality):
    """The progressive fixture encoder's scan script restores the exact
    quantized coefficients, so decode_jpeg on the SOF2 stream must be
    BIT-IDENTICAL to decoding the baseline encoding of the same image —
    pinning DC first/refine, AC spectral-selection first scans, and both
    AC successive-approximation refinement passes (round-4 verdict #5)."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    img = _smooth(45, 61)  # non-multiple-of-8 dims: MCU padding crossed
    prog = encode_jpeg_gray_progressive(img, quality=quality)
    base = encode_jpeg_gray(img, quality=quality)
    wp, hp, pp = decode_jpeg(prog)
    wb, hb, pb = decode_jpeg(base)
    assert (wp, hp) == (wb, hb) == (61, 45)
    assert np.array_equal(pp, pb)
    assert _snr_db(img.reshape(-1), pp) > 25.0


def test_jpeg_progressive_restarts_and_metrics(spark):
    """Restart markers inside every progressive scan (DRI applies per
    scan; predictors and EOB runs reset) still decode bit-exactly, and the
    Spark image-metrics pass accepts the SOF2 payload (no error row)."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    img = _smooth(32, 48)
    prog = encode_jpeg_gray_progressive(img, quality=85, restart_interval=3)
    base = encode_jpeg_gray(img, quality=85)
    assert np.array_equal(decode_jpeg(prog)[2], decode_jpeg(base)[2])
    df = spark.createDataFrame(
        [("prog", bytearray(prog))], "media_id string, bytes binary"
    )
    m = image_metrics(df).collect()[0]
    assert m["decode_ok"] and (m["width"], m["height"]) == (48, 32)
    assert m["error"] is None


@given(
    h=st.integers(9, 40),
    w=st.integers(9, 40),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_property(h, w, seed):
    """Property: for any image shape/content, progressive and baseline
    encodings of the same plane decode identically (the scan script is a
    lossless re-serialization of the quantized coefficients)."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    # heavy smoothing keeps coefficient magnitudes inside the Annex-K
    # encode table's s<=10 range (same bound as the baseline encoder)
    img = (img.astype(np.float64) * 0.25 + 96).astype(np.uint8)
    prog = encode_jpeg_gray_progressive(img, quality=80)
    base = encode_jpeg_gray(img, quality=80)
    assert np.array_equal(decode_jpeg(prog)[2], decode_jpeg(base)[2])
    assert decode_jpeg(prog)[:2] == (w, h)


def test_jpeg_12bit_precision():
    """12-bit extended-sequential (SOF1) JPEGs decode (round 5): native
    level shift / clip, luma reduced to 8 bits. The fixture encoder writes
    a 16-bit quant table (base x16) so Annex-K Huffman ranges hold."""
    rng = np.random.default_rng(5)
    img8 = _smooth(24, 33)
    img12 = (img8.astype(np.uint16) << 4) | rng.integers(
        0, 16, img8.shape, dtype=np.uint16
    )
    buf = encode_jpeg_gray(img12, quality=90, precision=12)
    w, h, luma = decode_jpeg(buf)
    assert (w, h) == (33, 24)
    assert _snr_db(img8.reshape(-1), luma) > 40.0
    # the frame really is SOF1/12-bit on the wire
    header = buf.split(b"\xff\xda")[0]
    i = header.find(b"\xff\xc1")
    assert i > 0 and header[i + 4] == 12
    # out-of-range samples and unsupported combos fail loudly
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.full((8, 8), 5000, np.uint16), precision=12)
    with pytest.raises(ValueError):
        encode_jpeg_gray(img12, precision=12, chroma420=True)
    with pytest.raises(ValueError):
        encode_jpeg_gray(img8, precision=10)


@pytest.mark.parametrize("chroma420", [False, True])
@pytest.mark.parametrize("quality", [90, 75, 50])
def test_jpeg_arithmetic_bit_exact(quality, chroma420):
    """Sequential ARITHMETIC JPEG (SOF9, T.81 Annex D QM-coder + Annex F
    decision models) decodes BIT-IDENTICALLY to the Huffman baseline of
    the same image — entropy coding is lossless, so the two streams carry
    the same quantized coefficients. Also pins the expected win of the
    adaptive coder over fixed Annex-K Huffman tables (round 5: the last
    sequential-JPEG entropy mode)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith,
    )

    img = _smooth(45, 61)  # non-multiple-of-8: edge padding crossed
    arith = encode_jpeg_gray_arith(img, quality=quality, chroma420=chroma420)
    base = encode_jpeg_gray(img, quality=quality, chroma420=chroma420)
    wa, ha, pa = decode_jpeg(arith)
    wb, hb, pb = decode_jpeg(base)
    assert (wa, ha) == (wb, hb) == (61, 45)
    assert np.array_equal(pa, pb)
    # compression sanity: adaptive arithmetic beats fixed Huffman tables
    assert len(arith) < len(base)
    # the frame really is SOF9 + DAC on the wire
    header = arith.split(b"\xff\xda")[0]
    assert b"\xff\xc9" in header and b"\xff\xcc" in header


def test_jpeg_arithmetic_restarts_and_metrics(spark):
    """RSTn markers inside an arithmetic scan re-initialize the QM coder
    AND reset every statistics area + DC predictors/contexts (T.81
    restart semantics) — decode stays bit-exact — and the Spark
    image-metrics pass accepts the SOF9 payload (no error row)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith,
    )

    img = _smooth(32, 48)
    arith = encode_jpeg_gray_arith(img, quality=85, restart_interval=3)
    base = encode_jpeg_gray(img, quality=85)
    assert np.array_equal(decode_jpeg(arith)[2], decode_jpeg(base)[2])
    # interleaved 4:2:0 with restarts: per-MCU coder resets across THREE
    # components and two statistics-table pairs
    ar420 = encode_jpeg_gray_arith(
        img, quality=85, chroma420=True, restart_interval=3
    )
    hb420 = encode_jpeg_gray(img, quality=85, chroma420=True)
    assert np.array_equal(decode_jpeg(ar420)[2], decode_jpeg(hb420)[2])
    df = spark.createDataFrame(
        [("ar", bytearray(arith))], "media_id string, bytes binary"
    )
    m = image_metrics(df).collect()[0]
    assert m["decode_ok"] and (m["width"], m["height"]) == (48, 32)
    assert m["error"] is None


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    quality=st.sampled_from([60, 80, 95]),
)
@settings(max_examples=14, deadline=None)
def test_jpeg_arithmetic_property(h, w, seed, quality):
    """Property: for ANY shape/content/quality, arithmetic and Huffman
    encodings of the same plane decode identically (the QM coder is a
    lossless re-serialization of the quantized coefficients — unlike the
    Huffman encode tables there is no magnitude-range ceiling, so raw
    white noise is fair game)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    arith = encode_jpeg_gray_arith(img, quality=quality)
    base = encode_jpeg_gray(img, quality=quality)
    assert np.array_equal(decode_jpeg(arith)[2], decode_jpeg(base)[2])
    assert decode_jpeg(arith)[:2] == (w, h)


def test_qm_coder_stream_roundtrip():
    """The raw QM coder roundtrips adversarial decision streams with
    byte-stuffing/carry paths exercised, final statistics states agree
    between encoder and decoder, and a marker legally terminates the
    entropy segment (zero data fed thereafter)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        ArithDecoder,
        ArithEncoder,
        FIXED_BIN,
    )

    rng = np.random.default_rng(99)
    ff_streams = 0
    for _ in range(60):
        n = int(rng.integers(1, 2500))
        nbins = int(rng.integers(1, 10))
        p = rng.uniform(0.01, 0.99, size=nbins)
        bins = rng.integers(0, nbins, size=n)
        bits = (rng.random(n) < p[bins]).astype(int)
        enc = ArithEncoder()
        est = bytearray(nbins)
        for b, bit in zip(bins, bits):
            enc.code(est, int(b), int(bit))
        data = enc.flush()
        ff_streams += int(b"\xff" in data)
        dec = ArithDecoder(bytes(data) + b"\xff\xd9", 0)
        dst = bytearray(nbins)
        assert [dec.decode(dst, int(b)) for b in bins] == list(bits)
        assert bytes(dst) == bytes(est)
    assert ff_streams > 0  # the 0xFF-stuffing path really ran
    # the fixed half-probability bin never adapts
    enc = ArithEncoder()
    fx = bytearray([FIXED_BIN])
    seq = [int(x) for x in rng.integers(0, 2, size=300)]
    for s in seq:
        enc.code(fx, 0, s)
    assert fx[0] == FIXED_BIN
    dec = ArithDecoder(enc.flush(), 0)
    fx2 = bytearray([FIXED_BIN])
    assert [dec.decode(fx2, 0) for _ in seq] == seq


@pytest.mark.parametrize("quality", [90, 75, 50])
def test_jpeg_progressive_arithmetic_bit_exact(quality):
    """PROGRESSIVE ARITHMETIC (SOF10, Annex G scans over the QM coder)
    decodes bit-identically to the Huffman baseline of the same image —
    the 6-scan script is a lossless re-serialization of the quantized
    coefficients, now through arithmetic decisions (DC conditioning, AC
    band models, fixed-bin refinement bits)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith_progressive,
    )

    img = _smooth(45, 61)
    pa = encode_jpeg_gray_arith_progressive(img, quality=quality)
    base = encode_jpeg_gray(img, quality=quality)
    wa, ha, plane = decode_jpeg(pa)
    assert (wa, ha) == (61, 45)
    assert np.array_equal(plane, decode_jpeg(base)[2])
    assert len(pa) < len(base)  # adaptive coder still wins
    header = pa.split(b"\xff\xda")[0]
    assert b"\xff\xca" in header and b"\xff\xcc" in header


def test_jpeg_progressive_arithmetic_restarts_and_metrics(spark):
    """RSTn inside every arithmetic progressive scan (coder re-init +
    per-scan statistics reset) stays bit-exact, and the Spark
    image-metrics pass accepts the SOF10 payload."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith_progressive,
    )

    img = _smooth(32, 48)
    pa = encode_jpeg_gray_arith_progressive(
        img, quality=85, restart_interval=3
    )
    base = encode_jpeg_gray(img, quality=85)
    assert np.array_equal(decode_jpeg(pa)[2], decode_jpeg(base)[2])
    df = spark.createDataFrame(
        [("pa", bytearray(pa))], "media_id string, bytes binary"
    )
    m = image_metrics(df).collect()[0]
    assert m["decode_ok"] and (m["width"], m["height"]) == (48, 32)
    assert m["error"] is None


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_arithmetic_property(h, w, seed):
    """Property: ANY shape and raw white-noise content — the hardest case
    for refinement-scan bookkeeping (dense newly-nonzero coefficients in
    every band) — decodes identically via SOF10-arithmetic and baseline
    Huffman. No magnitude ceiling applies (QM codes arbitrary
    categories), so unsmoothed noise is fair game."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith_progressive,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    pa = encode_jpeg_gray_arith_progressive(img, quality=80)
    base = encode_jpeg_gray(img, quality=80)
    assert np.array_equal(decode_jpeg(pa)[2], decode_jpeg(base)[2])
    assert decode_jpeg(pa)[:2] == (w, h)


def test_jpeg_arithmetic_corrupt_streams_terminate():
    """Robustness: random byte corruption and truncation of SOF9/SOF10
    streams always terminates promptly in either a decode (garbage
    pixels are fine — validity is the suite's luma-range check's job) or
    a clean exception that image_metrics turns into an in-band error row
    — never a hang or an uncaught non-Exception crash. All decoder loops
    are bounded (X-tree overflow guards, band-end run checks, zero-fed
    tails after markers)."""
    from doc_quality_check_spark.functions.jpeg_arith import (
        encode_jpeg_gray_arith,
        encode_jpeg_gray_arith_progressive,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    for base in (
        encode_jpeg_gray_arith(img, quality=80),
        encode_jpeg_gray_arith_progressive(img, quality=80),
    ):
        for _ in range(60):
            buf = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(2, len(buf)))] = int(
                    rng.integers(0, 256)
                )
            try:
                w, h, _p = decode_jpeg(bytes(buf))
                assert w >= 0 and h >= 0
            except (ValueError, NotImplementedError, KeyError, IndexError,
                    struct.error):
                pass
        for cut in range(10, len(base), max(1, len(base) // 12)):
            try:
                decode_jpeg(bytes(base[:cut]))
            except Exception:
                pass


def test_jpeg_lossless_exact_roundtrip():
    """LOSSLESS JPEG (SOF3, T.81 Annex H): decode(encode(img)) == img
    EXACTLY for every predictor selector 1..7 — no quantization anywhere.
    The DICOM-world mode; completes non-arithmetic T.81 coverage."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_lossless,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (23, 37), dtype=np.uint8)
    for sel in range(1, 8):
        buf = encode_jpeg_gray_lossless(img, predictor=sel)
        w, h, p = decode_jpeg(buf)
        assert (w, h) == (37, 23)
        assert np.array_equal(p.reshape(23, 37), img), f"predictor {sel}"
    # the frame really is SOF3 on the wire; predictors beat raw size on
    # smooth content
    smooth = _smooth(40, 56)
    b = encode_jpeg_gray_lossless(smooth, predictor=4)
    assert b"\xff\xc3" in b.split(b"\xff\xda")[0]
    assert len(b) < smooth.size
    assert np.array_equal(decode_jpeg(b)[2].reshape(40, 56), smooth)


def test_jpeg_lossless_precision_and_wrap():
    """High-precision lossless: 12/16-bit planes reduce to 8-bit luma on
    decode; the modulo-65536 wrap path (SSSS=16, no extension bits) and
    the point transform (Al=Pt) both roundtrip."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_lossless,
    )

    rng = np.random.default_rng(22)
    # alternating 0 / 32768+7 with predictor 1 forces diff == -32768
    img16 = np.zeros((4, 6), dtype=np.uint16)
    img16[:, 1::2] = 32768 + 7
    b16 = encode_jpeg_gray_lossless(img16, predictor=1, precision=16)
    assert np.array_equal(
        decode_jpeg(b16)[2].reshape(4, 6), (img16 >> 8).astype(np.uint8)
    )
    img12 = rng.integers(0, 4096, (9, 11)).astype(np.uint16)
    b12 = encode_jpeg_gray_lossless(img12, predictor=7, precision=12)
    assert np.array_equal(
        decode_jpeg(b12)[2].reshape(9, 11), (img12 >> 4).astype(np.uint8)
    )
    img8 = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    bpt = encode_jpeg_gray_lossless(img8, predictor=2, pt=2)
    assert np.array_equal(
        decode_jpeg(bpt)[2].reshape(8, 9), (img8 >> 2) << 2
    )
    with pytest.raises(ValueError):
        encode_jpeg_gray_lossless(img8, predictor=9)
    with pytest.raises(ValueError):
        encode_jpeg_gray_lossless(
            np.full((4, 4), 300, np.uint16), precision=8
        )


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    seed=st.integers(0, 10_000),
    predictor=st.integers(1, 7),
)
@settings(max_examples=14, deadline=None)
def test_jpeg_lossless_property(h, w, seed, predictor):
    """Property: ANY shape/content/predictor roundtrips bit-exactly."""
    from doc_quality_check_spark.functions.jpeg import (
        encode_jpeg_gray_lossless,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    w2, h2, p = decode_jpeg(encode_jpeg_gray_lossless(img, predictor))
    assert (w2, h2) == (w, h)
    assert np.array_equal(p.reshape(h, w), img)
