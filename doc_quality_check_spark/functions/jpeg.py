"""From-scratch baseline JPEG codec (stdlib + numpy), no image libraries.

The round-3 PNG decoder (media.py) closed the "multimodal image column"
gap for PNG; this module does the same for baseline JPEG — the other
format a real training-data table actually carries:

- :func:`decode_jpeg`: baseline sequential DCT (SOF0/SOF1), grayscale and
  YCbCr with any sampling factors (4:4:4 / 4:2:2 / 4:2:0), interleaved and
  single-component scans, restart markers — AND progressive (SOF2) with
  spectral selection + successive approximation (T.81 Annex G, round 5) —
  AND both ARITHMETIC modes (SOF9 sequential + SOF10 progressive: the
  Annex D QM-coder with Annex F/G decision models in :mod:`jpeg_arith`,
  round 5) — AND LOSSLESS (SOF3, Annex H predictors, round 5). Returns
  the LUMA plane — the engine's image metrics (ink ratio, mean luma) are
  luma-only, so chroma blocks are entropy-decoded (the bitstream demands
  it) but skip IDCT. 12-bit precision decodes too (level shift / clip at
  the native range, luma reduced to 8 bits; lossless takes any 2..16);
  only arithmetic-lossless (SOF11) and hierarchical modes raise
  NotImplementedError → in-band error rows downstream.
- :func:`encode_jpeg_gray`: a real baseline encoder (forward DCT +
  ITU T.81 Annex K tables) used as the deterministic fixture generator,
  the role ``encode_wav_pcm16`` plays for audio. ``chroma420=True`` wraps
  the same luma plane in an interleaved 4:2:0 three-component frame with
  flat chroma, exercising the decoder's interleaved/subsampled path.
- :func:`encode_jpeg_gray_progressive`: the progressive fixture twin — a
  6-scan script (DC/AC first + refinement passes) that reconstructs the
  exact quantized coefficients, so its decode is bit-identical to the
  baseline encoder's at the same quality (pinned in tests).

Decode-encode roundtrip invariant (tests/test_media_jpeg.py): decoded luma
matches the source within quantization error (allclose/SNR bound), the
image analog of the north rule's decoded-PCM allclose gate.

Per-pixel Huffman decode is pure Python — fine for a metrics pass over
thumbnails/fixtures; swap a C decoder into media._decode_one for
pixel-hungry production use (the Spark plan does not change).

Reference parity: the reference decodes page images via PIL/fitz
(/root/reference/utils/document_processor.py:92-120); nothing to copy —
this is built from the public JPEG spec (ITU T.81).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (ITU T.81)

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 base quantization tables (raster order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT basis: forward F = A @ f @ A.T, inverse f = A.T @ F @ A
_A = np.array([
    [
        (np.sqrt(1.0 / 8.0) if k == 0 else 0.5)
        * np.cos((2 * n + 1) * k * np.pi / 16.0)
        for n in range(8)
    ]
    for k in range(8)
])


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: (code_length, code_value) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: symbol → (code_value, code_length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 destuffing;
    surfaces RST markers to the MCU loop."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None  # pending marker (RST/EOI/...)

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data overran a marker")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            while nxt == 0xFF:  # T.81 B.1.1.2 fill bytes before a marker
                self.pos += 1
                nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            else:
                # a real marker: record it and feed padding bits (spec: the
                # last byte before a marker is 1-padded)
                self.marker = nxt
                self.pos += 1
                self.cur = (self.cur << 8) | 0xFF
                self.nbits += 8
                return
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align and consume the pending RST marker."""
        self.cur = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet pulled — it must be next in the raw stream
            # (possibly behind 0xFF fill bytes, T.81 B.1.1.2)
            if self.buf[self.pos] != 0xFF:
                raise ValueError("expected JPEG restart marker")
            while self.buf[self.pos + 1] == 0xFF:
                self.pos += 1
            self.marker = self.buf[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RST marker, got 0x{self.marker:02X}")
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    rd: _BitReader, dc_tab: dict, ac_tab: dict, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 data unit → (zigzag-order coefficients, new DC predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    t = rd.decode_huff(dc_tab)
    pred += _extend(rd.receive(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = rd.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        coef[k] = _extend(rd.receive(s), s)
        k += 1
    return coef, pred


def _idct_blocks(coefs: np.ndarray, precision: int = 8) -> np.ndarray:
    """(N, 64) zigzag-order DEQUANTIZED coefficients → (N, 8, 8) pixels.
    12-bit frames level-shift/clip at their native range, then reduce to
    the 8-bit luma the metrics consume (>> 4)."""
    blocks = np.zeros((coefs.shape[0], 64), dtype=np.float64)
    blocks[:, ZIGZAG] = coefs
    blocks = blocks.reshape(-1, 8, 8)
    pix = np.einsum("ki,nkl,lj->nij", _A, blocks, _A)
    center = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    out = np.clip(np.rint(pix + center), 0, maxv).astype(np.int64)
    if precision > 8:
        out >>= precision - 8
    return out.astype(np.uint8)


def decode_jpeg(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG bytes → (width, height, flattened 8-bit luma plane).

    Grayscale returns the single component; color returns Y (the metrics
    are luma-only — chroma blocks are entropy-decoded to keep bitstream
    position but never IDCT'd). Subsampled Y (a color frame where Y is not
    at full sampling) is edge-replicated up to (width, height)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, n = 2, len(buf)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (w, h, [(comp_id, hi, vi, tq), ...])
    restart_interval = 0
    progressive = False
    arithmetic = False
    lossless = False
    conditioning: dict = {}  # DAC: ('dc',id)->(L,U), ('ac',id)->Kx
    frame_precision = 8
    prog: _ProgState | None = None  # coefficient accumulator across scans
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip to the last 0xFF of the run
        while pos + 2 < n and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seglen]
        segend = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq_id = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                qt[tq_id] = tbl.astype(np.int64)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended / SOF2 progressive (Huffman)
            # / SOF3 lossless (Annex H predictors) / SOF9 extended
            # sequential + SOF10 progressive (arithmetic, the Annex D
            # QM-coder in jpeg_arith)
            precision = seg[0]
            lossless = marker == 0xC3
            ok_precision = (
                2 <= precision <= 16 if lossless else precision in (8, 12)
            )
            if not ok_precision:
                raise NotImplementedError(
                    f"JPEG {precision}-bit precision not supported"
                )
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            frame = (w, h, comps)
            frame_precision = precision
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0x{marker:02X} not supported "
                "(arithmetic-lossless / hierarchical)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0x0F
                cs = seg[i + 1]
                if tc == 0:
                    conditioning[("dc", tb)] = (cs & 0x0F, cs >> 4)
                else:
                    conditioning[("ac", tb)] = cs
                i += 2
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            w, h, comps = frame
            byid = {c[0]: idx for idx, c in enumerate(comps)}
            if progressive:
                # T.81 Annex G: accumulate this scan's coefficient
                # contributions and keep walking the marker stream — the
                # image is only complete at EOI
                scan_comps = []
                for s in range(ns):
                    cs, tds = seg[1 + 2 * s : 3 + 2 * s]
                    scan_comps.append((byid[cs], tds >> 4, tds & 0x0F))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if prog is None:
                    prog = _ProgState(frame)
                if arithmetic:
                    from doc_quality_check_spark.functions.jpeg_arith import (
                        decode_arith_prog_scan,
                    )

                    pos = decode_arith_prog_scan(
                        buf, segend, frame, prog, scan_comps, conditioning,
                        ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
                    )
                    continue
                pos = _decode_prog_scan(
                    buf, segend, frame, prog, scan_comps, huff,
                    ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
                )
                continue
            if lossless:
                # Annex H: Ss = predictor selector, Al = point transform
                sel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 0x0F
                scan = []
                for s in range(ns):
                    cs, tds = seg[1 + 2 * s : 3 + 2 * s]
                    scan.append((byid[cs], huff[(0, tds >> 4)]))
                return _decode_lossless_scan(
                    buf, segend, frame, scan, sel, pt, frame_precision,
                    restart_interval,
                )
            if arithmetic:
                from doc_quality_check_spark.functions.jpeg_arith import (
                    decode_arith_scan,
                )

                scan_comps = []
                for s in range(ns):
                    cs, tds = seg[1 + 2 * s : 3 + 2 * s]
                    scan_comps.append((byid[cs], tds >> 4, tds & 0x0F))
                return decode_arith_scan(
                    buf, segend, frame, scan_comps, conditioning,
                    restart_interval, qt, frame_precision, _idct_blocks,
                )
            scan = []  # (comp_index, dc_table, ac_table)
            for s in range(ns):
                cs, tds = seg[1 + 2 * s : 3 + 2 * s]
                scan.append((byid[cs], huff[(0, tds >> 4)],
                             huff[(1, tds & 0x0F)]))
            return _decode_scan(
                buf, segend, frame, scan, qt, restart_interval,
                precision=frame_precision,
            )
        pos = segend
    if prog is not None:
        return _finish_progressive(frame, prog, qt, frame_precision)
    raise ValueError("JPEG has no scan data")


def _decode_scan(buf, pos, frame, scan, qt, restart_interval, precision=8):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    rd = _BitReader(buf, pos)
    preds = [0] * len(comps)
    # collected zigzag coefficient blocks for the LUMA component only
    luma_idx = 0
    luma_blocks: list[np.ndarray] = []

    if len(scan) == 1:
        # non-interleaved: data units in raster order over the component grid
        ci, dct, act = scan[0]
        _, hi, vi, tq_id = comps[ci]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        bx, by = -(-cw // 8), -(-ch // 8)
        nunits = bx * by
        for u in range(nunits):
            if restart_interval and u and u % restart_interval == 0:
                rd.restart()
                preds = [0] * len(comps)
            coef, preds[ci] = _decode_block(rd, dct, act, preds[ci])
            if ci == luma_idx:
                luma_blocks.append(coef)
        grid = (by, bx)
        y_hi = y_vi = 1  # raster layout below treats the grid directly
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                rd.restart()
                preds = [0] * len(comps)
            for ci, dct, act in scan:
                _, hi, vi, _tq = comps[ci]
                for _v in range(vi):
                    for _h in range(hi):
                        coef, preds[ci] = _decode_block(
                            rd, dct, act, preds[ci]
                        )
                        if ci == luma_idx:
                            luma_blocks.append(coef)
        grid = (mcuy, mcux)
        y_hi, y_vi = comps[luma_idx][1], comps[luma_idx][2]

    if not luma_blocks:
        # legal multi-scan baseline file whose first SOS covers only a
        # chroma component; we decode the first scan only, so the luma
        # plane never materializes — fail loudly, not with np.stack's
        # opaque "need at least one array"
        raise NotImplementedError(
            "multi-scan baseline JPEG with a non-luma first scan not "
            "supported (only the first SOS is decoded)"
        )
    # dequantize + IDCT the luma blocks in ONE vectorized batch
    tq_id = comps[luma_idx][3]
    q = qt[tq_id][np.newaxis, :]  # zigzag order, same as coefficients
    coefs = np.stack(luma_blocks) * q
    pix = _idct_blocks(coefs, precision)

    # assemble the luma plane
    rows, cols = grid
    if len(scan) == 1:
        plane = (
            pix.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8)
        )
    else:
        # MCU-ordered: each MCU carries a (y_vi x y_hi) tile of luma blocks
        plane = (
            pix.reshape(rows, cols, y_vi, y_hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(rows * y_vi * 8, cols * y_hi * 8)
        )
    # luma component's real size (then replicate up to frame size if Y was
    # subsampled — rare, but legal)
    hi, vi = comps[luma_idx][1], comps[luma_idx][2]
    cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
    plane = plane[:ch, :cw]
    if (cw, ch) != (w, h):
        plane = np.repeat(
            np.repeat(plane, -(-h // ch), axis=0), -(-w // cw), axis=1
        )[:h, :w]
    return int(w), int(h), plane.reshape(-1)


# ---------------------------------------------------------------------------
# lossless decoding (T.81 Annex H: predictor residuals, no DCT). SOF3 is
# the Huffman-coded lossless mode — the DICOM/medical-imaging workhorse.
# One sample per MCU; the seven spatial predictors (H.1.2.1) feed DC-style
# Huffman categories (SSSS up to 16, where 16 codes diff=32768 with no
# extension bits) and reconstruction wraps modulo 65536.


def _lossless_predict(cur, prev, x, y, sel, default):
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(cur[x - 1])
    if x == 0:
        return int(prev[x])
    ra, rb, rc = int(cur[x - 1]), int(prev[x]), int(prev[x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless predictor selector {sel} not in 1..7")


def _decode_lossless_scan(
    buf, pos, frame, scan, sel, pt, precision, restart_interval
):
    """Decode an SOF3 scan → (width, height, 8-bit component-0 plane).
    ``scan``: [(comp_index, huffman_table), ...]. All components decode
    (the bitstream interleaves them); component 0 is returned, reduced to
    8 bits for the engine's luma-only metrics."""
    w, h, comps = frame
    if any(c[1] != 1 or c[2] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampled components not supported"
        )
    if restart_interval:
        raise NotImplementedError(
            "restart markers in lossless JPEG scans not supported"
        )
    if all(ci != 0 for ci, _tab in scan):
        # same rule as the DCT paths' non-luma first scan: only the first
        # scan decodes, so component 0 would come back as silent zeros
        raise NotImplementedError(
            "multi-scan lossless JPEG with a non-first-component first "
            "scan not supported (only the first SOS is decoded)"
        )
    rd = _BitReader(buf, pos)
    default = 1 << (precision - pt - 1)
    ncomp = len(scan)
    prev = [np.zeros(w, dtype=np.int64) for _ in range(ncomp)]
    cur = [np.zeros(w, dtype=np.int64) for _ in range(ncomp)]
    out0 = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            for si, (ci, tab) in enumerate(scan):
                t = rd.decode_huff(tab)
                if t == 16:
                    d = 32768  # H.2: SSSS=16 carries no extension bits
                else:
                    d = _extend(rd.receive(t), t)
                p = _lossless_predict(cur[si], prev[si], x, y, sel, default)
                cur[si][x] = (p + d) & 0xFFFF
        for si, (ci, _tab) in enumerate(scan):
            if ci == 0:
                out0[y] = cur[si]
            prev[si], cur[si] = cur[si], prev[si]
    plane = out0 << pt  # undo the point transform (H.2.1)
    if precision > 8:
        plane >>= precision - 8
    return int(w), int(h), plane.astype(np.uint8).reshape(-1)


# a 17-symbol canonical table (categories 0..16, all 5-bit codes) — the
# Annex-K DC table stops at category 11, too small for 16-bit residuals
LOSSLESS_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
LOSSLESS_VALS = list(range(17))


def encode_jpeg_gray_lossless(
    pixels: np.ndarray, predictor: int = 4, precision: int = 8,
    pt: int = 0,
) -> bytes:
    """Encode an (h, w) plane as a LOSSLESS (SOF3) JPEG — the fixture
    twin of the Annex-H decoder. decode(encode(img)) reproduces the input
    EXACTLY at 8-bit precision (higher precisions reduce to 8-bit luma on
    decode, so they roundtrip through ``img >> (P-8)``)."""
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 2 <= precision <= 16:
        raise ValueError("lossless precision must be 2..16")
    plane = np.asarray(pixels).astype(np.int64)
    if plane.ndim != 2:
        raise ValueError("encode_jpeg_gray_lossless expects (h, w)")
    if plane.size and (
        int(plane.max()) >= (1 << precision) or int(plane.min()) < 0
    ):
        raise ValueError("sample out of range for the declared precision")
    h, w = plane.shape
    if pt:
        plane = plane >> pt
    tab = _build_encode_table(LOSSLESS_BITS, LOSSLESS_VALS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xC3, struct.pack(">BHHB", precision, h, w, 1)
                + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, LOSSLESS_BITS, LOSSLESS_VALS)
    out += _seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt]))
    wr = _BitWriter()
    default = 1 << (precision - pt - 1)
    prev = np.zeros(w, dtype=np.int64)
    cur = np.zeros(w, dtype=np.int64)
    for y in range(h):
        for x in range(w):
            p = _lossless_predict(cur, prev, x, y, predictor, default)
            cur[x] = int(plane[y, x])
            d = (int(plane[y, x]) - p) & 0xFFFF
            if d >= 32768:
                d -= 65536
            if d == -32768:
                code, length = tab[16]
                wr.write(code, length)  # SSSS=16: no extension bits
                continue
            t = 0 if d == 0 else abs(d).bit_length()
            code, length = tab[t]
            wr.write(code, length)
            if t:
                wr.write(d if d > 0 else d + (1 << t) - 1, t)
        prev, cur = cur, prev
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G: spectral selection + successive
# approximation, Huffman entropy coding; BOTH arithmetic modes — SOF9
# sequential and SOF10 progressive — live in jpeg_arith.py). Control flow
# mirrors libjpeg's jdphuff.c — the publicly documented reference decoder
# for the refinement bit protocol.


class _ProgState:
    """Per-component coefficient accumulators across progressive scans.

    Coefficients live in ZIGZAG index order (position k of a block array IS
    zigzag index k — the same convention as :func:`_decode_block`), shaped
    (block_rows, block_cols, 64) on the MCU-padded grid so interleaved DC
    scans and non-interleaved AC scans index the same arrays."""

    def __init__(self, frame):
        w, h, comps = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef = [
            np.zeros((self.mcuy * vi, self.mcux * hi, 64), dtype=np.int64)
            for _, hi, vi, _ in comps
        ]
        self.eobrun = 0  # current AC scan's end-of-band run counter

    def comp_blocks(self, frame, ci) -> tuple[int, int]:
        """(block_rows, block_cols) of one component's OWN grid — the
        traversal bounds of a non-interleaved scan (no MCU padding)."""
        w, h, comps = frame
        _, hi, vi, _ = comps[ci]
        cw = -(-w * hi // self.hmax)
        ch = -(-h * vi // self.vmax)
        return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(
    buf, pos, frame, state: _ProgState, scan_comps, huff,
    ss: int, se: int, ah: int, al: int, restart_interval: int,
) -> int:
    """Decode one progressive scan's entropy data into ``state`` and return
    the buffer position of the next marker."""
    rd = _BitReader(buf, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        _prog_dc_scan(rd, frame, state, scan_comps, huff, ah, al,
                      restart_interval)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        _prog_ac_scan(rd, frame, state, scan_comps[0], huff, ss, se, ah, al,
                      restart_interval)
    if rd.marker is not None and not (0xD0 <= rd.marker <= 0xD7):
        return rd.pos - 2  # marker already pulled by the bit reader
    p, n = rd.pos, len(buf)
    while p + 1 < n:
        if buf[p] == 0xFF and buf[p + 1] != 0x00 and not (
            0xD0 <= buf[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _prog_dc_scan(rd, frame, state, scan_comps, huff, ah, al, ri):
    w, h, comps = frame
    preds = {ci: 0 for ci, _, _ in scan_comps}
    tabs = {
        ci: (huff[(0, td)] if ah == 0 else None) for ci, td, _ in scan_comps
    }

    def one(ci, r, c):
        blk = state.coef[ci][r, c]
        if ah == 0:
            t = rd.decode_huff(tabs[ci])
            preds[ci] += _extend(rd.receive(t), t)
            blk[0] = preds[ci] << al
        else:  # refinement: append one magnitude bit (G.1.2.1)
            blk[0] |= rd.read_bit() << al

    if len(scan_comps) == 1:
        ci = scan_comps[0][0]
        by, bx = state.comp_blocks(frame, ci)
        u = 0
        for r in range(by):
            for c in range(bx):
                if ri and u and u % ri == 0:
                    rd.restart()
                    preds[ci] = 0
                one(ci, r, c)
                u += 1
        return
    for m in range(state.mcux * state.mcuy):
        if ri and m and m % ri == 0:
            rd.restart()
            preds = dict.fromkeys(preds, 0)
        my, mx = divmod(m, state.mcux)
        for ci, _, _ in scan_comps:
            _, hi, vi, _ = comps[ci]
            for v in range(vi):
                for hh in range(hi):
                    one(ci, my * vi + v, mx * hi + hh)


def _prog_ac_scan(rd, frame, state, scan_comp, huff, ss, se, ah, al, ri):
    ci, _, ta = scan_comp
    ac_tab = huff[(1, ta)]
    by, bx = state.comp_blocks(frame, ci)
    state.eobrun = 0
    u = 0
    for r in range(by):
        for c in range(bx):
            if ri and u and u % ri == 0:
                rd.restart()
                state.eobrun = 0  # EOB runs never cross a restart
            blk = state.coef[ci][r, c]
            if ah == 0:
                _ac_first_block(rd, blk, ac_tab, ss, se, al, state)
            else:
                _ac_refine_block(rd, blk, ac_tab, ss, se, al, state)
            u += 1


def _ac_first_block(rd, blk, ac_tab, ss, se, al, state):
    """First AC scan of a band: coefficient values at approximation Al."""
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = rd.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: this block ends, 2^r-1+ext more blocks skip
                state.eobrun = (1 << r) - 1
                if r:
                    state.eobrun += rd.receive(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient index out of band")
            blk[k] = _extend(rd.receive(s), s) << al
            k += 1


def _ac_refine_block(rd, blk, ac_tab, ss, se, al, state):
    """AC successive-approximation refinement (G.1.2.3 / jdphuff.c):
    newly-nonzero coefficients arrive as ±2^Al; every already-nonzero
    coefficient traversed consumes one correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state.eobrun == 0:
        while k <= se:
            rs = rd.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    state.eobrun = 1 << r
                    if r:
                        state.eobrun += rd.receive(r)
                    break  # remaining correction bits via the EOB path below
                # r == 15 (ZRL): advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "invalid refinement magnitude in progressive scan"
                    )
                newval = p1 if rd.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if rd.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if state.eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if rd.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state.eobrun -= 1


def _finish_progressive(
    frame, state: _ProgState, qt, precision: int = 8
) -> tuple[int, int, np.ndarray]:
    """Dequantize + IDCT the accumulated LUMA coefficients (metrics are
    luma-only, matching the sequential path) and assemble the plane."""
    w, h, comps = frame
    luma_idx = 0
    tq_id = comps[luma_idx][3]
    coefs = state.coef[luma_idx]
    rows, cols = coefs.shape[:2]
    pix = _idct_blocks(
        coefs.reshape(-1, 64) * qt[tq_id][np.newaxis, :], precision
    )
    plane = (
        pix.reshape(rows, cols, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(rows * 8, cols * 8)
    )
    hi, vi = comps[luma_idx][1], comps[luma_idx][2]
    cw = -(-w * hi // state.hmax)
    ch = -(-h * vi // state.vmax)
    plane = plane[:ch, :cw]
    if (cw, ch) != (w, h):
        plane = np.repeat(
            np.repeat(plane, -(-h // ch), axis=0), -(-w // cw), axis=1
        )[:h, :w]
    return int(w), int(h), plane.reshape(-1)


# ---------------------------------------------------------------------------
# encoder (fixture generator — the image twin of audio.encode_wav_pcm16)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.cur >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (raw marker — never byte-stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_blocks(
    wr: _BitWriter,
    plane: np.ndarray,
    q: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    restart_interval: int = 0,
    level: float = 128.0,
) -> None:
    """Forward-DCT, quantize, and Huffman-encode an 8-aligned plane in
    raster block order (single-component scan layout; MCU = one block).
    ``q`` must be in ZIGZAG order (same as the DQT segment, T.81 B.2.4.1)
    so each scanned coefficient divides by its own frequency's step."""
    hh, ww = plane.shape
    pred = 0
    u = 0
    for by in range(hh // 8):
        for bx in range(ww // 8):
            if restart_interval and u and u % restart_interval == 0:
                wr.restart(u // restart_interval - 1)
                pred = 0
            f = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - level
            coef = _A @ f @ _A.T
            zz = np.rint(coef.reshape(-1)[ZIGZAG] / q).astype(np.int64)
            pred = _encode_one_block(wr, zz, pred, dc_tab, ac_tab)
            u += 1


def _encode_one_block(wr, zz, pred, dc_tab, ac_tab) -> int:
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = 0 if diff == 0 else int(diff if diff > 0 else -diff).bit_length()
    code, length = dc_tab[t]
    wr.write(code, length)
    if t:
        wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            wr.write(code, length)
            run -= 16
        s = int(v if v > 0 else -v).bit_length()
        code, length = ac_tab[(run << 4) | s]
        wr.write(code, length)
        wr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        wr.write(code, length)
    return pred


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mult) * mult
    pw = -(-w // mult) * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


def encode_jpeg_gray(
    pixels: np.ndarray,
    quality: int = 90,
    chroma420: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (h, w) uint8 luma plane as a baseline JPEG.

    ``chroma420=False``: single-component grayscale frame (non-interleaved
    scan). ``chroma420=True``: interleaved YCbCr 4:2:0 frame with flat
    chroma (Cb=Cr=128 → zero coefficient blocks) — same visual content,
    exercises a decoder's interleaved/subsampled MCU path.
    ``restart_interval``: emit a DRI segment and RSTn markers every that
    many MCUs (predictors reset, stream byte-aligned) — exercises a
    decoder's restart path. ``precision=12`` (grayscale only) takes an
    (h, w) uint16 plane of 0..4095 samples and writes an extended
    sequential (SOF1) frame with a 16-bit quant table (base table ×16, so
    quantized coefficient magnitudes — and thus the Annex-K Huffman range
    — match the 8-bit case)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        if chroma420:
            raise ValueError("12-bit fixture encoder is grayscale-only")
        plane = np.asarray(pixels, dtype=np.uint16)
        if plane.ndim != 2 or int(plane.max(initial=0)) > 4095:
            raise ValueError("12-bit encode expects (h, w) samples 0..4095")
    else:
        plane = np.asarray(pixels, dtype=np.uint8)
        if plane.ndim != 2:
            raise ValueError("encode_jpeg_gray expects an (h, w) array")
    h, w = plane.shape
    # zigzag-reorder once: DQT stores Qk in ZIGZAG order (T.81 B.2.4.1) and
    # the block encoder quantizes zigzag-scanned coefficients, so both
    # consume the same permuted table
    qy = _scale_quant(QUANT_LUMA, quality)[ZIGZAG]
    dc_y = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if precision == 12:
        qy = qy * 16  # 16-bit table: same quantized magnitudes as 8-bit
        out += _seg(0xDB, bytes([0x10]) + b"".join(
            struct.pack(">H", int(v)) for v in qy))
    else:
        out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    wr = _BitWriter()
    if not chroma420:
        out += _seg(
            0xC1 if precision == 12 else 0xC0,
            struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0]),
        )
        out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        out += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        _encode_blocks(wr, _pad_edge(plane, 8), qy, dc_y, ac_y,
                       restart_interval,
                       level=float(1 << (precision - 1)))
    else:
        qc = _scale_quant(QUANT_CHROMA, quality)[ZIGZAG]
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc))
        out += _seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        out += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        out += _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
        padded = _pad_edge(plane, 16)
        ph, pw = padded.shape
        preds = [0, 0, 0]
        zero = np.zeros(64, dtype=np.int64)
        m = 0
        for my in range(ph // 16):
            for mx in range(pw // 16):
                if restart_interval and m and m % restart_interval == 0:
                    wr.restart(m // restart_interval - 1)
                    preds = [0, 0, 0]
                m += 1
                for v in range(2):
                    for hh in range(2):
                        f = padded[
                            my * 16 + v * 8 : my * 16 + v * 8 + 8,
                            mx * 16 + hh * 8 : mx * 16 + hh * 8 + 8,
                        ].astype(np.float64) - 128.0
                        zz = np.rint(
                            (_A @ f @ _A.T).reshape(-1)[ZIGZAG] / qy
                        ).astype(np.int64)
                        preds[0] = _encode_one_block(
                            wr, zz, preds[0], dc_y, ac_y
                        )
                # flat chroma: all-zero blocks (Cb=Cr=128)
                preds[1] = _encode_one_block(wr, zero, preds[1], dc_c, ac_c)
                preds[2] = _encode_one_block(wr, zero, preds[2], dc_c, ac_c)
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture twin of the Annex-G decoder above)


def _enc_prog_dc(wr, coefs, dc_tab, ah, al, ri):
    pred, u = 0, 0
    for by in range(coefs.shape[0]):
        for bx in range(coefs.shape[1]):
            if ri and u and u % ri == 0:
                wr.restart(u // ri - 1)
                pred = 0
            dc = int(coefs[by, bx, 0]) >> al  # arithmetic shift (G.1.2.1)
            if ah == 0:
                diff = dc - pred
                pred = dc
                t = 0 if diff == 0 else abs(diff).bit_length()
                code, length = dc_tab[t]
                wr.write(code, length)
                if t:
                    wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            else:  # refinement: one magnitude bit per block
                wr.write(dc & 1, 1)
            u += 1


def _enc_prog_ac_first(wr, coefs, ac_tab, ss, se, al, ri):
    u = 0
    for by in range(coefs.shape[0]):
        for bx in range(coefs.shape[1]):
            if ri and u and u % ri == 0:
                wr.restart(u // ri - 1)
            blk = coefs[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = (v if v >= 0 else -v) >> al  # magnitude point transform
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    code, length = ac_tab[0xF0]
                    wr.write(code, length)
                    r -= 16
                s = t.bit_length()
                code, length = ac_tab[(r << 4) | s]
                wr.write(code, length)
                sv = t if v >= 0 else -t
                wr.write(sv if sv > 0 else sv + (1 << s) - 1, s)
                r = 0
            if r > 0:
                code, length = ac_tab[0x00]  # per-block EOB (run of 1)
                wr.write(code, length)
            u += 1


def _enc_prog_ac_refine(wr, coefs, ac_tab, ss, se, al, ri):
    """Per-block port of jcphuff.c encode_mcu_AC_refine: newly-nonzero
    coefficients emit (run, 1) + sign; history-nonzero ones buffer one
    correction bit, flushed after the next symbol (the order the decoder's
    advance loop consumes them). EOB runs never span blocks here — each
    block with pending zeros/bits ends with EOB(run=1) + its buffered
    bits, which the decoder's EOBRUN branch reads back."""
    u = 0
    for by in range(coefs.shape[0]):
        for bx in range(coefs.shape[1]):
            if ri and u and u % ri == 0:
                wr.restart(u // ri - 1)
            blk = coefs[by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = ss - 1  # position of the last NEWLY-nonzero coefficient
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    code, length = ac_tab[0xF0]
                    wr.write(code, length)
                    r -= 16
                    for b in br:
                        wr.write(b, 1)
                    br = []
                if t > 1:  # history-nonzero: buffer its correction bit
                    br.append(t & 1)
                    continue
                code, length = ac_tab[(r << 4) | 1]
                wr.write(code, length)
                wr.write(1 if int(blk[k]) >= 0 else 0, 1)
                for b in br:
                    wr.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                code, length = ac_tab[0x00]
                wr.write(code, length)
                for b in br:
                    wr.write(b, 1)
            u += 1


# the default luma scan script: exercises every Annex-G scan type the
# decoder implements — DC first with point transform, DC refinement, AC
# spectral-selection first scans, and two AC successive-approximation
# refinement passes
PROGRESSIVE_SCANS = (
    (0, 0, 0, 1),   # DC first, Al=1
    (1, 5, 0, 2),   # AC 1-5 first, Al=2
    (6, 63, 0, 2),  # AC 6-63 first, Al=2
    (1, 63, 2, 1),  # AC refine Ah=2 -> Al=1
    (1, 63, 1, 0),  # AC refine Ah=1 -> Al=0
    (0, 0, 1, 0),   # DC refine
)


def encode_jpeg_gray_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    scans: tuple = PROGRESSIVE_SCANS,
) -> bytes:
    """Encode an (h, w) uint8 luma plane as a PROGRESSIVE (SOF2) JPEG.

    The scan script reconstructs the exact quantized coefficients (all
    approximation bits restored), so decode parity with the baseline
    encoder is bit-exact. ``restart_interval`` applies to every scan
    (one DRI), exercising the progressive restart path."""
    plane = np.asarray(pixels, dtype=np.uint8)
    if plane.ndim != 2:
        raise ValueError("encode_jpeg_gray_progressive expects (h, w)")
    h, w = plane.shape
    qy = _scale_quant(QUANT_LUMA, quality)[ZIGZAG]
    padded = _pad_edge(plane, 8)
    nby, nbx = padded.shape[0] // 8, padded.shape[1] // 8
    coefs = np.zeros((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            f = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            coefs[by, bx] = np.rint(
                (_A @ f @ _A.T).reshape(-1)[ZIGZAG] / qy
            ).astype(np.int64)

    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    for ss, se, ah, al in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        wr = _BitWriter()
        if ss == 0:
            _enc_prog_dc(wr, coefs, dc_tab, ah, al, restart_interval)
        elif ah == 0:
            _enc_prog_ac_first(wr, coefs, ac_tab, ss, se, al, restart_interval)
        else:
            _enc_prog_ac_refine(wr, coefs, ac_tab, ss, se, al, restart_interval)
        wr.flush()
        out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
