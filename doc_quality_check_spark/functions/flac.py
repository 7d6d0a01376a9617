"""From-scratch REAL FLAC codec (stdlib + numpy), no audio libraries.

Until round 5 the engine's "flac" payloads were a deterministic FAKE
container (audio.py encode_fake_flac — magic + raw PCM16), honestly
declared. This module adds the real thing, built from the public FLAC
format specification (xiph.org / RFC 9639):

- :func:`decode_flac`: full native-FLAC decoder — STREAMINFO + metadata
  walk, frame sync with CRC-8-verified headers, UTF-8-coded frame/sample
  numbers, all block-size/sample-rate/sample-size codes, CONSTANT /
  VERBATIM / FIXED(0-4) / LPC(1-32) subframes, wasted bits, Rice and
  Rice2 residual partitions with raw-bits escapes, and every stereo
  decorrelation mode (independent, left/side, right/side, mid/side —
  side channels carry bps+1 bits). Returns (sr, float32 mono-mixed PCM
  in [-1, 1]) — the same contract as audio._parse_wav.
- :func:`encode_flac`: a real, spec-conformant encoder used as the
  deterministic fixture generator (mono or independent-stereo, 16-bit,
  fixed blocking): per frame it picks the cheapest FIXED predictor order
  0-2 and Rice-codes the residual (single partition), with correct CRC-8
  header and CRC-16 frame checksums — any conformant FLAC decoder can
  play its output.

Lossless gate: decode(encode(pcm16)) reproduces the input EXACTLY
(tests/test_audio_udfs.py), the strongest possible roundtrip invariant —
plus CRC self-validation on every decoded frame.
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# sample-rate codes (frame header, table from the spec)
_SR_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (for CRC spans)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos  # next unread BYTE (bits are drawn from cur)
        self.cur = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
            self.cur = (self.cur << 8) | self.buf[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.cur >> self.n) & ((1 << nbits) - 1)
        self.cur &= (1 << self.n) - 1
        return v

    def sread(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1_000_000:
                raise ValueError("FLAC unary run overflow")
        return q

    def align(self) -> None:
        self.n = 0
        self.cur = 0


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("bad FLAC UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        k = bits.read(pbits)
        if k == escape:
            raw = bits.read(5)
            for i in range(n):
                out[w + i] = bits.sread(raw) if raw else 0
        else:
            for i in range(n):
                q = bits.unary()
                v = (q << k) | (bits.read(k) if k else 0)
                out[w + i] = (v >> 1) ^ -(v & 1)  # zigzag
        w += n
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        out = np.full(blocksize, bits.sread(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([bits.sread(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        warm = [bits.sread(bps) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = resid[i - order] + pred
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        warm = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(buf: bytes):
    """Native FLAC bytes → (sample_rate, float32 mono PCM in [-1, 1]).
    Multi-channel audio mixes to mono (the engine's metrics contract,
    same as audio._parse_wav). Raises ValueError on malformed input."""
    if buf[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = channels = bps = None
    total = 0
    # metadata blocks
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + length]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("short FLAC STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        pos += 4 + length
        if hdr & 0x80:  # last-metadata-block flag
            break
    if sr is None or not sr:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    ndecoded = 0
    while pos + 2 <= len(buf) and (total == 0 or ndecoded < total):
        sync = (buf[pos] << 8) | buf[pos + 1]
        if (sync >> 2) != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        frame_start = pos
        bits = _Bits(buf, pos + 2)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError("reserved FLAC sample size code")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        if bits.n:
            raise ValueError("FLAC frame header not byte-aligned")
        if _crc8(buf[frame_start : bits.pos]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [
                _decode_subframe(bits, blocksize, fbps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            extra0 = 1 if ch_code == 9 else 0  # side channel gets bps+1
            extra1 = 1 if ch_code in (8, 10) else 0
            a = _decode_subframe(bits, blocksize, fbps + extra0)
            b = _decode_subframe(bits, blocksize, fbps + extra1)
            if ch_code == 8:  # left/side: L, S=L-R
                subs = [a, a - b]
            elif ch_code == 9:  # right/side: S=L-R, R
                subs = [a + b, b]
            else:  # mid/side
                m2 = (a << 1) | (b & 1)
                subs = [(m2 + b) >> 1, (m2 - b) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        bits.align()
        if _crc16(buf[frame_start : bits.pos]) != bits.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = bits.pos
        for c in range(channels):
            chans[c].append(subs[c])
        ndecoded += blocksize

    if not chans[0]:
        raise ValueError("FLAC stream has no frames")
    planes = [np.concatenate(c) for c in chans]
    if total:
        planes = [p[:total] for p in planes]
    mono = planes[0].astype(np.float64)
    for p in planes[1:]:
        mono += p.astype(np.float64)
    mono /= len(planes)
    scale = float((1 << (bps - 1)) - 1)
    return int(sr), (mono / scale).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder (fixture twin): FIXED predictors + Rice residuals, fixed blocking


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.cur = (self.cur << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.cur >> self.n) & 0xFF)
        self.cur &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def flush(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    bits_needed = n.bit_length()
    for nbytes in range(1, 7):
        if bits_needed <= 6 - nbytes + 6 * nbytes:
            lead = (0xFF << (7 - nbytes)) & 0xFF
            out = [lead | (n >> (6 * nbytes))]
            for i in range(nbytes - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _rice_cost(zig: np.ndarray, k: int) -> int:
    return int(np.sum(zig >> k)) + len(zig) * (k + 1)


def _best_rice_k(zig: np.ndarray) -> int:
    best_k, best_c = 0, _rice_cost(zig, 0)
    for k in range(1, 15):
        c = _rice_cost(zig, k)
        if c < best_c:
            best_k, best_c = k, c
    return best_k


def _write_rice_residual(wr: _BitWriter, resid: np.ndarray) -> None:
    zig = np.where(resid >= 0, resid << 1, (-resid << 1) - 1).astype(
        np.int64
    )
    k = _best_rice_k(zig)
    wr.write(0, 2)  # rice method (4-bit params)
    wr.write(0, 4)  # partition order 0
    wr.write(k, 4)
    for v in zig:
        v = int(v)
        wr.unary(v >> k)
        if k:
            wr.write(v & ((1 << k) - 1), k)


def _encode_channel(
    wr: _BitWriter, x: np.ndarray, bps: int, use_lpc: bool = False
) -> None:
    n = len(x)
    if n and np.all(x == x[0]):
        wr.write(0, 1)
        wr.write(0, 6)  # CONSTANT
        wr.write(0, 1)
        wr.write(int(x[0]), bps)
        return
    if use_lpc and n > 8:
        # order-2 LPC: solve the 2x2 normal equations on the block's
        # autocorrelation, quantize at precision 12 — exercises the
        # decoder's LPC subframe path with exact residual reconstruction
        xf = x.astype(np.float64)
        r0 = float(np.dot(xf, xf))
        r1 = float(np.dot(xf[1:], xf[:-1]))
        r2 = float(np.dot(xf[2:], xf[:-2]))
        det = r0 * r0 - r1 * r1
        if det > 1e-9 and r0 > 0:
            a1 = (r1 * r0 - r1 * r2) / det
            a2 = (r2 * r0 - r1 * r1) / det
            shift = 10
            q1 = int(np.clip(round(a1 * (1 << shift)), -2048, 2047))
            q2 = int(np.clip(round(a2 * (1 << shift)), -2048, 2047))
            xi = x.astype(np.int64)
            pred = (q1 * xi[1:-1] + q2 * xi[:-2]) >> shift
            resid = xi[2:] - pred
            wr.write(0, 1)
            wr.write(32 + (2 - 1), 6)  # LPC, order 2
            wr.write(0, 1)
            wr.write(int(xi[0]), bps)
            wr.write(int(xi[1]), bps)
            wr.write(12 - 1, 4)  # precision 12
            wr.write(shift, 5)  # non-negative shift
            wr.write(q1, 12)
            wr.write(q2, 12)
            _write_rice_residual(wr, resid)
            return
    # pick the cheapest fixed order 0..2 by residual magnitude sum
    # (np.diff applied `order` times IS the FIXED-order residual, with
    # warmup samples x[:order])
    best = None
    for order in range(0, 3):
        if n <= order:
            break
        r = x.astype(np.int64)
        for _ in range(order):
            r = np.diff(r)
        cost = int(np.sum(np.abs(r)))
        if best is None or cost < best[1]:
            best = (order, cost, r)
    order, _cost, resid = best
    wr.write(0, 1)
    wr.write(8 + order, 6)  # FIXED order
    wr.write(0, 1)  # no wasted bits
    for i in range(order):
        wr.write(int(x[i]), bps)
    _write_rice_residual(wr, resid)


def encode_flac(
    pcm: np.ndarray,
    sr_hz: int,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    use_lpc: bool = False,
) -> bytes:
    """float32 [-1,1] (n,) mono or (n, 2) stereo → REAL native FLAC
    (16-bit, fixed blocking, FIXED-predictor + Rice frames — or order-2
    LPC with ``use_lpc=True`` — correct CRC-8/CRC-16).
    decode_flac(encode_flac(x)) is bit-exact on the quantized int16
    samples. ``stereo_mode``: 'independent', 'mid_side', 'left_side', or
    'right_side' — the decorrelated modes exercise a decoder's side
    channel (bps+1 bits) and reconstruction math."""
    if stereo_mode not in ("independent", "mid_side", "left_side",
                           "right_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    x = np.asarray(pcm)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("encode_flac expects (n,) mono or (n, 2) stereo")
    if stereo_mode != "independent" and x.shape[1] != 2:
        raise ValueError("decorrelated stereo modes need (n, 2) input")
    q = np.clip(np.rint(np.clip(x, -1, 1) * 32767.0), -32768, 32767).astype(
        np.int64
    )
    n, channels = q.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    out = bytearray(FLAC_MAGIC)
    packed = (sr_hz << 44) | ((channels - 1) << 41) | ((16 - 1) << 36) | n
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 0 = unknown (spec-allowed)
    )
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fno, b0 in enumerate(range(0, n, block_size)):
        blk = q[b0 : b0 + block_size]
        bs = len(blk)
        hdr = bytearray(b"\xff\xf8")  # sync + fixed blocking
        wr = _BitWriter()
        if bs == block_size and block_size in (256, 512, 1024, 2048, 4096,
                                               8192, 16384, 32768):
            bs_code = 8 + (block_size.bit_length() - 9)
            follow = b""
        elif bs <= 256:
            bs_code, follow = 6, bytes([bs - 1])
        else:
            bs_code, follow = 7, struct.pack(">H", bs - 1)
        wr.write(bs_code, 4)
        wr.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent":
            ch_code = channels - 1
        else:
            ch_code = {"left_side": 8, "right_side": 9,
                       "mid_side": 10}[stereo_mode]
        wr.write(ch_code, 4)
        wr.write(4, 3)  # 16-bit
        wr.write(0, 1)
        wr.flush()
        hdr += bytes(wr.out)
        hdr += _utf8_number(fno)
        hdr += follow
        hdr.append(_crc8(bytes(hdr)))
        body = _BitWriter()
        if stereo_mode == "independent":
            for c in range(channels):
                _encode_channel(body, blk[:, c], 16, use_lpc)
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right  # 17-bit side channel
            if stereo_mode == "left_side":
                _encode_channel(body, left, 16, use_lpc)
                _encode_channel(body, side, 17, use_lpc)
            elif stereo_mode == "right_side":
                _encode_channel(body, side, 17, use_lpc)
                _encode_channel(body, right, 16, use_lpc)
            else:  # mid_side: mid = (L+R)>>1 (floor), side = L-R
                _encode_channel(body, (left + right) >> 1, 16, use_lpc)
                _encode_channel(body, side, 17, use_lpc)
        body.flush()
        frame = bytes(hdr) + bytes(body.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
