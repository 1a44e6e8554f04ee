"""FLAC codec in pure python/numpy — REAL compressed-audio sample decode.

Why this exists: ``operators/audio.py`` made the PCM/WAV path real end to
end but left compressed codecs header-only.  FLAC is losslessly decodable
with nothing but integer arithmetic — rice-coded residuals over fixed or
LPC predictors — so, like the baseline-JPEG codec in ``operators/jpeg.py``,
a pure-python tier can prove the engine's audio statistics operate on
genuinely entropy-decoded bytes (an md5 stand-in cannot predict the RMS of
a rice-coded square wave).

* ``make_flac(samples, rate, bits)`` — subset encoder for engine-built
  fixtures: per-subframe choice of CONSTANT / VERBATIM / best FIXED
  predictor (orders 0-4) with single-partition rice residuals; optional
  mid/side stereo decorrelation and an LPC emission mode (quantized
  coefficients equal to the fixed predictor's, exercising the decoder's
  LPC path bit-exactly).  Correct CRC-8 / CRC-16, UTF-8 frame numbers,
  STREAMINFO with the spec's interleaved-LE sample MD5.
* ``decode_flac(payload)`` — FULL subset decoder covering everything real
  encoders emit for 8/16/24-bit fixed-blocking streams: CONSTANT,
  VERBATIM, FIXED 0-4, LPC 1-32, partitioned rice (4- and 5-bit params,
  escape-to-raw partitions), wasted bits, left/side + right/side +
  mid/side channel decorrelation, CRC-verified frames.  Returns
  (samples (n, ch) int32, rate, bits) or None — callers fall back to the
  declared-fake tier on anything outside the subset (variable blocking).

All bit-layout facts are from the public FLAC format spec (RFC 9639).
The wordspell reference has no audio path (`/root/reference/` is a text
engine); this is LLM-pipeline extension surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC frame checksums: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _make_crc_table(0x07, 8)
_CRC16_TBL = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ int(_CRC16_TBL[(r >> 8) ^ b])
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, n: int) -> None:
        if n <= 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, byte_pos: int = 0):
        self.buf = buf
        self.pos = byte_pos * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("flac: bitstream truncated")
        first, last = self.pos >> 3, (end + 7) >> 3
        v = int.from_bytes(self.buf[first:last], "big")
        v >>= (last << 3) - end
        self.pos = end
        return v & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# rice residual coding (RFC 9639 §9.2.7)
# ---------------------------------------------------------------------------


def _rice_encode(bw: _BitWriter, res: np.ndarray, param: int) -> None:
    zz = np.where(res >= 0, res.astype(np.int64) * 2, -2 * res.astype(np.int64) - 1)
    for u in zz.tolist():
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res.astype(np.float64)).mean())
    p = 0
    while (1 << (p + 1)) < mean * 2 + 1 and p < 14:
        p += 1
    return p


def _read_residual(br: _BitReader, n: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if n % nparts or (n >> po) <= pred_order:
        if po:  # partitions must divide the block and exceed the warmup
            raise ValueError("flac: bad partition order")
    out = np.empty(n - pred_order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        cnt = (n >> po) - (pred_order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += cnt
    return out


# fixed predictor coefficients per order (applied to previous samples)
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    out = np.empty(order + len(res), dtype=np.int64)
    out[:order] = warm
    coeffs = _FIXED_COEFFS[order]
    for i in range(len(res)):
        acc = res[i]
        for j, c in enumerate(coeffs):
            acc += c * out[order + i - 1 - j]
        out[order + i] = acc
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
            1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
_RATE_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
              24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_BITS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad utf8 number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bits: int, use_lpc: bool) -> None:
    s64 = s.astype(np.int64)
    if np.all(s64 == s64[0]):
        bw.write(0, 1); bw.write(0b000000, 6); bw.write(0, 1)
        bw.write_signed(int(s64[0]), bits)
        return
    # pick the fixed order with the smallest residual magnitude
    best_o, best_res, best_cost = 0, s64, float(np.abs(s64).sum())
    for o in range(1, min(5, len(s64))):
        res = _fixed_residual(s64, o)
        cost = float(np.abs(res).sum())
        if cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    param = _best_rice_param(best_res)
    est = len(best_res) * (param + 2) + best_o * bits
    if est >= len(s64) * bits:  # verbatim is smaller
        bw.write(0, 1); bw.write(0b000001, 6); bw.write(0, 1)
        for v in s64.tolist():
            bw.write_signed(v, bits)
        return
    if use_lpc and best_o >= 1:
        # LPC subframe with quantized coeffs identical to the fixed
        # predictor — exercises the decoder's LPC path bit-exactly
        coeffs = _FIXED_COEFFS[best_o]
        prec = 15
        bw.write(0, 1); bw.write(0b100000 | (best_o - 1), 6); bw.write(0, 1)
        for v in s64[:best_o].tolist():
            bw.write_signed(v, bits)
        bw.write(prec - 1, 4)
        bw.write_signed(0, 5)  # shift 0
        for c in coeffs:
            bw.write_signed(c, prec)
    else:
        bw.write(0, 1); bw.write(0b001000 | best_o, 6); bw.write(0, 1)
        for v in s64[:best_o].tolist():
            bw.write_signed(v, bits)
    bw.write(0, 2)   # residual method: 4-bit rice
    bw.write(0, 4)   # partition order 0
    bw.write(param, 4)
    _rice_encode(bw, best_res, param)


def make_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bits: int = 16,
    block_size: int = 256,
    stereo_mode: str = "independent",
    use_lpc: bool = False,
) -> bytes:
    """Serialize signed PCM ((n,) or (n, ch) ints) into a real FLAC stream.

    ``stereo_mode``: 'independent' or 'mid_side' (2-channel only) —
    mid/side emits genuinely decorrelated subframes so the decoder's
    channel-reconstruction path is exercised by engine-built fixtures.
    ``use_lpc`` swaps fixed-predictor subframes for equivalent LPC ones.
    """
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not (1 <= ch <= 8):
        raise ValueError("flac: 1-8 channels")
    if bits not in (8, 16, 24):  # byte-aligned depths (the STREAMINFO md5
        raise ValueError(f"flac: unsupported bits={bits}")  # is over LE bytes)
    if stereo_mode not in ("independent", "mid_side"):
        raise ValueError(f"flac: unknown stereo_mode={stereo_mode!r}")
    if stereo_mode == "mid_side" and ch != 2:
        raise ValueError("flac: mid_side needs exactly 2 channels")
    s64 = s.astype(np.int64)
    lim = 1 << (bits - 1)
    if s64.min() < -lim or s64.max() >= lim:
        raise ValueError("flac: samples out of range for bit depth")

    # STREAMINFO (34 bytes) — including the spec's interleaved-LE sample MD5
    if bits == 24:  # numpy has no int24: drop the top byte of each LE int32
        le = s64.astype("<i4").tobytes()
        md5_src = b"".join(le[i : i + 3] for i in range(0, len(le), 4))
    else:
        md5_src = s64.astype(f"<i{bits // 8}").tobytes()
    md5 = hashlib.md5(md5_src).digest()
    bs = min(block_size, max(n, 16))
    info = _BitWriter()
    info.write(bs, 16); info.write(bs, 16)
    info.write(0, 24); info.write(0, 24)       # min/max frame size unknown
    info.write(rate, 20)
    info.write(ch - 1, 3)
    info.write(bits - 1, 5)
    info.write(n, 36)
    info.align()
    head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info.bytes() + md5

    frames = bytearray()
    for fno, start in enumerate(range(0, n, bs)):
        blk = s64[start : start + bs]
        bn = len(blk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)          # reserved
        hdr.write(0, 1)          # fixed blocking
        bs_code = _BS_CODE.get(bn, 7)
        hdr.write(bs_code, 4)
        hdr.write(_RATE_CODE.get(rate, 0), 4)
        mid_side = stereo_mode == "mid_side" and ch == 2
        hdr.write(0b1010 if mid_side else ch - 1, 4)
        hdr.write(_BITS_CODE[bits], 3)
        hdr.write(0, 1)          # reserved
        hdr.align()
        hbytes = bytearray(hdr.bytes())
        hbytes += _utf8_number(fno)
        if bs_code == 7:
            hbytes += struct.pack(">H", bn - 1)
        elif bs_code == 6:
            hbytes += bytes([bn - 1])
        hbytes.append(crc8(bytes(hbytes)))

        body = _BitWriter()
        if mid_side:
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            _encode_subframe(body, mid, bits, use_lpc)
            _encode_subframe(body, side, bits + 1, use_lpc)
        else:
            for c in range(ch):
                _encode_subframe(body, blk[:, c], bits, use_lpc)
        body.align()
        frame = bytes(hbytes) + body.bytes()
        frames += frame + struct.pack(">H", crc16(frame))
    return head + bytes(frames)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BS_FROM_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
                 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODE.items()}
_BITS_FROM_CODE = {v: k for k, v in _BITS_CODE.items()}


def _decode_subframe(br: _BitReader, n: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe pad bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bits -= wasted
    if stype == 0b000000:
        out = np.full(n, br.read_signed(bits), dtype=np.int64)
    elif stype == 0b000001:
        out = np.fromiter((br.read_signed(bits) for _ in range(n)), np.int64, n)
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        warm = np.fromiter((br.read_signed(bits) for _ in range(order)), np.int64, order)
        res = _read_residual(br, n, order)
        out = _fixed_restore(warm, res, order)
    elif stype & 0b100000:
        order = (stype & 0x1F) + 1
        warm = np.fromiter((br.read_signed(bits) for _ in range(order)), np.int64, order)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coeffs[j] * out[i - 1 - j]
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype:#08b}")
    return out << wasted if wasted else out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """REAL FLAC decode: (samples (n, ch) int32, rate, bits) or None."""
    try:
        if len(payload) < 42 or payload[:4] != b"fLaC":
            return None
        # metadata block walk
        pos = 4
        rate = ch = bits = 0
        total = 0
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            btype = hdr & 0x7F
            body = payload[pos + 4 : pos + 4 + size]
            if btype == 0 and size >= 34:
                br = _BitReader(bytes(body))
                br.read(16); br.read(16); br.read(24); br.read(24)
                rate = br.read(20)
                ch = br.read(3) + 1
                bits = br.read(5) + 1
                total = br.read(36)
            pos += 4 + size
            if hdr & 0x80:
                break
        if not rate or not ch:
            return None
        if bits not in (8, 12, 16, 20, 24, 32):
            return None

        out: list[np.ndarray] = []
        got = 0
        while pos + 4 < len(payload) and (not total or got < total):
            frame_start = pos
            br = _BitReader(payload, pos)
            if br.read(14) != 0b11111111111110:
                return None
            br.read(1)
            if br.read(1):  # variable blocking: outside the subset
                return None
            bs_code = br.read(4)
            rate_code = br.read(4)
            ch_code = br.read(4)
            bits_code = br.read(3)
            br.read(1)
            _read_utf8_number(br)
            if bs_code == 6:
                bn = br.read(8) + 1
            elif bs_code == 7:
                bn = br.read(16) + 1
            elif bs_code in _BS_FROM_CODE:
                bn = _BS_FROM_CODE[bs_code]
            else:
                return None
            if rate_code == 12:
                br.read(8)
            elif rate_code in (13, 14):
                br.read(16)
            hdr_crc = br.read(8)
            if crc8(payload[frame_start : (br.pos >> 3) - 1]) != hdr_crc:
                return None
            fbits = _BITS_FROM_CODE.get(bits_code, bits)
            if ch_code < 8:
                nch = ch_code + 1
                planes = [_decode_subframe(br, bn, fbits) for _ in range(nch)]
                blk = np.stack(planes, axis=1)
            elif ch_code in (8, 9, 10):
                a_bits = fbits + (1 if ch_code == 9 else 0)
                b_bits = fbits + (0 if ch_code == 9 else 1)
                p0 = _decode_subframe(br, bn, a_bits)
                p1 = _decode_subframe(br, bn, b_bits)
                if ch_code == 8:    # left/side
                    left, right = p0, p0 - p1
                elif ch_code == 9:  # right/side: p0 is side
                    right = p1
                    left = p1 + p0
                else:               # mid/side
                    side = p1
                    mid = (p0 << 1) | (side & 1)
                    left = (mid + side) >> 1
                    right = (mid - side) >> 1
                blk = np.stack([left, right], axis=1)
            else:
                return None
            br.align()
            fcrc = br.read(16)
            if crc16(payload[frame_start : (br.pos >> 3) - 2]) != fcrc:
                return None
            out.append(blk)
            got += bn
            pos = br.pos >> 3
        if not out:
            return None
        s = np.concatenate(out, axis=0)
        if total:
            s = s[:total]
        return s.astype(np.int32), int(rate), int(bits)
    except (ValueError, IndexError, struct.error):
        return None
