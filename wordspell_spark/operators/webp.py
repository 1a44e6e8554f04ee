"""WebP-lossless (VP8L) codec in pure python/numpy — the fifth REAL image
container.

PNG/BMP/GIF/baseline-JPEG already have real pixel paths in this engine;
WEBP was the last common web container behind the declared fake-feature
stub.  The lossless variant (VP8L) is exactly decodable with integer
arithmetic — canonical Huffman codes, LZ77 backward references, a color
cache, and four reversible spatial transforms — so, like the FLAC and JPEG
codecs, a pure-python tier can prove the engine's statistics operate on
genuinely entropy-decoded bytes.

* ``decode_webp_pixels(payload)`` — FULL VP8L decoder: simple and
  code-length-coded Huffman codes (incl. the max-symbol shortcut), meta
  Huffman groups, color cache, LZ77 with the 120-entry neighbor distance
  map, and all four transforms (predictor with its 14 modes, color,
  subtract-green, color-indexing incl. sub-byte packed indices).  Lossy
  VP8 payloads honestly return None (they need a perceptual codec).
* ``make_webp_lossless(pixels)`` — subset encoder for engine fixtures:
  optional subtract-green, run-length LZ77 (distance 1), simple or
  code-length-coded Huffman codes built per image.  Bit-exact round trip
  by construction (lossless), so oracle queries can predict pixel
  statistics arithmetically.

All bit-layout facts are from the public WebP lossless bitstream spec
(RFC 9649).  The wordspell reference has no image path; this is
LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# LSB-first bit I/O (VP8L, unlike JPEG/FLAC, reads bits little-endian)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, bit_pos: int = 0):
        self.buf = buf
        self.pos = bit_pos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        for i in range(n):
            p = self.pos + i
            byte = p >> 3
            if byte >= len(self.buf):
                raise ValueError("vp8l: bitstream truncated")
            v |= ((self.buf[byte] >> (p & 7)) & 1) << i
        self.pos += n
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        out = bytes(self.out) + (bytes([self.acc & 0xFF]) if self.nbits else b"")
        return out


# ---------------------------------------------------------------------------
# canonical Huffman (codes read MSB-of-code-first through the LSB stream)
# ---------------------------------------------------------------------------


class _Huff:
    """Canonical prefix decoder from a code-length array."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("vp8l: empty huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        maxlen = max(ln for ln, _ in nz)
        counts = [0] * (maxlen + 1)
        for ln, _ in nz:
            counts[ln] += 1
        # Kraft check: complete codes only
        total = 0
        for ln in range(1, maxlen + 1):
            total += counts[ln] << (maxlen - ln)
        if total != (1 << maxlen):
            raise ValueError("vp8l: incomplete huffman code")
        self.vals = [sym for _ln, sym in sorted(nz)]
        self.mincode = [0] * (maxlen + 1)
        self.maxcode = [-1] * (maxlen + 1)
        self.valptr = [0] * (maxlen + 1)
        code = 0
        k = 0
        for ln in range(1, maxlen + 1):
            if counts[ln]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln]
                k += counts[ln]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = br.read(1)
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln >= len(self.maxcode):
                raise ValueError("vp8l: bad huffman code")
            code = (code << 1) | br.read(1)
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (encoder side).

    A single-symbol code consumes ZERO bits per use (the decoder — like
    libwebp's table builder — resolves it without reading), regardless of
    the transmitted code length."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in nz:
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _write_code(bw: _BitWriter, code: int, ln: int) -> None:
    # prefix codes are written MSB-of-code first into the LSB-first stream
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _huffman_lengths(freqs: list[int], maxlen: int = 15) -> list[int]:
    """Code lengths from frequencies, depth-limited (heap Huffman + Kraft
    fixup — fixture alphabets are small, optimality is not the point)."""
    import heapq

    syms = [s for s, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    uid = len(heap)
    while len(heap) > 1:
        fa, _, ga = heapq.heappop(heap)
        fb, _, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, uid, ga + gb))
        uid += 1
    lengths = [0] * len(freqs)
    for s in syms:
        lengths[s] = min(depth[s], maxlen)
    # Kraft fixup after clamping: demote/promote until the code is complete
    def kraft() -> float:
        return sum(2.0 ** -l for l in lengths if l)

    while kraft() > 1.0:
        for s in sorted(syms, key=lambda s: lengths[s]):
            if lengths[s] < maxlen:
                lengths[s] += 1
                break
        else:
            raise ValueError("vp8l: cannot satisfy kraft")
        if kraft() <= 1.0:
            break
    # tighten: promote the deepest codes while the code stays decodable
    improved = True
    while improved:
        improved = False
        for s in sorted(syms, key=lambda s: -lengths[s]):
            if lengths[s] > 1:
                lengths[s] -= 1
                if kraft() <= 1.0:
                    improved = True
                else:
                    lengths[s] += 1
    if abs(kraft() - 1.0) > 1e-12:  # decoders require complete codes
        raise ValueError("vp8l: could not build a complete huffman code")
    return lengths


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1
            h = _Huff.__new__(_Huff)
            h.single = sym0
            return h
        sym1 = br.read(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ValueError("vp8l: bad simple code")
        lengths[sym0] = lengths[sym1] = 1
        return _Huff(lengths)
    # code-length-coded
    num_codes = br.read(4) + 4
    if num_codes > len(_CL_ORDER):
        raise ValueError("vp8l: bad code-length count")
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_huff.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huff(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix coding + distance neighbor map
# ---------------------------------------------------------------------------


def _prefix_decode(br: _BitReader, s: int) -> int:
    if s < 4:
        return s + 1
    extra = (s - 2) >> 1
    offset = (2 + (s & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value → (symbol, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    hi = v.bit_length() - 1
    extra = hi - 1
    sym = 2 * hi + ((v >> extra) & 1)
    return sym, v & ((1 << extra) - 1), extra


_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image decode (shared by ARGB data, transforms, entropy img)
# ---------------------------------------------------------------------------

_GREEN_LIT = 256
_LEN_CODES = 24


def _decode_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """One VP8L entropy-coded image → (h, w, 4) uint8 ARGB."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("vp8l: bad cache bits")
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_image(br, mw, mh, False)
        meta = (meta_img[:, :, 1].astype(np.int64) << 8) | meta_img[:, :, 2]
        n_groups = int(meta.max()) + 1

    green_size = _GREEN_LIT + _LEN_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_huffman_code(br, green_size)
        r = _read_huffman_code(br, 256)
        b = _read_huffman_code(br, 256)
        a = _read_huffman_code(br, 256)
        d = _read_huffman_code(br, 40)
        groups.append((g, r, b, a, d))

    n = w * h
    argb = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gh, rh, bh, ah, dh = groups[gi]
        else:
            gh, rh, bh, ah, dh = groups[0]
        s = gh.decode(br)
        if s < 256:  # literal: green, then red / blue / alpha
            red = rh.decode(br)
            blue = bh.decode(br)
            alpha = ah.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            argb[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backref
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, dh.decode(br))
            dist = _map_distance(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: bad backref")
            for i in range(length):
                px = int(argb[pos - dist + i])
                argb[pos + i] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += length
        else:  # color cache
            if cache is None:
                raise ValueError("vp8l: cache hit without cache")
            argb[pos] = cache[s - 256 - 24]
            pos += 1

    out = np.empty((h, w, 4), dtype=np.uint8)
    px = argb.reshape(h, w)
    out[:, :, 0] = (px >> 24) & 0xFF
    out[:, :, 1] = (px >> 16) & 0xFF
    out[:, :, 2] = (px >> 8) & 0xFF
    out[:, :, 3] = px & 0xFF
    return out  # ARGB planes


# ---------------------------------------------------------------------------
# transforms (inverse, applied in reverse read order)
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int64) + b.astype(np.int64)) >> 1


def _inv_predictor(px: np.ndarray, modes: np.ndarray, bits: int) -> np.ndarray:
    h, w, _ = px.shape
    out = np.zeros_like(px, dtype=np.int64)
    src = px.astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # quirk pinned by libwebp: TR of the last column is the
                # first pixel of the current row (already decoded)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pL = int(np.abs(p - L).sum())
                    pT = int(np.abs(p - T).sum())
                    pred = L if pL < pT else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = _avg2(L, T)
                    d = ave - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))  # trunc
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"vp8l: bad predictor mode {mode}")
            out[y, x] = (src[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _ctdelta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic shift)."""
    ts = t.astype(np.int64)
    ts = np.where(ts >= 128, ts - 256, ts)
    cs = c.astype(np.int64)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, tf: np.ndarray, bits: int) -> np.ndarray:
    h, w, _ = px.shape
    yy, xx = np.mgrid[0:h, 0:w]
    blk_y, blk_x = yy >> bits, xx >> bits
    # RFC 9649 / libwebp ColorCodeToMultipliers: the transform pixel packs
    # green_to_red in its BLUE byte (bits 0-7), green_to_blue in GREEN
    # (8-15), red_to_blue in RED (16-23)
    g2r = tf[blk_y, blk_x, 3]   # blue channel of the transform pixel
    g2b = tf[blk_y, blk_x, 2]   # green channel
    r2b = tf[blk_y, blk_x, 1]   # red channel
    out = px.astype(np.int64)
    g = out[:, :, 2]
    out[:, :, 1] = (out[:, :, 1] + _ctdelta(g2r, g)) & 0xFF
    out[:, :, 3] = (out[:, :, 3] + _ctdelta(g2b, g) + _ctdelta(r2b, out[:, :, 1])) & 0xFF
    return out.astype(np.uint8)


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    out = px.astype(np.int64)
    out[:, :, 1] = (out[:, :, 1] + out[:, :, 2]) & 0xFF  # red += green
    out[:, :, 3] = (out[:, :, 3] + out[:, :, 2]) & 0xFF  # blue += green
    return out.astype(np.uint8)


def _inv_color_index(px: np.ndarray, palette: np.ndarray, w: int) -> np.ndarray:
    n_colors = palette.shape[0]
    if n_colors > 16:
        idx = px[:, :, 2].astype(np.int64)
        if idx.max() >= n_colors:
            raise ValueError("vp8l: palette index out of range")
        return palette[idx]
    wbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1
    per = 1 << wbits
    ibits = 8 >> wbits
    h = px.shape[0]
    packed = px[:, :, 2].astype(np.int64)  # packed indices in green
    out = np.zeros((h, w), dtype=np.int64)
    for k in range(per):
        cols = np.arange(packed.shape[1]) * per + k
        keep = cols < w
        out[:, cols[keep]] = (packed[:, keep] >> (k * ibits)) & ((1 << ibits) - 1)
    if out.max() >= n_colors:
        raise ValueError("vp8l: palette index out of range")
    return palette[out]


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


def find_vp8l_chunk(payload: bytes) -> bytes | None:
    """The VP8L chunk body from a RIFF/WEBP container (direct or inside
    VP8X), or None."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    from .riff import walk_chunks

    for cid, body, size in walk_chunks(payload, 12, len(payload)):
        if cid == b"VP8L":
            return payload[body : body + size]
    return None


def decode_webp_pixels(payload: bytes) -> np.ndarray | None:
    """REAL WebP-lossless pixel decode → (H, W, 4) uint8 RGBA, or None for
    payloads outside the lossless subset (lossy VP8 needs a perceptual
    codec) or malformed bytes."""
    try:
        body = find_vp8l_chunk(payload)
        if body is None or not body or body[0] != 0x2F:
            return None
        br = _BitReader(body, 8)
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:
            return None  # version
        # transforms, recorded in read order
        transforms: list[tuple] = []
        seen = set()
        packed_w = w
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("vp8l: repeated transform")
            seen.add(t)
            if t == 0:  # predictor
                bits = br.read(3) + 2
                mw, mh = -(-packed_w // (1 << bits)), -(-h // (1 << bits))
                modes = _decode_image(br, mw, mh, False)[:, :, 2]  # green
                transforms.append(("pred", bits, modes))
            elif t == 1:  # color transform
                bits = br.read(3) + 2
                mw, mh = -(-packed_w // (1 << bits)), -(-h // (1 << bits))
                tf = _decode_image(br, mw, mh, False)
                transforms.append(("color", bits, tf))
            elif t == 2:  # subtract green
                transforms.append(("subgreen",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image(br, n_colors, 1, False)[0].astype(np.int64)
                pal = np.cumsum(pal, axis=0) & 0xFF  # delta-coded palette
                if n_colors <= 2:
                    packed_w = -(-w // 8)
                elif n_colors <= 4:
                    packed_w = -(-w // 4)
                elif n_colors <= 16:
                    packed_w = -(-w // 2)
                transforms.append(("palette", pal.astype(np.uint8)))

        px = _decode_image(br, packed_w, h, True)
        for tr in reversed(transforms):
            if tr[0] == "palette":
                px = _inv_color_index(px, tr[1], w)
            elif tr[0] == "subgreen":
                px = _inv_subtract_green(px)
            elif tr[0] == "color":
                px = _inv_color_transform(px, tr[2].astype(np.int64), tr[1])
            else:
                px = _inv_predictor(px, tr[2], tr[1])
        # ARGB planes → RGBA
        return np.stack([px[:, :, 1], px[:, :, 2], px[:, :, 3], px[:, :, 0]], axis=2)
    except (ValueError, IndexError, struct.error):
        return None


# ---------------------------------------------------------------------------
# subset encoder (engine fixtures)
# ---------------------------------------------------------------------------


def _write_huffman_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a huffman code (simple when possible) and return the symbol →
    (code, length) table for payload writing."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(s <= 255 for s in nz):
        bw.write(1, 1)                       # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}
    bw.write(0, 1)                           # code-length-coded
    last_nz = max(nz) + 1
    trimmed = lengths[:last_nz]
    cl_freq = [0] * 19
    for ln in trimmed:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    # num_codes covers every cl symbol we actually use, in _CL_ORDER
    used = {s for s, ln in enumerate(cl_lengths) if ln > 0}
    num_codes = max(max(_CL_ORDER.index(s) for s in used) + 1, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    # max-symbol shortcut: stop after the last nonzero length
    bw.write(1, 1)
    length_nbits_code = 0
    while 2 + (1 << (2 + 2 * length_nbits_code)) - 1 < last_nz and length_nbits_code < 7:
        length_nbits_code += 1
    bw.write(length_nbits_code, 3)
    bw.write(last_nz - 2, 2 + 2 * length_nbits_code)
    for ln in trimmed:
        c, cl = cl_codes[ln]
        _write_code(bw, c, cl)
    return _canonical_codes(lengths)


def make_webp_lossless(
    pixels: np.ndarray, use_subtract_green: bool = False, use_lz77: bool = True
) -> bytes:
    """Encode (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 as a real
    VP8L lossless WebP: run-length LZ77 (distance 1), per-image canonical
    Huffman codes, optional subtract-green transform.  Bit-exact by
    construction — the decoder recovers every pixel."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.dtype != np.uint8 or px.shape[2] not in (1, 3, 4):
        raise ValueError("make_webp_lossless expects uint8 (H,W[,C])")
    h, w = px.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    if px.shape[2] == 3:
        px = np.concatenate([px, np.full((h, w, 1), 255, np.uint8)], axis=2)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    a = px[:, :, 3].astype(np.int64)
    if use_subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    argb = (a << 24) | (r << 16) | (g << 8) | b
    flat = argb.reshape(-1)
    n = flat.shape[0]

    # tokenize: literals + distance-1 runs
    tokens: list[tuple] = []  # ("lit", i) | ("copy", length)
    g_freq = [0] * (_GREEN_LIT + _LEN_CODES)
    r_freq, b_freq, a_freq = [0] * 256, [0] * 256, [0] * 256
    d_freq = [0] * 40
    i = 0
    while i < n:
        run = 0
        if use_lz77 and i > 0:
            while i + run < n and flat[i + run] == flat[i - 1] and run < 4096:
                run += 1
        if run >= 3:
            sym, _ebv, _ebc = _prefix_encode(run)
            g_freq[256 + sym] += 1
            dsym, _dv, _dc = _prefix_encode(121)  # dist 1 → code 121
            d_freq[dsym] += 1
            tokens.append(("copy", run))
            i += run
        else:
            v = int(flat[i])
            g_freq[(v >> 8) & 0xFF] += 1
            r_freq[(v >> 16) & 0xFF] += 1
            b_freq[v & 0xFF] += 1
            a_freq[(v >> 24) & 0xFF] += 1
            tokens.append(("lit", v))
            i += 1

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if use_subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform: subtract green
    bw.write(0, 1)      # no more transforms
    bw.write(0, 1)      # no color cache
    bw.write(0, 1)      # no meta huffman

    def lens(freqs: list[int]) -> list[int]:
        if not any(freqs):  # unused alphabet still needs a (dummy) code
            freqs = [1] + freqs[1:]
        return _huffman_lengths(freqs)

    g_codes = _write_huffman_code(bw, lens(g_freq))
    r_codes = _write_huffman_code(bw, lens(r_freq))
    b_codes = _write_huffman_code(bw, lens(b_freq))
    a_codes = _write_huffman_code(bw, lens(a_freq))
    d_codes = _write_huffman_code(bw, lens(d_freq))

    for kind, v in tokens:
        if kind == "lit":
            c, ln = g_codes[(v >> 8) & 0xFF]
            _write_code(bw, c, ln)
            c, ln = r_codes[(v >> 16) & 0xFF]
            _write_code(bw, c, ln)
            c, ln = b_codes[v & 0xFF]
            _write_code(bw, c, ln)
            c, ln = a_codes[(v >> 24) & 0xFF]
            _write_code(bw, c, ln)
        else:
            sym, ebv, ebc = _prefix_encode(v)
            c, ln = g_codes[256 + sym]
            _write_code(bw, c, ln)
            bw.write(ebv, ebc)
            dsym, dbv, dbc = _prefix_encode(121)
            c, ln = d_codes[dsym]
            _write_code(bw, c, ln)
            bw.write(dbv, dbc)

    body = bytes([0x2F]) + bw.bytes()[1:]
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
