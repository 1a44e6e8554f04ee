"""WebP-lossless (VP8L) codec: encoder round trips, and hand-built
bitstreams for every decoder path the subset encoder does not emit —
color cache, meta Huffman groups, predictor / color / color-indexing
transforms, neighbor distance codes — plus container negatives and the
multimodal dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wordspell_spark.operators import multimodal as MM
from wordspell_spark.operators import webp as W


def _rt(px, **kw):
    blob = W.make_webp_lossless(px, **kw)
    dec = W.decode_webp_pixels(blob)
    assert dec is not None
    src = px
    if src.ndim == 2:
        src = src[:, :, None]
    if src.shape[2] == 1:
        src = np.repeat(src, 3, axis=2)
    if src.shape[2] == 3:
        src = np.concatenate([src, np.full((*src.shape[:2], 1), 255, np.uint8)], 2)
    assert np.array_equal(dec, src)
    return blob


GRAD = np.stack(
    [(np.mgrid[0:23, 0:31][1] * 5) % 256,
     (np.mgrid[0:23, 0:31][0] * 7) % 256,
     ((np.mgrid[0:23, 0:31][0] + np.mgrid[0:23, 0:31][1]) * 3) % 256],
    axis=2,
).astype(np.uint8)


class TestEncoderRoundTrip:
    def test_flat_compresses(self):
        blob = _rt(np.full((16, 24), 78, np.uint8))
        assert len(blob) < 16 * 24  # LZ77 runs collapse the flat image

    def test_gradient_rgb(self):
        _rt(GRAD)

    def test_subtract_green_transform(self):
        blob = _rt(GRAD, use_subtract_green=True)
        assert W.decode_webp_pixels(blob) is not None

    def test_no_lz77(self):
        _rt(GRAD, use_lz77=False)

    def test_rgba_alpha_carried(self):
        rgba = np.dstack([GRAD, ((np.mgrid[0:23, 0:31][1] * 11) % 256).astype(np.uint8)])
        dec = W.decode_webp_pixels(W.make_webp_lossless(rgba))
        assert np.array_equal(dec, rgba)

    def test_noise_survives(self):
        rng = np.random.default_rng(9)
        _rt(rng.integers(0, 256, (17, 19, 3)).astype(np.uint8))

    def test_1x1(self):
        _rt(np.array([[123]], np.uint8))

    def test_bad_inputs(self):
        with pytest.raises(ValueError):
            W.make_webp_lossless(np.zeros((4, 4), np.int32))


class TestContainer:
    def test_not_webp(self):
        assert W.decode_webp_pixels(b"not webp") is None
        assert W.decode_webp_pixels(b"") is None

    def test_lossy_vp8_declined(self):
        lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBPVP8 " + struct.pack("<I", 4) + b"\x00" * 4
        assert W.decode_webp_pixels(lossy) is None

    def test_vp8l_inside_vp8x(self):
        # extended container: VP8X chunk first, VP8L after — chunk walk finds it
        blob = W.make_webp_lossless(np.full((4, 4), 10, np.uint8))
        vp8l_off = blob.find(b"VP8L")
        vp8l = blob[vp8l_off:]
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        body = b"WEBP" + vp8x + vp8l
        wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
        dec = W.decode_webp_pixels(wrapped)
        assert dec is not None and (dec[:, :, 0] == 10).all()

    def test_truncated(self):
        blob = W.make_webp_lossless(GRAD)
        assert W.decode_webp_pixels(blob[: len(blob) // 2]) is None


# ---------------------------------------------------------------------------
# hand-built streams for decoder-only paths
# ---------------------------------------------------------------------------


def _emit_literal_image(bw, argb_pixels):
    """cache-off literal-only entropy-coded image (sub-image framing: the
    caller writes the meta bit when this is the main image)."""
    bw.write(0, 1)  # no color cache
    g = [0] * 280
    r = [0] * 256
    b = [0] * 256
    a = [0] * 256
    d = [0] * 40
    for px in argb_pixels:
        g[(px >> 8) & 0xFF] += 1
        r[(px >> 16) & 0xFF] += 1
        b[px & 0xFF] += 1
        a[(px >> 24) & 0xFF] += 1

    def lens(f):
        if not any(f):
            f = [1] + f[1:]
        return W._huffman_lengths(f)

    gc = W._write_huffman_code(bw, lens(g))
    rc = W._write_huffman_code(bw, lens(r))
    bc = W._write_huffman_code(bw, lens(b))
    ac = W._write_huffman_code(bw, lens(a))
    W._write_huffman_code(bw, lens(d))
    for px in argb_pixels:
        for codes, val in (
            (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
            (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
        ):
            c, ln = codes[val]
            W._write_code(bw, c, ln)


def _wrap(body_bits: W._BitWriter) -> bytes:
    body = body_bits.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


class TestDecoderOnlyPaths:
    def test_neighbor_distance_codes(self):
        # 4x3: row 0 literal, rows 1-2 one backref of length 8 at distance
        # code 1 → neighbor (0,1) → dist = xsize = 4 (row-above copy)
        w, h = 4, 3
        row0 = [_argb(255, 10 * i, 20 * i, 5 * i) for i in range(w)]
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        g = [0] * 280
        r = [0] * 256
        b = [0] * 256
        a = [0] * 256
        d = [0] * 40
        for px in row0:
            g[(px >> 8) & 0xFF] += 1
            r[(px >> 16) & 0xFF] += 1
            b[px & 0xFF] += 1
            a[(px >> 24) & 0xFF] += 1
        len_sym, len_ebv, len_ebc = W._prefix_encode(8)
        g[256 + len_sym] += 1
        dist_sym, dist_ebv, dist_ebc = W._prefix_encode(1)  # dist_code 1
        d[dist_sym] += 1

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        gc = W._write_huffman_code(bw, lens(g))
        rc = W._write_huffman_code(bw, lens(r))
        bc = W._write_huffman_code(bw, lens(b))
        ac = W._write_huffman_code(bw, lens(a))
        dc = W._write_huffman_code(bw, lens(d))
        for px in row0:
            for codes, val in (
                (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
            ):
                c, ln = codes[val]
                W._write_code(bw, c, ln)
        c, ln = gc[256 + len_sym]
        W._write_code(bw, c, ln)
        bw.write(len_ebv, len_ebc)
        c, ln = dc[dist_sym]
        W._write_code(bw, c, ln)
        bw.write(dist_ebv, dist_ebc)

        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None and dec.shape == (3, 4, 4)
        for y in range(3):
            for x in range(4):
                px = row0[x]
                assert tuple(dec[y, x]) == (
                    (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, px >> 24)

    def test_color_cache(self):
        # literal P, cache-hit P, literal Q, cache-hit Q (cache_bits=4)
        cache_bits = 4
        P = _argb(255, 1, 2, 3)
        Q = _argb(255, 9, 8, 7)
        hp = (0x1E35A7BD * P & 0xFFFFFFFF) >> (32 - cache_bits)
        hq = (0x1E35A7BD * Q & 0xFFFFFFFF) >> (32 - cache_bits)
        assert hp != hq
        w, h = 4, 1
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)             # no transforms
        bw.write(1, 1)             # cache on
        bw.write(cache_bits, 4)
        bw.write(0, 1)             # no meta
        size = 280 + (1 << cache_bits)
        g = [0] * size
        g[2] += 1
        g[8] += 1
        g[280 + hp] += 1
        g[280 + hq] += 1
        r = [0] * 256
        r[1] += 1
        r[9] += 1
        b = [0] * 256
        b[3] += 1
        b[7] += 1
        a = [0] * 256
        a[255] += 2

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        gc = W._write_huffman_code(bw, lens(g))
        rc = W._write_huffman_code(bw, lens(r))
        bc = W._write_huffman_code(bw, lens(b))
        ac = W._write_huffman_code(bw, lens(a))
        W._write_huffman_code(bw, lens([0] * 40))
        for px, hit in ((P, hp), (None, hp), (Q, hq), (None, hq)):
            if px is not None:
                for codes, val in (
                    (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                    (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
                ):
                    c, ln = codes[val]
                    W._write_code(bw, c, ln)
            else:
                c, ln = gc[280 + hit]
                W._write_code(bw, c, ln)
        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None
        assert tuple(dec[0, 0]) == tuple(dec[0, 1]) == (1, 2, 3, 255)
        assert tuple(dec[0, 2]) == tuple(dec[0, 3]) == (9, 8, 7, 255)

    def test_predictor_transform_mode_T(self):
        # one 4x4 block, mode 2 (top): residual rows of zeros replicate row 0
        w, h = 4, 3
        target = np.zeros((h, w, 4), np.int64)  # ARGB
        for x in range(w):
            target[:, x] = [255, 3 * x, 7 * x, 11 * x]
        res = []
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0])
                elif y == 0:
                    pred = target[0, x - 1]  # first row: forced L
                elif x == 0:
                    pred = target[y - 1, 0]  # first column: forced T
                else:
                    pred = target[y - 1, x]  # block mode 2 = T
                delta = (target[y, x] - pred) & 0xFF
                res.append(_argb(*[int(v) for v in delta]))
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # predictor
        bw.write(0, 3)  # bits = 2 → 4x4 blocks → 1x1 mode image
        _emit_literal_image(bw, [_argb(255, 0, 2, 0)])  # mode 2 in green
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)  # main: no color cache
        bw.write(0, 1)  # main: no meta
        g = [0] * 280
        r = [0] * 256
        b = [0] * 256
        a = [0] * 256
        for px in res:
            g[(px >> 8) & 0xFF] += 1
            r[(px >> 16) & 0xFF] += 1
            b[px & 0xFF] += 1
            a[(px >> 24) & 0xFF] += 1

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        gc = W._write_huffman_code(bw, lens(g))
        rc = W._write_huffman_code(bw, lens(r))
        bc = W._write_huffman_code(bw, lens(b))
        ac = W._write_huffman_code(bw, lens(a))
        W._write_huffman_code(bw, lens([0] * 40))
        for px in res:
            for codes, val in (
                (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
            ):
                c, ln = codes[val]
                W._write_code(bw, c, ln)
        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None
        want = np.stack(
            [target[:, :, 1], target[:, :, 2], target[:, :, 3], target[:, :, 0]],
            axis=2,
        ).astype(np.uint8)
        assert np.array_equal(dec, want)

    def test_color_indexing_packed(self):
        # 3-color palette → 2-bit packed indices, w=10 → packed_w=3
        w, h = 10, 2
        palette = [_argb(255, 200, 10, 30), _argb(255, 0, 255, 0), _argb(255, 5, 5, 250)]
        idx = [[0, 1, 2, 1, 0, 2, 2, 1, 0, 0], [2, 2, 0, 0, 1, 1, 2, 0, 1, 2]]
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(3, 2)       # color indexing
        bw.write(len(palette) - 1, 8)
        deltas = []
        prev = 0
        for p in palette:    # palette stream is delta-coded per channel
            d = ((p & 0xFF) - (prev & 0xFF)) & 0xFF
            d |= ((((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
            d |= ((((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
            d |= ((((p >> 24) & 0xFF) - ((prev >> 24) & 0xFF)) & 0xFF) << 24
            deltas.append(d)
            prev = p
        _emit_literal_image(bw, deltas)
        bw.write(0, 1)       # no more transforms
        # packed main image: 4 indices per green byte, 2 bits each, LSB first
        packed_rows = []
        for row in idx:
            prow = []
            for i in range(0, w, 4):
                byte = 0
                for k, v in enumerate(row[i : i + 4]):
                    byte |= v << (2 * k)
                prow.append(_argb(255, 0, byte, 0))
            packed_rows.extend(prow)
        bw.write(0, 1)       # no cache
        bw.write(0, 1)       # no meta
        g = [0] * 280
        r = [0] * 256
        b = [0] * 256
        a = [0] * 256
        for px in packed_rows:
            g[(px >> 8) & 0xFF] += 1
            r[(px >> 16) & 0xFF] += 1
            b[px & 0xFF] += 1
            a[(px >> 24) & 0xFF] += 1

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        gc = W._write_huffman_code(bw, lens(g))
        rc = W._write_huffman_code(bw, lens(r))
        bc = W._write_huffman_code(bw, lens(b))
        ac = W._write_huffman_code(bw, lens(a))
        W._write_huffman_code(bw, lens([0] * 40))
        for px in packed_rows:
            for codes, val in (
                (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
            ):
                c, ln = codes[val]
                W._write_code(bw, c, ln)
        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None and dec.shape == (2, 10, 4)
        for y in range(h):
            for x in range(w):
                p = palette[idx[y][x]]
                assert tuple(dec[y, x]) == (
                    (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, p >> 24)

    def test_meta_huffman_groups(self):
        # 8x1, huffman_bits=2 → two 4px groups with disjoint literal codes
        w, h = 8, 1
        left = [_argb(255, i, 50, 60) for i in range(4)]
        right = [_argb(255, 100 + i, 70, 80) for i in range(4)]
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # meta present
        bw.write(0, 3)  # huffman_bits = 2 → meta image 2x1
        # meta image pixels: group index in (red<<8)|green → groups 0, 1
        _emit_literal_image(bw, [_argb(0, 0, 0, 0), _argb(0, 0, 1, 0)])

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        group_codes = []
        for pix in (left, right):
            g = [0] * 280
            r = [0] * 256
            b = [0] * 256
            a = [0] * 256
            for px in pix:
                g[(px >> 8) & 0xFF] += 1
                r[(px >> 16) & 0xFF] += 1
                b[px & 0xFF] += 1
                a[(px >> 24) & 0xFF] += 1
            gc = W._write_huffman_code(bw, lens(g))
            rc = W._write_huffman_code(bw, lens(r))
            bc = W._write_huffman_code(bw, lens(b))
            ac = W._write_huffman_code(bw, lens(a))
            W._write_huffman_code(bw, lens([0] * 40))
            group_codes.append((gc, rc, bc, ac))
        for x in range(w):
            px = left[x] if x < 4 else right[x - 4]
            gc, rc, bc, ac = group_codes[0 if x < 4 else 1]
            for codes, val in (
                (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
            ):
                c, ln = codes[val]
                W._write_code(bw, c, ln)
        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None
        for x in range(4):
            assert tuple(dec[0, x]) == (x, 50, 60, 255)
            assert tuple(dec[0, 4 + x]) == (100 + x, 70, 80, 255)

    def test_color_transform(self):
        # one block; RFC 9649 packs g2r in the BLUE byte, g2b in GREEN,
        # r2b in RED of the transform pixel (delta = (int8)t*(int8)c >> 5).
        # Asymmetric g2r != r2b so a channel swap cannot cancel out.
        w, h = 2, 1
        bits = 3  # block 8 → single block
        g2r, g2b, r2b = 64, 32, 16
        tf_px = _argb(0, r2b, g2b, g2r)
        final = [(255, 30, 40, 50), (255, 130, 140, 150)]  # (a, r, g, b)

        def ct(t, c):
            t8 = t - 256 if t >= 128 else t
            c8 = c - 256 if c >= 128 else c
            return (t8 * c8) >> 5

        res = []
        for aa, rr, gg, bb in final:
            sr = (rr - ct(g2r, gg)) & 0xFF
            sb = (bb - ct(g2b, gg) - ct(r2b, rr)) & 0xFF
            res.append(_argb(aa, sr, gg, sb))
        bw = W._BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(1, 2)       # color transform
        bw.write(bits - 2, 3)
        _emit_literal_image(bw, [tf_px])
        bw.write(0, 1)       # no more transforms
        bw.write(0, 1)       # no cache
        bw.write(0, 1)       # no meta
        g = [0] * 280
        r = [0] * 256
        b = [0] * 256
        a = [0] * 256
        for px in res:
            g[(px >> 8) & 0xFF] += 1
            r[(px >> 16) & 0xFF] += 1
            b[px & 0xFF] += 1
            a[(px >> 24) & 0xFF] += 1

        def lens(f):
            if not any(f):
                f = [1] + f[1:]
            return W._huffman_lengths(f)

        gc = W._write_huffman_code(bw, lens(g))
        rc = W._write_huffman_code(bw, lens(r))
        bc = W._write_huffman_code(bw, lens(b))
        ac = W._write_huffman_code(bw, lens(a))
        W._write_huffman_code(bw, lens([0] * 40))
        for px in res:
            for codes, val in (
                (gc, (px >> 8) & 0xFF), (rc, (px >> 16) & 0xFF),
                (bc, px & 0xFF), (ac, (px >> 24) & 0xFF),
            ):
                c, ln = codes[val]
                W._write_code(bw, c, ln)
        dec = W.decode_webp_pixels(_wrap(bw))
        assert dec is not None
        for x, (aa, rr, gg, bb) in enumerate(final):
            assert tuple(dec[0, x]) == (rr, gg, bb, aa)


class TestMultimodalDispatch:
    def test_decode_pixels_routes_webp(self):
        blob = W.make_webp_lossless(np.full((8, 8), 90, np.uint8))
        px = MM.decode_pixels(blob)
        assert px is not None and (px[:, :, 0] == 90).all()

    def test_pixel_features_real_for_webp(self):
        f = MM.pixel_features(W.make_webp_lossless(np.full((16, 16), 120, np.uint8)))
        assert f is not None
        assert abs(float(f[0]) - 120 / 255) < 1e-6 and float(f[1]) < 1e-9
