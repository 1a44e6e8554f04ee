"""Audio modality: real WAV/PCM path, header-real compressed containers,
declared-fake tier, and the Spark plumbing rules (one Arrow pass, binary
never shuffled)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from wordspell_spark.operators import audio as A


def _make_flac(rate, ch, bits, total):
    v = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    info = bytes(10) + v.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info


class TestWavRoundTrip:
    @pytest.mark.parametrize("bits,dtype,lo,hi", [
        (8, np.uint8, 0, 256),
        (16, np.int16, -30000, 30000),
        (32, np.int32, -(2**30), 2**30),
    ])
    @pytest.mark.parametrize("ch", [1, 2, 4])
    def test_bit_exact(self, bits, dtype, lo, hi, ch):
        rng = np.random.default_rng(bits * 10 + ch)
        s = rng.integers(lo, hi, size=(777, ch)).astype(dtype)
        dec = A.decode_wav(A.make_wav(s, rate=22050, bits=bits))
        assert dec is not None
        s2, rate, b = dec
        assert (rate, b) == (22050, bits)
        assert np.array_equal(s, s2)

    def test_odd_data_length_pads_even(self):
        s = np.arange(99, dtype=np.uint8)
        payload = A.make_wav(s, rate=8000, bits=8)
        assert len(payload) % 2 == 0
        s2, _, _ = A.decode_wav(payload)
        assert np.array_equal(s[:, None], s2)

    def test_extra_chunks_tolerated(self):
        s = np.arange(-50, 50, dtype=np.int16)
        p = A.make_wav(s, rate=8000)
        # splice a LIST chunk between fmt and data
        fmt_end = p.index(b"data")
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = p[:fmt_end] + extra + p[fmt_end:]
        spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        s2, rate, bits = A.decode_wav(spliced)
        assert np.array_equal(s[:, None], s2)

    @pytest.mark.parametrize("bad", [
        b"", b"RIFF", b"RIFFxxxxWAVE",                      # truncated
        b"RIFF\x00\x00\x00\x00AVI ",                        # wrong form
        b"\x89PNG\r\n\x1a\n" + bytes(40),                   # an image
    ])
    def test_non_wav_returns_none(self, bad):
        assert A.decode_wav(bad) is None

    def test_float_pcm_rejected(self):
        s = np.arange(10, dtype=np.int16)
        p = bytearray(A.make_wav(s, rate=8000))
        p[20:22] = struct.pack("<H", 3)  # WAVE_FORMAT_IEEE_FLOAT
        assert A.decode_wav(bytes(p)) is None


class TestFeatures:
    def test_square_wave_exact(self):
        amp = 12800
        sq = np.empty(64, dtype=np.int16)
        sq[::2], sq[1::2] = amp, -amp
        f = A.wav_features(A.make_wav(sq, rate=8000))
        assert f[1] == pytest.approx(amp / 32768, abs=1e-7)  # rms
        assert f[2] == pytest.approx(amp / 32768, abs=1e-7)  # peak
        assert f[3] == 1.0                                   # zcr
        assert abs(f[4]) < 1e-9                              # dc (n even)
        assert f[0] == pytest.approx(64 / 8000)
        assert (f[6], f[7]) == (1.0, 0.5)

    def test_dc_signal_exact(self):
        v = -6400
        f = A.wav_features(A.make_wav(np.full(80, v, dtype=np.int16), rate=8000))
        assert f[1] == pytest.approx(abs(v) / 32768, abs=1e-7)
        assert f[4] == pytest.approx(v / 32768, abs=1e-7)
        assert f[3] == 0.0

    def test_8bit_normalization(self):
        # constant 128 == exactly zero on the normalized scale
        f = A.wav_features(A.make_wav(np.full(40, 128, dtype=np.uint8), rate=8000, bits=8))
        assert f[1] == 0.0 and f[4] == 0.0

    def test_fake_tier_deterministic_and_marked(self):
        f1 = A._audio_features(b"definitely not audio")
        f2 = A._audio_features(b"definitely not audio")
        assert np.array_equal(f1, f2) and f1.shape == (A.AUDIO_FEATURE_DIM,)
        assert A.wav_features(b"definitely not audio") is None


class TestCompressedHeaders:
    def test_flac_streaminfo(self):
        assert A.decode_audio_header(_make_flac(96000, 8, 24, 7)) == (96000, 8, 24, 7, "flac")
        assert A.decode_audio_header(_make_flac(44100, 1, 16, 0)) == (44100, 1, 16, -1, "flac")

    def test_flac_wrong_first_block_rejected(self):
        bad = b"fLaC" + bytes([0x84]) + (34).to_bytes(3, "big") + bytes(34)
        assert A.decode_audio_header(bad) is None

    def test_mp3_with_and_without_id3(self):
        frame = bytes([0xFF, 0xFB, 0x90, 0xC0])  # MPEG1 L3 44.1kHz mono
        assert A.decode_audio_header(frame + bytes(32)) == (44100, 1, -1, -1, "mp3")
        id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10])
        assert A.decode_audio_header(id3 + bytes(10) + frame) == (44100, 1, -1, -1, "mp3")
        stereo_v2 = bytes([0xFF, 0xF3, 0x94, 0x00])  # MPEG2, 24kHz, stereo
        assert A.decode_audio_header(stereo_v2) == (24000, 2, -1, -1, "mp3")

    def test_mp3_id3_footer_and_padding(self):
        # ID3v2.4 footer flag (0x10): the first frame starts 10 bytes past
        # the computed tag end (r5 fix — it previously degraded to the
        # md5-fake tier); and tags padded past their declared size are
        # recovered by the bounded sync scan
        frame = bytes([0xFF, 0xFB, 0x90, 0xC0])
        footered = b"ID3" + bytes([4, 0, 0x10, 0, 0, 0, 10]) + bytes(10) + bytes(10) + frame
        assert A.decode_audio_header(footered) == (44100, 1, -1, -1, "mp3")
        padded = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + bytes(10) + bytes(37) + frame
        assert A.decode_audio_header(padded) == (44100, 1, -1, -1, "mp3")
        # but untagged payloads still require the sync at byte 0 — garbage
        # with an embedded 0xFFE must NOT alias as mp3
        garbage = bytes(64) + frame
        assert A.decode_audio_header(garbage) is None

    def test_mp3_v25_and_reserved_version(self):
        # MPEG2.5 uses its own rate table (half of V2), and the reserved
        # version code 0b01 is not a valid frame at all
        v25 = bytes([0xFF, 0xE3, 0x90, 0xC0])  # MPEG2.5 L3, rate idx 0 → 11025
        assert A.decode_audio_header(v25) == (11025, 1, -1, -1, "mp3")
        reserved = bytes([0xFF, 0xEB, 0x90, 0xC0])
        assert A.decode_audio_header(reserved) is None

    def test_ogg_vorbis_ident(self):
        ogg = (b"OggS" + bytes(24) + b"\x01vorbis" + bytes(4) + bytes([2])
               + struct.pack("<I", 48000) + bytes(16))
        assert A.decode_audio_header(ogg) == (48000, 2, -1, -1, "ogg")

    def test_garbage_none(self):
        assert A.decode_audio_header(b"") is None
        assert A.decode_audio_header(b"\xff\x00\x00\x00") is None


class TestResample:
    def test_constant_signal_any_ratio(self):
        p = A.make_wav(np.full(100, 777, dtype=np.int16), rate=8000)
        for new_rate in (4000, 16000, 11025):
            s2, rate, _ = A.decode_wav(A.resample_wav(p, new_rate))
            assert rate == new_rate
            assert np.all(s2 == 777)
            assert s2.shape[0] == int(round(100 * new_rate / 8000))

    def test_matches_np_interp(self):
        rng = np.random.default_rng(9)
        s = rng.integers(-20000, 20000, size=(200, 2)).astype(np.int16)
        p = A.make_wav(s, rate=10000)
        s2, rate, _ = A.decode_wav(A.resample_wav(p, 5000))
        old_t = np.arange(200) / 10000.0
        new_t = np.arange(100) / 5000.0
        for c in range(2):
            want = np.clip(np.rint(np.interp(new_t, old_t, s[:, c] / 32768.0) * 32768.0),
                           -32768, 32767).astype(np.int16)
            assert np.array_equal(s2[:, c], want)

    def test_non_pcm_returns_none(self):
        assert A.resample_wav(b"mpeg junk", 8000) is None


class TestSparkPlumbing:
    def test_audio_metadata_end_to_end(self, spark):
        from pyspark.sql import functions as F

        @F.pandas_udf("binary")
        def wav_udf(doc_id: pd.Series) -> pd.Series:
            out = []
            for d in doc_id:
                d = int(d)
                if d % 3 == 2:
                    out.append(b"not audio %d" % d)
                else:
                    n = (d % 5 + 2) * 8
                    s = np.full(n, (d * 7) % 100 * 256, dtype=np.int16)
                    out.append(A.make_wav(s, rate=8000, bits=16))
            return pd.Series(out)

        df = spark.range(30).select(F.col("id").alias("doc_id"),
                                    wav_udf(F.col("id")).alias("payload"))
        meta = A.audio_metadata(df).collect()
        by_id = {r["doc_id"]: r for r in meta}
        assert len(by_id) == 30
        for d in range(30):
            r = by_id[d]
            if d % 3 == 2:
                assert r["format"] == "unknown" and r["sample_rate"] == -1
            else:
                assert r["format"] == "wav"
                assert r["sample_rate"] == 8000 and r["bits"] == 16
                assert r["n_frames"] == (d % 5 + 2) * 8
                v = (d * 7) % 100 * 256
                assert round(r["features"][1] * 32768) == v  # rms of DC == v
        # plumbing rule: exactly one Arrow pass, no exchange of the payload
        plan = A.audio_metadata(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") <= 1
        assert "Exchange" not in plan.split("MapInPandas")[0]

    def test_resample_audio_flags_non_pcm(self, spark):
        from pyspark.sql import functions as F

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            return pd.Series([
                A.make_wav(np.full(64, 5000, dtype=np.int16), rate=8000)
                if int(d) % 2 == 0 else b"opaque blob"
                for d in doc_id
            ])

        df = spark.range(10).select(F.col("id").alias("doc_id"),
                                    payload_udf(F.col("id")).alias("payload"))
        rows = A.resample_audio(df, 16000).collect()
        for r in rows:
            if r["doc_id"] % 2 == 0:
                assert r["resampled"] is True
                s2, rate, _ = A.decode_wav(bytes(r["payload"]))
                assert rate == 16000 and s2.shape[0] == 128
            else:
                assert r["resampled"] is False
                assert bytes(r["payload"]) == b"opaque blob"


class TestWavVariants:
    """r4 long-tail WAV variants: IEEE float32 PCM (format 3) and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping PCM/float SubFormats."""

    @staticmethod
    def _wav(fmt_body, data):
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        body += b"data" + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_float32_pcm(self):
        x = (np.sin(np.arange(64) / 5) * 0.5).astype("<f4")
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
        dec = A.decode_wav(self._wav(fmt, x.tobytes()))
        assert dec is not None
        s, rate, bits = dec
        assert (rate, bits, s.shape) == (8000, 32, (64, 1))
        back = s[:, 0].astype(np.float64) / 2147483648.0
        assert np.abs(back - x.astype(np.float64)).max() < 1e-9

    def test_extensible_pcm16(self):
        raw = np.arange(-50, 50, dtype=np.int16)
        sub = struct.pack("<H", 1) + b"\x00" * 14  # PCM SubFormat GUID head
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 0x4) + sub
        dec = A.decode_wav(self._wav(fmt, raw.tobytes()))
        assert dec is not None
        s, rate, bits = dec
        assert rate == 16000 and bits == 16 and np.array_equal(s[:, 0], raw)

    def test_extensible_float(self):
        x = np.linspace(-0.9, 0.9, 32).astype("<f4")
        sub = struct.pack("<H", 3) + b"\x00" * 14
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32)
        fmt += struct.pack("<HHI", 22, 32, 0x4) + sub
        s, rate, bits = A.decode_wav(self._wav(fmt, x.tobytes()))
        assert bits == 32
        assert np.abs(s[:, 0] / 2147483648.0 - x.astype(np.float64)).max() < 1e-9

    def test_compressed_format_still_none(self):
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)  # MP3-in-WAV
        assert A.decode_wav(self._wav(fmt, b"\x00" * 64)) is None

    def test_float_wrong_width_none(self):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # float16: no
        assert A.decode_wav(self._wav(fmt, b"\x00" * 64)) is None
