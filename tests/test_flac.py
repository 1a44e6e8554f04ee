"""FLAC codec: pure-python lossless round trips (constant / fixed+rice /
verbatim / LPC / mid-side), partitioned-rice unit coverage, CRC rejection,
and the audio-operator integration (real features + transcode-resample)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from wordspell_spark.operators import audio as A
from wordspell_spark.operators import flac as FL


def _rt(s, **kw):
    bits = kw.pop("bits", 16)
    blob = FL.make_flac(s, rate=kw.pop("rate", 8000), bits=bits, **kw)
    dec = FL.decode_flac(blob)
    assert dec is not None
    s2, rate, b = dec
    src = s if s.ndim == 2 else s[:, None]
    assert b == bits
    assert np.array_equal(src, s2)
    return blob


SMOOTH = (3000 * np.sin(np.arange(1000) / 30)).astype(np.int64)


class TestRoundTrip:
    def test_constant(self):
        _rt(np.full(500, -1234, np.int64))

    def test_fixed_predictors_compress(self):
        blob = _rt(SMOOTH)
        assert len(blob) < 1000 * 2 / 3  # genuinely compressed vs raw PCM

    def test_noisy_verbatim(self):
        rng = np.random.default_rng(1)
        _rt(rng.integers(-30000, 30000, 777).astype(np.int64))

    def test_stereo_independent(self):
        _rt(np.stack([SMOOTH, SMOOTH // 2 + 7], axis=1))

    @pytest.mark.parametrize("delta", [0, 1])  # even and odd l+r parity
    def test_mid_side(self, delta):
        _rt(np.stack([SMOOTH, SMOOTH + delta], axis=1), stereo_mode="mid_side")

    def test_lpc_path(self):
        _rt(SMOOTH, use_lpc=True)
        _rt(np.stack([SMOOTH, SMOOTH - 3], axis=1), stereo_mode="mid_side", use_lpc=True)

    @pytest.mark.parametrize("bits,scale", [(8, 100), (16, 1), (24, 1000)])
    def test_bit_depths(self, bits, scale):
        s = (SMOOTH // 100 if bits == 8 else SMOOTH * scale).astype(np.int64)
        _rt(s, bits=bits)

    def test_multi_frame(self):
        blob = _rt(SMOOTH, block_size=128)
        blob_one = _rt(SMOOTH, block_size=4096)
        assert blob != blob_one  # genuinely different framings, same samples

    def test_square_wave(self):
        sq = np.empty(96, np.int64)
        sq[::2], sq[1::2] = 7000, -7000
        _rt(sq)

    def test_four_channels(self):
        _rt(np.stack([SMOOTH, SMOOTH + 1, SMOOTH // 3, -SMOOTH], axis=1))

    def test_streaminfo_md5_is_spec_md5(self):
        import hashlib

        s = SMOOTH.astype(np.int64)
        blob = FL.make_flac(s, bits=16)
        want = hashlib.md5(s.astype("<i2").tobytes()).digest()
        assert blob[8 + 18 : 8 + 34] == want  # STREAMINFO bytes 18..34


class TestRejection:
    def test_not_flac(self):
        assert FL.decode_flac(b"not flac") is None
        assert FL.decode_flac(b"") is None
        assert FL.decode_flac(b"fLaC" + b"\x00" * 50) is None

    def test_corrupt_frame_crc(self):
        blob = bytearray(FL.make_flac(SMOOTH))
        blob[60] ^= 0xFF
        assert FL.decode_flac(bytes(blob)) is None

    def test_corrupt_header_crc(self):
        blob = bytearray(FL.make_flac(SMOOTH))
        # frame header starts right after fLaC + 4 + 34 metadata bytes
        blob[42 + 2] ^= 0x01  # blocksize/rate nibble
        assert FL.decode_flac(bytes(blob)) is None

    def test_truncated(self):
        blob = FL.make_flac(SMOOTH)
        assert FL.decode_flac(blob[: len(blob) // 2]) is None

    def test_out_of_range_samples_raise(self):
        with pytest.raises(ValueError):
            FL.make_flac(np.array([40000]), bits=16)

    def test_bad_modes_raise(self):
        with pytest.raises(ValueError):
            FL.make_flac(SMOOTH, bits=12)
        with pytest.raises(ValueError):
            FL.make_flac(SMOOTH, stereo_mode="mid_side")  # mono


class TestPartitionedRice:
    """The encoder emits partition order 0; real encoders emit more — decode
    coverage for po>0 and escape partitions is pinned at the unit level."""

    def _decode_bits(self, write, n, order):
        bw = FL._BitWriter()
        write(bw)
        bw.align()
        return FL._read_residual(FL._BitReader(bw.bytes()), n, order)

    def test_four_partitions(self):
        res = np.array([3, -1, 4, -1, 5, -9, 2, -6], dtype=np.int64)

        def write(bw):
            bw.write(0, 2)   # 4-bit rice
            bw.write(2, 4)   # partition order 2 -> 4 partitions of 2
            for p in range(4):
                part = res[p * 2 : p * 2 + 2]
                bw.write(3, 4)
                FL._rice_encode(bw, part, 3)

        got = self._decode_bits(write, 8, 0)
        assert np.array_equal(got, res)

    def test_escape_partition_raw(self):
        res = np.array([1000, -1000, 7, -7], dtype=np.int64)

        def write(bw):
            bw.write(0, 2)
            bw.write(1, 4)   # 2 partitions of 2
            bw.write(15, 4)  # escape
            bw.write(12, 5)  # 12 raw bits
            bw.write_signed(1000, 12)
            bw.write_signed(-1000, 12)
            bw.write(2, 4)   # normal rice partition
            FL._rice_encode(bw, res[2:], 2)

        got = self._decode_bits(write, 4, 0)
        assert np.array_equal(got, res)

    def test_five_bit_params(self):
        res = np.array([123456, -123456], dtype=np.int64)

        def write(bw):
            bw.write(1, 2)   # 5-bit rice
            bw.write(0, 4)
            bw.write(16, 5)  # param 16 (needs 5 bits)
            FL._rice_encode(bw, res, 16)

        got = self._decode_bits(write, 2, 0)
        assert np.array_equal(got, res)

    def test_first_partition_skips_warmup(self):
        # order-1 predictor: first partition has one fewer residual
        res = np.array([5, -5, 6], dtype=np.int64)

        def write(bw):
            bw.write(0, 2)
            bw.write(1, 4)   # 2 partitions of 2; first carries 1 residual
            bw.write(3, 4)
            FL._rice_encode(bw, res[:1], 3)
            bw.write(3, 4)
            FL._rice_encode(bw, res[1:], 3)

        got = self._decode_bits(write, 4, 1)
        assert np.array_equal(got, res)


class TestAudioIntegration:
    def test_features_real_for_flac(self):
        # RMS of a ±A square wave == A/32768, recovered exactly
        amp = 9000
        sq = np.empty(128, np.int64)
        sq[::2], sq[1::2] = amp, -amp
        f = A.wav_features(FL.make_flac(sq, rate=8000, bits=16))
        assert f is not None
        assert round(float(f[1]) * 32768) == amp
        assert round(float(f[3]) * 10000) == round(127 / 127 * 10000)  # zcr 1.0
        assert abs(float(f[4])) < 1e-12  # dc 0

    def test_decode_audio_samples_dispatch(self):
        sq = np.arange(64, dtype=np.int64) * 100 - 3000
        for payload in (A.make_wav(sq.astype(np.int16)), FL.make_flac(sq)):
            s, rate, bits = A.decode_audio_samples(payload)
            assert np.array_equal(s.ravel(), sq)
        assert A.decode_audio_samples(b"mp3 junk") is None

    def test_resample_transcodes_flac_to_wav(self):
        sq = (1000 * np.sin(np.arange(400) / 10)).astype(np.int64)
        out = A.resample_wav(FL.make_flac(sq, rate=8000), 4000)
        assert out is not None
        s2, rate, bits = A.decode_wav(out)
        assert rate == 4000 and abs(s2.shape[0] - 200) <= 1

    def test_metadata_df_flac_real_features(self, spark):
        from pyspark.sql import functions as F

        @F.pandas_udf("binary")
        def payload_udf(doc_id: pd.Series) -> pd.Series:
            out = []
            for d in doc_id:
                d = int(d)
                amp = (d % 7 + 1) * 1000
                sq = np.empty(64, np.int64)
                sq[::2], sq[1::2] = amp, -amp
                out.append(FL.make_flac(sq, rate=16000, bits=16,
                                        use_lpc=d % 2 == 0))
            return pd.Series(out)

        df = spark.range(8).select(F.col("id").alias("doc_id"),
                                   payload_udf(F.col("id")).alias("payload"))
        rows = {r["doc_id"]: r for r in A.audio_metadata(df).collect()}
        for d in range(8):
            r = rows[d]
            assert r["format"] == "flac" and r["sample_rate"] == 16000
            assert r["n_frames"] == 64
            assert round(r["features"][1] * 32768) == (d % 7 + 1) * 1000
