"""Pure-Python media codecs (core.media_codecs): WAV PCM + netpbm round
trips, strict error paths, and the real-decode branch of the multimodal
operator (round-3 verdict #8)."""

import math
import struct

import pytest

from scrubah_pii_spark.core.media_codecs import (
    MediaDecodeError,
    decode_pnm,
    decode_wav,
    detect_and_decode,
    encode_pgm,
    encode_ppm,
    encode_wav,
)


class TestWav:
    def test_roundtrip_8bit_features(self):
        samples = [0, 64, 128, 192, 255, 128, 128, 128]
        d = decode_wav(encode_wav(samples, rate=8000, bits=8))
        assert d["codec"] == "wav"
        assert d["duration_ms"] == len(samples) * 1000 // 8000
        centered = [s - 128 for s in samples]
        n = len(samples)
        assert d["features"][0] == sum(centered) / (128 * n)
        assert d["features"][1] == math.sqrt(
            sum(c * c for c in centered) / (16384 * n)
        )

    def test_roundtrip_16bit(self):
        samples = [-32768, -1, 0, 1, 32767, 1000]
        d = decode_wav(encode_wav(samples, rate=44100, bits=16))
        n = len(samples)
        assert d["duration_ms"] == n * 1000 // 44100
        assert d["features"][0] == sum(samples) / (32768 * n)

    def test_silence_is_zero(self):
        d = decode_wav(encode_wav([128] * 100, bits=8))
        assert d["features"] == [0.0, 0.0]

    def test_full_scale_square_wave_rms_one(self):
        d = decode_wav(encode_wav([-32768, -32768, -32768] , bits=16))
        assert d["features"][1] == 1.0

    def test_truncated_data_chunk_raises(self):
        b = encode_wav([128] * 10, bits=8)
        with pytest.raises(MediaDecodeError):
            decode_wav(b[:-3])

    def test_non_pcm_raises(self):
        b = bytearray(encode_wav([128] * 4, bits=8))
        # audio_format field lives at offset 20 (RIFF12 + 'fmt '+len 8)
        struct.pack_into("<H", b, 20, 85)  # mp3
        with pytest.raises(MediaDecodeError, match="non-PCM"):
            decode_wav(bytes(b))

    def test_stereo_rejected(self):
        b = bytearray(encode_wav([128] * 4, bits=8))
        struct.pack_into("<H", b, 22, 2)
        with pytest.raises(MediaDecodeError, match="mono"):
            decode_wav(bytes(b))

    def test_empty_data_raises(self):
        with pytest.raises(MediaDecodeError):
            decode_wav(encode_wav([], bits=8))

    def test_odd_chunk_word_alignment(self):
        # a 3-byte LIST chunk before data must be skipped with pad byte
        base = encode_wav([0, 255], bits=8)
        riff, rest = base[:12], base[12:]
        extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
        payload = riff + extra + rest
        d = decode_wav(payload)
        assert len(d["features"]) == 2


class TestPnm:
    def test_ppm_roundtrip_means(self):
        w, h = 3, 2
        raster = bytes(range(w * h * 3))
        d = decode_pnm(encode_ppm(raster, w, h))
        assert (d["codec"], d["width"], d["height"]) == ("ppm", 3, 2)
        n = w * h
        for c in range(3):
            assert d["features"][c] == sum(raster[c::3]) / (255 * n)

    def test_pgm_roundtrip(self):
        raster = bytes([0, 255, 128, 64])
        d = decode_pnm(encode_pgm(raster, 2, 2))
        assert d["codec"] == "pgm"
        assert d["features"] == [sum(raster) / (255 * 4)]

    def test_header_comments_and_whitespace(self):
        raster = bytes([1, 2, 3])
        payload = b"P5\n# a comment\n 3 # widths\n1\n# another\n255\n" + raster
        d = decode_pnm(payload)
        assert (d["width"], d["height"]) == (3, 1)

    def test_truncated_raster_raises(self):
        b = encode_ppm(bytes(18), 3, 2)
        with pytest.raises(MediaDecodeError, match="truncated raster"):
            decode_pnm(b[:-1])

    def test_bad_maxval_raises(self):
        with pytest.raises(MediaDecodeError):
            decode_pnm(b"P5\n2 2\n65535\n" + bytes(8))

    def test_zero_width_raises(self):
        with pytest.raises(MediaDecodeError):
            decode_pnm(b"P6\n0 2\n255\n")


class TestDispatch:
    def test_unknown_returns_none(self):
        assert detect_and_decode(b"hello world, not media") is None
        assert detect_and_decode(b"") is None

    def test_wav_and_pnm_dispatch(self):
        assert detect_and_decode(encode_wav([128], bits=8))["codec"] == "wav"
        assert detect_and_decode(encode_ppm(bytes(3), 1, 1))["codec"] == "ppm"

    def test_recognized_but_malformed_raises(self):
        with pytest.raises(MediaDecodeError):
            detect_and_decode(b"RIFF\x00\x00\x00\x00WAVEjunk")


class TestOperatorRealDecode:
    def test_mixed_payloads_through_operator(self, spark):
        from scrubah_pii_spark.operators.multimodal import extract_media_features

        wav = encode_wav([0, 128, 255, 128], rate=1000, bits=8)
        ppm = encode_ppm(bytes([10, 20, 30] * 2), 2, 1)
        bad = b"RIFF\x04\x00\x00\x00WAVE"  # recognized, malformed
        other = b"plain text payload"
        df = spark.createDataFrame(
            [(1, wav), (2, ppm), (3, bad), (4, other)],
            "id int, payload binary",
        )
        rows = {r["id"]: r["media"].asDict()
                for r in extract_media_features(df, "payload").collect()}
        assert rows[1]["codec"] == "wav"
        assert rows[1]["duration_ms"] == 4 * 1000 // 1000
        assert rows[2]["codec"] == "ppm" and rows[2]["width"] == 2
        assert rows[3]["error"] is not None and rows[3]["codec"] is None
        assert rows[4]["codec"] == "hash" and len(rows[4]["features"]) == 8
        # hash fallback unchanged: sha256-derived stand-in features
        import hashlib

        d = hashlib.sha256(other).digest()
        got = [round(f, 6) for f in rows[4]["features"]]
        assert got == [round(b / 255.0, 6) for b in d[:8]]
