"""Clean-room WAV codec tests (extensions/audiocodec.py) and the real
audio-decode multimodal operators."""

import struct

import numpy as np
import pytest

from xcube_resampling_spark.extensions.audiocodec import (
    decode_wav,
    encode_wav,
    is_wav,
)


class TestWav:
    def test_int16_roundtrip(self):
        rng = np.random.default_rng(5)
        s = rng.integers(-32768, 32768, (777,), dtype=np.int16)
        back, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        assert back.shape == (777, 1)
        assert (back[:, 0] == s).all()

    def test_stereo_and_dtypes(self):
        rng = np.random.default_rng(6)
        for dt, lo, hi in ((np.uint8, 0, 256), (np.int16, -100, 100),
                           (np.int32, -2**31, 2**31)):
            s = rng.integers(lo, hi, (50, 2)).astype(dt)
            back, rate = decode_wav(encode_wav(s, 44100))
            assert rate == 44100
            assert back.dtype == s.dtype and (back == s).all()

    def test_odd_data_length_word_aligned(self):
        # odd-length data chunk gets a pad byte (RIFF word alignment)
        s = np.array([1, 2, 3], dtype=np.uint8)
        wav = encode_wav(s, 100)
        assert len(wav) % 2 == 0
        back, _ = decode_wav(wav)
        assert (back[:, 0] == s).all()

    def test_unknown_chunks_skipped(self):
        s = np.array([5, -5, 7], dtype=np.int16)
        wav = bytearray(encode_wav(s, 200))
        # splice a LIST chunk between WAVE and fmt
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        wav[12:12] = extra
        wav[4:8] = struct.pack("<I", len(wav) - 8)
        back, rate = decode_wav(bytes(wav))
        assert rate == 200 and (back[:, 0] == s).all()

    def test_non_pcm_and_bad_magic_raise(self):
        s = np.zeros(4, dtype=np.int16)
        wav = bytearray(encode_wav(s, 100))
        off = wav.index(b"fmt ") + 8
        wav[off:off + 2] = struct.pack("<H", 3)  # IEEE float
        with pytest.raises(NotImplementedError, match="PCM only"):
            decode_wav(bytes(wav))
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"OggS....")
        assert not is_wav(b"RIFFxxxxAVI ")

    def test_decode_audio_dispatch(self):
        from xcube_resampling_spark.extensions.multimodal import (
            DecoderNotAvailable,
            decode_audio,
        )

        s = np.array([9, -9], dtype=np.int16)
        back, rate = decode_audio(encode_wav(s, 300))
        assert rate == 300 and (back[:, 0] == s).all()
        with pytest.raises(DecoderNotAvailable):
            decode_audio(b"\xff\xfb\x90mp3frame")


class TestAudioOperators:
    def test_audio_pipeline_is_shuffle_free(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_features,
            encode_audio_wav,
            synthetic_media,
        )
        from tests.test_imagecodec import _n_exchanges

        media = synthetic_media(spark, 9)
        assert _n_exchanges(
            audio_features(encode_audio_wav(media))) == 0

    def test_encode_then_features(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_features,
            encode_audio_wav,
            synthetic_media,
        )

        media = synthetic_media(spark, 12)
        out = audio_features(encode_audio_wav(media)).collect()
        assert out  # audio rows only (kind == 'audio')
        src = {m["media_id"]: m for m in media.collect()}
        for r in out:
            payload = bytes(src[r["media_id"]]["payload"])
            usable = len(payload) - len(payload) % 2
            mono = np.frombuffer(
                payload[:usable], dtype="<i2").astype(np.int64)
            signs = np.where(mono >= 0, 1, -1)
            assert r["sample_rate"] == 16000
            assert r["n_samples"] == len(mono)
            assert r["zero_crossings"] == int(
                (signs[1:] != signs[:-1]).sum())
            assert r["sum_abs"] == int(np.abs(mono).sum())
