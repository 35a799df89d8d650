"""FLAC codec: lossless round-trips, bit-level fixtures for the
decode paths the FIXED-predictor encoder doesn't emit (LPC, stereo
decorrelation, escape partitions, wasted bits), CRC/MD5 guards."""

import hashlib
import struct

import numpy as np
import pytest

from xcube_resampling_spark.extensions.flaccodec import (
    _BitWriter,
    _crc8,
    _crc16,
    _interleaved_bytes,
    _write_coded_number,
    decode_flac,
    encode_flac,
    is_flac,
)


def _tone(n=2000, ch=1, seed=5, amp=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    base = (amp * np.sin(t / 20.0 + np.arange(ch) * 2)).astype(np.int64)
    noise = rng.integers(-200, 201, (n, ch))
    return (base + noise).astype(np.int16)


def test_is_flac():
    assert is_flac(encode_flac(_tone(64), 16000))
    assert not is_flac(b"RIFF....WAVE")


def test_mono_roundtrip_exact():
    x = _tone(3000)
    data = encode_flac(x, 22050)
    y, sr = decode_flac(data)
    assert sr == 22050
    np.testing.assert_array_equal(y, x)
    assert y.dtype == np.int16


def test_stereo_multiframe_roundtrip():
    x = _tone(10000, ch=2)  # 3 frames at the 4096 default
    y, sr = decode_flac(encode_flac(x, 44100))
    np.testing.assert_array_equal(y, x)


def test_eight_channels():
    x = _tone(500, ch=8)
    y, _ = decode_flac(encode_flac(x, 8000))
    np.testing.assert_array_equal(y, x)


def test_constant_and_verbatim_subframes():
    # constant channel + white noise (rice would expand -> verbatim)
    rng = np.random.default_rng(0)
    x = np.stack([
        np.full(1000, -5, np.int64),
        rng.integers(-32768, 32768, 1000),
    ], axis=1).astype(np.int16)
    data = encode_flac(x, 16000)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y, x)


def test_24bit_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(-(1 << 23), 1 << 23, (600, 2)).astype(np.int32)
    smooth = np.cumsum(x // 4096, axis=0).astype(np.int32)
    data = encode_flac(smooth, 48000, bps=24)
    y, sr = decode_flac(data)
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y, smooth)


def test_md5_verified():
    data = bytearray(encode_flac(_tone(300), 16000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the block body
    data[26 + 4] ^= 0xFF
    with pytest.raises(ValueError, match="MD5|CRC"):
        decode_flac(bytes(data))


def test_frame_crc16_detects_corruption():
    data = bytearray(encode_flac(_tone(300), 16000))
    data[-40] ^= 0x10  # inside the last frame's subframe data
    with pytest.raises(ValueError, match="CRC|MD5"):
        decode_flac(bytes(data))


def test_truncated_stream_raises():
    data = encode_flac(_tone(5000), 16000)
    with pytest.raises(ValueError):
        decode_flac(data[: len(data) * 2 // 3])


def test_not_flac_raises():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"\x00" * 32)


def test_bps_range_validated():
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([40000], np.int64), 16000, bps=16)


# ------------------------------------------------------------------ #
# hand-framed fixtures for decoder-only paths
# ------------------------------------------------------------------ #


def _streaminfo(sr, ch, bps, total, md5=b"\x00" * 16, bs=16):
    w = _BitWriter()
    w.write(16, bs)
    w.write(16, bs)
    w.write(24, 0)
    w.write(24, 0)
    w.write(20, sr)
    w.write(3, ch - 1)
    w.write(5, bps - 1)
    w.write(36, total)
    info = w.getvalue() + md5
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(info))[1:] + info


def _frame(bs, ch_assign, bps_code, fill_subframes, sr_code=0):
    """Build one frame: header + caller-written subframes."""
    w = _BitWriter()
    w.write(14, 0x3FFE)
    w.write(2, 0)
    w.write(4, 7)
    w.write(4, sr_code)
    w.write(4, ch_assign)
    w.write(3, bps_code)
    w.write(1, 0)
    _write_coded_number(w, 0)
    w.write(16, bs - 1)
    w.align()
    hdr = w.getvalue()
    w2 = _BitWriter()
    for b in hdr:
        w2.write(8, b)
    w2.write(8, _crc8(hdr))
    fill_subframes(w2)
    w2.align()
    body = w2.getvalue()
    return body + struct.pack(">H", _crc16(body))


def test_lpc_subframe_decodes():
    # s[i] = (2*s[i-1] - s[i-2]) >> 0 + e[i], order-2 LPC with
    # explicit coefficients [2, -1], shift 0, precision 5
    warm = [10, 13]
    errs = [1, -2, 3, 0, -1, 2, 1, -3, 0, 2, -2, 1, 0, 1]
    want = list(warm)
    for e in errs:
        want.append(2 * want[-1] - want[-2] + e)

    def fill(w):
        w.write(1, 0)
        w.write(6, 32 + 1)  # LPC order 2 (type 0b100000 | order-1)
        w.write(1, 0)       # no wasted bits
        for v in warm:
            w.write(16, v)
        w.write(4, 5 - 1)   # precision 5
        w.write(5, 0)       # shift 0
        for c in (2, -1):
            w.write(5, c & 0x1F)
        # residual: method 0, partition order 0, rice param 2
        w.write(2, 0)
        w.write(4, 0)
        w.write(4, 2)
        for e in errs:
            z = (e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1
            w.unary(z >> 2)
            w.write(2, z & 3)

    data = _streaminfo(16000, 1, 16, 16) + _frame(16, 0, 4, fill)
    y, sr = decode_flac(data)
    np.testing.assert_array_equal(y[:, 0], np.array(want, np.int16))


def _rice_write(w, vals, param):
    for e in vals:
        z = (e << 1) ^ (e >> 63) if e >= 0 else ((-e) << 1) - 1
        w.unary(z >> param)
        if param:
            w.write(param, z & ((1 << param) - 1))


def _verbatim(w, vals, bps):
    w.write(1, 0)
    w.write(6, 1)
    w.write(1, 0)
    for v in vals:
        w.write(bps, v & ((1 << bps) - 1))


def test_stereo_decorrelations_decode():
    left = [100, 120, 90, 95, 110, 105, 98, 102,
            101, 99, 97, 103, 104, 96, 100, 100]
    right = [50, 60, 45, 47, 55, 52, 49, 51,
             50, 49, 48, 52, 53, 47, 50, 50]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]

    cases = [
        (8, [(left, 16), (side, 17)]),    # left/side
        (9, [(side, 17), (right, 16)]),   # side/right
        (10, [(mid, 16), (side, 17)]),    # mid/side
    ]
    for chan, subs in cases:
        def fill(w, subs=subs):
            for vals, bps in subs:
                _verbatim(w, vals, bps)

        data = _streaminfo(16000, 2, 16, 16) + _frame(16, chan, 4, fill)
        y, _ = decode_flac(data)
        np.testing.assert_array_equal(y[:, 0], left)
        np.testing.assert_array_equal(y[:, 1], right)


def test_escape_partition_and_partition_order():
    # order-0 FIXED, partition order 2 (4 partitions of 4), partition
    # 1 escape-coded raw 7 bits, others rice param 1
    vals = [3, -2, 1, 0, 60, -50, 33, -12, 2, -1, 0, 1, -2, 3, 1, 0]

    def fill(w):
        w.write(1, 0)
        w.write(6, 8)   # FIXED order 0
        w.write(1, 0)
        w.write(2, 0)   # rice method 0
        w.write(4, 2)   # partition order 2
        for p in range(4):
            part = vals[p * 4:(p + 1) * 4]
            if p == 1:
                w.write(4, 15)  # escape
                w.write(5, 7)
                for v in part:
                    w.write(7, v & 0x7F)
            else:
                w.write(4, 1)
                _rice_write(w, part, 1)

    data = _streaminfo(16000, 1, 16, 16) + _frame(16, 0, 4, fill)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y[:, 0], vals)


def test_wasted_bits_shift():
    vals = [v * 8 for v in (-3, 5, 2, -1, 0, 4, -2, 1,
                            3, -4, 2, 0, 1, -1, 2, 0)]

    def fill(w):
        w.write(1, 0)
        w.write(6, 1)   # VERBATIM
        w.write(1, 1)   # wasted-bits flag
        w.unary(2)      # unary 2 -> wasted = 3
        for v in vals:
            w.write(13, (v >> 3) & 0x1FFF)

    data = _streaminfo(16000, 1, 16, 16) + _frame(16, 0, 4, fill)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y[:, 0], vals)


def test_fixed_orders_3_and_4_decode():
    # polynomial signals are exactly predicted by high fixed orders
    n = 16
    t = np.arange(n, dtype=np.int64)
    sig3 = (t ** 3 - 5 * t ** 2 + 3 * t).astype(np.int64)
    sig4 = (t ** 4 // 8 - t ** 2).astype(np.int64)
    for order, sig in ((3, sig3), (4, sig4)):
        res = sig.copy()
        for _ in range(order):
            res = np.diff(res)
        assert np.abs(res).max() <= 40

        def fill(w, order=order, sig=sig, res=res):
            w.write(1, 0)
            w.write(6, 8 + order)
            w.write(1, 0)
            for v in sig[:order]:
                w.write(16, int(v) & 0xFFFF)
            w.write(2, 0)
            w.write(4, 0)
            w.write(4, 3)
            _rice_write(w, [int(v) for v in res], 3)

        data = _streaminfo(16000, 1, 16, n) + _frame(n, 0, 4, fill)
        y, _ = decode_flac(data)
        np.testing.assert_array_equal(y[:, 0].astype(np.int64), sig)


def test_rice2_method_decodes():
    vals = [3, -2, 1, 0, 6, -5, 3, -1, 2, -1, 0, 1, -2, 3, 1, 0]

    def fill(w):
        w.write(1, 0)
        w.write(6, 8)   # FIXED order 0
        w.write(1, 0)
        w.write(2, 1)   # rice method 1 (5-bit params)
        w.write(4, 0)
        w.write(5, 2)
        _rice_write(w, vals, 2)

    data = _streaminfo(16000, 1, 16, 16) + _frame(16, 0, 4, fill)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y[:, 0], vals)


def test_md5_passes_when_set():
    vals = np.array(range(-8, 8), np.int16)[:, None]
    md5 = hashlib.md5(_interleaved_bytes(vals.astype(np.int64), 2)).digest()

    def fill(w):
        _verbatim(w, [int(v) for v in vals[:, 0]], 16)

    data = _streaminfo(16000, 1, 16, 16, md5=md5) + _frame(16, 0, 4, fill)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y, vals)


def test_skips_other_metadata_blocks():
    base = encode_flac(_tone(100), 16000)
    # insert a VORBIS_COMMENT (type 4) between STREAMINFO and frames:
    # clear STREAMINFO's last-block bit, append the new last block
    si_end = 8 + 34
    pad = b"\x00" * 12
    injected = (
        base[:4]
        + bytes([base[4] & 0x7F]) + base[5:si_end]
        + bytes([0x80 | 4]) + struct.pack(">I", len(pad))[1:] + pad
        + base[si_end:]
    )
    y, sr = decode_flac(injected)
    np.testing.assert_array_equal(y, decode_flac(base)[0])


class TestFlacOperators:
    def test_decode_audio_dispatch(self):
        from xcube_resampling_spark.extensions.multimodal import (
            DecoderNotAvailable,
            decode_audio,
        )

        x = _tone(400, ch=2)
        y, sr = decode_audio(encode_flac(x, 22050))
        assert sr == 22050
        np.testing.assert_array_equal(y, x)
        with pytest.raises(DecoderNotAvailable):
            decode_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00")

    def test_flac_features_equal_wav_features(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_features,
            encode_audio_flac,
            encode_audio_wav,
            synthetic_media,
        )

        media = synthetic_media(spark, 15)
        via_wav = {
            r["media_id"]: (r["n_samples"], r["zero_crossings"],
                            r["sum_abs"])
            for r in audio_features(encode_audio_wav(media)).collect()
        }
        via_flac = {
            r["media_id"]: (r["n_samples"], r["zero_crossings"],
                            r["sum_abs"])
            for r in audio_features(encode_audio_flac(media)).collect()
        }
        assert via_wav == via_flac
        assert via_wav

    def test_flac_pipeline_is_shuffle_free(self, spark):
        from tests.test_imagecodec import _n_exchanges
        from xcube_resampling_spark.extensions.multimodal import (
            audio_features,
            encode_audio_flac,
            synthetic_media,
        )

        media = synthetic_media(spark, 9)
        assert _n_exchanges(
            audio_features(encode_audio_flac(media))) == 0

    def test_flac_smaller_than_wav_on_smooth_audio(self):
        # the point of FLAC: smooth PCM compresses
        from xcube_resampling_spark.extensions.audiocodec import (
            encode_wav,
        )

        x = _tone(8000, amp=3000)
        assert len(encode_flac(x, 16000)) < 0.7 * len(
            encode_wav(x[:, 0], 16000))


def test_id3v2_prefixed_stream_decodes():
    x = _tone(500)
    base = encode_flac(x, 16000)
    tag_body = b"\x00" * 200
    # syncsafe size 200 = 0x00 0x00 0x01 0x48
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F])
    data = id3 + tag_body + base
    assert is_flac(data)
    y, sr = decode_flac(data)
    np.testing.assert_array_equal(y, x)
    assert not is_flac(id3 + tag_body + b"JUNK")


class TestAudioFingerprint:
    def test_identical_audio_distance_zero(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_fingerprint,
            dhash_pairs,
            encode_audio_flac,
            release_cached,
            synthetic_media,
        )

        media = synthetic_media(spark, 15)
        fp = audio_fingerprint(encode_audio_flac(media))
        rows = {r["media_id"]: (r["fp_hi"], r["fp_lo"])
                for r in fp.collect()}
        assert rows
        # a duplicate copy at shifted ids must pair at distance 0
        from pyspark.sql import functions as F

        dup = fp.unionByName(fp.select(
            (F.col("media_id") + 1000).alias("media_id"),
            "fp_hi", "fp_lo"))
        pairs = dhash_pairs(
            dup.select("media_id",
                       F.col("fp_hi").alias("dhash_hi"),
                       F.col("fp_lo").alias("dhash_lo")),
            max_distance=0,
        ).collect()
        release_cached()
        exact = {(p["id_a"], p["id_b"]) for p in pairs
                 if p["id_b"] == p["id_a"] + 1000}
        assert len(exact) == len(rows)

    def test_fingerprint_matches_manual_energy_walk(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_fingerprint,
            encode_audio_wav,
            synthetic_media,
        )

        media = synthetic_media(spark, 9)
        got = {r["media_id"]: (r["fp_hi"] << 32) | r["fp_lo"]
               for r in audio_fingerprint(
                   encode_audio_wav(media)).collect()}
        src = {m["media_id"]: bytes(m["payload"])
               for m in media.collect() if m["kind"] == "audio"}
        assert set(got) == set(src)
        for mid, payload in src.items():
            usable = len(payload) - len(payload) % 2
            s = np.abs(np.frombuffer(
                payload[:usable], "<i2").astype(np.int64))
            en = np.zeros(65, np.int64)
            for i, v in enumerate(s):
                en[i * 65 // s.size] += v
            want = 0
            for k in range(64):
                if en[k + 1] > en[k]:
                    want |= 1 << k
            assert got[mid] == want

    def test_wav_and_flac_fingerprints_agree(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            audio_fingerprint,
            encode_audio_flac,
            encode_audio_wav,
            synthetic_media,
        )

        media = synthetic_media(spark, 12)
        via_wav = {r["media_id"]: (r["fp_hi"], r["fp_lo"])
                   for r in audio_fingerprint(
                       encode_audio_wav(media)).collect()}
        via_flac = {r["media_id"]: (r["fp_hi"], r["fp_lo"])
                    for r in audio_fingerprint(
                        encode_audio_flac(media)).collect()}
        assert via_wav == via_flac
