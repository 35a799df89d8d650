"""AVI container codec: DIB (lossless) and MJPG (clean-room JPEG)
streams, missing-DHT MJPEG splice, index/header structure."""

import struct

import numpy as np
import pytest

from xcube_resampling_spark.extensions.avicodec import (
    _ensure_dht,
    decode_avi,
    encode_avi,
    is_avi,
)


def _frames(n=4, h=16, w=24, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_is_avi():
    data = encode_avi(_frames(1))
    assert is_avi(data)
    assert not is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    assert not is_avi(b"")


def test_dib_roundtrip_exact():
    frames = _frames(5, 10, 13)  # odd width exercises row padding
    data = encode_avi(frames, fps=12, codec="DIB")
    out, meta = decode_avi(data)
    assert meta["width"] == 13 and meta["height"] == 10
    assert meta["fps"] == (12, 1)
    assert meta["codec"] in ("DIB", "")
    assert meta["n_frames"] == 5
    assert len(out) == 5
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_mjpg_roundtrip_close():
    rng = np.random.default_rng(3)
    base = rng.integers(60, 196, (2, 2, 3))
    frames = [np.kron(base + i, np.ones((8, 8, 1))).clip(0, 255)
              .astype(np.uint8) for i in range(3)]
    data = encode_avi(frames, fps=25, codec="MJPG", quality=95)
    out, meta = decode_avi(data)
    assert meta["codec"] == "MJPG"
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert b.shape == a.shape
        err = np.abs(a.astype(int) - b.astype(int)).max()
        assert err <= 12  # smooth blocks at q95


def test_mjpg_missing_dht_decodes():
    # strip the DHT segments from each frame: the classic MJPEG form
    frames = [np.full((8, 8, 3), v, np.uint8) for v in (40, 200)]
    data = encode_avi(frames, codec="MJPG", quality=98)
    ref, _ = decode_avi(data)

    def strip_dht(jpeg):
        out, pos = bytearray(jpeg[:2]), 2
        while pos + 4 <= len(jpeg):
            marker = jpeg[pos + 1]
            if marker == 0xDA:
                out += jpeg[pos:]
                return bytes(out)
            if 0xD0 <= marker <= 0xD9:
                out += jpeg[pos:pos + 2]
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
            seg = jpeg[pos:pos + 2 + seglen]
            if marker != 0xC4:
                out += seg
            pos += 2 + seglen
        raise AssertionError("no SOS")

    # rebuild the AVI with tableless frames
    out2, meta = decode_avi(_rewrite_frames(data, strip_dht))
    assert len(out2) == 2
    for a, b in zip(ref, out2):
        np.testing.assert_array_equal(a, b)


def _rewrite_frames(data, fn):
    """Apply fn to every 00dc chunk payload, fixing sizes."""
    out = bytearray()
    pos = 0
    stop = data.find(b"idx1")  # idx1 entries also start with '00dc'
    if stop < 0:
        stop = len(data)
    while pos < len(data):
        if pos < stop and data[pos:pos + 4] == b"00dc":
            (size,) = struct.unpack_from("<I", data, pos + 4)
            new = fn(data[pos + 8:pos + 8 + size])
            out += b"00dc" + struct.pack("<I", len(new)) + new
            if len(new) & 1:
                out += b"\x00"
            pos += 8 + size + (size & 1)
        else:
            out.append(data[pos])
            pos += 1
    return _fix_sizes(bytes(out))


def _fix_sizes(buf):
    """Recompute RIFF and movi LIST sizes after chunk edits."""
    buf = bytearray(buf)
    # find movi LIST: scan top-level chunks
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    pos = 12
    while pos + 8 <= len(buf):
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if fourcc == b"LIST" and buf[pos + 8:pos + 12] == b"movi":
            # movi extends to idx1 (or EOF)
            idx = buf.find(b"idx1", pos)
            end = idx if idx >= 0 else len(buf)
            struct.pack_into("<I", buf, pos + 4, end - pos - 8)
            size = end - pos - 8
        pos += 8 + size + (size & 1)
    struct.pack_into("<I", buf, 4, len(buf) - 8)
    return bytes(buf)


def test_unknown_codec_refuses_loudly():
    data = bytearray(encode_avi(_frames(1), codec="MJPG"))
    i = data.find(b"MJPG")
    data[i:i + 4] = b"H264"  # strh handler
    i = data.find(b"MJPG", i + 4)
    data[i:i + 4] = b"H264"  # strf biCompression
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi(bytes(data))


def test_empty_chunk_repeats_previous_frame():
    frames = _frames(2, 8, 8)
    data = encode_avi(frames, codec="DIB")
    # append a zero-size 00db chunk inside movi
    buf = bytearray(data)
    idx = buf.find(b"idx1")
    buf[idx:idx] = b"00db" + struct.pack("<I", 0)
    out, meta = decode_avi(_fix_sizes(bytes(buf)))
    assert len(out) == 3
    np.testing.assert_array_equal(out[1], out[2])


def test_truncated_stream_raises():
    data = encode_avi(_frames(2))
    with pytest.raises(ValueError):
        decode_avi(data[: len(data) // 2] + b"\x00\x00\x00\x00")


def test_no_video_stream_raises():
    wav_ish = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    with pytest.raises(ValueError, match="vids|movi"):
        decode_avi(wav_ish)


def test_ensure_dht_idempotent_on_tabled_stream():
    from xcube_resampling_spark.extensions.jpegcodec import encode_jpeg

    jpeg = encode_jpeg(_frames(1)[0], quality=90)
    assert _ensure_dht(jpeg) == jpeg


def test_grayscale_mjpg_expands_to_rgb():
    from xcube_resampling_spark.extensions.jpegcodec import encode_jpeg

    gray = np.full((8, 8), 128, np.uint8)
    jpeg = encode_jpeg(gray, quality=95)
    frames = [np.zeros((8, 8, 3), np.uint8)]
    data = bytearray(encode_avi(frames, codec="MJPG"))
    out = _rewrite_frames(bytes(data), lambda _: jpeg)
    decoded, _ = decode_avi(out)
    assert decoded[0].shape == (8, 8, 3)
    assert np.all(np.abs(decoded[0].astype(int) - 128) <= 2)


def test_idx1_present_and_offsets_resolve():
    frames = _frames(3, 8, 8)
    data = encode_avi(frames, codec="DIB")
    i = data.find(b"idx1")
    assert i > 0
    (size,) = struct.unpack_from("<I", data, i + 4)
    assert size == 3 * 16
    movi_fourcc = data.find(b"movi")
    for k in range(3):
        ckid, flags, off, sz = struct.unpack_from(
            "<4sIII", data, i + 8 + 16 * k)
        assert ckid == b"00db"
        assert flags & 0x10
        assert data[movi_fourcc + off:movi_fourcc + off + 4] == b"00db"
        (csz,) = struct.unpack_from("<I", data, movi_fourcc + off + 4)
        assert csz == sz


def test_top_down_dib_decodes_unflipped():
    frames = _frames(1, 6, 4)
    data = bytearray(encode_avi(frames, codec="DIB"))
    # negate biHeight in strf (BITMAPINFOHEADER) AND re-pack each
    # frame's rows top-down so pixel content is preserved
    i = data.find(b"strf")
    struct.pack_into("<i", data, i + 8 + 8, -6)
    from xcube_resampling_spark.extensions.avicodec import _encode_dib

    td = _encode_dib(frames[0][::-1])  # bottom-up of flipped = top-down
    out = bytes(data).replace(_encode_dib(frames[0]), td)
    decoded, meta = decode_avi(out)
    assert meta["height"] == 6
    np.testing.assert_array_equal(decoded[0], frames[0])


def test_zero_size_first_chunk_emits_blank_frame():
    frames = _frames(2, 8, 8)
    data = encode_avi(frames, codec="DIB")
    movi = data.find(b"movi")
    buf = bytearray(data)
    buf[movi + 4:movi + 4] = b"00db" + struct.pack("<I", 0)
    out, meta = decode_avi(_fix_sizes(bytes(buf)))
    assert len(out) == 3
    assert not out[0].any()  # blank, not silently dropped
    np.testing.assert_array_equal(out[1], frames[0])


class TestAviAudioStream:
    def test_pcm_audio_roundtrip(self):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi_audio,
        )

        rng = np.random.default_rng(11)
        audio = rng.integers(-20000, 20000, (1600, 2)).astype(np.int16)
        data = encode_avi(_frames(4, 8, 8), fps=10, codec="DIB",
                          audio=audio, audio_rate=8000)
        got, rate = decode_avi_audio(data)
        assert rate == 8000
        np.testing.assert_array_equal(got, audio)
        # the video track still decodes untouched
        frames, meta = decode_avi(data)
        assert len(frames) == 4

    def test_mono_audio(self):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi_audio,
        )

        audio = np.arange(-50, 50, dtype=np.int16)
        data = encode_avi(_frames(2, 8, 8), codec="MJPG", audio=audio)
        got, rate = decode_avi_audio(data)
        assert rate == 16000
        np.testing.assert_array_equal(got[:, 0], audio)

    def test_no_audio_stream_raises(self):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi_audio,
        )

        with pytest.raises(ValueError, match="auds"):
            decode_avi_audio(encode_avi(_frames(1)))

    def test_mp3_track_refused_loudly(self):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi_audio,
        )

        data = bytearray(encode_avi(
            _frames(1), audio=np.zeros(100, np.int16)))
        # rewrite wFormatTag 1 -> 0x55 (MP3) in the audio strf
        i = data.find(b"auds")
        j = data.find(b"strf", i)
        struct.pack_into("<H", data, j + 8, 0x55)
        with pytest.raises(NotImplementedError, match="PCM only"):
            decode_avi_audio(bytes(data))


def test_decode_audio_accepts_avi_track():
    from xcube_resampling_spark.extensions.multimodal import (
        decode_audio,
    )

    audio = np.arange(-400, 400, dtype=np.int16)
    data = encode_avi(_frames(2, 8, 8), audio=audio, audio_rate=8000)
    got, rate = decode_audio(data)
    assert rate == 8000
    np.testing.assert_array_equal(got[:, 0], audio)
