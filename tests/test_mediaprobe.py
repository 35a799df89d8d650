"""Container prober: header-only metadata for every supported format
plus MP4/ISO-BMFF (which the engine deliberately cannot decode)."""

import struct

import numpy as np

from xcube_resampling_spark.extensions.mediaprobe import (
    media_probe,
    probe_media,
)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_fixture(w=640, h=360, timescale=1000, duration=5400,
                 vcodec=b"avc1", acodec=b"mp4a"):
    def tkhd(width, height):
        body = bytes(4)          # version 0 + flags
        body += bytes(16)        # ctime mtime track_id reserved
        body += bytes(4)         # duration
        body += bytes(8 + 2 + 2 + 2 + 2 + 36)
        body += struct.pack(">II", width << 16, height << 16)
        return _box(b"tkhd", body)

    def stsd(fourcc):
        entry = struct.pack(">I", 16) + fourcc + bytes(8)
        return _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)

    def trak(kind, fourcc, width=0, height=0):
        hdlr = _box(b"hdlr", bytes(8) + kind + bytes(12))
        stbl = _box(b"stbl", stsd(fourcc))
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        return _box(b"trak", tkhd(width, height) + mdia)

    mvhd = _box(b"mvhd", bytes(4) + bytes(8)
                + struct.pack(">II", timescale, duration) + bytes(80))
    moov = _box(b"moov", mvhd
                + trak(b"vide", vcodec, w, h)
                + trak(b"soun", acodec))
    ftyp = _box(b"ftyp", b"isom" + bytes(8))
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


class TestProbeMp4:
    def test_video_and_audio_tracks(self):
        p = probe_media(_mp4_fixture())
        assert p["format"] == "mp4"
        assert p["brand"] == "isom"
        assert p["width"] == 640 and p["height"] == 360
        assert p["codec"] == "avc1"
        assert p["audio_codec"] == "mp4a"
        assert p["duration_ms"] == 5400
        assert p["n_tracks"] == 2

    def test_hevc_and_64bit_mvhd(self):
        data = _mp4_fixture(vcodec=b"hev1")
        assert probe_media(data)["codec"] == "hev1"

    def test_truncated_mp4_stops_cleanly(self):
        data = _mp4_fixture()
        p = probe_media(data[:40])
        assert p["format"] == "mp4"  # ftyp seen, rest missing


class TestProbeNativeFormats:
    def test_avi(self):
        from xcube_resampling_spark.extensions.avicodec import (
            encode_avi,
        )

        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
                  for _ in range(5)]
        audio = np.zeros(800, np.int16)
        p = probe_media(encode_avi(frames, fps=10, codec="MJPG",
                                   audio=audio))
        assert p["format"] == "avi"
        assert p["width"] == 20 and p["height"] == 12
        assert p["n_frames"] == 5
        assert p["codec"] == "MJPG"
        assert p["duration_ms"] == 500
        assert p["n_tracks"] == 2

    def test_gif_frame_count(self):
        from xcube_resampling_spark.extensions.gifcodec import (
            encode_gif,
        )

        img = np.zeros((6, 9, 3), np.uint8)
        p = probe_media(encode_gif(img))
        assert p["format"] == "gif"
        assert (p["width"], p["height"], p["n_frames"]) == (9, 6, 1)

    def test_y4m(self):
        from xcube_resampling_spark.extensions.videocodec import (
            encode_y4m,
        )

        y = np.zeros((4, 6, 8), np.uint8)
        p = probe_media(encode_y4m(y))
        assert p["format"] == "y4m"
        assert (p["width"], p["height"], p["n_frames"]) == (8, 6, 4)

    def test_wav(self):
        from xcube_resampling_spark.extensions.audiocodec import (
            encode_wav,
        )

        p = probe_media(encode_wav(np.zeros(16000, np.int16), 16000))
        assert p["format"] == "wav"
        assert p["sample_rate"] == 16000
        assert p["channels"] == 1
        assert p["codec"] == "pcm"
        assert p["duration_ms"] == 1000

    def test_flac(self):
        from xcube_resampling_spark.extensions.flaccodec import (
            encode_flac,
        )

        p = probe_media(encode_flac(
            np.zeros((22050, 2), np.int16), 22050))
        assert p["format"] == "flac"
        assert p["sample_rate"] == 22050
        assert p["channels"] == 2
        assert p["duration_ms"] == 1000

    def test_images_and_unknown(self):
        from xcube_resampling_spark.extensions.imagecodec import (
            encode_bmp,
            encode_png,
        )
        from xcube_resampling_spark.extensions.jpegcodec import (
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = np.zeros((5, 7, 3), np.uint8)
        assert probe_media(encode_png(img)) == {
            "format": "png", "width": 7, "height": 5}
        assert probe_media(encode_bmp(img))["width"] == 7
        p = probe_media(encode_jpeg(img))
        assert (p["format"], p["codec"]) == ("jpeg", "jpeg_baseline")
        p2 = probe_media(encode_jpeg_progressive(img))
        assert p2["codec"] == "jpeg_progressive"
        assert probe_media(b"ID3\x03\x00" + bytes(20))["format"] == \
            "mp3"
        assert probe_media(b"\x01\x02\x03")["format"] == "unknown"
        assert probe_media(b"")["format"] == "unknown"

    def test_real_system_files(self):
        import glob

        pngs = glob.glob("/usr/share/**/*.png", recursive=True)[:25]
        gifs = glob.glob("/usr/share/**/*.gif", recursive=True)[:10]
        checked = 0
        for f in pngs + gifs:
            data = open(f, "rb").read()
            p = probe_media(data)
            if p["format"] in ("png", "gif"):
                assert p.get("width", 0) > 0
                checked += 1
        files = pngs + gifs
        # most real files must probe; tolerate a few misnamed ones
        assert not files or checked >= max(1, len(files) // 2)


class TestMediaProbeOperator:
    def test_probe_all_kinds(self, spark):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.extensions.multimodal import (
            encode_audio_flac,
            encode_images,
            encode_video_y4m,
            synthetic_media,
        )

        media = synthetic_media(spark, 12)
        containers = (
            encode_images(media, "gif")
            .unionByName(encode_audio_flac(media))
            .unionByName(encode_video_y4m(media))
        )
        out = media_probe(containers).collect()
        fmts = {r["format"] for r in out}
        assert fmts == {"gif", "flac", "y4m"}
        for r in out:
            if r["format"] == "gif":
                assert r["width"] >= 4 and r["height"] == 4
            elif r["format"] == "flac":
                assert r["sample_rate"] == 16000
            else:
                assert r["n_frames"] == 6

    def test_probe_is_shuffle_free(self, spark):
        from tests.test_imagecodec import _n_exchanges
        from xcube_resampling_spark.extensions.multimodal import (
            synthetic_media,
        )

        assert _n_exchanges(media_probe(synthetic_media(spark, 9))) == 0


class TestProbeNeverRaises:
    def test_truncated_headers_degrade_to_format(self):
        # the review's repro set: every one used to raise
        cases = [
            (b"GIF89a", "gif"),
            (b"\x89PNG\r\n\x1a\n", "png"),
            (b"BMx", "bmp"),
            (b"RIFF\x10\x00\x00\x00WAVEfmt ", "wav"),
            (b"\xff\xd8\xff\xc0\x00\x11\x08", "jpeg"),
            (b"YUV4MPEG2 Wx H4\n", "y4m"),
            (b"RIFF\x08\x00\x00\x00AVI ", "avi"),
            (b"fLaC\x00", "flac"),
        ]
        for payload, fmt in cases:
            p = probe_media(payload)
            assert p["format"] == fmt, payload

    def test_c422_y4m_frame_count(self):
        # C422 frame = w*h + 2*(w//2)*h bytes; a 4:2:0-sized walk
        # would land mid-plane and undercount
        w, h, n = 4, 4, 3
        frame = bytes(w * h + 2 * (w // 2) * h)
        data = (b"YUV4MPEG2 W4 H4 F25:1 C422\n"
                + (b"FRAME\n" + frame) * n)
        p = probe_media(data)
        assert p["n_frames"] == n

    def test_wav_data_substring_in_comment_chunk(self):
        # a LIST-INFO chunk whose text contains 'data' must not be
        # mistaken for the data chunk
        import struct as _s

        from xcube_resampling_spark.extensions.audiocodec import (
            encode_wav,
        )

        wav = bytearray(encode_wav(np.zeros(8000, np.int16), 8000))
        note = b"INFOICMT" + _s.pack("<I", 16) + b"field data 2024\x00"
        lst = b"LIST" + _s.pack("<I", len(note)) + note
        # insert before the fmt chunk (after the 12-byte RIFF header)
        wav[12:12] = lst
        _s.pack_into("<I", wav, 4, len(wav) - 8)
        p = probe_media(bytes(wav))
        assert p["duration_ms"] == 1000


class TestProbeMp3:
    def _frame_header(self, ver=3, layer_field=1, br_idx=9, sr_idx=0,
                      mode=3):
        # ver 3=MPEG1; layer_field 1=Layer III; br_idx 9 -> 128 kbps
        b1 = 0xE0 | (ver << 3) | (layer_field << 1) | 1
        b2 = (br_idx << 4) | (sr_idx << 2)
        b3 = mode << 6
        return bytes([0xFF, b1, b2, b3])

    def test_mpeg1_layer3_header(self):
        data = self._frame_header() + bytes(16000)
        p = probe_media(data)
        assert p["codec"] == "mpeg1_layer3"
        assert p["sample_rate"] == 44100
        assert p["channels"] == 1
        # 128 kbps CBR over ~16 KB -> ~1s
        assert 900 <= p["duration_ms"] <= 1100

    def test_id3_skipped_to_first_frame(self):
        id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 40]) + bytes(40)
        data = id3 + self._frame_header(
            ver=2, layer_field=1, br_idx=4, sr_idx=1, mode=0)
        p = probe_media(data + bytes(2000))
        assert p["codec"] == "mpeg2_layer3"
        assert p["sample_rate"] == 24000
        assert p["channels"] == 2

    def test_bare_id3_still_mp3(self):
        assert probe_media(b"ID3\x04\x00\x00\x00\x00\x00\x00")[
            "format"] == "mp3"
