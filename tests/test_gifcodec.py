"""Clean-room GIF codec (extensions/gifcodec.py): LZW variable-width
coding, interlace, transparency/disposal compositing, palette
round-trips, and hand-framed fixtures for decode paths the encoder
never emits."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xcube_resampling_spark.extensions.gifcodec import (
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


class TestLzw:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_roundtrip(self, mcs):
        rng = np.random.default_rng(mcs)
        idx = rng.integers(0, 1 << mcs, 5000, dtype=np.uint8)
        idx = idx.astype(np.uint8)
        back = _lzw_decode(_lzw_encode(idx, mcs), mcs, len(idx))
        np.testing.assert_array_equal(back, idx)

    def test_dictionary_reset_at_4096(self):
        # enough distinct phrases to exhaust the 12-bit dictionary
        rng = np.random.default_rng(9)
        idx = rng.integers(0, 256, 60_000, dtype=np.uint8)
        idx = idx.astype(np.uint8)
        back = _lzw_decode(_lzw_encode(idx, 8), 8, len(idx))
        np.testing.assert_array_equal(back, idx)

    def test_kwkwk_case(self):
        # the classic code == len(table) case (cScSc pattern)
        idx = np.array([1, 1, 1, 1, 1, 1, 1], dtype=np.uint8)
        back = _lzw_decode(_lzw_encode(idx, 2), 2, len(idx))
        np.testing.assert_array_equal(back, idx)


class TestRoundtrip:
    def test_exact_under_256_colors(self):
        rng = np.random.default_rng(3)
        for shape in [(1, 1), (7, 13), (33, 45), (64, 100)]:
            img = (rng.integers(0, 6, (*shape, 3)) * 42).astype(
                np.uint8)
            np.testing.assert_array_equal(
                decode_gif(encode_gif(img)), img)

    def test_grayscale_256_palette(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (20, 30), dtype=np.uint8).astype(
            np.uint8)
        np.testing.assert_array_equal(
            decode_gif(encode_gif(g)), np.stack([g] * 3, -1))

    def test_rich_image_quantizes(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8).astype(
            np.uint8)
        dec = decode_gif(encode_gif(img))
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 30  # 6x7x6 cube: coarse but sane

    def test_dict_reset_image(self):
        rng = np.random.default_rng(1)
        big = (rng.integers(0, 6, (200, 300, 3)) * 42).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_gif(encode_gif(big)), big)


def _hand_gif(w, h, palette, lzw_mcs, stream, iflags=0,
              gce=None, extra_images=()):
    out = bytearray(b"GIF89a")
    n = len(palette)
    bits = max(1, (n - 1).bit_length()) - 1
    out += struct.pack("<HHBBB", w, h, 0x80 | bits, 0, 0)
    out += bytes(np.asarray(palette, np.uint8).ravel())
    imgs = ((0, 0, w, h, iflags, lzw_mcs, stream, gce),) + extra_images
    for left, top, iw, ih, ifl, mcs, st, g in imgs:
        if g is not None:
            out += b"\x21\xf9" + bytes([len(g)]) + g + b"\x00"
        out += struct.pack("<BHHHHB", 0x2C, left, top, iw, ih, ifl)
        out += bytes([mcs])
        for off in range(0, len(st), 255):
            blk = st[off:off + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


class TestHandFramed:
    PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]

    def test_interlaced_image(self):
        # our encoder never interlaces; hand-frame an 8x8 with rows
        # permuted into the 4-pass order
        rows = np.arange(8, dtype=np.uint8) % 4
        img_idx = np.repeat(rows, 8).reshape(8, 8)
        order = [0]  # pass layout for h=8: 0; 4; 2,6; 1,3,5,7
        order = [0, 4, 2, 6, 1, 3, 5, 7]
        stored = img_idx[order].ravel().astype(np.uint8)
        stream = _lzw_encode(stored, 2)
        gif = _hand_gif(8, 8, self.PAL4, 2, stream, iflags=0x40)
        got = decode_gif(gif)
        exp = np.asarray(self.PAL4, np.uint8)[img_idx]
        np.testing.assert_array_equal(got, exp)

    def test_deinterlace_helper_is_inverse(self):
        h, w = 11, 3
        img = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 255
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        stored = img[order].ravel()
        np.testing.assert_array_equal(
            _deinterlace(stored, h, w), img)

    def test_transparency_composites_over_background(self):
        # frame 1 solid red; frame 2 has a transparent hole -> the
        # red must show through
        idx1 = np.full(16, 1, np.uint8)
        idx2 = np.array([2] * 8 + [3] * 8, np.uint8)
        idx2[5] = 0  # transparent index
        gce2 = bytes([0x01, 0, 0, 0])  # transparency on, index 0
        gif = _hand_gif(
            4, 4, self.PAL4, 2, _lzw_encode(idx1, 2),
            extra_images=(
                (0, 0, 4, 4, 0, 2, _lzw_encode(idx2, 2), gce2),),
        )
        frames = [f for f, _ in decode_gif_frames(gif)]
        assert len(frames) == 2
        pal = np.asarray(self.PAL4, np.uint8)
        np.testing.assert_array_equal(frames[0], pal[idx1].reshape(
            4, 4, 3))
        exp2 = pal[np.where(idx2 == 0, 1, idx2)].reshape(4, 4, 3)
        np.testing.assert_array_equal(frames[1], exp2)

    def test_sub_frame_placement(self):
        # a 2x2 patch at (1,1) inside a 4x4 screen
        idx1 = np.full(16, 1, np.uint8)
        patch = np.full(4, 2, np.uint8)
        gif = _hand_gif(
            4, 4, self.PAL4, 2, _lzw_encode(idx1, 2),
            extra_images=(
                (1, 1, 2, 2, 0, 2, _lzw_encode(patch, 2), None),),
        )
        frames = [f for f, _ in decode_gif_frames(gif)]
        pal = np.asarray(self.PAL4, np.uint8)
        exp = pal[idx1].reshape(4, 4, 3).copy()
        exp[1:3, 1:3] = pal[2]
        np.testing.assert_array_equal(frames[1], exp)

    def test_missing_end_code_tolerated(self):
        idx = np.array([1, 2, 3, 0], np.uint8)
        stream = _lzw_encode(idx, 2)
        # chop the end-code byte(s); decoder zero-fills the tail
        gif = _hand_gif(2, 2, self.PAL4, 2, stream[:-1])
        img = decode_gif(gif)
        assert img.shape == (2, 2, 3)

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="GIF8"):
            decode_gif(b"PNG nope")

    def test_truncated_sub_block(self):
        # cut INSIDE the first data sub-block: the promised length
        # exceeds the remaining bytes -> loud ValueError
        img = (np.arange(48).reshape(4, 4, 3) % 6 * 40).astype(
            np.uint8)
        enc = bytearray(encode_gif(img))
        i = enc.index(0x2C)  # image descriptor
        cut = bytes(enc[:i + 9 + 1 + 1 + 2])  # mcs + len byte + 2 data
        with pytest.raises(ValueError, match="truncated|sub-block"):
            decode_gif(cut)


class TestRealWorld:
    def test_system_gifs_decode(self):
        import glob

        files = [
            f for f in glob.glob("/usr/share/**/*.gif", recursive=True)
        ][:40]
        if not files:
            pytest.skip("no system GIFs")
        ok = 0
        for p in files:
            try:
                img = decode_gif(open(p, "rb").read())
                assert img.ndim == 3 and img.shape[2] == 3
                ok += 1
            except ValueError:
                pass  # genuinely truncated files exist in the wild
        assert ok >= len(files) * 0.9


class TestDispatch:
    def test_sniff_and_decode_image(self):
        from xcube_resampling_spark.extensions.imagecodec import (
            sniff_image_format,
        )
        from xcube_resampling_spark.extensions.multimodal import (
            decode_image,
        )

        img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
        enc = encode_gif(img)
        assert sniff_image_format(enc) == "gif"
        np.testing.assert_array_equal(decode_image(enc), img)


class TestReviewRegressions:
    def test_overhanging_transparent_frame(self):
        # a frame rect taller than the logical screen with
        # transparency must composite the clipped region, not crash
        pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
        idx1 = np.full(16, 1, np.uint8)
        over = np.full(24, 2, np.uint8)  # 4x6 on a 4x4 screen
        over[3] = 0
        gce = bytes([0x01, 0, 0, 0])  # transparent index 0
        gif = _hand_gif(
            4, 4, pal, 2, _lzw_encode(idx1, 2),
            extra_images=(
                (0, 0, 4, 6, 0, 2, _lzw_encode(over, 2), gce),),
        )
        frames = [f for f, _ in decode_gif_frames(gif)]
        assert frames[1].shape == (4, 4, 3)
        palette = np.asarray(pal, np.uint8)
        # position 3 is transparent -> frame-1 red shows through
        np.testing.assert_array_equal(frames[1][0, 3], palette[1])
        np.testing.assert_array_equal(frames[1][0, 0], palette[2])

    def test_early_end_code_zero_fills(self):
        pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
        short = _lzw_encode(np.array([1, 2], np.uint8), 2)
        gif = _hand_gif(2, 2, pal, 2, short)  # promises 4 pixels
        img = decode_gif(gif)
        palette = np.asarray(pal, np.uint8)
        np.testing.assert_array_equal(img[0, 0], palette[1])
        np.testing.assert_array_equal(img[1, 1], palette[0])  # filled


class TestVideoSource:
    def test_animated_gif_as_video(self, spark):
        # two-frame animation -> decode_video returns a (2, h, w) luma
        # stack; video_frame_features consumes it like Y4M
        from xcube_resampling_spark.extensions.multimodal import (
            MEDIA_SCHEMA,
            decode_video,
            video_frame_features,
        )

        pal = [(0, 0, 0), (90, 90, 90), (180, 180, 180), (255, 255, 255)]
        idx1 = np.full(16, 1, np.uint8)
        idx2 = np.full(16, 2, np.uint8)
        gif = _hand_gif(
            4, 4, pal, 2, _lzw_encode(idx1, 2),
            extra_images=(
                (0, 0, 4, 4, 0, 2, _lzw_encode(idx2, 2), None),),
        )
        y, u, v, meta = decode_video(gif)
        assert y.shape == (2, 4, 4) and u is None
        assert int(y[0, 0, 0]) == 90 and int(y[1, 0, 0]) == 180
        df = spark.createDataFrame(
            [(1, "video", bytes(gif), None, None, None, 2)],
            MEDIA_SCHEMA)
        feats = video_frame_features(df).collect()
        assert [r.frame_idx for r in feats] == [0, 1]
        assert feats[0].sum_bytes == 16 * 90
        assert feats[1].sum_bytes == 16 * 180
