"""Clean-room PNG/BMP codec tests (extensions/imagecodec.py) and the
real-decode multimodal operators built on them."""

import struct
import zlib

import numpy as np
import pytest

from xcube_resampling_spark.extensions.imagecodec import (
    PNG_SIGNATURE,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    sniff_image_format,
    to_rgb,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _hand_png(img: np.ndarray, ftypes, ctype=2, depth=8,
              plte: bytes | None = None) -> bytes:
    """Reference encoder independent of encode_png: explicit filter
    type per row, optional palette."""
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    bpp = max(1, c * depth // 8)
    flat = img.reshape(h, -1).astype(np.int64)
    raw = b""
    prev = np.zeros(flat.shape[1], np.int64)
    for j, ft in enumerate(ftypes):
        cur = flat[j]
        n = len(cur)
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - left) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
            enc = (cur - (left + prev) // 2) % 256
        else:  # paeth
            enc = np.empty(n, np.int64)
            for i in range(n):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else cc)
                enc[i] = (cur[i] - pred) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = cur
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


class TestPng:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()

    def test_gray_and_rgba_roundtrip(self):
        rng = np.random.default_rng(8)
        g = rng.integers(0, 256, (5, 9), dtype=np.uint8)
        out = decode_png(encode_png(g))
        assert out.shape == (5, 9, 1)
        assert (out[..., 0] == g).all()
        a = rng.integers(0, 256, (6, 6, 4), dtype=np.uint8)
        assert (decode_png(encode_png(a)) == a).all()

    def test_all_five_filters(self):
        # one row per filter type, built by the independent reference
        # encoder -- exercises the decoder's Sub/Up/Average/Paeth paths
        # regardless of what encode_png chooses
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        assert (decode_png(_hand_png(img, [0, 1, 2, 3, 4])) == img).all()

    def test_palette8(self):
        rng = np.random.default_rng(10)
        plte = bytes(rng.integers(0, 256, 12, dtype=np.uint8))  # 4 colors
        idx = rng.integers(0, 4, (6, 5), dtype=np.uint8)
        png = _hand_png(idx, [0] * 6, ctype=3, plte=plte)
        got = decode_png(png)
        want = np.frombuffer(plte, np.uint8).reshape(4, 3)[idx]
        assert (got == want).all()

    def test_gray_depth1_scaling(self):
        # 1-bit gray: w=10 -> stride 2, packed MSB-first, 1 -> 255
        bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1]], np.uint8)
        packed = np.packbits(bits, axis=1)
        ihdr = struct.pack(">IIBBBBB", 10, 1, 1, 0, 0, 0, 0)
        raw = b"\x00" + packed.tobytes()
        png = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(raw))
               + _chunk(b"IEND", b""))
        got = decode_png(png)
        assert got.shape == (1, 10, 1)
        assert (got[0, :, 0] == bits[0] * 255).all()

    def test_crc_mismatch_raises(self):
        png = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
        png[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(png))

    def test_bad_interlace_method_raises(self):
        # (16-bit and Adam7 are now SUPPORTED -- see TestPng16Bit /
        # TestAdam7)
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2)
        png = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="interlace"):
            decode_png(png)

    def test_bad_signature_raises(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JFIF....")

    def test_to_rgb_shapes(self):
        assert to_rgb(np.zeros((2, 3), np.uint8)).shape == (2, 3, 3)
        assert to_rgb(np.zeros((2, 3, 2), np.uint8)).shape == (2, 3, 3)
        assert to_rgb(np.zeros((2, 3, 4), np.uint8)).shape == (2, 3, 3)


class TestBmp:
    def test_rgb_roundtrip_with_padding(self):
        # w=5: 15 bytes/row -> padded to 16
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    def test_top_down(self):
        img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(4, 2, 3)
        data = bytearray(encode_bmp(img))
        # flip height sign -> top-down; rows must be reinterpreted
        h = struct.unpack("<i", data[22:26])[0]
        data[22:26] = struct.pack("<i", -h)
        got = decode_bmp(bytes(data))
        assert (got == img[::-1]).all()

    def test_palette8(self):
        pal = bytes(
            b for i in range(4) for b in (i * 10, i * 20, i * 30, 0))
        idx = np.array([[0, 1], [2, 3]], np.uint8)
        rows = np.zeros((2, 4), np.uint8)  # w=2 -> padded to 4
        rows[:, :2] = idx[::-1]  # bottom-up
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8,
                           2835, 2835, 4, 0)
        off = 14 + 40 + len(pal)
        hdr = struct.pack("<2sIHHI", b"BM", off + 8, 0, 0, off)
        got = decode_bmp(hdr + info + pal + rows.tobytes())
        # stored BGRA -> RGB
        want = np.array(
            [[i * 30, i * 20, i * 10] for i in range(4)],
            np.uint8)[idx]
        assert (got == want).all()

    def test_32bit(self):
        img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
        bgrx = np.zeros((2, 2, 4), np.uint8)
        bgrx[..., 0] = img[..., 2]
        bgrx[..., 1] = img[..., 1]
        bgrx[..., 2] = img[..., 0]
        rows = bgrx[::-1].reshape(2, 8)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, 16,
                           2835, 2835, 0, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
        assert (decode_bmp(hdr + info + rows.tobytes()) == img).all()

    def test_compressed_raises(self):
        data = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
        data[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(NotImplementedError, match="compression"):
            decode_bmp(bytes(data))


class TestSniffAndDispatch:
    def test_sniff(self):
        assert sniff_image_format(
            encode_png(np.zeros((2, 2, 3), np.uint8))) == "png"
        assert sniff_image_format(
            encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
        assert sniff_image_format(b"\xff\xd8\xff") == "jpeg"
        assert sniff_image_format(b"RIFFxxxx") is None

    def test_decode_image_dispatch(self):
        from xcube_resampling_spark.extensions.multimodal import (
            DecoderNotAvailable, decode_image,
        )

        img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        assert (decode_image(encode_png(img)) == img).all()
        assert (decode_image(encode_bmp(img)) == img).all()
        # baseline JPEG now decodes natively (lossy -> near, not equal)
        from xcube_resampling_spark.extensions.jpegcodec import (
            encode_jpeg,
        )

        dec = decode_image(encode_jpeg(img, 95))
        assert dec.shape == img.shape
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 16
        with pytest.raises(DecoderNotAvailable):
            decode_image(b"RIFF....WEBPVP8 ")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for ln in plan.split("\n")
               if "Exchange" in ln and "Reused" not in ln)


class TestSparkOperators:
    def test_codec_pipeline_is_shuffle_free(self, spark):
        # encode -> decode is two narrow mapInPandas passes: the
        # 100-TB shape claim, plan-asserted
        from xcube_resampling_spark.extensions.multimodal import (
            decode_images,
            encode_images,
            synthetic_media,
        )

        media = synthetic_media(spark, 9)
        assert _n_exchanges(decode_images(encode_images(media))) == 0

    def test_reencode_real_payload_transcodes(self, spark):
        # a payload that already IS an image decodes through the real
        # codec (ignoring the metadata w/h) and transcodes losslessly
        import numpy as np

        from xcube_resampling_spark.extensions.multimodal import (
            decode_images,
            encode_images,
        )

        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        media = spark.createDataFrame(
            [(0, "image", bytearray(encode_png(img)), 99, 99,
              None, None)],
            "media_id long, kind string, payload binary, width int, "
            "height int, sample_rate int, n_frames int",
        )
        out = decode_images(encode_images(media, "bmp")).collect()[0]
        assert (out["width"], out["height"]) == (7, 5)
        got = np.frombuffer(bytes(out["pixels"]), np.uint8)
        assert (got.reshape(5, 7, 3) == img).all()

    def test_encode_then_decode_images(self, spark):
        from xcube_resampling_spark.extensions.multimodal import (
            _fake_decode_rgb,
            decode_images,
            encode_images,
            synthetic_media,
        )

        media = synthetic_media(spark, 9)
        for codec in ("png", "bmp"):
            out = decode_images(encode_images(media, codec)).collect()
            assert out  # image rows only
            for r in out:
                src = [
                    m for m in media.collect()
                    if m["media_id"] == r["media_id"]][0]
                want = _fake_decode_rgb(
                    src["payload"], src["width"], src["height"])
                got = np.frombuffer(r["pixels"], np.uint8).reshape(
                    r["height"], r["width"], 3)
                assert (got == want).all(), (codec, r["media_id"])


class TestPng16Bit:
    def test_roundtrip_gray16(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 65536, (7, 11), dtype=np.uint16)
        dec = decode_png(encode_png(img))
        assert dec.dtype == np.uint16
        assert (dec[..., 0] == img).all()

    def test_roundtrip_rgb16_and_rgba16(self):
        rng = np.random.default_rng(6)
        for c in (3, 4):
            img = rng.integers(0, 65536, (5, 9, c), dtype=np.uint16)
            dec = decode_png(encode_png(img))
            assert dec.shape == img.shape and (dec == img).all()

    def test_roundtrip_gray_alpha16(self):
        img = (np.arange(4 * 6 * 2, dtype=np.uint16) * 997
               ).reshape(4, 6, 2)
        dec = decode_png(encode_png(img))
        assert dec.shape == (4, 6, 2) and (dec == img).all()

    def test_filtered_16bit_rows_decode(self):
        """Hand-build a 16-bit gray PNG using Sub and Up filters --
        filters operate on BYTES with bpp=2 per the spec."""
        w, h = 4, 3
        img = np.array([
            [1000, 2000, 3000, 60000],
            [1100, 2100, 3100, 60100],
            [1200, 2200, 3200, 60200],
        ], dtype=np.uint16)
        rows = np.ascontiguousarray(
            img.astype(">u2")).view(np.uint8).reshape(h, w * 2)
        scan = bytearray()
        # row 0: Sub (bpp=2 lanes)
        r0 = rows[0].astype(np.int64)
        sub = r0.copy()
        sub[2:] = (r0[2:] - r0[:-2]) % 256
        scan += b"\x01" + bytes(sub.astype(np.uint8))
        # rows 1, 2: Up
        for j in (1, 2):
            up = (rows[j].astype(np.int64)
                  - rows[j - 1].astype(np.int64)) % 256
            scan += b"\x02" + bytes(up.astype(np.uint8))
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
        png = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(scan)))
               + _chunk(b"IEND", b""))
        dec = decode_png(png)
        assert (dec[..., 0] == img).all()

    def test_to_rgb_scales_16bit(self):
        img = np.full((2, 2), 0xABCD, dtype=np.uint16)
        rgb = to_rgb(decode_png(encode_png(img)))
        assert rgb.dtype == np.uint8
        assert (rgb == 0xAB).all()

    def test_16bit_palette_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
        png = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="16-bit palette"):
            decode_png(png)


def _encode_adam7(img: np.ndarray, depth: int = 8) -> bytes:
    """Test-local Adam7 encoder: filter-0 rows per pass (the decoder
    under test must reassemble the passes)."""
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    a = img if img.ndim == 3 else img[..., None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    scan = bytearray()
    for x0, y0, dx, dy in passes:
        sub = a[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for j in range(ph):
            scan += b"\x00"
            if depth == 16:
                scan += np.ascontiguousarray(
                    sub[j].astype(">u2")).tobytes()
            elif depth == 8:
                scan += np.ascontiguousarray(
                    sub[j].astype(np.uint8)).tobytes()
            else:  # sub-byte gray: pack MSB-first
                bits = np.unpackbits(
                    sub[j, :, 0].astype(np.uint8)[:, None], axis=1,
                )[:, 8 - depth:]
                flat = bits.reshape(-1)
                pad = (-len(flat)) % 8
                flat = np.concatenate(
                    [flat, np.zeros(pad, np.uint8)])
                scan += np.packbits(flat).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _chunk(b"IEND", b""))


class TestAdam7:
    def test_rgb8_interlaced_matches_progressive(self):
        rng = np.random.default_rng(11)
        for h, w in [(1, 1), (3, 5), (8, 8), (9, 13), (16, 7)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_png(_encode_adam7(img)) == img).all()

    def test_gray16_interlaced(self):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 65536, (11, 6, 1), dtype=np.uint16)
        dec = decode_png(_encode_adam7(img, depth=16))
        assert dec.dtype == np.uint16
        assert (dec == img).all()

    def test_subbyte_gray_interlaced(self):
        # 2-bit gray: values 0..3 scale to 0/85/170/255
        img = (np.arange(7 * 9) % 4).reshape(7, 9, 1).astype(np.uint8)
        dec = decode_png(_encode_adam7(img, depth=2))
        assert (dec[..., 0] == img[..., 0] * 85).all()

    def test_truncated_interlaced_raises(self):
        # an 8x8 RGB Adam7 scan needs a known byte count; compress a
        # scan that is 5 bytes short and expect a loud error
        passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                  (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                  (0, 1, 1, 2))
        need = 0
        for x0, y0, dx, dy in passes:
            pw = (8 - x0 + dx - 1) // dx
            ph = (8 - y0 + dy - 1) // dy
            if pw and ph:
                need += ph * (pw * 3 + 1)
        bad_idat = zlib.compress(b"\x00" * (need - 5))
        png = (PNG_SIGNATURE
               + _chunk(b"IHDR",
                        struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1))
               + _chunk(b"IDAT", bad_idat) + _chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="truncated"):
            decode_png(png)
