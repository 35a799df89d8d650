"""Clean-room baseline JPEG codec: encode/decode round-trips, DCT
identities, stream structure, and integration with decode_image."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xcube_resampling_spark.extensions.jpegcodec import (
    _C,
    _canonical_codes,
    _extend,
    _magnitude,
    _zigzag_order,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        (xx * 255 // max(w - 1, 1)),
        (yy * 255 // max(h - 1, 1)),
        ((xx + yy) * 255 // max(h + w - 2, 1)),
    ], axis=-1).astype(np.uint8)


class TestPrimitives:
    def test_dct_matrix_is_orthonormal(self):
        assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)

    def test_dct_roundtrip_exact(self):
        rng = np.random.default_rng(0)
        b = rng.uniform(-128, 127, (8, 8))
        f = _C @ b @ _C.T
        assert np.allclose(_C.T @ f @ _C, b, atol=1e-9)

    def test_dct_dc_term(self):
        # constant block -> all energy in F(0,0) = 8 * value
        f = _C @ np.full((8, 8), 10.0) @ _C.T
        assert abs(f[0, 0] - 80.0) < 1e-9
        assert np.max(np.abs(f.reshape(-1)[1:])) < 1e-9

    def test_zigzag_covers_all_64_once(self):
        zz = _zigzag_order()
        assert sorted(map(tuple, zz.tolist())) == [
            (r, c) for r in range(8) for c in range(8)]
        # spec's first entries
        assert zz[:4].tolist() == [[0, 0], [0, 1], [1, 0], [2, 0]]

    def test_magnitude_extend_inverse(self):
        for v in list(range(-300, 301)) + [-32767, 32767]:
            size, bits = _magnitude(v)
            assert _extend(bits, size) == v

    def test_huffman_tables_are_valid(self):
        from xcube_resampling_spark.extensions.jpegcodec import (
            _AC_CHROMA_BITS,
            _AC_CHROMA_VALS,
            _AC_LUMA_BITS,
            _AC_LUMA_VALS,
            _DC_CHROMA_BITS,
            _DC_CHROMA_VALS,
            _DC_LUMA_BITS,
            _DC_LUMA_VALS,
        )

        for bits, vals in [
            (_DC_LUMA_BITS, _DC_LUMA_VALS),
            (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (_AC_LUMA_BITS, _AC_LUMA_VALS),
            (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]:
            codes = _canonical_codes(bits, vals)
            assert len(codes) == len(vals)
            # prefix-free: no code is a prefix of a longer one
            seen = sorted(
                (length, code) for code, length in codes.values())
            for i, (l1, c1) in enumerate(seen):
                for l2, c2 in seen[i + 1:]:
                    assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1)

    def test_ac_tables_cover_all_runsize_symbols(self):
        from xcube_resampling_spark.extensions.jpegcodec import (
            _AC_CHROMA_VALS,
            _AC_LUMA_VALS,
        )

        need = {0x00, 0xF0} | {
            (r << 4) | s for r in range(16) for s in range(1, 11)}
        assert need <= set(_AC_LUMA_VALS)
        assert need <= set(_AC_CHROMA_VALS)


class TestRoundtrip:
    def test_gradient_rgb_high_quality(self):
        img = _gradient(48, 64)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        assert _psnr(img, dec) > 45

    def test_subsampling_420(self):
        img = _gradient(40, 56)
        enc444 = encode_jpeg(img, 90, "444")
        enc420 = encode_jpeg(img, 90, "420")
        assert len(enc420) < len(enc444)  # chroma halved
        assert _psnr(img, decode_jpeg(enc420)) > 38

    def test_solid_color_lossless(self):
        img = np.full((17, 23, 3), [200, 30, 90], dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 90))
        assert np.array_equal(img, dec)

    def test_grayscale(self):
        g = (np.add.outer(np.arange(24) * 2,
                          np.arange(33) * 3) % 256).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(g, 92))
        assert dec.shape == g.shape
        assert _psnr(g, dec) > 35

    def test_quality_monotone_in_size(self):
        img = _gradient(64, 64)
        sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_restart_markers(self):
        img = _gradient(40, 56)
        for ri in (1, 2, 5):
            enc = encode_jpeg(img, 90, "420", restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI present
            assert _psnr(img, decode_jpeg(enc)) > 38

    def test_non_multiple_of_mcu_sizes(self):
        for shape in [(1, 1, 3), (3, 5, 3), (9, 17, 3), (15, 9, 3)]:
            img = (np.arange(np.prod(shape)).reshape(shape)
                   % 256).astype(np.uint8)
            for sub in ("444", "420"):
                dec = decode_jpeg(encode_jpeg(img, 95, sub))
                assert dec.shape == img.shape

    def test_byte_stuffing_in_scan(self):
        # high-entropy content reliably produces 0xFF scan bytes
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        enc = encode_jpeg(img, 95)
        dec = decode_jpeg(enc)
        assert _psnr(img, dec) > 30

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, 40), st.integers(1, 40),
        st.integers(30, 98), st.sampled_from(["444", "420"]),
        st.integers(0, 2 ** 31 - 1),
    )
    def test_roundtrip_property(self, h, w, q, sub, seed):
        rng = np.random.default_rng(seed)
        # smooth-ish content (random low-res field upsampled)
        small = rng.integers(0, 256, (max(h // 8, 1),
                                      max(w // 8, 1), 3))
        img = np.kron(
            small, np.ones((8, 8, 1)))[:h, :w, :].astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, q, sub))
        assert dec.shape == img.shape
        # hard color edges + 4:2:0 on 1-px-high strips legitimately
        # land near 20 dB at q=30 (seen 22.9); the property guards
        # against structural corruption (PSNR ~6-10 dB), not against
        # honest quantization loss
        assert _psnr(img, dec) > 18


class TestStructureAndErrors:
    def test_markers_present(self):
        enc = encode_jpeg(_gradient(16, 16), 80)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                       b"\xff\xda", b"\xff\xe0"):
            assert marker in enc

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"PNG whatever")

    def test_rejects_progressive(self):
        enc = bytearray(encode_jpeg(_gradient(16, 16), 80))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC2  # flip SOF0 -> SOF2
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(bytes(enc))

    def test_truncated_scan_raises_valueerror(self):
        # cutting entropy data mid-scan must surface as ValueError
        # ("truncated"), never a raw IndexError
        enc = encode_jpeg(_gradient(32, 32), 90)
        sos = enc.find(b"\xff\xda")
        cut = enc[: sos + 20]  # header + a few entropy bytes
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(cut)

    def test_rejects_bad_quality_input_dtype(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((8, 8, 3), dtype=np.float32))

    def test_decode_image_dispatches_jpeg(self):
        from xcube_resampling_spark.extensions.imagecodec import (
            sniff_image_format,
        )
        from xcube_resampling_spark.extensions.multimodal import (
            decode_image,
        )

        img = _gradient(24, 24)
        enc = encode_jpeg(img, 92)
        assert sniff_image_format(enc) == "jpeg"
        dec = decode_image(enc)
        assert dec.shape == img.shape
        assert _psnr(img, dec) > 40
        # grayscale JPEG comes back promoted to 3 channels
        gray = encode_jpeg(img[..., 0], 92)
        assert decode_image(gray).shape == (24, 24, 3)
