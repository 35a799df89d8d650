"""Clean-room JPEG codec (ITU-T T.81 / ISO 10918-1: baseline
sequential AND progressive DCT, Huffman entropy coding) -- pure
numpy, no imaging library, same clean-room pattern as the
PNG/BMP/WAV/Y4M codecs.

Encoders
--------
:func:`encode_jpeg` -- baseline JFIF output: 8x8 forward DCT (exact
matrix form), Annex-K quantization tables scaled by the libjpeg
quality formula, zigzag + DC DPCM + AC run-length coding,
standard-shaped canonical Huffman tables (embedded in DHT, so ANY
conforming decoder reads them -- validity does not depend on matching
libjpeg's defaults bit-for-bit), 4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling, grayscale or RGB (BT.601 full-range YCbCr), optional
restart markers.
:func:`encode_jpeg_progressive` -- SOF2 output with a 4-kind scan
script (DC first + DC refinement + per-component AC first + AC
refinement) that exercises every progressive decode path, optional
restart markers in every scan kind; shares the baseline encoder's
quantizer, so the two encodings of one image decode bit-identically.

Decoder
-------
Parses DQT/DHT/SOF/SOS/DRI from the stream (tables come from the
FILE, not this module's constants).  Baseline/extended sequential
(SOF0/1) including multi-scan non-interleaved files, and progressive
(SOF2) per T.81 Annex G: spectral selection, successive
approximation, DC/AC refinement scans, cross-block EOB runs with
correction bits, restart markers in any scan kind.  All scans
accumulate into per-component coefficient buffers; dequantize + IDCT
run once, vectorized over all blocks.  Arithmetic coding, lossless/
hierarchical SOFs, and 12-bit precision raise ``NotImplementedError``
loudly.  Verified against real-world camera/web files of both
flavors.

The reference engine gets JPEG from GDAL-family libraries; this module
is spec-derived, not ported (no reference counterpart).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]

# ------------------------------------------------------------------ #
# constants

# Annex K.1 / K.2 quantization tables (row-major 8x8)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """(64, 2) (row, col) pairs in zigzag scan order, derived rather
    than transcribed."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(diag)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]
_UNZZ = np.argsort(_ZZ_FLAT)

# encoder Huffman table shapes: (bits-per-length[1..16], symbols).
# DC tables are the Annex-K standard ones; AC tables use the standard
# LENGTH HISTOGRAM with the symbol set ordered canonically
# ((run,size) ascending within each code length is irrelevant to
# validity -- the tables travel in DHT, so decoders never assume
# libjpeg's exact ordering).
_DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUMA_VALS = tuple(range(12))
_DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_CHROMA_VALS = tuple(range(12))

_AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
_AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)
_AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
_AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _canonical_codes(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81
    C.2); validates the (bits, vals) shape."""
    if sum(bits) != len(vals):
        raise ValueError("Huffman BITS/HUFFVAL mismatch")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >> length:
                raise ValueError("Huffman code overflow")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# DCT-II basis matrix: block_dct = C @ block @ C.T
def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_matrix()
_CT = _C.T


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table (public formula)."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    scaled = (table * s + 50) // 100
    return np.clip(scaled, 1, 255).astype(np.int32)


# ------------------------------------------------------------------ #
# bit I/O with 0xFF byte stuffing


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError(
                "JPEG scan data truncated (entropy stream ended before "
                "the expected block count)"
            )
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError(
                    "JPEG scan data truncated after a 0xFF byte"
                )
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # marker inside scan data: feed 0 bits (the decoder
                # stops at the right block count; RSTs are consumed
                # by the MCU loop, not here)
                self.pos -= 1
                b = 0
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        """Drop partial-byte bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and \
                0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected restart marker")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) of a DPCM/AC value per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of :func:`_magnitude` (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------------ #
# encoder


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.stack([r, g, b], axis=-1) + 0.5, 0, 255
    ).astype(np.uint8)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(
    zz: np.ndarray, dc_codes, ac_codes, dc_pred: int, bw: _BitWriter,
) -> int:
    """Emit one block's quantized zigzag coefficients (baseline)."""
    # DC
    diff = int(zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(
        int(table.reshape(-1)[_ZZ_FLAT][k]) for k in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 to a
    baseline JFIF JPEG.  ``subsampling``: ``'444'`` (no chroma
    subsampling), ``'422'`` (2x1 horizontal), or ``'420'`` (2x2 --
    the web default);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real camera files use)."""
    h, w, planes, sampling = _prep_planes(img, subsampling)
    n_comp = len(planes)
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)
    qts = [qt_l] + [qt_c] * (n_comp - 1)
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    dcs = [dc_l] + [dc_c] * (n_comp - 1)
    acs = [ac_l] + [ac_c] * (n_comp - 1)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef = _quantize_planes(planes, sampling, qts, mcux, mcuy)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))
    out += _dqt_segment(0, qt_l)
    if n_comp > 1:
        out += _dqt_segment(1, qt_c)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([n_comp])
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if n_comp > 1:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += (b"\xff\xdd" + struct.pack(">H", 4)
                + struct.pack(">H", int(restart_interval)))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * n_comp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * n_comp
            mcu_count += 1
            for ci in range(n_comp):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block(
                            coef[ci][my * sv + by, mx * sh + bx],
                            dcs[ci], acs[ci], preds[ci], bw,
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _prep_planes(img, subsampling):
    """Shared encoder front matter: color transform + chroma
    subsampling.  Returns (h, w, planes, sampling)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("JPEG encoding needs uint8 input")
    if img.ndim == 2:
        return img.shape[0], img.shape[1], \
            [img.astype(np.float64)], [(1, 1)]
    if img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "444":
            return img.shape[0], img.shape[1], \
                [ycc[..., c] for c in range(3)], \
                [(1, 1), (1, 1), (1, 1)]
        if subsampling == "420":
            y = ycc[..., 0]
            cb = _pad_to_blocks(ycc[..., 1], 2, 2)
            cr = _pad_to_blocks(ycc[..., 2], 2, 2)
            cb = cb.reshape(
                cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(
                cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            return img.shape[0], img.shape[1], [y, cb, cr], \
                [(2, 2), (1, 1), (1, 1)]
        if subsampling == "422":
            y = ycc[..., 0]
            cb = _pad_to_blocks(ycc[..., 1], 1, 2)
            cr = _pad_to_blocks(ycc[..., 2], 1, 2)
            cb = cb.reshape(
                cb.shape[0], cb.shape[1] // 2, 2).mean(2)
            cr = cr.reshape(
                cr.shape[0], cr.shape[1] // 2, 2).mean(2)
            return img.shape[0], img.shape[1], [y, cb, cr], \
                [(2, 1), (1, 1), (1, 1)]
        raise ValueError("subsampling must be '444', '422', or '420'")
    raise ValueError("JPEG encoding needs (h,w) or (h,w,3) input")


def _quantize_planes(planes, sampling, qts, mcux, mcuy):
    """DCT + quantize every 8x8 block of every (padded) plane.
    Returns per-component ``(nby, nbx, 64)`` int32 zigzag-order
    coefficient arrays over the full MCU-padded grid."""
    out = []
    for p, (sh, sv), qt in zip(planes, sampling, qts):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pp = _pad_to_blocks(p, 8, 8)
        pp = np.pad(pp, ((0, ph - pp.shape[0]), (0, pw - pp.shape[1])),
                    mode="edge")
        nby, nbx = ph // 8, pw // 8
        blocks = pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ij,abjk,kl->abil", _C, blocks - 128.0, _CT)
        q = np.round(f / qt[None, None]).astype(np.int32)
        out.append(q.reshape(nby, nbx, 64)[..., _ZZ_FLAT])
    return out


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode to a PROGRESSIVE (SOF2) JFIF JPEG, T.81 Annex G.

    Scan script (covers every progressive decode path: spectral
    selection, successive approximation, DC and AC refinement):

    1. DC first, all components interleaved, Al=1
    2. DC refinement, Al=0 (raw bits, no entropy tables)
    3. per component: AC first, Ss=1..63, Al=1
    4. per component: AC refinement, Ss=1..63, Ah=1, Al=0

    EOB runs are flushed per block (EOB0 only), so the standard
    baseline Huffman tables suffice; any conformant decoder accepts
    longer runs, so this is a pure encoder-side simplification.
    ``restart_interval`` > 0 emits DRI + RSTn markers in EVERY scan
    (the interval counts MCUs in the interleaved DC scans and blocks
    in the non-interleaved AC scans, per A.2.2)."""
    h, w, planes, sampling = _prep_planes(img, subsampling)
    n_comp = len(planes)
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)
    qts = [qt_l] + [qt_c] * (n_comp - 1)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef = _quantize_planes(planes, sampling, qts, mcux, mcuy)
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    dcs = [dc_l] + [dc_c] * (n_comp - 1)
    acs = [ac_l] + [ac_c] * (n_comp - 1)

    out = bytearray()
    out += b"\xff\xd8"
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))
    out += _dqt_segment(0, qt_l)
    if n_comp > 1:
        out += _dqt_segment(1, qt_c)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([n_comp])
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if n_comp > 1:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    if restart_interval:
        out += (b"\xff\xdd" + struct.pack(">H", 4)
                + struct.pack(">H", int(restart_interval)))

    def sos_header(comp_ids, tds, tas, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    class _Scan:
        """Restart bookkeeping for one scan: RSTn numbering starts at
        0 per scan and cycles mod 8; ``boundary()`` is called before
        each restart unit (MCU or block)."""

        def __init__(self):
            self.bw = _BitWriter()
            self.unit = 0
            self.rst = 0
            self.reset = False

        def boundary(self):
            self.reset = False
            if restart_interval and self.unit \
                    and self.unit % restart_interval == 0:
                self.bw.flush()
                self.bw.out += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) % 8
                self.reset = True
            self.unit += 1

    def mcu_blocks(scan):
        """Interleaved block order over the padded grid, with restart
        boundaries between MCUs."""
        for my in range(mcuy):
            for mx in range(mcux):
                scan.boundary()
                for ci, (sh, sv) in enumerate(sampling):
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, coef[ci][my * sv + by,
                                               mx * sh + bx]

    # scan 1: DC first (interleaved, Al=1)
    out += sos_header(list(range(1, n_comp + 1)),
                      [0] + [1] * (n_comp - 1), [0] * n_comp,
                      0, 0, 0, 1)
    sc = _Scan()
    preds = [0] * n_comp
    for ci, zz in mcu_blocks(sc):
        if sc.reset:
            preds = [0] * n_comp
            sc.reset = False
        dcv = int(zz[0]) >> 1  # DC point transform: arithmetic shift
        size, bits = _magnitude(dcv - preds[ci])
        preds[ci] = dcv
        code, length = dcs[ci][size]
        sc.bw.write(code, length)
        if size:
            sc.bw.write(bits, size)
    sc.bw.flush()
    out += sc.bw.out

    # scan 2: DC refinement (Al=0) -- one raw bit per block
    out += sos_header(list(range(1, n_comp + 1)),
                      [0] * n_comp, [0] * n_comp, 0, 0, 1, 0)
    sc = _Scan()
    for ci, zz in mcu_blocks(sc):
        sc.bw.write(int(zz[0]) & 1, 1)
    sc.bw.flush()
    out += sc.bw.out

    # per-component block grids for non-interleaved AC scans
    grids = []
    for ci, (sh, sv) in enumerate(sampling):
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    # scans 3..: AC first per component (Ss=1..63, Al=1)
    for ci in range(n_comp):
        out += sos_header([ci + 1], [0], [0 if ci == 0 else 1],
                          1, 63, 0, 1)
        sc = _Scan()
        bh, bwid = grids[ci]
        for by in range(bh):
            for bx in range(bwid):
                sc.boundary()
                _emit_ac_first(coef[ci][by, bx], 1, 63, 1,
                               acs[ci], sc.bw)
        sc.bw.flush()
        out += sc.bw.out

    # scans ..: AC refinement per component (Ah=1, Al=0)
    for ci in range(n_comp):
        out += sos_header([ci + 1], [0], [0 if ci == 0 else 1],
                          1, 63, 1, 0)
        sc = _Scan()
        bh, bwid = grids[ci]
        for by in range(bh):
            for bx in range(bwid):
                sc.boundary()
                _emit_ac_refine(coef[ci][by, bx], 1, 63, 0,
                                acs[ci], sc.bw)
        sc.bw.flush()
        out += sc.bw.out

    out += b"\xff\xd9"
    return bytes(out)


def _emit_ac_first(zz, ss, se, al, ac_codes, bw):
    """AC first-scan block (T.81 G.1.2.2): run-length over the point-
    transformed band; EOB0 closes any trailing zero run."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            r -= 16
        sv = t if v > 0 else -t
        size, bits = _magnitude(sv)
        code, length = ac_codes[(r << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        r = 0
    if r:
        code, length = ac_codes[0x00]
        bw.write(code, length)


def _emit_ac_refine(zz, ss, se, al, ac_codes, bw):
    """AC refinement block (T.81 G.1.2.3): correction bits for
    history coefficients ride along buffered; newly nonzero
    coefficients emit (run, 1) + sign; EOB0 carries leftovers."""
    absv = [abs(int(zz[k])) >> al for k in range(64)]
    eob_pos = ss - 1
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob_pos = k
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # ZRL only when the run cannot fold into the final EOB
        while r > 15 and k <= eob_pos:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        code, length = ac_codes[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, length = ac_codes[0x00]
        bw.write(code, length)
        for b in pending:
            bw.write(b, 1)


# ------------------------------------------------------------------ #
# decoder


class _HuffTable:
    """Fast-enough canonical decoder: (length -> {code: symbol})."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.by_len: list[dict[int, int]] = [dict() for _ in range(17)]
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.by_len[length][code] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = self.by_len[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JPEG to ``(h, w)`` grayscale or ``(h, w, 3)`` RGB
    uint8.

    Handles baseline/extended sequential (SOF0/SOF1) including
    multi-scan non-interleaved files, AND progressive (SOF2) per
    T.81 Annex G: spectral selection, successive approximation, DC
    and AC refinement scans, EOB runs, and restart markers in any
    scan kind.  All scans accumulate into per-component coefficient
    buffers; dequantization + IDCT happen once at EOI (vectorized
    over all blocks).  Arithmetic coding, hierarchical (SOF3+), and
    12-bit precision raise ``NotImplementedError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None
    geom: dict = {}
    saw_scan = False
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # the spec allows 0xFF fill bytes before a marker code
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq:
                    raise NotImplementedError("16-bit DQT")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZZ_FLAT] = np.frombuffer(
                    body[off + 1:off + 65], dtype=np.uint8)
                qts[tq] = tab.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 prog
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            progressive = marker == 0xC2
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            geom = {"hmax": hmax, "vmax": vmax,
                    "mcux": mcux, "mcuy": mcuy}
            coef = []
            for c in comps:
                # full (MCU-padded) grid for interleaved addressing;
                # non-interleaved scans cover the ceil(size/8) subgrid
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bw"] = -(-cw // 8)
                c["bh"] = -(-ch // 8)
                coef.append(np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if coef is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si:3 + 2 * si]
                ci, comp = next(
                    (i, c) for i, c in enumerate(comps)
                    if c["id"] == cs)
                comp["td"] = tdta >> 4
                comp["ta"] = tdta & 0xF
                scan.append((ci, comp))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            pos = _decode_scan_into(
                data, pos, scan, coef, huff, geom,
                restart_interval, progressive, ss, se, ah, al)
            saw_scan = True
            # resume marker parsing: skip pad bits / stray restarts
            while pos < len(data) - 1:
                if data[pos] == 0xFF and data[pos + 1] != 0x00:
                    if 0xD0 <= data[pos + 1] <= 0xD7:
                        pos += 2
                        continue
                    break
                pos += 1
        # other segments (APPn, COM) are skipped
    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(comps, coef, qts, h, w, geom)


def _decode_scan_into(
    data, pos, scan, coef, huff, geom,
    restart_interval, progressive, ss, se, ah, al,
) -> int:
    """Decode one entropy-coded scan into the coefficient buffers;
    return the byte position after the scan data.  Dispatches on the
    T.81 scan kind: sequential (DC+AC), progressive DC first/refine,
    progressive AC first/refine (Annex G.2)."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError(
                "progressive AC scan must be non-interleaved")
        if ss > se or se > 63:
            raise ValueError("bad spectral selection bounds")
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    eobrun = [0]
    interleaved = len(scan) > 1
    mcux, mcuy = geom["mcux"], geom["mcuy"]

    def decode_block(si, zz):
        ci, c = scan[si]
        if not progressive:
            _seq_block(br, zz, huff[(0, c["td"])], huff[(1, c["ta"])],
                       preds, si)
        elif ss == 0 and ah == 0:
            size = huff[(0, c["td"])].decode(br)
            preds[si] += _extend(br.read(size), size)
            zz[0] = preds[si] << al
        elif ss == 0:
            if br.read(1):
                zz[0] |= 1 << al
        elif ah == 0:
            _ac_first_block(br, zz, huff[(1, c["ta"])], ss, se, al,
                            eobrun)
        else:
            _ac_refine_block(br, zz, huff[(1, c["ta"])], ss, se, al,
                             eobrun)

    if interleaved:
        units = mcuy * mcux
    else:
        # single-component scan: MCU = one block over the component's
        # own ceil(size/8) grid (T.81 A.2.2), in any coding mode
        _, c0 = scan[0]
        units = c0["bh"] * c0["bw"]
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            br.align_to_marker()
            preds = [0] * len(scan)
            eobrun[0] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for si, (ci, c) in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        decode_block(
                            si,
                            coef[ci][my * c["v"] + by,
                                     mx * c["h"] + bx])
        else:
            ci, c = scan[0]
            by, bx = divmod(u, c["bw"])
            decode_block(0, coef[ci][by, bx])
    return br.pos


def _seq_block(br, zz, dc_t, ac_t, preds, si):
    size = dc_t.decode(br)
    preds[si] += _extend(br.read(size), size)
    zz[0] = preds[si]
    k = 1
    while k < 64:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.read(s), s)
        k += 1


def _ac_first_block(br, zz, ac_t, ss, se, al, eobrun):
    """Progressive AC first scan for one block (T.81 G.2.2): baseline
    run-length coding over the spectral band, plus EOBn run symbols
    covering whole zero bands of the FOLLOWING blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += br.read(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        zz[k] = _extend(br.read(s), s) << al
        k += 1


def _ac_refine_block(br, zz, ac_t, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.2.3): one
    correction bit per already-nonzero coefficient, new coefficients
    enter with magnitude ``1 << al``, EOB runs carry correction bits
    for the blocks they span."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += br.read(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "AC refinement symbol with size != 1")
                newval = p1 if br.read(1) else m1
            # advance over r zero-history coefficients, emitting
            # correction bits for nonzero ones along the way
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if br.read(1) and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError(
                        "AC refinement run past the spectral band")
                zz[k] = newval
            k += 1
    if eobrun[0] > 0:
        # correction bits for the rest of this block's band
        while k <= se:
            v = int(zz[k])
            if v != 0:
                if br.read(1) and (v & p1) == 0:
                    zz[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun[0] -= 1


def _reconstruct(comps, coef, qts, h, w, geom) -> np.ndarray:
    """Dequantize + IDCT all blocks (vectorized), assemble planes,
    upsample subsampled chroma, convert color."""
    hmax, vmax = geom["hmax"], geom["vmax"]
    full = []
    for c, cz in zip(comps, coef):
        qt = qts[c["tq"]].astype(np.float64)
        nby, nbx, _ = cz.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[..., _ZZ_FLAT] = cz
        f = nat.reshape(nby, nbx, 8, 8) * qt[None, None]
        pix = np.einsum("ij,abjk,kl->abil", _CT, f, _C) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ch = -(-(h * c["v"]) // vmax)
        cw = -(-(w * c["h"]) // hmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise NotImplementedError(f"{len(full)}-component JPEG")
