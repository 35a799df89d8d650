"""Clean-room baseline JPEG codec (ITU-T T.81 / ISO 10918-1, baseline
sequential DCT, Huffman entropy coding) -- pure numpy, no imaging
library, same clean-room pattern as the PNG/BMP/WAV/Y4M codecs.

Encoder
-------
JFIF output: 8x8 forward DCT (exact matrix form), Annex-K quantization
tables scaled by the libjpeg quality formula, zigzag + DC DPCM + AC
run-length coding, standard-shaped canonical Huffman tables (embedded
in DHT, so ANY conforming decoder reads them -- validity does not
depend on matching libjpeg's defaults bit-for-bit), 4:4:4 or 4:2:0
chroma subsampling, grayscale or RGB (BT.601 full-range YCbCr).

Decoder
-------
General baseline: parses DQT/DHT/SOF0/SOS/DRI from the stream (tables
come from the FILE, not from this module's constants), interleaved
MCU scan with sampling factors 1-2, restart markers, byte unstuffing,
dequantize + inverse DCT + chroma upsampling + color conversion.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` loudly.

The reference engine gets JPEG from GDAL-family libraries; this module
is spec-derived, not ported (no reference counterpart).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

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
    block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes,
    dc_pred: int, bw: _BitWriter,
) -> int:
    f = _C @ (block - 128.0) @ _CT
    q = np.round(f / qt).astype(np.int64)
    zz = q.reshape(-1)[_ZZ_FLAT]
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
    subsampling) or ``'420'`` (2x2 -- the web default);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real camera files use)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg needs uint8 input")
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        sampling = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "444":
            planes = [ycc[..., c] for c in range(3)]
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            y = ycc[..., 0]
            # mean-pool chroma 2x2 (pad odd dims first)
            cb = _pad_to_blocks(ycc[..., 1], 2, 2)
            cr = _pad_to_blocks(ycc[..., 2], 2, 2)
            cb = cb.reshape(
                cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(
                cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            planes = [y, cb, cr]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
    else:
        raise ValueError("encode_jpeg needs (h,w) or (h,w,3) input")
    h, w = img.shape[:2]
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
    padded = []
    for p, (sh, sv) in zip(planes, sampling):
        ph = mcuy * 8 * sv
        pw = mcux * 8 * sh
        pp = _pad_to_blocks(p, 8, 8)
        pp = np.pad(
            pp,
            ((0, ph - pp.shape[0]), (0, pw - pp.shape[1])),
            mode="edge",
        )
        padded.append(pp)

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
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            block, qts[ci], dcs[ci], acs[ci],
                            preds[ci], bw,
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


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
    """Decode a baseline JPEG to ``(h, w)`` grayscale or ``(h, w, 3)``
    RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while pos < len(data):
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} "
                "(progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG not "
                    "supported -- one interleaved scan only")
            order = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"] = tdta >> 4
                comp["ta"] = tdta & 0xF
                order.append(comp)
            return _decode_scan(
                data, pos, order, qts, huff, h, w, restart_interval)
        # other segments (APPn, COM) are skipped
    raise ValueError("no SOS marker found")


def _decode_scan(
    data, pos, comps, qts, huff, h, w, restart_interval
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros(
            (mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_to_marker()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, c["td"])]
                ac_t = huff[(1, c["ta"])]
                qt = qts[c["tq"]].astype(np.float64)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = dc_t.decode(br)
                        diff = _extend(br.read(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
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
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZZ_FLAT] = zz
                        f = blk.reshape(8, 8) * qt
                        pix = _CT @ f @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1
    full = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise NotImplementedError(f"{len(full)}-component JPEG")
