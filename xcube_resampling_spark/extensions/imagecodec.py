"""Clean-room PNG and BMP image codecs (pure ``zlib`` + numpy).

No imaging library exists in this environment, so the two formats whose
byte layouts are fully public and whose only compression primitive is
deflate get real decoders here -- the same clean-room-codec pattern as
the blosc1/LZW/crc32c implementations in ``sources/``:

* **PNG** per the W3C PNG specification (ISO/IEC 15948): chunk stream
  with CRC-32 verification, IHDR/PLTE/IDAT/IEND (ancillary chunks like
  tRNS are CRC-checked then skipped; alpha is dropped by
  :func:`to_rgb` anyway), zlib-compressed scanlines, all five row
  filters (None/Sub/Up/Average/Paeth -- Average/Paeth are
  left-sequential by definition, so those two undo loops are scalar;
  Sub vectorizes as a per-lane cumsum, Up as one vector add), color
  types 0/2/3/4/6 at bit depths 1/2/4/8/16 -- 16-bit (DEM tiles,
  scientific rasters) decodes to uint16 with big-endian samples per
  the spec -- and Adam7 interlace (seven independently-filtered
  sub-images scattered by the fixed pass geometry).
* **BMP** per the Windows BITMAPFILEHEADER + BITMAPINFOHEADER layout:
  uncompressed (BI_RGB) 8/24/32-bit, bottom-up and top-down rows,
  4-byte row padding, 8-bit palette.

Encoders emit canonical subsets (PNG: non-interlaced 8- or 16-bit,
filter None; BMP: 24-bit BI_RGB) -- enough for lossless round-trips in
tests and for writing thumbnails / elevation tiles from pipelines.

The reference engine delegates raster decode to GDAL-family libraries;
this module is spec-derived, not ported (no reference counterpart).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_image_format(data: bytes) -> str | None:
    """'png' | 'bmp' | 'jpeg' | 'gif' | None from magic bytes."""
    if data[:8] == PNG_SIGNATURE:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"GIF8":
        return "gif"
    return None


# ------------------------------------------------------------------ #
# PNG


def _png_chunks(data: bytes):
    """Yield (type, payload) with CRC-32 verification."""
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG chunk truncated")
        crc_off = pos + 8 + length
        (crc,) = struct.unpack(">I", data[crc_off:crc_off + 4])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos = crc_off + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-row filters -> (h, stride) uint8 of raw scanlines."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8)
    for j in range(h):
        ftype = int(arr[j * (stride + 1)])
        row = arr[j * (stride + 1) + 1:(j + 1) * (stride + 1)].copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: cumulative per bpp lane
            pad = (-len(row)) % bpp
            lanes = np.concatenate(
                [row, np.zeros(pad, np.uint8)]
            ).reshape(-1, bpp).astype(np.int64)
            cur = (np.cumsum(lanes, axis=0) % 256) \
                .astype(np.uint8).reshape(-1)[:stride]
        elif ftype == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average (left-sequential)
            cur = np.empty(stride, dtype=np.uint8)
            r = row.astype(np.int64)
            p = prev.astype(np.int64)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (r[i] + (left + p[i]) // 2) % 256
        elif ftype == 4:  # Paeth (left-sequential)
            cur = np.empty(stride, dtype=np.uint8)
            r = row.astype(np.int64)
            p = prev.astype(np.int64)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(p[i])
                c = int(p[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (r[i] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[j] = cur
        prev = out[j]
    return out


def _unpack_subbyte(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) packed 1/2/4-bit samples -> (h, w) ints 0..2^d-1."""
    bits = np.unpackbits(rows, axis=1)  # MSB-first, per PNG packing
    h = rows.shape[0]
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    out = (vals.astype(np.uint16) * weights).sum(axis=2)
    return out[:, :w].astype(np.uint8)


# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _rows_to_samples(
    rows: np.ndarray, w: int, ch: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> sample grid: (h, w) ints for
    sub-byte depths, (h, w, ch) uint8 for depth 8, uint16 (big-endian
    samples) for depth 16."""
    h = rows.shape[0]
    stride = rows.shape[1]
    if depth == 16:
        be = np.ascontiguousarray(rows[:, :w * ch * 2])
        return be.view(">u2").reshape(h, w, ch).astype(np.uint16)
    if depth < 8:
        return _unpack_subbyte(rows, w, depth)
    return rows.reshape(h, stride)[:, :w * ch].reshape(h, w, ch)


def _deinterlace_adam7(
    raw: bytes, w: int, h: int, ch: int, depth: int
) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images, scattered onto
    the output grid by the fixed pass geometry.  Empty passes (zero
    width or height) contribute no scanlines, per the spec."""
    if depth == 16:
        out = np.zeros((h, w, ch), dtype=np.uint16)
    elif depth < 8:
        out = np.zeros((h, w), dtype=np.uint8)
    else:
        out = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    arr = np.frombuffer(raw, dtype=np.uint8)
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * ch * depth + 7) // 8
        bpp = max(1, (ch * depth + 7) // 8)
        need = ph * (stride + 1)
        chunk = arr[pos:pos + need]
        if len(chunk) != need:
            raise ValueError("PNG interlaced pixel data truncated")
        pos += need
        rows = _unfilter(chunk.tobytes(), ph, stride, bpp)
        samples = _rows_to_samples(rows, pw, ch, depth)
        out[y0::dy, x0::dx] = samples
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (uint16 for 16-bit
    files -- scientific rasters/DEM tiles; samples are stored
    big-endian per the spec and returned native).

    Channels follow the stored color type: 1 (gray / palette index
    resolved through PLTE to RGB -> 3), 2 (gray+alpha), 3 (RGB),
    4 (RGBA).  Use :func:`to_rgb` for a uniform (h, w, 3) view.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    w = h = depth = ctype = interlace = None
    plte: np.ndarray | None = None
    idat = bytearray()
    for tag, body in _png_chunks(data):
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unknown compression/filter method")
        elif tag == b"PLTE":
            if len(body) % 3:
                raise ValueError("PNG PLTE length not divisible by 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
    if w is None:
        raise ValueError("PNG has no IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype} invalid")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth} invalid")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG 16-bit palette images are invalid")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG depth {depth} invalid for color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        samples = _deinterlace_adam7(raw, w, h, ch, depth)
    else:
        stride = (w * ch * depth + 7) // 8
        bpp = max(1, (ch * depth + 7) // 8)
        rows = _unfilter(raw, h, stride, bpp)
        samples = _rows_to_samples(rows, w, ch, depth)
    if depth == 16:
        return samples
    if depth < 8:
        vals = samples
        if ctype == 0:  # gray: scale to full range
            scale = 255 // ((1 << depth) - 1)
            return (vals * scale).astype(np.uint8)[..., None]
        # palette
        if plte is None:
            raise ValueError("PNG palette image without PLTE")
        if int(vals.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[vals]
    if ctype == 3:
        if plte is None:
            raise ValueError("PNG palette image without PLTE")
        idxs = samples[..., 0]
        if int(idxs.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idxs]
    return samples


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Any decoded (h, w[, c]) uint8 -> (h, w, 3) RGB (alpha dropped,
    gray replicated; 16-bit samples scaled to their high byte)."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(img[..., :1], 3, axis=2)
    if c == 3:
        return img
    if c == 4:
        return img[..., :3]
    raise ValueError(f"cannot interpret {c}-channel image as RGB")


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w[, c]) uint8 or uint16 -> PNG bytes (8- or 16-bit,
    non-interlaced, filter None rows; c in {1: gray, 2: gray+alpha,
    3: RGB, 4: RGBA}).  uint16 input writes a 16-bit PNG with
    big-endian samples per the spec."""
    src = np.asarray(img)
    sixteen = src.dtype == np.uint16
    a = np.ascontiguousarray(
        src.astype(np.uint16 if sixteen else np.uint8))
    if a.ndim == 2:
        a = a[..., None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png needs (h, w) or (h, w, 1|2|3|4)")
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    depth = 16 if sixteen else 8
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    if sixteen:
        flat = np.ascontiguousarray(
            a.astype(">u2")).view(np.uint8).reshape(h, w * c * 2)
    else:
        flat = a.reshape(h, w * c)
    scan = np.zeros((h, flat.shape[1] + 1), dtype=np.uint8)
    scan[:, 1:] = flat  # filter byte 0 per row
    idat = zlib.compress(scan.tobytes(), level)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


# ------------------------------------------------------------------ #
# BMP

_BI_RGB = 0


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB.  Uncompressed (BI_RGB)
    8-bit-palette / 24-bit / 32-bit, bottom-up or top-down."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("BMP truncated")
    (data_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP core-header size {hdr_size} not supported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != _BI_RGB:
        raise NotImplementedError(
            f"BMP compression {compression} not supported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP {bpp}-bit not supported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("BMP has non-positive dimensions")
    palette: np.ndarray | None = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off:pal_off + 4 * n_colors], np.uint8
        ).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]]  # stored BGRA -> RGB
    row_bytes = (w * bpp // 8 + 3) & ~3  # 4-byte padded
    need = data_off + row_bytes * h
    if len(data) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(
        data[data_off:need], np.uint8
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idxs = rows[:, :w]
        if int(idxs.max(initial=0)) >= len(palette):
            raise ValueError("BMP palette index out of range")
        return palette[idxs]
    spp = bpp // 8
    px = rows[:, :w * spp].reshape(h, w, spp)
    return px[..., [2, 1, 0]]  # BGR(A) -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp needs (h, w, 3)")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pix = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB, len(pix),
        2835, 2835, 0, 0)
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return file_hdr + info + pix
