"""Clean-room GIF codec (GIF87a/GIF89a, CompuServe spec + W3C GIF89a
specification) -- pure numpy, no imaging library, same pattern as the
PNG/BMP/JPEG codecs.

Decoder
-------
Logical screen descriptor + global/local color tables, interlaced and
non-interlaced image descriptors, variable-width LSB-first LZW with
clear/end codes and the 4096-entry dictionary cap, GIF89a extensions
(graphic control: transparency + disposal, comment, application --
skipped structurally), multi-frame animations with disposal methods
"none/keep" (1), "restore background" (2), and "restore previous"
(3).  :func:`decode_gif` returns the first frame as ``(h, w, 3)``
uint8 (transparent pixels take the background color);
:func:`decode_gif_frames` yields every composited frame -- the frame-
sample source for the multimodal video pipeline, like the Y4M path.

Encoder
-------
Single-frame GIF89a: adaptive palette via exact color enumeration
when the image has <= 256 distinct colors, else a fixed 6x7x6 color
cube with nearest-match quantization; variable-width LZW with
dictionary reset at 4096.  Round-trips exactly for <= 256-color
images (every decoded system GIF re-encodes losslessly).

The reference engine has no GIF path (xarray rasters); this extends
the LLM-data multimodal surface.  Executed per payload inside Arrow
``mapInPandas`` batches -- chunk-local, never a shuffle stage.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]


def _color_table(data: bytes, pos: int, n: int):
    tab = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                        offset=pos).reshape(n, 3).copy()
    return tab, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks (length-prefixed, 0 terminates)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        parts.append(data[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("GIF sub-block truncated")
        pos += n
    return b"".join(parts), pos


def _lzw_decode(stream: bytes, min_code_size: int, n_pixels: int
                ) -> np.ndarray:
    """Variable-width LSB-first GIF LZW -> index array."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(stream)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                # tolerate a missing explicit end code (seen in the
                # wild); emit what we have
                out.extend(b"\x00" * (n_pixels - len(out)))
                return np.frombuffer(bytes(out), dtype=np.uint8)
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            # an early end code (truncated/malformed file) zero-fills
            # the remainder, same salvage as a missing end code
            if len(out) < n_pixels:
                out.extend(b"\x00" * (n_pixels - len(out)))
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code would not fit (deferred-clear
        # encoders stop at 12 bits)
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    r = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[r]
            r += 1
    return out


def decode_gif_frames(data: bytes):
    """Yield ``(frame_rgb, delay_cs)`` for every frame, composited per
    the GIF89a disposal model onto the logical screen."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (no GIF87a/GIF89a signature)")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(data, pos, 2 << (flags & 7))
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    screen = np.zeros((sh, sw, 3), np.uint8)
    screen[:] = bg_rgb
    transparent = None
    disposal = 0
    delay = 0
    yielded = False
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _sub_blocks(data, pos)
                if len(blk) >= 4:
                    gflags = blk[0]
                    (delay,) = struct.unpack_from("<H", blk, 1)
                    transparent = blk[3] if gflags & 1 else None
                    disposal = (gflags >> 2) & 7
            else:  # comment / application / plain text: skip
                _, pos = _sub_blocks(data, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            ct, pos = _color_table(data, pos, 2 << (iflags & 7))
        if ct is None:
            raise ValueError("GIF image has no color table")
        mcs = data[pos]
        pos += 1
        stream, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(stream, mcs, w * h)
        if iflags & 0x40:
            idx = _deinterlace(idx, h, w)
        else:
            idx = idx.reshape(h, w)
        idx = np.minimum(idx, len(ct) - 1)
        before = screen.copy() if disposal == 3 else None
        region = ct[idx]
        tile = screen[top:top + h, left:left + w]
        th, tw = tile.shape[:2]  # frame rects may overhang the screen
        if transparent is not None:
            mask = (idx != transparent)[:th, :tw, np.newaxis]
            tile[:] = np.where(mask, region[:th, :tw], tile)
        else:
            tile[:] = region[:th, :tw]
        yield screen.copy(), delay
        yielded = True
        if disposal == 2:  # restore background in the frame's region
            screen[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3 and before is not None:
            screen = before
        transparent = None
        disposal = 0
    if not yielded:
        raise ValueError("GIF contains no image data")


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as ``(h, w, 3)`` uint8."""
    for frame, _delay in decode_gif_frames(data):
        return frame
    raise ValueError("GIF contains no image data")


# ------------------------------------------------------------------ #
# encoder


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    cur = b""
    for v in indices.tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code <= 4095:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode ``(h, w, 3)`` or ``(h, w)`` uint8 to a single-frame
    GIF89a.  Images with <= 256 distinct colors round-trip exactly;
    richer images quantize to a 6x7x6 color cube."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_gif needs uint8 input")
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif needs (h,w) or (h,w,3) input")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        palette = colors
        indices = inverse.astype(np.uint8)
    else:
        # fixed 6x7x6 cube (252 colors)
        r = np.minimum(flat[:, 0].astype(np.int32) * 6 // 256, 5)
        g = np.minimum(flat[:, 1].astype(np.int32) * 7 // 256, 6)
        b = np.minimum(flat[:, 2].astype(np.int32) * 6 // 256, 5)
        indices = (r * 42 + g * 6 + b).astype(np.uint8)
        rr, gg, bb = np.meshgrid(
            np.linspace(25, 230, 6), np.linspace(21, 234, 7),
            np.linspace(25, 230, 6), indexing="ij")
        palette = np.stack(
            [rr.ravel(), gg.ravel(), bb.ravel()], axis=1
        ).astype(np.uint8)
    n = max(2, 1 << max(1, (len(palette) - 1).bit_length()))
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    gct_bits = n.bit_length() - 2  # table size field: 2 << bits == n
    mcs = max(2, n.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out += bytes([mcs])
    stream = _lzw_encode(indices, mcs)
    for off in range(0, len(stream), 255):
        blk = stream[off:off + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)
