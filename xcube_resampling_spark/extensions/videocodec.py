"""Clean-room Y4M (YUV4MPEG2) video codec.

YUV4MPEG2 is the standard UNCOMPRESSED video interchange container
(the format ffmpeg/mjpegtools pipe raw video through): an ASCII header
line, then one ``FRAME\\n`` marker + raw planar YUV per frame.  Like
WAV for audio and PNG/BMP for images, its layout is fully public and
needs no codec library, so video decode can be REAL here; compressed
video (H.264/VP9/AV1) genuinely needs external decoders and stays
behind ``DecoderNotAvailable`` in :mod:`.multimodal`.

Supported colorspaces: ``Cmono`` (Y only), ``C420``/``C420jpeg``/
``C420mpeg2``/``C420paldv`` (all share the same plane sizes -- chroma
siting differences don't change the byte layout), ``C444``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_y4m", "encode_y4m", "is_y4m"]

_MAGIC = b"YUV4MPEG2"

# colorspace -> chroma subsampling (None = no chroma planes)
_CHROMA = {
    "mono": None,
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "444": (1, 1),
}


def is_y4m(data: bytes) -> bool:
    return data[:9] == _MAGIC


def decode_y4m(data: bytes):
    """Y4M bytes -> ``(y, u, v, meta)``.

    ``y`` is ``(n_frames, h, w)`` uint8; ``u``/``v`` are
    ``(n_frames, ch, cw)`` uint8 or ``None`` for mono; ``meta`` is a
    dict with ``width height fps colorspace``."""
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M header line unterminated")
    w = h = None
    fps = (25, 1)
    cs = "420"
    for tok in data[9:nl].split(b" "):
        tok = tok.decode("ascii", errors="replace")
        if not tok:
            continue
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, _, den = tok[1:].partition(":")
            fps = (int(num), int(den or 1))
        elif tok[0] == "C":
            cs = tok[1:]
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cs not in _CHROMA:
        raise NotImplementedError(f"Y4M colorspace C{cs} not supported")
    sub = _CHROMA[cs]
    if sub and (w % sub[0] or h % sub[1]):
        raise ValueError(
            f"Y4M C{cs} needs dimensions divisible by {sub}")
    y_size = w * h
    if sub:
        cw, ch_ = w // sub[0], h // sub[1]
        c_size = cw * ch_
    else:
        cw = ch_ = c_size = 0
    frame_bytes = y_size + 2 * c_size
    ys, us, vs = [], [], []
    pos = nl + 1
    n = len(data)
    while pos < n:
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("Y4M FRAME marker missing or corrupt")
        pos = fnl + 1
        if pos + frame_bytes > n:
            raise ValueError("Y4M frame data truncated")
        buf = np.frombuffer(data[pos:pos + frame_bytes], np.uint8)
        ys.append(buf[:y_size].reshape(h, w))
        if sub:
            us.append(buf[y_size:y_size + c_size].reshape(ch_, cw))
            vs.append(buf[y_size + c_size:].reshape(ch_, cw))
        pos += frame_bytes
    meta = {"width": w, "height": h, "fps": fps, "colorspace": cs}
    y = np.stack(ys) if ys else np.zeros((0, h, w), np.uint8)
    if sub:
        u = np.stack(us) if us else np.zeros((0, ch_, cw), np.uint8)
        v = np.stack(vs) if vs else np.zeros((0, ch_, cw), np.uint8)
    else:
        u = v = None
    return y, u, v, meta


def encode_y4m(
    y: np.ndarray,
    u: np.ndarray | None = None,
    v: np.ndarray | None = None,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """``(n, h, w)`` uint8 Y frames (+ optional matching chroma
    planes, both or neither) -> Y4M bytes (Cmono, C444, or C420 by the
    chroma shape)."""
    ya = np.ascontiguousarray(np.asarray(y, dtype=np.uint8))
    if ya.ndim != 3:
        raise ValueError("y must be (n_frames, h, w)")
    n, h, w = ya.shape
    if (u is None) != (v is None):
        raise ValueError("pass both u and v, or neither")
    if u is None:
        cs = "mono"
    else:
        u = np.ascontiguousarray(np.asarray(u, dtype=np.uint8))
        v = np.ascontiguousarray(np.asarray(v, dtype=np.uint8))
        if u.shape != v.shape or u.ndim != 3 or u.shape[0] != n:
            raise ValueError("chroma planes must match (n, ch, cw)")
        if u.shape[1:] == (h, w):
            cs = "444"
        elif u.shape[1:] == (h // 2, w // 2) and h % 2 == 0 \
                and w % 2 == 0:
            cs = "420"
        else:
            raise ValueError(
                f"chroma shape {u.shape[1:]} is neither 4:4:4 nor "
                f"4:2:0 of {(h, w)}")
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
            .encode("ascii"))
    parts = [head]
    for k in range(n):
        parts.append(b"FRAME\n")
        parts.append(ya[k].tobytes())
        if u is not None:
            parts.append(u[k].tobytes())
            parts.append(v[k].tobytes())
    return b"".join(parts)
