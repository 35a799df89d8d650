"""Clean-room WAV (RIFF/WAVE PCM) audio codec.

WAV with integer PCM is the standard uncompressed audio container and
its layout is fully public (RIFF chunks + a ``fmt `` descriptor + a
``data`` payload), so -- like PNG/BMP in :mod:`.imagecodec` -- audio
decode can be REAL here without external libraries: 8-bit unsigned and
16/32-bit signed little-endian PCM, any channel count.  Compressed
formats (MP3/AAC/FLAC) genuinely need codec libraries and stay behind
``DecoderNotAvailable`` in :mod:`.multimodal`.

The reference engine has no audio path at all; this exists for the
training-data extension surface (audio payload columns).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "is_wav"]

_PCM_DTYPES = {8: np.dtype("u1"), 16: np.dtype("<i2"),
               32: np.dtype("<i4")}


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ``(samples, sample_rate)``; samples shaped
    ``(n_frames, n_channels)``, dtype uint8 / int16 / int32 per the
    stored bit depth."""
    if not is_wav(data):
        raise ValueError("not a WAV (RIFF/WAVE) file")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            if len(body) != size:
                raise ValueError("WAV data chunk truncated")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _brate, _align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported (PCM only)")
    dt = _PCM_DTYPES.get(bits)
    if dt is None:
        raise NotImplementedError(f"WAV {bits}-bit PCM not supported")
    if channels < 1:
        raise ValueError("WAV channel count must be >= 1")
    frame_bytes = dt.itemsize * channels
    usable = len(pcm) - len(pcm) % frame_bytes
    samples = np.frombuffer(pcm[:usable], dtype=dt).reshape(-1, channels)
    return samples, int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """``(n_frames[, n_channels])`` uint8/int16/int32 -> WAV bytes."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    kind_bits = {("u", 1): 8, ("i", 2): 16, ("i", 4): 32}
    bits = kind_bits.get((a.dtype.kind, a.dtype.itemsize))
    if bits is None:
        raise ValueError(
            f"dtype {a.dtype} not WAV-PCM (uint8/int16/int32)")
    if bits > 8:
        a = a.astype(a.dtype.newbyteorder("<"))
    channels = a.shape[1]
    pcm = np.ascontiguousarray(a).tobytes()
    align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, int(sample_rate),
        int(sample_rate) * align, align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
