"""MPEG audio (MP3/MP2/MP1) frame-level splitting -- stream plumbing,
no decode.

The audio twin of :mod:`.mp4demux`: walk an MPEG audio elementary
stream frame by frame using only the public ISO 11172-3 / 13818-3
header layout (the same tables :mod:`.mediaprobe` probes the FIRST
frame with) and emit one record per frame -- offset, size, timing,
layer/bitrate/samplerate -- so a large audio corpus can be split into
per-frame rows distributed: windowed segment extraction, per-frame
dedup/fingerprints, routing payload bytes to a downstream decoder.
Frame SIZES follow from the header alone (that is what makes
splitting possible without decoding):

* Layer I:        ``(12000 * kbps // sr + pad) * 4`` bytes
* Layer II/III:   ``N * 1000 * kbps // sr + pad`` where ``N`` = 144
  for MPEG-1 and for MPEG-2/2.5 Layer II; 72 for MPEG-2/2.5 Layer III
* samples/frame:  L1 = 384; L2 = 1152; L3 = 1152 (MPEG-1) / 576
  (MPEG-2/2.5)

ID3v2 prefix tags are skipped by declared size; a trailing 128-byte
ID3v1 ``TAG`` block ends the walk; anything unparseable mid-stream
stops cleanly with the bad offset reported (strict mode) rather than
guessing a resync.

Decode remains out of scope (Layer III synthesis needs the spec's
coefficient tables verbatim); :func:`split_mpeg_audio` is the
probe-and-route tier, one shuffle-free Arrow ``mapInPandas`` pass.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .mediaprobe import _MP3_BITRATES, _MP3_RATES

__all__ = [
    "build_mpeg_audio",
    "parse_mpeg_frames",
    "split_mpeg_audio",
]

_VER_BITS = {3: "v1", 2: "v2", 0: "v2"}  # MPEG1 / MPEG2 / MPEG2.5


def _frame_geometry(ver: int, layer: int, kbps: int, sr: int,
                    pad: int) -> tuple[int, int]:
    """(frame_size_bytes, samples_per_frame) from header fields."""
    if layer == 1:
        return (12000 * kbps // sr + pad) * 4, 384
    if layer == 2:
        return 144000 * kbps // sr + pad, 1152
    # Layer III
    if ver == 3:
        return 144000 * kbps // sr + pad, 1152
    return 72000 * kbps // sr + pad, 576


def parse_mpeg_frames(data: bytes, *, want_payload: bool = True):
    """Split an MPEG audio stream into per-frame records.

    Returns ``(info, frames, error)``: ``info`` carries the stream
    header (codec/sample_rate/channels), ``frames`` the per-frame
    records ``{frame_idx, offset, size, kbps, n_samples,
    duration_us, data?}``, and ``error`` is None or a message naming
    the offset where the walk had to stop (frames before it are
    still returned -- the salvage contract)."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size + (10 if data[5] & 0x10 else 0)
    info: dict = {}
    frames: list[dict] = []
    idx = 0
    while pos + 4 <= len(data):
        if data[pos:pos + 3] == b"TAG" and pos + 128 >= len(data):
            break  # trailing ID3v1 tag
        b0, b1, b2, b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return info, frames, f"lost sync at offset {pos}"
        ver = (b1 >> 3) & 3
        layer = 4 - ((b1 >> 1) & 3)
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if ver == 1 or layer == 4 or sr_idx == 3:
            return info, frames, f"reserved header field at {pos}"
        if br_idx == 0 or br_idx == 15:
            return info, frames, (
                f"free/bad bitrate index at {pos} (free-format "
                f"streams need decoder-side sizing)")
        sr = _MP3_RATES[ver][sr_idx]
        kbps = _MP3_BITRATES[(_VER_BITS[ver], layer)][br_idx - 1]
        size, n_samp = _frame_geometry(ver, layer, kbps, sr, pad)
        if pos + size > len(data):
            return info, frames, (
                f"truncated frame at {pos} (needs {size} bytes)")
        if not info:
            info = {
                "codec": f"mpeg{'1' if ver == 3 else '2'}"
                         f"_layer{layer}",
                "sample_rate": sr,
                "channels": 1 if (b3 >> 6) == 3 else 2,
            }
        rec = {
            "frame_idx": idx, "offset": pos, "size": size,
            "kbps": kbps, "n_samples": n_samp,
            "duration_us": n_samp * 1_000_000 // sr,
        }
        if want_payload:
            rec["data"] = data[pos:pos + size]
        frames.append(rec)
        pos += size
        idx += 1
    return info, frames, None


def build_mpeg_audio(
    n_frames: int,
    *,
    version: int = 3,            # header bits: 3=MPEG1, 2=MPEG2
    layer: int = 2,
    bitrate_indexes: tuple[int, ...] = (4, 6),
    sr_index: int = 2,
    channels: int = 1,
    padding: tuple[int, ...] = (0,),
    payload: bytes = b"",
    id3v2: bytes | None = None,
) -> bytes:
    """Write a syntactically valid MPEG audio stream: real headers,
    deterministic filler payload (``payload`` bytes cycled).  Frame
    ``k`` uses ``bitrate_indexes[k % len]`` and ``padding[k % len]``
    -- a VBR-ish stream whose frame sizes genuinely vary, so the
    walker's size arithmetic is what round-trips."""
    layer_bits = 4 - layer
    out = bytearray()
    if id3v2 is not None:
        n = len(id3v2)
        out += b"ID3\x04\x00\x00" + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F,
             (n >> 7) & 0x7F, n & 0x7F]) + id3v2
    fill = payload or b"\x00"
    fpos = 0
    for k in range(n_frames):
        br_idx = bitrate_indexes[k % len(bitrate_indexes)]
        pad = padding[k % len(padding)]
        b1 = 0xE0 | (version << 3) | (layer_bits << 1) | 1
        b2 = (br_idx << 4) | (sr_index << 2) | (pad << 1)
        b3 = (0xC0 if channels == 1 else 0x00)
        sr = _MP3_RATES[version][sr_index]
        kbps = _MP3_BITRATES[(_VER_BITS[version], layer)][br_idx - 1]
        size, _ = _frame_geometry(version, layer, kbps, sr, pad)
        body = bytes(
            fill[(fpos + i) % len(fill)] for i in range(size - 4))
        fpos += size - 4
        out += bytes([0xFF, b1, b2, b3]) + body
    return bytes(out)


def encode_mpeg_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    base_frames: int = 4,
    mod_frames: int = 5,
) -> DataFrame:
    """Containerize payload bytes as MPEG-1 Layer II streams with
    ``base_frames + media_id % mod_frames`` frames each (executor-
    side, shuffle-free) -- closed-form frame counts/sizes a SQL
    oracle can replay while the emitted headers are real."""
    cols = [id_col, payload_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, payloads = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                mids.append(mid)
                payloads.append(build_mpeg_audio(
                    base_frames + int(mid) % mod_frames,
                    payload=bytes(payload or b"")))
            yield pd.DataFrame(
                {"media_id": mids, "payload": payloads})

    return media.select(*cols).mapInPandas(
        gen, "media_id long, payload binary")


_SPLIT_SCHEMA = (
    "media_id long, frame_idx int, offset long, size long, "
    "kbps int, sample_rate int, n_samples int, duration_us long, "
    "codec string, data binary, error string"
)


def split_mpeg_audio(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    want_payload: bool = True,
) -> DataFrame:
    """One row per MPEG audio frame (narrow Arrow ``mapInPandas``, no
    shuffle).  A stream that stops parsing mid-way still yields its
    leading frames, with ``error`` set on one trailing marker row."""
    cols = [id_col, payload_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "frame_idx", "offset", "size", "kbps",
                "sample_rate", "n_samples", "duration_us", "codec",
                "data", "error")}

            def emit(mid, rec, info, err=None):
                out["media_id"].append(mid)
                for k in ("frame_idx", "offset", "size", "kbps",
                          "n_samples", "duration_us"):
                    out[k].append(None if rec is None else rec[k])
                out["sample_rate"].append(info.get("sample_rate"))
                out["codec"].append(info.get("codec"))
                out["data"].append(
                    None if rec is None else rec.get("data"))
                out["error"].append(err)

            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    info, frames, err = parse_mpeg_frames(
                        bytes(payload or b""),
                        want_payload=want_payload)
                except (ValueError, struct.error) as exc:
                    info, frames = {}, []
                    err = f"{type(exc).__name__}: {exc}"
                for rec in frames:
                    emit(mid, rec, info)
                if err is not None:
                    emit(mid, None, info, err)
            yield pd.DataFrame(out)

    return media.select(*cols).mapInPandas(gen, _SPLIT_SCHEMA)
