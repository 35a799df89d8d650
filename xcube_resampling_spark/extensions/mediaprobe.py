"""Container probing: identify a media payload and pull its declared
metadata WITHOUT decoding -- the cheap first pass of a crawled-media
curation pipeline (filter by codec/dimensions/duration before any
expensive decode, and know what a payload IS even when its codec
needs an external decoder).

Pure header parsing from the public container specs:

* MP4 / ISO-BMFF (the dominant crawled-video container): box walk --
  ``ftyp`` brand, ``mvhd`` timescale/duration, per-``trak`` ``tkhd``
  dimensions + ``hdlr`` handler + ``stsd`` sample-entry fourcc (the
  codec, e.g. ``avc1``/``hev1``/``mp4a``).  Metadata only: H.264/AAC
  payloads still need external decoders and stay undecodable here.
* AVI, GIF, Y4M, WAV, FLAC, PNG, BMP, JPEG (incl. progressive),
  MP3 (ID3/frame-sync detection, format only).

Everything returns plain dict fields; :func:`media_probe` is the
Spark operator (one Arrow ``mapInPandas`` pass, fixed schema).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np  # noqa: F401  (kept for parity with sibling modules)
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["probe_media", "media_probe"]


def _mp4_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated: stop cleanly
        yield btype, body, pos + size
        pos += size


def _probe_mp4(data: bytes) -> dict:
    out = {"format": "mp4"}
    tracks = []
    for btype, body, bend in _mp4_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            out["brand"] = data[body:body + 4].decode(
                "ascii", errors="replace").strip()
        elif btype == b"moov":
            for b2, p2, e2 in _mp4_boxes(data, body, bend):
                if b2 == b"mvhd":
                    ver = data[p2]
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", data,
                                                     p2 + 4 + 16)
                    else:
                        ts, dur = struct.unpack_from(">II", data,
                                                     p2 + 4 + 8)
                    if ts:
                        out["duration_ms"] = int(dur * 1000 // ts)
                elif b2 == b"trak":
                    tracks.append(_probe_trak(data, p2, e2))
    vid = next((t for t in tracks if t.get("kind") == "vide"), None)
    aud = next((t for t in tracks if t.get("kind") == "soun"), None)
    if vid:
        out["width"] = vid.get("width")
        out["height"] = vid.get("height")
        out["codec"] = vid.get("codec")
    if aud:
        out["audio_codec"] = aud.get("codec")
    out["n_tracks"] = len(tracks)
    return out


def _probe_trak(data: bytes, start: int, end: int) -> dict:
    t: dict = {}
    for btype, body, bend in _mp4_boxes(data, start, end):
        if btype == b"tkhd":
            ver = data[body]
            off = body + 4 + (32 if ver == 1 else 20)
            # reserved(8) layer(2) alt(2) volume(2) reserved(2)
            # matrix(36) then width/height as 16.16 fixed
            off += 8 + 2 + 2 + 2 + 2 + 36
            if off + 8 <= bend:
                w, h = struct.unpack_from(">II", data, off)
                t["width"], t["height"] = w >> 16, h >> 16
        elif btype == b"mdia":
            for b2, p2, e2 in _mp4_boxes(data, body, bend):
                if b2 == b"hdlr":
                    t["kind"] = data[p2 + 8:p2 + 12].decode(
                        "ascii", errors="replace")
                elif b2 == b"minf":
                    for b3, p3, e3 in _mp4_boxes(data, p2, e2):
                        if b3 != b"stbl":
                            continue
                        for b4, p4, e4 in _mp4_boxes(data, p3, e3):
                            if b4 == b"stsd" and p4 + 16 <= e4:
                                t["codec"] = data[p4 + 12:p4 + 16
                                                  ].decode(
                                    "ascii", errors="replace").strip()
    return t


# MPEG audio frame-header tables (ISO 11172-3 / 13818-3, public)
_MP3_BITRATES = {
    # (version_group, layer): kbps by bitrate index 1-14
    ("v1", 1): (32, 64, 96, 128, 160, 192, 224, 256,
                288, 320, 352, 384, 416, 448),
    ("v1", 2): (32, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 384),
    ("v1", 3): (32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320),
    ("v2", 1): (32, 48, 56, 64, 80, 96, 112, 128,
                144, 160, 176, 192, 224, 256),
    ("v2", 2): (8, 16, 24, 32, 40, 48, 56, 64,
                80, 96, 112, 128, 144, 160),
    ("v2", 3): (8, 16, 24, 32, 40, 48, 56, 64,
                80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def _probe_mp3(data: bytes) -> dict:
    """Parse the first MPEG audio frame header (after any ID3v2 tag):
    layer, bitrate, sample rate, channel mode -- plus a CBR-assuming
    duration estimate.  No decode (Layer III needs an external
    decoder and stays honest about it)."""
    out = {"format": "mp3", "codec": "mp3"}
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size + (10 if data[5] & 0x10 else 0)
    if pos + 4 > len(data):
        return out
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return out
    ver = (b1 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = 4 - ((b1 >> 1) & 3)  # field 3->Layer I ... 1->Layer III
    br_idx = b2 >> 4
    sr_idx = (b2 >> 2) & 3
    if ver == 1 or layer == 4 or sr_idx == 3:
        return out  # reserved fields: report format only
    out["codec"] = f"mpeg{'1' if ver == 3 else '2'}_layer{layer}"
    rates = _MP3_RATES[ver]
    out["sample_rate"] = rates[sr_idx]
    out["channels"] = 1 if (b3 >> 6) == 3 else 2
    if 1 <= br_idx <= 14:
        group = "v1" if ver == 3 else "v2"
        kbps = _MP3_BITRATES[(group, layer)][br_idx - 1]
        out["duration_ms"] = int(
            (len(data) - pos) * 8 // kbps)  # CBR estimate
    return out


def _gif_frame_count(data: bytes) -> int:
    """Count image descriptors by walking GIF blocks (skipping LZW
    sub-block lengths -- no pixel decode)."""
    try:
        flags = data[10]
        pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
        count = 0
        while pos < len(data):
            b = data[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(data) and data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                count += 1
                dflags = data[pos + 9]
                pos += 10
                if dflags & 0x80:
                    pos += 3 * (2 << (dflags & 7))
                pos += 1  # LZW minimum code size
                while pos < len(data) and data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            else:
                break  # malformed: stop counting
        return count
    except IndexError:
        return 0


def _probe_jpeg(data: bytes) -> dict:
    out = {"format": "jpeg"}
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            h, w = struct.unpack_from(">HH", data, pos + 5)
            out.update(width=w, height=h,
                       codec="jpeg_progressive" if marker == 0xC2
                       else "jpeg_baseline")
            return out
        if marker == 0xDA:
            break
        if 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + seglen
    return out


def probe_media(payload: bytes) -> dict:
    """Sniff + header-parse one payload; always returns at least
    ``{"format": ...}`` (``"unknown"`` if nothing matches).  Never
    decodes sample data and NEVER raises -- truncated or malformed
    headers degrade to the bare sniffed format (crawled data is the
    whole point of a prober), so it is safe and cheap on ANY input,
    including codecs this engine cannot decode (H.264 MP4s, MP3s)."""
    data = payload or b""
    try:
        return _probe(data)
    except Exception:
        # header parse died mid-way: keep the sniffed format at least
        return {"format": _sniff(data)}


def _sniff(data: bytes) -> str:
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC" or data[:3] == b"ID3":
        return "flac" if data[:4] == b"fLaC" else "mp3"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def _probe(data: bytes) -> dict:
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return _probe_mp4(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        out = {"format": "avi"}
        try:
            from .avicodec import _chunks

            (riff_size,) = struct.unpack_from("<I", data, 4)
            end = min(len(data), 8 + riff_size)
            n_streams = 0
            for fourcc, body, size in _chunks(data, 12, end):
                if fourcc == b"LIST" and data[body:body + 4] == b"hdrl":
                    for f2, b2, s2 in _chunks(data, body + 4,
                                              body + size):
                        if f2 == b"avih":
                            (uspf,) = struct.unpack_from(
                                "<I", data, b2)
                            (total,) = struct.unpack_from(
                                "<I", data, b2 + 16)
                            w, h = struct.unpack_from(
                                "<II", data, b2 + 32)
                            out.update(
                                width=w, height=h, n_frames=total,
                                duration_ms=int(
                                    total * uspf // 1000))
                        elif f2 == b"LIST" and data[b2:b2 + 4] == \
                                b"strl":
                            n_streams += 1
                            for f3, b3, s3 in _chunks(
                                    data, b2 + 4, b2 + s2):
                                if (f3 == b"strh"
                                        and data[b3:b3 + 4] == b"vids"):
                                    c = data[b3 + 4:b3 + 8].decode(
                                        "ascii", errors="replace"
                                    ).strip("\x00 ")
                                    out["codec"] = c or "DIB"
            out["n_tracks"] = n_streams
        except ValueError:
            pass
        return out
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return {"format": "gif", "width": w, "height": h,
                "n_frames": _gif_frame_count(data)}
    if data[:9] == b"YUV4MPEG2":
        nl = data.find(b"\n")
        out = {"format": "y4m"}
        cs = "420"
        for tok in data[9:nl].split(b" "):
            tok = tok.decode("ascii", errors="replace")
            if tok[:1] == "W":
                out["width"] = int(tok[1:])
            elif tok[:1] == "H":
                out["height"] = int(tok[1:])
            elif tok[:1] == "C":
                cs = tok[1:]
        w, h = out.get("width", 0), out.get("height", 0)
        if cs == "mono":
            fsize = w * h
        elif cs.startswith("444alpha"):
            fsize = 4 * w * h
        elif cs.startswith("444"):
            fsize = 3 * w * h
        elif cs.startswith("422"):
            fsize = w * h + 2 * ((w // 2) * h)
        elif cs.startswith("411"):
            fsize = w * h + 2 * ((w // 4) * h)
        else:  # the 420 family
            fsize = w * h + 2 * ((w // 2) * (h // 2))
        # walk FRAME markers structurally (the raw planes can contain
        # the ASCII bytes 'FRAME', so a substring count would lie)
        n, pos = 0, nl + 1
        while (fsize and pos + 5 <= len(data)
               and data[pos:pos + 5] == b"FRAME"):
            fnl = data.find(b"\n", pos)
            if fnl < 0:
                break
            pos = fnl + 1 + fsize
            if pos > len(data):
                break
            n += 1
        out["n_frames"] = n
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        # walk RIFF chunks (a substring find would match 'data'
        # inside a LIST-INFO/bext comment)
        from .avicodec import _chunks

        out = {"format": "wav"}
        fmt = None
        nbytes = None
        (riff_size,) = struct.unpack_from("<I", data, 4)
        end = min(len(data), 8 + riff_size)
        for fourcc, body, size in _chunks(data, 12, end):
            if fourcc == b"fmt " and size >= 14:
                tag, ch, rate, _avg, align = struct.unpack_from(
                    "<HHIIH", data, body)
                bits = (struct.unpack_from("<H", data, body + 14)[0]
                        if size >= 16
                        else (align // max(ch, 1)) * 8)
                fmt = (tag, ch, rate, bits)
                out.update(sample_rate=rate, channels=ch,
                           codec="pcm" if tag == 1 else f"tag{tag}")
            elif fourcc == b"data":
                nbytes = size
        if fmt and nbytes is not None:
            tag, ch, rate, bits = fmt
            denom = rate * ch * max(bits // 8, 1)
            if denom:
                out["duration_ms"] = int(nbytes * 1000 // denom)
        return out
    from .flaccodec import _skip_id3, is_flac

    if is_flac(data):
        off = (_skip_id3(data) if data[:4] != b"fLaC" else 0) + 8
        # STREAMINFO: sr(20 bits) ch-1(3) bps-1(5) total(36) at +10
        b = data[off + 10:off + 18]
        if len(b) == 8:
            v = int.from_bytes(b, "big")
            sr = v >> 44
            ch = ((v >> 41) & 0x7) + 1
            total = v & ((1 << 36) - 1)
            out = {"format": "flac", "sample_rate": sr,
                   "channels": ch, "codec": "flac"}
            if sr:
                out["duration_ms"] = int(total * 1000 // sr)
            return out
        return {"format": "flac"}
    if data[:3] == b"ID3" or (len(data) > 2 and data[0] == 0xFF
                              and (data[1] & 0xE0) == 0xE0):
        return _probe_mp3(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", data, 16)
        return {"format": "png", "width": w, "height": h}
    if data[:2] == b"BM":
        w, h = struct.unpack_from("<ii", data, 18)
        return {"format": "bmp", "width": w, "height": abs(h)}
    if data[:2] == b"\xff\xd8":
        return _probe_jpeg(data)
    return {"format": "unknown"}


_PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("codec", T.StringType(), True),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("channels", T.LongType(), True),
])


def media_probe(media: DataFrame) -> DataFrame:
    """Probe every payload's container metadata (no decode): the
    curation pre-filter.  One narrow ``mapInPandas`` pass over ALL
    kinds; schema ``(media_id, format, codec, width, height,
    n_frames, duration_ms, sample_rate, channels)`` with NULLs where
    the container doesn't declare a field."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _PROBE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = probe_media(bytes(payload or b""))
                rows.append((
                    int(mid), p.get("format", "unknown"),
                    p.get("codec"), p.get("width"), p.get("height"),
                    p.get("n_frames"), p.get("duration_ms"),
                    p.get("sample_rate"), p.get("channels"),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        compute, _PROBE_SCHEMA
    )
