"""Clean-room AVI (RIFF) video container codec with MJPEG and
uncompressed-DIB streams.

AVI is the classic real-world video container (Microsoft "AVI RIFF
File Reference", public since 1992): a ``RIFF('AVI ')`` form holding a
``LIST('hdrl')`` (main ``avih`` header + one ``LIST('strl')`` per
stream with ``strh``/``strf``), a ``LIST('movi')`` of frame chunks,
and an optional ``idx1`` index.  Two video stream flavors decode and
encode here, both without any external library:

* ``MJPG`` -- Motion JPEG: every ``00dc`` chunk is a standalone JPEG
  image, decoded through the clean-room T.81 codec in
  :mod:`.jpegcodec`.  Real-world MJPEG streams (the format's one
  famous quirk) often OMIT the Huffman tables from each frame and
  expect the decoder to supply the T.81 Annex K defaults --
  :func:`_ensure_dht` splices the standard ``DHT`` segment in before
  decoding, and a round-trip test covers the tableless form.
* ``DIB `` / BI_RGB -- uncompressed bottom-up BGR rows, each row
  padded to a 4-byte boundary (the plain Windows bitmap layout).
  Lossless, so container round-trips are byte-exact.

Reference parity note: the xcube reference has no video surface at
all; this module extends the LLM multimodal pipeline
(:mod:`.multimodal`) so crawled ``.avi`` assets open natively, the
same way :mod:`.gifcodec`/:mod:`.jpegcodec` handle images.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_avi", "decode_avi_audio", "encode_avi", "is_avi"]

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


# --------------------------------------------------------------------- #
# RIFF walking
# --------------------------------------------------------------------- #


def _chunks(data: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_size)`` for each chunk
    in ``data[start:end]`` (chunks are word-aligned; a chunk that
    claims to run past ``end`` is truncated -- raise)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} at {pos} claims {size} bytes, "
                f"runs past the enclosing structure at {end}")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _ensure_dht(jpeg: bytes) -> bytes:
    """Splice the T.81 Annex K default Huffman tables into a
    tables-omitted MJPEG frame (the standard MJPEG shortcut: frames
    carry DQT/SOF/SOS but no DHT).  Frames that already carry a DHT
    are returned unchanged."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("MJPG chunk is not a JPEG stream (no SOI)")
    pos = 2
    sos_at = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xC4:  # DHT present -- nothing to do
            return jpeg
        if marker == 0xDA:  # SOS: scan starts, no DHT seen
            sos_at = pos
            break
        if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI have no length
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        pos += 2 + seglen
    if sos_at is None:
        raise ValueError("JPEG stream ended before SOS")
    from .jpegcodec import (
        _AC_CHROMA_BITS,
        _AC_CHROMA_VALS,
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _DC_CHROMA_BITS,
        _DC_CHROMA_VALS,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _dht_segment,
    )

    dht = (
        _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    )
    return jpeg[:sos_at] + dht + jpeg[sos_at:]


def _decode_dib(chunk: bytes, w: int, h: int, bpp: int,
                top_down: bool = False) -> np.ndarray:
    """BI_RGB frame chunk -> (h, w, 3) uint8 RGB.  Rows are BGR(A)
    padded to 4-byte boundaries, bottom-up unless the header declared
    a negative biHeight (the top-down form)."""
    if bpp not in (24, 32):
        raise NotImplementedError(
            f"uncompressed AVI frames with biBitCount={bpp} not "
            "supported (24/32-bit BI_RGB only)")
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    if len(chunk) < stride * h:
        raise ValueError(
            f"DIB frame chunk holds {len(chunk)} bytes, needs "
            f"{stride * h} for {w}x{h}x{bpp}")
    rows = np.frombuffer(chunk[: stride * h], np.uint8).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB


def decode_avi(data: bytes):
    """AVI bytes -> ``(frames, meta)``.

    ``frames`` is a list of ``(h, w, 3)`` uint8 RGB arrays (one per
    video frame of the FIRST video stream, in ``movi`` order);
    ``meta`` has ``width height fps codec n_frames``.  MJPG frames
    decode through :mod:`.jpegcodec` (grayscale JPEGs are expanded to
    RGB); DIB/BI_RGB frames decode exactly.  Other compression
    fourccs raise :class:`NotImplementedError` loudly.
    """
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    stream_no = None  # first 'vids' stream index
    n_streams = 0
    codec = None
    w = h = None
    bpp = 24
    rate, scale = 25, 1
    movi = None  # (start, end) of the movi LIST payload

    for fourcc, body, size in _chunks(data, 12, end):
        if fourcc == b"LIST":
            ltype = data[body:body + 4]
            if ltype == b"hdrl":
                for f2, b2, s2 in _chunks(data, body + 4, body + size):
                    if f2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                        this_no = n_streams
                        n_streams += 1
                        if stream_no is not None:
                            continue
                        for f3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                            if f3 == b"strh" and s3 >= 48:
                                if data[b3:b3 + 4] != b"vids":
                                    break  # not video: skip this strl
                                stream_no = this_no
                                codec = data[b3 + 4:b3 + 8]
                                scale, rate = struct.unpack_from(
                                    "<II", data, b3 + 20)
                            elif f3 == b"strf" and s3 >= 40:
                                (w, h, _planes, bpp) = struct.unpack_from(
                                    "<iiHH", data, b3 + 4)
                                comp = data[b3 + 16:b3 + 20]
                                if comp not in (b"\x00\x00\x00\x00",):
                                    codec = comp
            elif ltype == b"movi":
                movi = (body + 4, body + size)
    if stream_no is None or w is None:
        raise ValueError("AVI has no video ('vids') stream")
    if movi is None:
        raise ValueError("AVI has no movi LIST")
    top_down = h < 0  # negative biHeight = top-down DIB rows
    h = abs(h)
    codec_s = (codec or b"\x00\x00\x00\x00").decode(
        "ascii", errors="replace").strip("\x00 ").upper()
    if codec_s not in ("", "DIB", "RGB", "MJPG"):
        raise NotImplementedError(
            f"AVI video codec {codec_s!r} not supported (clean-room "
            "MJPG and uncompressed DIB only; H.264/VP9/AV1 need "
            "external decoders)")
    prefix = b"%02d" % stream_no

    frames = []
    for fourcc, body, size in _chunks(data, movi[0], movi[1]):
        if fourcc == b"LIST":  # 'rec ' grouping: recurse one level
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                if f2[:2] == prefix and f2[2:4] in (b"dc", b"db"):
                    frames.append((f2, data[b2:b2 + s2]))
            continue
        if fourcc[:2] == prefix and fourcc[2:4] in (b"dc", b"db"):
            frames.append((fourcc, data[body:body + size]))

    out = []
    for fourcc, chunk in frames:
        if not chunk:
            # zero-size chunk = dropped/repeat frame (legal in AVI):
            # repeat the previous frame, or emit a blank one when the
            # stream STARTS dropped -- silently skipping would shift
            # every later frame index off the timeline
            out.append(out[-1] if out
                       else np.zeros((h, w, 3), np.uint8))
            continue
        if codec_s == "MJPG":
            from .jpegcodec import decode_jpeg

            img = decode_jpeg(_ensure_dht(bytes(chunk)))
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            out.append(img)
        else:
            out.append(_decode_dib(bytes(chunk), w, h, bpp,
                                   top_down=top_down))
    meta = {
        "width": int(w), "height": int(h),
        "fps": (int(rate) or 25, int(scale) or 1),
        "codec": codec_s or "DIB",
        "n_frames": len(out),
    }
    return out, meta


def decode_avi_audio(data: bytes):
    """Extract the FIRST audio (``auds``) stream of an AVI as
    ``(samples (n, channels), sample_rate)`` -- integer PCM only
    (WAVEFORMATEX ``wFormatTag`` 1; MP3/AC3 tracks need external
    decoders and raise :class:`NotImplementedError`).  The common
    "pull the audio out of a crawled video" step."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    stream_no = None
    n_streams = 0
    fmt = None
    movi = None
    for fourcc, body, size in _chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                if f2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                    this_no = n_streams
                    n_streams += 1
                    if stream_no is not None:
                        continue
                    is_auds = False
                    for f3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                        if f3 == b"strh" and s3 >= 48:
                            if data[b3:b3 + 4] != b"auds":
                                break
                            is_auds = True
                            stream_no = this_no
                        elif f3 == b"strf" and is_auds and s3 >= 14:
                            # 14-byte WAVEFORMAT (no wBitsPerSample)
                            # is legal: derive bits from block align
                            tag_, ch_, rate_, avg_, align_ = (
                                struct.unpack_from("<HHIIH", data, b3))
                            bits_ = (struct.unpack_from(
                                "<H", data, b3 + 14)[0] if s3 >= 16
                                else (align_ // max(ch_, 1)) * 8)
                            fmt = (tag_, ch_, rate_, avg_, align_,
                                   bits_)
        elif ltype == b"movi":
            movi = (body + 4, body + size)
    if stream_no is None or fmt is None:
        raise ValueError("AVI has no audio ('auds') stream")
    if movi is None:
        raise ValueError("AVI has no movi LIST")
    tag, n_ch, rate, _bps_avg, _align, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"AVI audio format tag {tag} not supported (PCM only; "
            "MP3/AC3 need external decoders)")
    if bits not in (8, 16, 32):
        raise NotImplementedError(
            f"AVI PCM with {bits} bits per sample not supported")
    prefix = b"%02d" % stream_no
    pcm = bytearray()
    for fourcc, body, size in _chunks(data, movi[0], movi[1]):
        if fourcc == b"LIST":
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                if f2[:2] == prefix and f2[2:4] == b"wb":
                    pcm += data[b2:b2 + s2]
            continue
        if fourcc[:2] == prefix and fourcc[2:4] == b"wb":
            pcm += data[body:body + size]
    dt = {8: np.dtype("u1"), 16: np.dtype("<i2"),
          32: np.dtype("<i4")}[bits]
    frame_bytes = dt.itemsize * max(1, n_ch)
    usable = len(pcm) - (len(pcm) % frame_bytes)
    samples = np.frombuffer(bytes(pcm[:usable]), dt).reshape(
        -1, max(1, n_ch))
    return samples, int(rate)


# --------------------------------------------------------------------- #
# encode
# --------------------------------------------------------------------- #


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _encode_dib(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, 2::-1].reshape(h, w * 3)
    return rows.tobytes()


def encode_avi(
    frames,
    fps: int = 25,
    codec: str = "DIB",
    quality: int = 90,
    audio=None,
    audio_rate: int = 16000,
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 RGB frames (all equal-sized) as a
    spec-complete AVI: ``hdrl`` with ``avih``/``strh``/``strf``, a
    ``movi`` LIST, and an ``idx1`` index (AVIF_HASINDEX set).

    ``codec='DIB'`` writes uncompressed bottom-up BGR rows (lossless);
    ``codec='MJPG'`` writes one baseline JPEG per frame through
    :func:`.jpegcodec.encode_jpeg` at ``quality``.  ``audio`` adds a
    second stream: ``(n,)`` or ``(n, channels)`` int16 PCM samples at
    ``audio_rate``, interleaved as one ``01wb`` chunk per video frame
    (the standard muxing); :func:`decode_avi_audio` extracts it."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("all frames must be (h, w, 3) equal-sized")
    codec = codec.upper()
    if codec == "DIB":
        payloads = [_encode_dib(f) for f in frames]
        ckid, compression, bitcount = b"00db", 0, 24
    elif codec == "MJPG":
        from .jpegcodec import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        ckid, compression, bitcount = (
            b"00dc", struct.unpack("<I", b"MJPG")[0], 24)
    else:
        raise ValueError(f"codec must be DIB or MJPG, got {codec!r}")
    max_sz = max(len(p) for p in payloads)

    aud = None
    if audio is not None:
        aud = np.asarray(audio, np.int16)
        if aud.ndim == 1:
            aud = aud[:, None]
        if aud.ndim != 2 or not (1 <= aud.shape[1] <= 8):
            raise ValueError("audio must be (n,) or (n, channels)")
    n_streams = 2 if aud is not None else 1

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_sz * fps,              # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        _AVIF_HASINDEX,            # dwFlags
        len(frames),               # dwTotalFrames
        0, n_streams,              # dwInitialFrames, dwStreams
        max_sz,                    # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,          # width, height, reserved[4]
    )
    strh = (
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"\x00\x00\x00\x00")
        + struct.pack(
            "<IHHIIIIIIii",
            0, 0, 0,            # flags, priority, language
            0,                  # initial frames
            1, fps,             # scale, rate
            0, len(frames),     # start, length
            max_sz, -1, 0)      # bufsize, quality, samplesize
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    stride = (w * 3 + 3) & ~3
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bitcount, compression,
        stride * h, 0, 0, 0, 0)
    strl = b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    hdrl = b"hdrl" + _chunk(b"avih", avih) + _chunk(b"LIST", strl)
    audio_chunks: list[bytes] = []
    if aud is not None:
        n_ch = aud.shape[1]
        block_align = 2 * n_ch
        strh_a = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIii",
                0, 0, 0, 0,
                1, audio_rate,           # scale, rate (samples/s)
                0, aud.shape[0],         # start, length in samples
                block_align * audio_rate, -1, block_align)
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        # WAVEFORMATEX, wFormatTag 1 = PCM, cbSize 0
        strf_a = struct.pack(
            "<HHIIHHH", 1, n_ch, audio_rate,
            audio_rate * block_align, block_align, 16, 0)
        hdrl += _chunk(b"LIST", b"strl" + _chunk(b"strh", strh_a)
                       + _chunk(b"strf", strf_a))
        spf = -(-aud.shape[0] // len(frames))  # samples per frame
        for k in range(len(frames)):
            part = aud[k * spf:(k + 1) * spf]
            audio_chunks.append(
                part.astype("<i2").tobytes() if part.size else b"")

    movi_body = b"movi"
    idx = b""
    for k, p in enumerate(payloads):
        # idx1 offsets point at the chunk fourcc, relative to the
        # 'movi' fourcc position (the widespread convention)
        idx += b"00" + ckid[2:] + struct.pack(
            "<III", _AVIIF_KEYFRAME, len(movi_body), len(p))
        movi_body += _chunk(ckid, p)
        if audio_chunks and audio_chunks[k]:
            idx += b"01wb" + struct.pack(
                "<III", _AVIIF_KEYFRAME, len(movi_body),
                len(audio_chunks[k]))
            movi_body += _chunk(b"01wb", audio_chunks[k])

    riff_body = (
        b"AVI "
        + _chunk(b"LIST", hdrl)
        + _chunk(b"LIST", movi_body)
        + _chunk(b"idx1", idx)
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
