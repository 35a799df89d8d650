"""Clean-room FLAC audio codec (RFC 9639 / xiph.org spec).

FLAC is the archival lossless audio format of real speech/audio
training corpora (LibriSpeech, Common Voice exports, ...), so the LLM
audio pipeline needs it to open genuine datasets.  The format is
fully public: a ``fLaC`` magic + metadata blocks (STREAMINFO
mandatory), then byte-aligned frames of Rice-coded subframes.

Decode supports the complete common profile:

* CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32)
  subframes, wasted-bits shifts;
* Rice residual methods 0 (4-bit params) and 1 (5-bit params) with
  partition orders 0-15 and escape-coded raw partitions;
* all stereo decorrelations (left/side, right/side, mid/side) and
  1-8 independent channels, 8/12/16/20/24/32-bit samples;
* frame-header CRC-8 and frame CRC-16 verification, STREAMINFO MD5
  verification when present.

The encoder produces spec-valid streams with FIXED predictors
(best-of-orders-0-2 per subframe, falling back to VERBATIM when Rice
coding would expand) -- enough for exact lossless round-trips at any
bit depth, which is how the tests pin the decoder.

No reference counterpart (the xcube reference has no audio surface);
this extends :mod:`.multimodal`'s ``decode_audio`` the same way
:mod:`.jpegcodec` extends ``decode_image``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "is_flac"]

_SYNC = 0x3FFE

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_ENC = {v: k for k, v in _BPS_CODES.items()}

_FIXED_COEFS = {
    0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
}


def _skip_id3(data: bytes) -> int:
    """Real-world FLAC files often carry a prepended ID3v2 tag (a
    tagging-tool habit the format spec discourages but decoders
    accept).  Returns the offset where the FLAC stream starts."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size, excluding the 10-byte header
    size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    off = 10 + size
    if data[5] & 0x10:  # footer-present flag
        off += 10
    return off if data[off:off + 4] == b"fLaC" else 0


def is_flac(data: bytes) -> bool:
    if data[:4] == b"fLaC":
        return True
    off = _skip_id3(data)
    return off > 0 and data[off:off + 4] == b"fLaC"


# --------------------------------------------------------------------- #
# CRCs (FLAC uses CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0)
# --------------------------------------------------------------------- #


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tbl[i] = c & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (int(_CRC16_TBL[(c >> 8) ^ b]) ^ (c << 8)) & 0xFFFF
    return c


# --------------------------------------------------------------------- #
# bit I/O (MSB-first)
# --------------------------------------------------------------------- #


from ..bitio import BitReader as _BitReader  # noqa: E402
from ..bitio import BitWriter as _BitWriterBase  # noqa: E402


class _BitWriter(_BitWriterBase):
    def getvalue(self) -> bytes:  # FLAC callers require alignment
        return super().getvalue(pad=False)


# --------------------------------------------------------------------- #
# coded number (the UTF-8-style frame/sample index)
# --------------------------------------------------------------------- #


def _read_coded_number(r: _BitReader) -> int:
    b = r.read(8)
    if b < 0x80:
        return b
    n = 0
    while b & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid FLAC coded number lead byte")
    v = b & (0x7F >> n)
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(8, v)
        return
    for n in range(2, 8):
        if v < (1 << (5 * n + 1)):
            break
    else:
        raise ValueError("coded number out of range")
    parts = []
    for _ in range(n - 1):
        parts.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = ((0xFF00 >> n) & 0xFF) | v
    w.write(8, lead)
    for p in reversed(parts):
        w.write(8, p)


# --------------------------------------------------------------------- #
# decode
# --------------------------------------------------------------------- #


def _decode_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise NotImplementedError(
            f"FLAC residual coding method {method} is reserved")
    plen = 4 + method
    escape = (1 << plen) - 1
    po = r.read(4)
    if bs % (1 << po):
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(bs - order, np.int64)
    at = 0
    for p in range(1 << po):
        n = (bs >> po) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for i in range(n):
                out[at + i] = r.signed(raw) if raw else 0
        else:
            for i in range(n):
                q = r.unary()
                z = (q << param) | r.read(param)
                out[at + i] = (z >> 1) ^ -(z & 1)
        at += n
    return out


def _predict_fixed(order: int, warm: list, res: np.ndarray) -> np.ndarray:
    out = np.empty(len(warm) + res.size, np.int64)
    out[:order] = warm
    if order == 0:
        out[:] = res
        return out
    # fixed predictors are iterated deltas: order-k reconstruction is
    # k cumulative sums seeded by the warmup's successive differences
    # -- exact in int64 and fully vectorized
    d = np.array(warm, np.int64)
    heads = [d[-1]]
    for _ in range(order - 1):
        d = np.diff(d)
        heads.append(d[-1])
    acc = res.astype(np.int64)
    for h in reversed(heads):
        acc = np.cumsum(acc, dtype=np.int64) + h
    out[order:] = acc
    return out


def _predict_lpc(order: int, warm: list, coefs: list, shift: int,
                 res: np.ndarray) -> np.ndarray:
    n = len(warm) + res.size
    out = [0] * n
    out[:order] = [int(v) for v in warm]
    c = [int(v) for v in coefs]
    rs = res.tolist()
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * out[i - 1 - j]
        out[i] = (acc >> shift) + rs[i - order]
    return np.array(out, np.int64)


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ty = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eb = bps - wasted
    if eb <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ty == 0:  # CONSTANT
        out = np.full(bs, r.signed(eb), np.int64)
    elif ty == 1:  # VERBATIM
        out = np.fromiter(
            (r.signed(eb) for _ in range(bs)), np.int64, bs)
    elif 8 <= ty <= 12:  # FIXED order ty-8
        order = ty - 8
        warm = [r.signed(eb) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _predict_fixed(order, warm, res)
    elif ty >= 32:  # LPC order ty-31
        order = ty - 31
        warm = [r.signed(eb) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code 15 is invalid")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [r.signed(prec) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _predict_lpc(order, warm, coefs, shift, res)
    else:
        raise ValueError(f"FLAC subframe type {ty} is reserved")
    return out << wasted if wasted else out


def decode_flac(data: bytes, verify_md5: bool = True):
    """FLAC bytes -> ``(samples, sample_rate)``; samples shaped
    ``(n_frames, n_channels)``, int16 for bit depths <= 16 else
    int32.  CRC-8/CRC-16 are verified per frame; the STREAMINFO MD5
    is verified when the stream carries one (all-zero = unset)."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = _skip_id3(data) + 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)
            r.read(24)
            sr = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = (sr, ch, bps, total, md5)
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    sr0, ch0, bps0, total, md5 = info

    chans: list = [[] for _ in range(ch0)]
    # ONE reader over the whole stream (slicing a fresh reader per
    # frame re-indexes the remaining bytes every frame = O(n^2); a
    # real 3-minute FLAC has ~2000 frames)
    r = _BitReader(data)
    r.pos = pos * 8
    while r.pos + 16 <= r.nbits:
        frame_start = r.pos >> 3  # frames are byte-aligned
        pos = frame_start
        sync = r.read(14)
        if sync != _SYNC:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        if r.read(1):
            raise ValueError("FLAC frame reserved bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC frame header reserved bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 is reserved")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            sr = sr0
        elif sr_code == 12:
            sr = r.read(8) * 1000
        elif sr_code == 13:
            sr = r.read(16)
        elif sr_code == 14:
            sr = r.read(16) * 10
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code 15 is invalid")
        else:
            sr = _SAMPLE_RATES[sr_code]
        bps = bps0 if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise ValueError(f"FLAC bps code {bps_code} is reserved")
        hdr_bytes = ((r.pos + 7) >> 3) - frame_start
        if _crc8(data[pos:pos + hdr_bytes]) != r.read(8):
            raise ValueError(f"FLAC frame header CRC-8 mismatch at {pos}")

        if chan <= 7:
            n_ch = chan + 1
            subs = [
                _decode_subframe(r, bs, bps) for _ in range(n_ch)]
        elif chan in (8, 9, 10):
            n_ch = 2
            bump = (0, 1) if chan == 8 else (1, 0) if chan == 9 else (0, 1)
            a = _decode_subframe(r, bs, bps + bump[0])
            b = _decode_subframe(r, bs, bps + bump[1])
            if chan == 8:  # left/side
                subs = [a, a - b]
            elif chan == 9:  # side/right
                subs = [b + a, b]
            else:  # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise ValueError(f"FLAC channel assignment {chan} is reserved")
        if n_ch != ch0:
            raise ValueError(
                f"frame channel count {n_ch} != STREAMINFO {ch0}")
        r.align()
        body_bytes = (r.pos >> 3) - frame_start
        crc = r.read(16)
        if _crc16(data[frame_start:frame_start + body_bytes]) != crc:
            raise ValueError(f"FLAC frame CRC-16 mismatch at {frame_start}")
        for c in range(ch0):
            chans[c].append(subs[c])

    if not chans[0]:
        raise ValueError("FLAC stream has no frames")
    cols = [np.concatenate(c) for c in chans]
    samples = np.stack(cols, axis=1)
    if total and samples.shape[0] < total:
        raise ValueError(
            f"FLAC stream ended early: {samples.shape[0]} of {total} "
            "samples")
    if total:
        samples = samples[:total]
    dt = np.int16 if bps0 <= 16 else np.int32
    out = samples.astype(dt)
    if (out.astype(np.int64) != samples).any():
        raise ValueError("FLAC samples exceed the declared bit depth")
    if verify_md5 and md5 != b"\x00" * 16:
        nb = (bps0 + 7) // 8
        raw = _interleaved_bytes(samples, nb)
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return out, sr0


def _interleaved_bytes(samples: np.ndarray, nb: int) -> bytes:
    """Samples (n, ch) int -> the little-endian interleaved byte
    stream the STREAMINFO MD5 covers (nb bytes per sample)."""
    flat = samples.astype(np.int64).reshape(-1)
    le = np.empty((flat.size, nb), np.uint8)
    v = flat.copy()
    for k in range(nb):
        le[:, k] = v & 0xFF
        v >>= 8
    return le.tobytes()


# --------------------------------------------------------------------- #
# encode (FIXED predictors; lossless)
# --------------------------------------------------------------------- #


def _best_rice_param(z: np.ndarray, plen: int) -> tuple[int, int]:
    """zigzagged residuals -> (param, total bits) minimizing the Rice
    size; escape excluded (VERBATIM fallback handles expansion)."""
    best = (0, 1 << 62)
    for p in range((1 << plen) - 1):
        bits = z.size * (p + 1) + int((z >> p).sum())
        if bits < best[1]:
            best = (p, bits)
    return best


def _encode_residual(w: _BitWriter, res: np.ndarray) -> None:
    z = ((res << 1) ^ (res >> 63)).astype(np.uint64)
    param, _ = _best_rice_param(z.astype(np.int64), 4)
    w.write(2, 0)   # method 0: 4-bit Rice
    w.write(4, 0)   # partition order 0
    w.write(4, param)
    for v in z.tolist():
        v = int(v)
        w.unary(v >> param)
        if param:
            w.write(param, v & ((1 << param) - 1))


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    if np.all(x == x[0]):
        w.write(1, 0)
        w.write(6, 0)  # CONSTANT
        w.write(1, 0)
        w.write(bps, int(x[0]))
        return
    best_order, best_res, best_cost = 0, x, 1 << 62
    for order in range(0, 3):
        if x.size <= order:
            break
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        z = (res << 1) ^ (res >> 63)
        _, bits = _best_rice_param(z, 4)
        cost = order * bps + bits
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if best_cost >= x.size * bps:
        w.write(1, 0)
        w.write(6, 1)  # VERBATIM
        w.write(1, 0)
        for v in x.tolist():
            w.write(bps, int(v))
        return
    w.write(1, 0)
    w.write(6, 8 + best_order)  # FIXED
    w.write(1, 0)
    for v in x[:best_order].tolist():
        w.write(bps, int(v))
    _encode_residual(w, best_res)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int | None = None,
    block_size: int = 4096,
) -> bytes:
    """Encode ``(n, channels)`` (or ``(n,)``) integer samples as a
    spec-valid FLAC stream: STREAMINFO (with the audio MD5) + fixed
    4096-sample frames of FIXED-predictor subframes.  Lossless -- the
    decoder returns the exact input."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    if not (1 <= ch <= 8):
        raise ValueError(f"FLAC supports 1-8 channels, got {ch}")
    if bps is None:
        bps = 16 if samples.dtype.itemsize <= 2 else 32
    if bps not in _BPS_ENC and bps != 32:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    s64 = samples.astype(np.int64)
    lim = 1 << (bps - 1)
    if s64.min() < -lim or s64.max() >= lim:
        raise ValueError(f"samples exceed {bps}-bit signed range")
    if not (0 < sample_rate < (1 << 20)):
        raise ValueError("sample rate out of FLAC's 20-bit range")

    md5 = hashlib.md5(
        _interleaved_bytes(s64, (bps + 7) // 8)).digest()
    si = _BitWriter()
    si.write(16, min(block_size, n))
    si.write(16, min(block_size, n))
    si.write(24, 0)
    si.write(24, 0)
    si.write(20, sample_rate)
    si.write(3, ch - 1)
    si.write(5, bps - 1)
    si.write(36, n)
    info = si.getvalue() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    bps_code = _BPS_ENC.get(bps, 7 if bps == 32 else 0)
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s64[start:start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(14, _SYNC)
        w.write(1, 0)
        w.write(1, 0)        # fixed block size strategy
        w.write(4, 7)        # 16-bit block size - 1 follows
        w.write(4, 0)        # sample rate from STREAMINFO
        w.write(4, ch - 1)   # independent channels
        w.write(3, bps_code)
        w.write(1, 0)
        _write_coded_number(w, fi)
        w.write(16, bs - 1)
        w.align()
        hdr = w.getvalue()
        w2 = _BitWriter()
        for b in hdr:
            w2.write(8, b)
        w2.write(8, _crc8(hdr))
        for c in range(ch):
            _encode_subframe(w2, blk[:, c], bps)
        w2.align()
        body = w2.getvalue()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)
