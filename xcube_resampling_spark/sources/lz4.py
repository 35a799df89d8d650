"""Clean-room LZ4 *block* codec (the public LZ4 block format spec).

Why this exists: essentially every public zarr v2 store is written with
numcodecs' default compressor ``Blosc(cname='lz4')`` -- including the
reference's own S3 ``.levels`` input (reference cfconv.py:343-358, the
``LC-1x2025x2025-2.0.0.levels`` store of BASELINE.md row 11).  The
native lz4/c-blosc libraries are not available in this environment, so
this module implements the block format directly (the format is a short
public spec: ``lz4_Block_format.md``):

A block is a sequence of *sequences*; each sequence is

* 1 token byte -- high nibble = literal length, low nibble = match
  length - 4 (``MINMATCH``); a nibble of 15 is extended by following
  bytes (each 0..255 added; 255 continues),
* that many literal bytes,
* a 2-byte little-endian match offset (1..65535; 0 is invalid),
* optional match-length extension bytes.

The final sequence is literals-only (the block ends after its
literals).  Encoder-side end rules (required for interoperability with
the reference implementation's decoder): the last 5 bytes are always
literals, and the last match must start at least 12 bytes before the
block end -- blocks shorter than 13 bytes are therefore stored as one
literal run.

Overlapping matches (offset < length) replicate the preceding pattern
-- e.g. offset 1 is a run-length byte fill -- and the decoder handles
them with the standard pattern-doubling copy.

Two framings are provided on top of the raw block:

* :func:`compress_block` / :func:`decompress_block` -- the bare block
  (what blosc stores inside its chunk streams), and
* :func:`compress_framed` / :func:`decompress_framed` -- numcodecs'
  ``LZ4`` framing (a ``uint32-le`` uncompressed-size prefix), the form
  zarr v2 uses for a plain (non-blosc) ``{"id": "lz4"}`` compressor.

The encoder is a greedy single-pass hash-table matcher (4-byte
prefixes, most-recent-position table) -- the same shape as the
reference implementation's fast path; output is decodable by ANY
conformant LZ4 decoder, and this decoder accepts any conformant
stream.  Both directions are pure Python over ``memoryview``/
``bytearray``; at executor scale the chunks are O(100 KB) each and
arrive one-per-task, so codec throughput is not the scale bottleneck
(the shuffle plan is).
"""

from __future__ import annotations

import struct

__all__ = [
    "compress_block",
    "decompress_block",
    "compress_framed",
    "decompress_framed",
]

_MINMATCH = 4
_MAX_OFFSET = 65535
# encoder end-of-block rules from the spec ("End of block restrictions")
_MFLIMIT = 12     # last match must start >= 12 bytes before block end
_LASTLITERALS = 5  # the final 5 bytes are always literals


# ------------------------------------------------------------------ #
# decode


def decompress_block(src: bytes, dst_size: int) -> bytes:
    """Decode one raw LZ4 block to exactly ``dst_size`` bytes.

    Raises ``ValueError`` on any malformed input (truncated sequence,
    zero / out-of-range offset, output overrun or underrun) -- corrupt
    chunks must fail loudly, never return short data.
    """
    if dst_size == 0:
        if len(src) == 0:
            return b""
        # a 0-size block is legal only as a single empty-literal token
        if src == b"\x00":
            return b""
        raise ValueError("LZ4 block for empty output has trailing data")
    s = memoryview(src)
    n = len(src)
    out = bytearray(dst_size)
    opos = 0
    ipos = 0
    while True:
        if ipos >= n:
            raise ValueError("LZ4 block truncated (no token)")
        token = s[ipos]
        ipos += 1
        # -- literals
        lit = token >> 4
        if lit == 15:
            while True:
                if ipos >= n:
                    raise ValueError(
                        "LZ4 block truncated in literal length")
                b = s[ipos]
                ipos += 1
                lit += b
                if b != 255:
                    break
        if lit:
            if ipos + lit > n:
                raise ValueError("LZ4 block truncated in literals")
            if opos + lit > dst_size:
                raise ValueError("LZ4 literals overrun the output")
            out[opos:opos + lit] = s[ipos:ipos + lit]
            ipos += lit
            opos += lit
        if ipos == n:
            # last sequence: literals only
            if opos != dst_size:
                raise ValueError(
                    f"LZ4 block decoded to {opos} bytes, "
                    f"expected {dst_size}"
                )
            return bytes(out)
        # -- match
        if ipos + 2 > n:
            raise ValueError("LZ4 block truncated in match offset")
        offset = s[ipos] | (s[ipos + 1] << 8)
        ipos += 2
        if offset == 0:
            raise ValueError("LZ4 match offset 0 is invalid")
        if offset > opos:
            raise ValueError(
                f"LZ4 match offset {offset} reaches before the output "
                f"start (position {opos})"
            )
        mlen = (token & 0x0F)
        if mlen == 15:
            while True:
                if ipos >= n:
                    raise ValueError(
                        "LZ4 block truncated in match length")
                b = s[ipos]
                ipos += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MINMATCH
        if opos + mlen > dst_size:
            raise ValueError("LZ4 match overruns the output")
        start = opos - offset
        if offset >= mlen:
            out[opos:opos + mlen] = out[start:start + mlen]
            opos += mlen
        else:
            # overlapping match: replicate the pattern, doubling the
            # copied span each step instead of a per-byte loop
            pattern = out[start:opos]
            want = mlen
            while want > 0:
                take = min(want, len(pattern))
                out[opos:opos + take] = pattern[:take]
                opos += take
                want -= take
                pattern = out[start:opos]


def decompress_framed(src: bytes) -> bytes:
    """Decode numcodecs ``LZ4`` framing: u32-le size + raw block."""
    if len(src) < 4:
        raise ValueError("LZ4 framed stream shorter than its header")
    (dst_size,) = struct.unpack_from("<I", src, 0)
    return decompress_block(src[4:], dst_size)


# ------------------------------------------------------------------ #
# encode


def compress_block(src: bytes) -> bytes:
    """Encode raw bytes as one LZ4 block (greedy hash matcher).

    The output obeys the spec's end-of-block rules, so any conformant
    decoder accepts it.  Incompressible input degrades to one literal
    run (worst case ``len//255 + ~2`` bytes of overhead).
    """
    n = len(src)
    if n == 0:
        return b"\x00"  # single empty-literal token
    out = bytearray()
    if n < _MFLIMIT + 1:
        _emit(out, src, 0, n, None, 0)
        return bytes(out)
    s = src
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - _MFLIMIT  # last position where a match may start
    while i <= limit:
        key = s[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > _MAX_OFFSET or \
                s[cand:cand + 4] != key:
            i += 1
            continue
        # extend the match forward, but never into the last 5 bytes
        end = n - _LASTLITERALS
        m = i + 4
        c = cand + 4
        while m < end and s[m] == s[c]:
            m += 1
            c += 1
        _emit(out, s, anchor, i, i - cand, m - i)
        # index a couple of positions inside the covered span so
        # repetitive data keeps finding nearby matches
        step = max(1, (m - i) >> 2)
        for j in range(i + 1, min(m, limit + 1), step):
            table[s[j:j + 4]] = j
        i = m
        anchor = m
    _emit(out, s, anchor, n, None, 0)
    return bytes(out)


def _emit(
    out: bytearray,
    src: bytes,
    lit_start: int,
    lit_end: int,
    offset: int | None,
    match_len: int,
) -> None:
    """Append one sequence (literals + optional match) to ``out``."""
    lit = lit_end - lit_start
    ml = 0 if offset is None else match_len - _MINMATCH
    token_lit = 15 if lit >= 15 else lit
    token_ml = 15 if ml >= 15 else ml
    out.append((token_lit << 4) | (token_ml if offset is not None else 0))
    rem = lit - 15
    while rem >= 0:
        out.append(min(rem, 255))
        if rem < 255:
            break
        rem -= 255
    out += src[lit_start:lit_end]
    if offset is None:
        return
    out += struct.pack("<H", offset)
    rem = ml - 15
    while rem >= 0:
        out.append(min(rem, 255))
        if rem < 255:
            break
        rem -= 255


def compress_framed(src: bytes) -> bytes:
    """numcodecs ``LZ4`` framing: u32-le uncompressed size + block."""
    return struct.pack("<I", len(src)) + compress_block(src)
