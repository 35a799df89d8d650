"""Clean-room Zstandard frame codec (RFC 8878, decode-complete).

Zarr v3's DEFAULT compressor is zstd (and c-blosc can carry zstd inner
streams), so real-world v3 stores are unreadable without it; the
native library is not available in this environment.  This module
implements the PUBLIC RFC 8878 format directly:

* frame parsing (magic, frame header descriptor, single-segment /
  windowed, frame content size, optional xxhash64 content checksum --
  verified with the in-module :func:`xxh64`),
* raw / RLE / compressed blocks,
* literals: raw, RLE, Huffman-compressed (1- and 4-stream) and
  treeless (tree reuse within a frame); Huffman tree descriptions in
  both the direct 4-bit-weight form and the FSE-compressed form
  (two interleaved states over a shared table),
* sequences: predefined, RLE, FSE-compressed, and repeat modes for
  all three categories (literal lengths, offsets, match lengths),
  the backward sequence bitstream, and the 3-slot repeat-offset
  history with its literal-length-0 special cases,
* dictionaries are refused loudly (``Dictionary_ID != 0`` raises
  ``NotImplementedError``); skippable frames are skipped.

The encoder emits spec-conformant frames decodable by ANY zstd
decoder: greedy LZ matches as sequences over the PREDEFINED FSE
tables (mode 0 -- no table descriptions needed) with raw literals,
falling back to raw blocks when compression does not pay.  A
Huffman-literals path (direct weights, 1- or 4-stream) exists for
full coverage of the literal decode paths.  FSE *encoding* walks the
same decode table backwards (each symbol's state intervals partition
the state space, so the encoding state chain is unique).

Pure Python over ``int``/``bytes``; chunks are O(100 KB) and decoded
one-per-executor-task, so codec throughput is not the plan
bottleneck.
"""

from __future__ import annotations

import struct

__all__ = ["compress", "decompress", "xxh64"]

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_LO = 0x184D2A50  # skippable frames: 0x184D2A50..5F
_MAX_BLOCK = 128 * 1024

# ------------------------------------------------------------------ #
# xxHash64 (public algorithm; zstd's content checksum = low 32 bits)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for k in range(4):
                (lane,) = struct.unpack_from("<Q", data, i + 8 * k)
                v = (v1, v2, v3, v4)[k]
                v = (_rotl((v + lane * _P2) & _M64, 31) * _P1) & _M64
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((lane * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h ^= (lane * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------------------------ #
# bitstreams

class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            byte_i, bit_i = divmod(self.bitpos + k, 8)
            if byte_i >= len(self.data):
                raise ValueError("zstd FSE description truncated")
            v |= ((self.data[byte_i] >> bit_i) & 1) << k
        self.bitpos += n
        return v

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) // 8


class _BackBits:
    """Backward bitstream reader: bytes written forward, read starting
    from the final byte's padding sentinel (the highest set bit of the
    last byte), high bits first.  Reading past the start zero-fills --
    ``overdrawn()`` reports it, mirroring the reference decoder's
    reload-overflow condition."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd backward bitstream is empty")
        last = data[-1]
        if last == 0:
            raise ValueError(
                "zstd backward bitstream has no padding sentinel")
        pad = 8 - last.bit_length()
        self.val = int.from_bytes(data, "little")
        self.avail = len(data) * 8 - pad - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        mask = (1 << n) - 1
        if self.avail >= n:
            v = (self.val >> (self.avail - n)) & mask
        else:
            keep = max(self.avail, 0)
            v = (self.val & ((1 << keep) - 1)) << (n - keep) if keep \
                else 0
            v &= mask
        self.avail -= n
        return v

    def overdrawn(self) -> bool:
        return self.avail < 0


class _BitWriter:
    """Backward-stream writer: values pushed in REVERSE read order come
    out of :class:`_BackBits` in read order."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def push(self, value: int, n: int) -> None:
        if value >> n:
            raise ValueError(f"value {value} does not fit {n} bits")
        self.acc |= value << self.nbits
        self.nbits += n

    def finish(self) -> bytes:
        self.acc |= 1 << self.nbits  # padding sentinel
        self.nbits += 1
        nbytes = (self.nbits + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


# ------------------------------------------------------------------ #
# FSE

def _read_fse_distribution(
    data: bytes, max_al: int, max_symbol: int
) -> tuple[int, list[int], int]:
    """Parse an FSE table description; returns (accuracy_log, probs,
    bytes consumed).  Probabilities use -1 for the less-than-one case."""
    bits = _FwdBits(data)
    al = bits.read(4) + 5
    if al > max_al:
        raise ValueError(
            f"zstd FSE accuracy log {al} exceeds the maximum {max_al}")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nbits = al + 1
    probs: list[int] = []
    prev_zero = False
    while remaining > 1 and len(probs) <= max_symbol:
        if prev_zero:
            # 2-bit repeat flags: 3 adds three more zero-probability
            # symbols and continues; 0..2 adds that many and stops
            while True:
                rep = bits.read(2)
                probs.extend([0] * min(rep, 3))
                if rep < 3:
                    break
            prev_zero = False
            if len(probs) > max_symbol + 1:
                raise ValueError("zstd FSE zero-repeat overflow")
            continue
        maxv = (2 * threshold - 1) - remaining
        low = bits.read(nbits - 1)
        if low < maxv:
            count = low
        else:
            hi = bits.read(1)
            count = low | (hi << (nbits - 1))
            if count >= threshold:
                count -= maxv
        count -= 1  # 0 encodes the -1 probability
        remaining -= -count if count < 0 else count
        probs.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd FSE distribution does not sum to 1<<AL")
    return al, probs, bits.bytes_consumed()


def _build_fse_table(
    al: int, probs: list[int]
) -> list[tuple[int, int, int]]:
    """RFC 8878 FSE decode table: state -> (symbol, nbits, baseline)."""
    size = 1 << al
    syms = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            syms[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd FSE spread did not return to zero")
    nxt = [1 if p == -1 else p for p in probs]
    table: list[tuple[int, int, int]] = []
    for state in range(size):
        s = syms[state]
        x = nxt[s]
        nxt[s] += 1
        nb = al - (x.bit_length() - 1)
        baseline = (x << nb) - size
        table.append((s, nb, baseline))
    return table


def _fse_symbol_cells(
    table: list[tuple[int, int, int]]
) -> dict[int, list[tuple[int, int, int]]]:
    """Per-symbol (state, baseline, nbits) cells for ENCODING: a
    symbol's cell intervals [baseline, baseline + 2^nbits) partition
    the state space, so the backward encode walk is unique."""
    cells: dict[int, list[tuple[int, int, int]]] = {}
    for state, (s, nb, base) in enumerate(table):
        cells.setdefault(s, []).append((state, base, nb))
    return cells


def _fse_encode_states(
    codes: list[int], cells: dict[int, list[tuple[int, int, int]]]
) -> tuple[list[int], list[tuple[int, int]]]:
    """States S_0..S_{n-1} and per-step (delta, nbits) so a decoder
    reading S_0 then delta_i reproduces ``codes``."""
    n = len(codes)
    states = [0] * n
    deltas: list[tuple[int, int]] = [(0, 0)] * (n - 1)
    states[n - 1] = cells[codes[n - 1]][0][0]
    for i in range(n - 2, -1, -1):
        nxt = states[i + 1]
        for state, base, nb in cells[codes[i]]:
            if base <= nxt < base + (1 << nb):
                states[i] = state
                deltas[i] = (nxt - base, nb)
                break
        else:
            raise AssertionError("FSE state intervals must cover")
    return states, deltas


# predefined distributions and code baselines (RFC 8878 §3.1.1.3.2.2)
_LL_DEF = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
           2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
           -1, -1, -1, -1]
_ML_DEF = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
           -1, -1, -1, -1, -1]
_OF_DEF = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]
_LL_DEF_AL, _ML_DEF_AL, _OF_DEF_AL = 6, 6, 5
_LL_MAX_AL, _ML_MAX_AL, _OF_MAX_AL = 9, 9, 8

_LL_BASE = (list(range(16))
            + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
               1024, 2048, 4096, 8192, 16384, 32768, 65536])
_LL_BITS = ([0] * 16
            + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13,
               14, 15, 16])
_ML_BASE = (list(range(3, 35))
            + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259,
               515, 1027, 2051, 4099, 8195, 16387, 32771, 65539])
_ML_BITS = ([0] * 32
            + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12,
               13, 14, 15, 16])


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    for c in range(len(_LL_BASE) - 1, 15, -1):
        if v >= _LL_BASE[c]:
            return c
    raise AssertionError


def _ml_code(v: int) -> int:
    if v < 3:
        raise ValueError("zstd match length below 3")
    if v < 35:
        return v - 3
    for c in range(len(_ML_BASE) - 1, 31, -1):
        if v >= _ML_BASE[c]:
            return c
    raise AssertionError


class _FwdBitWriter:
    """Forward LSB-first writer -- the mirror of :class:`_FwdBits`,
    used for FSE table descriptions."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def push(self, value: int, n: int) -> None:
        if n and value >> n:
            raise ValueError(f"value {value} does not fit {n} bits")
        self.acc |= value << self.nbits
        self.nbits += n

    def finish(self) -> bytes:
        nbytes = (self.nbits + 7) // 8
        return self.acc.to_bytes(max(nbytes, 1), "little") \
            if self.nbits else b""


def _write_fse_distribution(al: int, probs: list[int]) -> bytes:
    """Serialize an FSE table description (mirror of
    :func:`_read_fse_distribution`)."""
    w = _FwdBitWriter()
    w.push(al - 5, 4)
    remaining = (1 << al) + 1
    threshold = 1 << al
    nbits = al + 1
    i = 0
    while i < len(probs):
        p = probs[i]
        maxv = (2 * threshold - 1) - remaining
        raw = p + 1  # -1 encodes as 0
        if raw >= threshold:
            w.push(raw + maxv, nbits)
        elif raw >= maxv:
            w.push(raw, nbits)
        else:
            w.push(raw, nbits - 1)
        remaining -= -p if p < 0 else p
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
        i += 1
        if p == 0:
            # zero-repeat flags: groups of 3 as flag 3, remainder 0..2
            nzero = 0
            while i + nzero < len(probs) and probs[i + nzero] == 0:
                nzero += 1
            i += nzero
            while nzero >= 3:
                w.push(3, 2)
                nzero -= 3
            w.push(nzero, 2)
        if remaining <= 1:
            break
    if remaining != 1:
        raise ValueError("zstd FSE distribution must sum to 1<<AL")
    return w.finish()


# ------------------------------------------------------------------ #
# Huffman

_HUF_MAX_BITS = 11
_WEIGHT_MAX_AL = 6


def _huf_table_from_weights(
    weights: list[int],
) -> tuple[list[tuple[int, int]], int]:
    """Canonical Huffman DECODE table from the transmitted weights
    (last symbol implied).  Returns (table of (symbol, nbits) of size
    2^tableLog, tableLog)."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd Huffman weights are all zero")
    max_bits = total.bit_length()  # floor(log2)+1
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ValueError(
            "zstd Huffman implied weight is not a power of two")
    last_w = left.bit_length()  # log2(left) + 1
    weights = weights + [last_w]
    if max_bits > _HUF_MAX_BITS:
        raise ValueError(
            f"zstd Huffman code length {max_bits} exceeds 11")
    # positions sorted by weight ascending then symbol ascending
    rank_start = [0] * (max_bits + 2)
    for w in weights:
        if w > 0:
            rank_start[w] += 1 << (w - 1)
    pos = 0
    starts = [0] * (max_bits + 2)
    for w in range(1, max_bits + 1):
        starts[w] = pos
        pos += rank_start[w]
    if pos != 1 << max_bits:
        raise ValueError("zstd Huffman weights do not fill the table")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        length = 1 << (w - 1)
        nb = max_bits + 1 - w
        for k in range(length):
            table[starts[w] + k] = (sym, nb)
        starts[w] += length
    return table, max_bits


def _huf_codes_from_weights(
    weights_full: list[int],
) -> dict[int, tuple[int, int]]:
    """Encode-side canonical codes: symbol -> (code, nbits), built so
    that reading ``tableLog`` bits MSB-first indexes the decode table
    at this symbol's span."""
    table, max_bits = _huf_table_from_weights(weights_full[:-1])
    codes: dict[int, tuple[int, int]] = {}
    i = 0
    while i < len(table):
        sym, nb = table[i]
        span = 1 << (max_bits - nb)
        codes[sym] = (i >> (max_bits - nb), nb)
        i += span
    return codes


def _decode_huf_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description -> (TRANSMITTED weights, bytes
    consumed); the implied final weight is derived by the table
    builder."""
    if not data:
        raise ValueError("zstd Huffman tree description truncated")
    h = data[0]
    if h >= 128:  # direct: (h - 127) 4-bit weights
        n = h - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ValueError("zstd Huffman weights truncated")
        ws = []
        for k in range(n):
            b = data[1 + k // 2]
            ws.append((b >> 4) if k % 2 == 0 else (b & 0x0F))
        return ws, 1 + nbytes
    # FSE-compressed weights: h = size of the FSE bitstream
    if len(data) < 1 + h:
        raise ValueError("zstd Huffman FSE weights truncated")
    payload = data[1:1 + h]
    al, probs, desc_len = _read_fse_distribution(
        payload, _WEIGHT_MAX_AL, 255)
    table = _build_fse_table(al, probs)
    stream = payload[desc_len:]
    bits = _BackBits(stream)
    st1 = bits.read(al)
    st2 = bits.read(al)
    ws: list[int] = []
    while True:
        if len(ws) > 254:
            raise ValueError("zstd Huffman weight stream too long")
        s, nb, base = table[st1]
        ws.append(s)
        st1 = base + bits.read(nb)
        if bits.overdrawn():
            ws.append(table[st2][0])
            break
        s, nb, base = table[st2]
        ws.append(s)
        st2 = base + bits.read(nb)
        if bits.overdrawn():
            ws.append(table[st1][0])
            break
    return ws, 1 + h


def _encode_huf_weights_fse(ws: list[int]) -> bytes | None:
    """FSE-compressed Huffman tree description (header byte < 128):
    the mirror of :func:`_decode_huf_weights`'s FSE path -- two
    interleaved states over one table, terminated by the reader's
    bitstream-overdraw rule (the update after the second-to-last
    stream's final symbol reads past the end, so the last two symbols
    are state flushes).  None when this form cannot express ``ws``."""
    n = len(ws)
    if n < 2:
        return None
    # normalize the weight-value histogram to 1<<AL slots, capping
    # every probability at half the table so no cell has 0 bits (the
    # overdraw-termination needs every update to consume >= 1 bit)
    counts: dict[int, int] = {}
    for v in ws:
        counts[v] = counts.get(v, 0) + 1
    if len(counts) < 2:
        return None
    al = 5
    size = 1 << al
    try:
        probs = _normalize_probs(counts, al, cap=size >> 1)
    except ValueError:
        return None
    while probs and probs[-1] == 0:
        probs.pop()
    desc = _write_fse_distribution(al, probs)
    table = _build_fse_table(al, probs)
    cells = _fse_symbol_cells(table)
    s1_syms = ws[0::2]
    s2_syms = ws[1::2]
    st1, d1 = _fse_encode_states(s1_syms, cells)
    st2, d2 = _fse_encode_states(s2_syms, cells)
    # read order: st1 init, st2 init, then updates interleaved after
    # each emission; the update after the LAST emission of the stream
    # holding ws[-2] is the overdraw (not written)
    reads: list[tuple[int, int]] = [(st1[0], al), (st2[0], al)]
    for i in range(n):
        stream_idx, j = i % 2, i // 2
        deltas = d1 if stream_idx == 0 else d2
        if j < len(deltas):
            reads.append(deltas[j])
        # past the chain end: this update is the overdraw (for the
        # stream of ws[n-2]) or never reached (flush of ws[n-1])
    w = _BitWriter()
    for value, nb in reversed(reads):
        w.push(value, nb)
    stream = w.finish()
    payload = desc + stream
    if len(payload) >= 128:
        return None
    # the overdraw rule needs the unwritten update to ask for >= 1 bit
    last_upd_stream = (n - 2) % 2
    last_state = (st1 if last_upd_stream == 0 else st2)[-1]
    if table[last_state][1] == 0:
        return None
    return bytes([len(payload)]) + payload


def _huf_decode_stream(
    data: bytes, table: list[tuple[int, int]], table_log: int,
    n_out: int,
) -> bytes:
    bits = _BackBits(data)
    out = bytearray()
    for _ in range(n_out):
        idx = bits.read(table_log)
        sym, nb = table[idx]
        bits.avail += table_log - nb  # only nb bits were consumed
        out.append(sym)
    return bytes(out)


# ------------------------------------------------------------------ #
# literals section

def _decode_literals(
    block: bytes, frame_state: dict
) -> tuple[bytes, int]:
    """Decode the literals section; returns (literals, bytes consumed
    from ``block``)."""
    if not block:
        raise ValueError("zstd compressed block is empty")
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # Raw / RLE
        if size_format in (0, 2):
            reg = b0 >> 3
            hdr = 1
        elif size_format == 1:
            if len(block) < 2:
                raise ValueError("zstd literals header truncated")
            reg = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ValueError("zstd literals header truncated")
            reg = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if lit_type == 0:
            if len(block) < hdr + reg:
                raise ValueError("zstd raw literals truncated")
            return bytes(block[hdr:hdr + reg]), hdr + reg
        if len(block) < hdr + 1:
            raise ValueError("zstd RLE literal truncated")
        return bytes([block[hdr]]) * reg, hdr + 1
    # Compressed (2) / Treeless (3)
    if size_format == 0:
        nstreams, rbits, hdr = 1, 10, 3
    elif size_format == 1:
        nstreams, rbits, hdr = 4, 10, 3
    elif size_format == 2:
        nstreams, rbits, hdr = 4, 14, 4
    else:
        nstreams, rbits, hdr = 4, 18, 5
    if len(block) < hdr:
        raise ValueError("zstd literals header truncated")
    h = int.from_bytes(block[:hdr], "little")
    reg = (h >> 4) & ((1 << rbits) - 1)
    csize = (h >> (4 + rbits)) & ((1 << rbits) - 1)
    if len(block) < hdr + csize:
        raise ValueError("zstd compressed literals truncated")
    payload = block[hdr:hdr + csize]
    if lit_type == 2:
        # _decode_huf_weights returns the TRANSMITTED weights;
        # _huf_table_from_weights derives the implied last one itself
        ws, consumed = _decode_huf_weights(payload)
        table, tlog = _huf_table_from_weights(ws)
        frame_state["huf"] = (table, tlog)
        payload = payload[consumed:]
    else:
        if "huf" not in frame_state:
            raise ValueError(
                "zstd treeless literals with no previous Huffman table")
        table, tlog = frame_state["huf"]
    if nstreams == 1:
        lits = _huf_decode_stream(payload, table, tlog, reg)
    else:
        if len(payload) < 6:
            raise ValueError("zstd literals jump table truncated")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        rest = payload[6:]
        if s1 + s2 + s3 > len(rest):
            raise ValueError("zstd literal stream sizes overflow")
        part = (reg + 3) // 4
        sizes_out = [part, part, part, reg - 3 * part]
        if sizes_out[3] < 0:
            raise ValueError("zstd 4-stream literals size too small")
        streams = [rest[:s1], rest[s1:s1 + s2],
                   rest[s1 + s2:s1 + s2 + s3], rest[s1 + s2 + s3:]]
        lits = b"".join(
            _huf_decode_stream(st, table, tlog, n)
            for st, n in zip(streams, sizes_out)
        )
    if len(lits) != reg:
        raise ValueError("zstd literals decoded to the wrong size")
    return lits, hdr + csize


# ------------------------------------------------------------------ #
# sequences section

def _read_nseq(block: bytes) -> tuple[int, int]:
    if not block:
        raise ValueError("zstd sequences header truncated")
    b0 = block[0]
    if b0 < 128:
        return b0, 1
    if b0 < 255:
        if len(block) < 2:
            raise ValueError("zstd sequences header truncated")
        return ((b0 - 128) << 8) + block[1], 2
    if len(block) < 3:
        raise ValueError("zstd sequences header truncated")
    return block[1] + (block[2] << 8) + 0x7F00, 3


def _seq_table(
    mode: int, data: bytes, category: str, frame_state: dict,
    defaults: tuple[int, list[int]], max_al: int, max_symbol: int,
) -> tuple[object, int]:
    """Resolve one category's decoding table; returns (table-or-RLE
    symbol, bytes consumed).  Tables are (al, fse_table) tuples; RLE is
    ('rle', symbol)."""
    key = "seq_" + category
    if mode == 0:
        al, dist = defaults
        tab = ("fse", al, _build_fse_table(al, dist))
        frame_state[key] = tab
        return tab, 0
    if mode == 1:
        if not data:
            raise ValueError("zstd RLE sequence symbol truncated")
        if data[0] > max_symbol:
            raise ValueError(
                f"zstd {category} RLE symbol {data[0]} out of range")
        tab = ("rle", data[0])
        frame_state[key] = tab
        return tab, 1
    if mode == 2:
        al, probs, used = _read_fse_distribution(data, max_al,
                                                 max_symbol)
        tab = ("fse", al, _build_fse_table(al, probs))
        frame_state[key] = tab
        return tab, used
    if key not in frame_state:
        raise ValueError(
            f"zstd {category} repeat mode with no previous table")
    return frame_state[key], 0


def _decode_sequences(
    block: bytes, lits: bytes, out: bytearray, frame_state: dict,
) -> None:
    """Decode the sequences section of one block and execute it,
    appending to ``out`` (which already holds prior frame output --
    the match window)."""
    nseq, used = _read_nseq(block)
    block = block[used:]
    if nseq == 0:
        if block:
            raise ValueError(
                "zstd block has trailing bytes after 0 sequences")
        out += lits
        return
    if not block:
        raise ValueError("zstd compression modes byte missing")
    modes = block[0]
    if modes & 3:
        raise ValueError("zstd sequence modes reserved bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    block = block[1:]
    ll_tab, used = _seq_table(ll_mode, block, "ll", frame_state,
                              (_LL_DEF_AL, _LL_DEF), _LL_MAX_AL, 35)
    block = block[used:]
    of_tab, used = _seq_table(of_mode, block, "of", frame_state,
                              (_OF_DEF_AL, _OF_DEF), _OF_MAX_AL, 31)
    block = block[used:]
    ml_tab, used = _seq_table(ml_mode, block, "ml", frame_state,
                              (_ML_DEF_AL, _ML_DEF), _ML_MAX_AL, 52)
    block = block[used:]

    bits = _BackBits(block)

    def init_state(tab):
        if tab[0] == "rle":
            return None
        return bits.read(tab[1])

    ll_st = init_state(ll_tab)
    of_st = init_state(of_tab)
    ml_st = init_state(ml_tab)

    def code_of(tab, st):
        return tab[1] if tab[0] == "rle" else tab[2][st][0]

    def update(tab, st):
        if tab[0] == "rle":
            return None
        _, nb, base = tab[2][st]
        return base + bits.read(nb)

    rep = frame_state.setdefault("rep", [1, 4, 8])
    lit_pos = 0
    for i in range(nseq):
        of_code = code_of(of_tab, of_st)
        if of_code > 31:
            raise ValueError("zstd offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = code_of(ml_tab, ml_st)
        match_len = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = code_of(ll_tab, ll_st)
        lit_len = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if bits.overdrawn():
            raise ValueError("zstd sequence bitstream overdrawn")
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            idx = offset_value - 1 if lit_len != 0 else offset_value
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[:] = [offset, rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                rep[:] = [offset, rep[0], rep[1]]
            else:  # lit_len == 0 and offset_value == 3
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd repeat offset underflow")
                rep[:] = [offset, rep[0], rep[1]]
        if lit_pos + lit_len > len(lits):
            raise ValueError("zstd sequence literals overrun")
        out += lits[lit_pos:lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out) - frame_state.get("base", 0):
            raise ValueError(
                f"zstd match offset {offset} exceeds window "
                f"({len(out) - frame_state.get('base', 0)} bytes of "
                "the current frame)")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            pattern = bytes(out[start:])
            want = match_len
            while want > 0:
                take = min(want, len(pattern))
                out += pattern[:take]
                want -= take
                pattern = bytes(out[start:])
        if i < nseq - 1:
            ll_st = update(ll_tab, ll_st)
            ml_st = update(ml_tab, ml_st)
            of_st = update(of_tab, of_st)
            if bits.overdrawn():
                raise ValueError("zstd sequence state update overdrawn")
    out += lits[lit_pos:]


# ------------------------------------------------------------------ #
# frame decode

def decompress(data: bytes) -> bytes:
    """Decode zstd frames (concatenated; skippable frames skipped)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("zstd input truncated before a magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_LO:
            if n - pos < 8:
                raise ValueError("zstd skippable frame truncated")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError(
                f"not a zstd frame (magic 0x{magic:08X})")
        pos = _decode_frame(data, pos + 4, out)
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray) -> int:
    if pos >= len(data):
        raise ValueError("zstd frame header truncated")
    fhd = data[pos]
    pos += 1
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ValueError("zstd frame header reserved bit set")
    checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    if not single_segment:
        pos += 1  # window descriptor (bounds apply per-match below)
    if did_size:
        did = int.from_bytes(data[pos:pos + did_size], "little")
        pos += did_size
        if did != 0:
            raise NotImplementedError(
                f"zstd dictionary {did} required -- dictionaries are "
                "not available in this build"
            )
    fcs = None
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    if fcs_len:
        if len(data) - pos < fcs_len:
            raise ValueError("zstd frame content size truncated")
        fcs = int.from_bytes(data[pos:pos + fcs_len], "little")
        if fcs_flag == 1:
            fcs += 256
        pos += fcs_len
    frame_state: dict = {}
    frame_start = len(out)
    # matches may only reach back to the current frame's start
    # (RFC 8878 window rule); without this, a corrupt second frame in
    # concatenated input would silently copy the previous frame's
    # bytes instead of failing loudly
    frame_state["base"] = frame_start
    while True:
        if len(data) - pos < 3:
            raise ValueError("zstd block header truncated")
        bh = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if len(data) - pos < bsize:
                raise ValueError("zstd raw block truncated")
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if len(data) - pos < 1:
                raise ValueError("zstd RLE block truncated")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if bsize > _MAX_BLOCK:
                raise ValueError("zstd compressed block exceeds 128 KB")
            if len(data) - pos < bsize:
                raise ValueError("zstd compressed block truncated")
            block = data[pos:pos + bsize]
            pos += bsize
            lits, used = _decode_literals(block, frame_state)
            _decode_sequences(block[used:], lits, out, frame_state)
        else:
            raise ValueError("zstd reserved block type")
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise ValueError(
            f"zstd frame decoded to {len(out) - frame_start} bytes, "
            f"header promised {fcs}")
    if checksum:
        if len(data) - pos < 4:
            raise ValueError("zstd content checksum truncated")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                f"zstd content checksum mismatch "
                f"(got {got:08x}, want {want:08x})")
    return pos


# ------------------------------------------------------------------ #
# encoder

def _find_sequences(
    src: bytes,
) -> tuple[list[tuple[int, int, int]], int]:
    """Greedy LZ matcher -> ([(lit_len, offset, match_len)], trailing
    literal count).  Offsets fit the predefined OF table; min match 4."""
    n = len(src)
    seqs: list[tuple[int, int, int]] = []
    if n < 16:
        return seqs, n
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 12
    while i <= limit:
        key = src[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or \
                src[cand:cand + 4] != key:
            i += 1
            continue
        end = n - 5
        m = i + 4
        c = cand + 4
        while m < end and src[m] == src[c]:
            m += 1
            c += 1
        seqs.append((i - anchor, i - cand, m - i))
        step = max(1, (m - i) >> 2)
        for j in range(i + 1, min(m, limit + 1), step):
            table[src[j:j + 4]] = j
        i = m
        anchor = m
    return seqs, n - anchor


def _split_literals(
    src: bytes, seqs: list[tuple[int, int, int]]
) -> bytes:
    lit_parts = []
    pos = 0
    for ll, off, ml in seqs:
        lit_parts.append(src[pos:pos + ll])
        pos += ll + ml
    lit_parts.append(src[pos:])
    return b"".join(lit_parts)


def _encode_block_body(
    src: bytes, table_mode: str = "predefined",
) -> bytes | None:
    """One compressed-block body: raw literals + FSE sequences.  None
    when the input does not compress."""
    seqs, _ = _find_sequences(src)
    if not seqs:
        return None
    lits = _split_literals(src, seqs)
    body = bytearray(_raw_literals_section(lits))
    sect, _tables = _sequences_section(seqs, table_mode)
    body += sect
    if len(body) >= len(src):
        return None
    return bytes(body)


def _raw_literals_section(lits: bytes) -> bytes:
    n = len(lits)
    if n < 32:
        return bytes([(n << 3) | 0]) + lits  # size_format 00
    if n < 4096:
        h = (n << 4) | (1 << 2) | 0
        return h.to_bytes(2, "little") + lits
    h = (n << 4) | (3 << 2) | 0
    return h.to_bytes(3, "little") + lits


_LL_PREDEF = ("fse", _LL_DEF_AL, _build_fse_table(_LL_DEF_AL, _LL_DEF))
_ML_PREDEF = ("fse", _ML_DEF_AL, _build_fse_table(_ML_DEF_AL, _ML_DEF))
_OF_PREDEF = ("fse", _OF_DEF_AL, _build_fse_table(_OF_DEF_AL, _OF_DEF))


def _normalize_probs(
    counts: dict[int, int], al: int, cap: int | None = None
) -> list[int]:
    """Histogram -> FSE probabilities: every present symbol gets >= 1
    slot, total exactly ``1 << al``.  ``cap`` bounds any single
    probability (the Huffman-weights table needs <= half the table so
    every state update consumes >= 1 bit)."""
    size = 1 << al
    hi = size if cap is None else cap
    total = sum(counts.values())
    probs = [0] * (max(counts) + 1)
    for v, c in counts.items():
        probs[v] = min(hi, max(1, round(c * size / total)))
    drift = size - sum(probs)
    order = sorted(counts, key=counts.get, reverse=True)
    k = 0
    while drift != 0:
        v = order[k % len(order)]
        step = 1 if drift > 0 else -1
        if 1 <= probs[v] + step <= hi:
            probs[v] += step
            drift -= step
        k += 1
        if k > 10 * len(order) + 16:
            raise ValueError("zstd FSE normalization did not converge")
    return probs


def _pick_seq_table(
    codes: list[int], table_mode: str, predef, max_al: int,
    prev,
) -> tuple[int, bytes, object]:
    """Choose one category's encoding: returns (mode_bits, description
    bytes, table) where table is ('fse', al, fse_table) or
    ('rle', symbol)."""
    if table_mode == "repeat":
        if prev is None:
            raise ValueError("zstd repeat mode needs a previous table")
        # a repeat block can only emit symbols the carried table can
        # represent: the RLE symbol itself, or codes with nonzero
        # probability in the FSE distribution
        if prev[0] == "rle":
            bad = {c for c in codes if c != prev[1]}
        else:
            bad = set(codes) - set(_fse_symbol_cells(prev[2]))
        if bad:
            raise ValueError(
                f"zstd repeat mode: codes {sorted(bad)} not "
                "representable by the previous block's table")
        return 3, b"", prev
    if table_mode == "fitted":
        distinct = set(codes)
        if len(distinct) == 1:
            return 1, bytes([codes[0]]), ("rle", codes[0])
        counts: dict[int, int] = {}
        for c in codes:
            counts[c] = counts.get(c, 0) + 1
        al = max(5, min(max_al, (len(codes) - 1).bit_length()))
        probs = _normalize_probs(counts, al)
        desc = _write_fse_distribution(al, probs)
        return 2, desc, ("fse", al, _build_fse_table(al, probs))
    return 0, b"", predef


def _sequences_section(
    seqs: list[tuple[int, int, int]],
    table_mode: str = "predefined",
    prev_tables: dict | None = None,
) -> tuple[bytes, dict]:
    """Serialize the sequences section.  ``table_mode`` is
    'predefined' (mode 0, no descriptions), 'fitted' (per-block FSE /
    RLE tables, the shape real encoders emit), or 'repeat' (mode 3,
    reuse ``prev_tables`` from the previous block).  Returns
    (bytes, tables) so a following block can repeat the tables."""
    n = len(seqs)
    if n >= 0x7F00 + 0x10000:
        # a 128 KB block holds < 44K three-byte matches, so this is a
        # logic-error guard, not a reachable input condition
        raise ValueError("zstd encoder: too many sequences per block")
    head = bytearray()
    if n < 128:
        head.append(n)
    elif n < 0x7F00:
        head.append(128 + (n >> 8))
        head.append(n & 0xFF)
    else:  # long form: 0xFF + little-endian (n - 0x7F00)
        head.append(255)
        head.append((n - 0x7F00) & 0xFF)
        head.append(((n - 0x7F00) >> 8) & 0xFF)
    ll_codes = [_ll_code(ll) for ll, _, _ in seqs]
    of_vals = [off + 3 for _, off, _ in seqs]
    of_codes = [v.bit_length() - 1 for v in of_vals]
    ml_codes = [_ml_code(ml) for _, _, ml in seqs]
    prev_tables = prev_tables or {}
    ll_mode, ll_desc, ll_tab = _pick_seq_table(
        ll_codes, table_mode, _LL_PREDEF, _LL_MAX_AL,
        prev_tables.get("ll"))
    of_mode, of_desc, of_tab = _pick_seq_table(
        of_codes, table_mode, _OF_PREDEF, _OF_MAX_AL,
        prev_tables.get("of"))
    ml_mode, ml_desc, ml_tab = _pick_seq_table(
        ml_codes, table_mode, _ML_PREDEF, _ML_MAX_AL,
        prev_tables.get("ml"))
    head.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    head += ll_desc + of_desc + ml_desc

    def chain(codes, tab):
        if tab[0] == "rle":
            return None, []
        cells = _fse_symbol_cells(tab[2])
        return _fse_encode_states(codes, cells)

    ll_states, ll_d = chain(ll_codes, ll_tab)
    of_states, of_d = chain(of_codes, of_tab)
    ml_states, ml_d = chain(ml_codes, ml_tab)
    # read order: LL init, OF init, ML init (RLE categories read no
    # state), then per sequence OF/ML/LL extra bits, then (while not
    # the last sequence) LL/ML/OF state updates
    reads: list[tuple[int, int]] = []
    if ll_states is not None:
        reads.append((ll_states[0], ll_tab[1]))
    if of_states is not None:
        reads.append((of_states[0], of_tab[1]))
    if ml_states is not None:
        reads.append((ml_states[0], ml_tab[1]))
    for i, (ll, off, ml) in enumerate(seqs):
        ofc = of_codes[i]
        reads.append((of_vals[i] - (1 << ofc), ofc))
        mlc = ml_codes[i]
        reads.append((ml - _ML_BASE[mlc], _ML_BITS[mlc]))
        llc = ll_codes[i]
        reads.append((ll - _LL_BASE[llc], _LL_BITS[llc]))
        if i < n - 1:
            if ll_states is not None:
                reads.append(ll_d[i])
            if ml_states is not None:
                reads.append(ml_d[i])
            if of_states is not None:
                reads.append(of_d[i])
    w = _BitWriter()
    for value, nb in reversed(reads):
        w.push(value, nb)
    tables = {"ll": ll_tab, "of": of_tab, "ml": ml_tab}
    return bytes(head) + w.finish(), tables


def _huffman_literals_section(
    lits: bytes, four_stream: bool = False
) -> bytes | None:
    """Huffman-compressed literals section (direct weights); None when
    Huffman does not pay.  Used by the encoder's huffman mode and the
    decoder's test fixtures."""
    import heapq

    if len(lits) < 16 or len(set(lits)) < 2:
        return None
    freq: dict[int, int] = {}
    for b in lits:
        freq[b] = freq.get(b, 0) + 1
    heap = [(f, s, None) for s, f in freq.items()]
    heapq.heapify(heap)
    seq = 256
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], seq, (a, b)))
        seq += 1
    depths: dict[int, int] = {}

    def walk(node, d):
        if node[2] is None:
            depths[node[1]] = max(d, 1)
            return
        walk(node[2][0], d + 1)
        walk(node[2][1], d + 1)

    walk(heap[0], 0)
    max_d = max(depths.values())
    if max_d > _HUF_MAX_BITS:
        return None  # depth-limited construction not needed for tests
    weights_full = [0] * 256
    for s, d in depths.items():
        weights_full[s] = max_d + 1 - d
    last_sym = max(s for s, w in enumerate(weights_full) if w > 0)
    transmitted = weights_full[:last_sym]
    codes = _huf_codes_from_weights(weights_full[:last_sym + 1])
    nw = len(transmitted)
    tree = None
    if nw <= 128:  # direct 4-bit form caps at 128 transmitted weights
        tree = bytearray([127 + nw])
        for k in range(0, nw, 2):
            hi = transmitted[k] << 4
            lo = transmitted[k + 1] if k + 1 < nw else 0
            tree.append(hi | lo)
    fse_tree = _encode_huf_weights_fse(transmitted)
    if fse_tree is not None and (tree is None or
                                 len(fse_tree) < len(tree)):
        tree = fse_tree
    if tree is None:
        return None

    def enc_stream(chunk: bytes) -> bytes:
        w = _BitWriter()
        for b in reversed(chunk):
            code, nb = codes[b]
            w.push(code, nb)
        return w.finish()

    reg = len(lits)
    if four_stream:
        part = (reg + 3) // 4
        chunks = [lits[:part], lits[part:2 * part],
                  lits[2 * part:3 * part], lits[3 * part:]]
        if any(not c for c in chunks):
            return None
        streams = [enc_stream(c) for c in chunks]
        payload = bytes(tree) + struct.pack(
            "<HHH", len(streams[0]), len(streams[1]), len(streams[2])
        ) + b"".join(streams)
        csize = len(payload)
        if reg >= (1 << 10) or csize >= (1 << 10):
            if reg >= (1 << 14) or csize >= (1 << 14):
                return None
            h = 2 | (2 << 2) | (reg << 4) | (csize << 18)
            header = h.to_bytes(4, "little")
        else:
            h = 2 | (1 << 2) | (reg << 4) | (csize << 14)
            header = h.to_bytes(3, "little")
    else:
        payload = bytes(tree) + enc_stream(lits)
        csize = len(payload)
        if reg >= (1 << 10) or csize >= (1 << 10):
            return None
        h = 2 | (0 << 2) | (reg << 4) | (csize << 14)
        header = h.to_bytes(3, "little")
    if len(header) + csize >= reg:
        return None
    return header + payload


def _encode_block_body_huffman(
    src: bytes, table_mode: str = "predefined",
) -> bytes | None:
    """Compressed-block body with HUFFMAN literals (sequences when
    they pay, else literals-only) -- exercises the full literal path."""
    seqs, _ = _find_sequences(src)
    lits = _split_literals(src, seqs) if seqs else src
    sect = _huffman_literals_section(
        lits, four_stream=len(lits) >= 256)
    if sect is None:
        sect = _raw_literals_section(lits)
    body = bytearray(sect)
    if seqs:
        seq_sect, _tables = _sequences_section(seqs, table_mode)
        body += seq_sect
    else:
        body += b"\x00"  # 0 sequences
    if len(body) >= len(src):
        return None
    return bytes(body)


def compress(
    data: bytes, checksum: bool = False, literals: str = "raw",
    tables: str = "predefined",
) -> bytes:
    """Encode ``data`` as one zstd frame.

    ``literals='raw'`` (default) emits raw literals; ``'huffman'``
    Huffman-codes them (direct or FSE-compressed weight tree,
    whichever is shorter).  ``tables='predefined'`` uses the RFC's
    default sequence distributions (mode 0); ``'fitted'`` emits
    per-block FSE / RLE table descriptions (the shape real encoders
    produce).  Blocks that do not compress are stored raw.
    """
    out = bytearray(struct.pack("<I", _MAGIC))
    n = len(data)
    # frame header: single-segment, explicit content size
    if n < 256:
        out.append((0 << 6) | 0x20 | (0x04 if checksum else 0))
        out.append(n)
    elif n < 65536 + 256:
        out.append((1 << 6) | 0x20 | (0x04 if checksum else 0))
        out += struct.pack("<H", n - 256)
    else:
        out.append((2 << 6) | 0x20 | (0x04 if checksum else 0))
        out += struct.pack("<I", n)
    encoder = (_encode_block_body_huffman if literals == "huffman"
               else _encode_block_body)
    if n == 0:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")
        if checksum:
            out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
        return bytes(out)
    for off in range(0, n, _MAX_BLOCK):
        chunk = data[off:off + _MAX_BLOCK]
        last = 1 if off + _MAX_BLOCK >= n else 0
        if len(set(chunk)) == 1 and len(chunk) >= 2:
            out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(
                3, "little")
            out.append(chunk[0])
            continue
        body = encoder(chunk, tables)
        if body is None:
            out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(
                3, "little")
            out += chunk
        else:
            out += (last | (2 << 1) | (len(body) << 3)).to_bytes(
                3, "little")
            out += body
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
