"""Shared MSB-first bit I/O for the clean-room binary codecs
(:mod:`.extensions.flaccodec`, :mod:`.sources.szip`).

One implementation of the two subtle pieces both codecs need:

* ``unary()`` in O(log n) via a precomputed one-bit index
  (``np.unpackbits`` once per stream + ``searchsorted`` per read) --
  never rescan bytes per unary symbol;
* the whole stream is indexed ONCE.  Decoders must create a single
  reader and advance ``pos`` across records/frames; re-slicing the
  buffer per frame (``BitReader(data[pos:])`` in a loop) is O(n^2)
  in stream size and measured minutes on a single real-length FLAC
  file.

JPEG keeps its own reader (:mod:`.extensions.jpegcodec`): its entropy
stream needs 0xFF00 byte-unstuffing, a different contract.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BitReader", "BitWriter"]


class BitReader:
    """MSB-first reader over the full buffer; ``pos`` is in bits."""

    def __init__(self, data: bytes, label: str = "bit"):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8
        self.label = label
        self._ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, np.uint8)))

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > self.nbits:
            raise ValueError(f"{self.label} stream truncated mid-field")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b1], "big")
        self.pos = end
        return (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0-bits up to the next 1-bit (consumed)."""
        i = np.searchsorted(self._ones, self.pos)
        if i >= self._ones.size:
            raise ValueError(
                f"{self.label} stream truncated mid-unary")
        one_at = int(self._ones[i])
        q = one_at - self.pos
        self.pos = one_at + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class BitWriter:
    """MSB-first writer; ``unary(q)`` emits q 0-bits then a 1-bit."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, n: int, v: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(32, 0)
            q -= 32
        self.write(q + 1, 1)

    def align(self) -> None:
        if self.nacc:
            self.write(8 - self.nacc, 0)

    def getvalue(self, pad: bool = False) -> bytes:
        if pad:
            self.align()
        assert self.nacc == 0, "unaligned bit stream"
        return bytes(self.buf)
