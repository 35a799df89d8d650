"""Pure-Python/numpy codec for the c-blosc (blosc1) chunk format.

Real-world Zarr v2 stores overwhelmingly default to the blosc compressor
(numcodecs ``Blosc``); the reference opens such stores directly through
zarr/xarray (reference cfconv.py:343-358).  The blosc C library is not
available in this environment, so this module implements the PUBLIC
blosc1 frame layout (c-blosc ``README_HEADER.rst``) with numpy:

16-byte little-endian header::

    byte  0      format version
    byte  1      codec (versionlz) version
    byte  2      flags: bit0 byte-shuffle, bit1 pure-memcpy,
                 bit2 bit-shuffle, bit4 dont-split,
                 bits5-7 codec id (0 blosclz, 1 lz4, 2 snappy,
                 3 zlib, 4 zstd)
    byte  3      typesize
    bytes 4-7    nbytes   (uncompressed size, uint32)
    bytes 8-11   blocksize (uint32)
    bytes 12-15  cbytes   (total frame size incl. header, uint32)

Body: for memcpy frames the raw bytes follow directly.  Otherwise a
``uint32`` offset table (one entry per block, offsets from the frame
start) is followed by the compressed blocks.  Each block holds one
stream per *split* -- ``typesize`` byte-plane streams when the
dont-split flag is clear (and the block is full-size), one stream
otherwise -- and every stream is ``int32 csize`` + payload, with
``csize == uncompressed-size`` marking a stored-raw stream.

Byte-shuffle is applied per block before compression: the block's
``nel = bsize // typesize`` elements are transposed into ``typesize``
byte planes (a numpy reshape/transpose); trailing bytes that do not
fill an element are carried unshuffled, matching c-blosc.

Inner codecs: ``zlib`` (stdlib) and ``lz4`` (the in-repo clean-room
block codec, sources/lz4.py -- the numcodecs ``Blosc`` DEFAULT, so
real-world zarr v2 stores now open) end-to-end; ``zstd`` streams
decode through the in-repo RFC 8878 codec (sources/zstd.py);
stored-raw streams of any codec decode fine.  Compressed blosclz/
snappy streams and bit-shuffle frames raise ``NotImplementedError``
with a clear message.

The encoder always sets the dont-split flag (one stream per block),
which real c-blosc decoders honor (the flag exists precisely so
decoders need not re-derive the split heuristic).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from xcube_resampling_spark.sources import lz4 as _lz4
from xcube_resampling_spark.sources import zstd as _zstd

_MEMCPY = 0x2
_SHUFFLE = 0x1
_BITSHUFFLE = 0x4
_DONT_SPLIT = 0x10
_CODECS = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_LZ4_ID = 1
_ZLIB_ID = 3
_ZSTD_ID = 4
_CNAME_IDS = {"zlib": _ZLIB_ID, "lz4": _LZ4_ID}
_MAX_BLOCK = 256 * 1024


def _unshuffle(block: bytes, typesize: int) -> bytes:
    nel = len(block) // typesize
    head = nel * typesize
    arr = np.frombuffer(block[:head], dtype=np.uint8)
    out = arr.reshape(typesize, nel).T.reshape(-1)
    return out.tobytes() + block[head:]


def _shuffle(block: bytes, typesize: int) -> bytes:
    nel = len(block) // typesize
    head = nel * typesize
    arr = np.frombuffer(block[:head], dtype=np.uint8)
    out = arr.reshape(nel, typesize).T.reshape(-1)
    return out.tobytes() + block[head:]


def decode(frame: bytes) -> bytes:
    """Decode one blosc1 frame to its raw bytes."""
    if len(frame) < 16:
        raise ValueError("blosc frame shorter than its 16-byte header")
    flags = frame[2]
    typesize = frame[3] or 1
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if cbytes > len(frame):
        raise ValueError(
            f"blosc frame truncated: header says {cbytes}, got {len(frame)}"
        )
    if flags & _MEMCPY:
        return bytes(frame[16:16 + nbytes])
    if flags & _BITSHUFFLE:
        raise NotImplementedError(
            "blosc bit-shuffle filter not available in this build"
        )
    codec = flags >> 5
    if codec not in _CODECS:
        raise ValueError(f"unknown blosc codec id {codec}")
    blocksize = blocksize or nbytes
    nblocks = max(1, -(-nbytes // blocksize))
    bstarts = np.frombuffer(frame, dtype="<u4", count=nblocks, offset=16)
    out = bytearray(nbytes)
    for b in range(nblocks):
        off = int(bstarts[b])
        bsize = min(blocksize, nbytes - b * blocksize)
        leftover = bsize < blocksize
        split = not (flags & _DONT_SPLIT) and not leftover and typesize > 1
        nsplits = typesize if split else 1
        neblock = bsize // nsplits
        parts = []
        for s in range(nsplits):
            (csize,) = struct.unpack_from("<i", frame, off)
            off += 4
            # the last split of a leftover block may be the remainder
            want = neblock if s < nsplits - 1 else bsize - neblock * (
                nsplits - 1
            )
            if csize == want:
                parts.append(frame[off:off + csize])
            elif csize <= 0:
                raise ValueError(f"invalid blosc split size {csize}")
            elif codec == _ZLIB_ID:
                raw = zlib.decompress(frame[off:off + csize])
                if len(raw) != want:
                    raise ValueError(
                        f"blosc split decoded to {len(raw)}, wanted {want}"
                    )
                parts.append(raw)
            elif codec == _LZ4_ID:
                raw = _lz4.decompress_block(
                    bytes(frame[off:off + csize]), want)
                parts.append(raw)
            elif codec == _ZSTD_ID:
                raw = _zstd.decompress(bytes(frame[off:off + csize]))
                if len(raw) != want:
                    raise ValueError(
                        f"blosc zstd split decoded to {len(raw)}, "
                        f"wanted {want}"
                    )
                parts.append(raw)
            else:
                raise NotImplementedError(
                    f"blosc inner codec '{_CODECS[codec]}' not available in "
                    "this build (zlib, lz4, zstd, and stored-raw streams "
                    "only)"
                )
            off += csize
        block = b"".join(parts)
        if flags & _SHUFFLE:
            block = _unshuffle(block, typesize)
        if len(block) != bsize:
            # bytearray slice assignment would silently RESIZE on a
            # short block (corrupt frame), shifting all later data
            raise ValueError(
                f"blosc block {b} decoded to {len(block)} bytes, "
                f"wanted {bsize}"
            )
        start = b * blocksize
        out[start:start + bsize] = block
    return bytes(out)


def encode(
    data: bytes,
    typesize: int = 8,
    clevel: int = 1,
    shuffle: bool = True,
    blocksize: int | None = None,
    cname: str = "zlib",
) -> bytes:
    """Encode raw bytes as a blosc1 frame (``zlib`` or ``lz4`` inner
    codec -- ``lz4`` produces the byte format real c-blosc emits for
    the numcodecs default ``Blosc(cname='lz4')``).

    The frame is decodable by any conformant blosc1 reader: standard
    header, per-block offset table, dont-split flag set, compressed
    streams with stored-raw fallback, whole-frame memcpy fallback when
    compression does not pay.
    """
    if cname not in _CNAME_IDS:
        raise NotImplementedError(
            f"blosc encode cname '{cname}' not available "
            "(zlib or lz4)"
        )
    nbytes = len(data)
    if nbytes == 0:
        return struct.pack("<BBBBIII", 2, 1, _MEMCPY, typesize, 0, 0, 16)
    if blocksize is None:
        blocksize = min(nbytes, _MAX_BLOCK)
    # keep whole elements per block so the shuffle planes stay aligned
    if blocksize % typesize:
        blocksize += typesize - blocksize % typesize
    blocksize = min(blocksize, max(nbytes, typesize))
    nblocks = -(-nbytes // blocksize)
    codec_id = _CNAME_IDS[cname]
    flags = (codec_id << 5) | _DONT_SPLIT | (_SHUFFLE if shuffle else 0)
    header_len = 16 + 4 * nblocks
    chunks: list[bytes] = []
    bstarts = np.zeros(nblocks, dtype="<u4")
    off = header_len
    for b in range(nblocks):
        start = b * blocksize
        block = data[start:start + min(blocksize, nbytes - start)]
        if shuffle:
            block = _shuffle(block, typesize)
        if codec_id == _LZ4_ID:
            comp = _lz4.compress_block(block)
        else:
            comp = zlib.compress(block, clevel)
        if len(comp) >= len(block):  # stored-raw stream
            comp = block
        stream = struct.pack("<i", len(comp)) + comp
        bstarts[b] = off
        chunks.append(stream)
        off += len(stream)
    total = off
    if total >= nbytes + 16:  # compression did not pay: memcpy frame
        return (
            struct.pack(
                "<BBBBIII", 2, 1, _MEMCPY, typesize, nbytes, blocksize,
                nbytes + 16,
            )
            + data
        )
    header = struct.pack(
        "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, total
    )
    return header + bstarts.tobytes() + b"".join(chunks)
