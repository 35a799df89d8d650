"""Clean-room numcodecs filter-chain codecs for zarr v2 stores.

Real-world EO zarr v2 stores (CMEMS, some ESA cubes) apply one or more
numcodecs *filters* -- array-to-array transforms -- ahead of the byte
compressor: ``Delta`` (store differences of packed integers),
``FixedScaleOffset`` (pack floats to small ints), ``Quantize`` (drop
float mantissa bits), ``Shuffle`` (byte transposition), ``AsType``
(width change).  The reference reads such stores for free through
zarr-python + numcodecs (reference cfconv.py:343-358 opens any store);
this module supplies the same semantics from the published numcodecs
codec definitions so the distributed reader opens them too.

Encode order (zarr v2 spec): filters are applied first-to-last on
write, then the compressor; decode runs the compressor first, then the
filters last-to-first.  :func:`encode_filters` / :func:`decode_filters`
operate bytes-to-bytes so the chunk pipeline stays a byte stream until
the final ``np.frombuffer`` with the array dtype.

Byte-stream codec ids (zlib/gzip/lz4/zstd) are also legal filter
entries in numcodecs and are routed to the in-repo codecs.
"""

from __future__ import annotations

import math
import zlib

import numpy as np

__all__ = ["decode_filters", "encode_filters"]


def _delta_encode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    arr = np.frombuffer(raw, dtype=dtype)
    enc = np.empty_like(arr, dtype=astype)
    if len(arr):
        enc[0] = arr[0]
        np.subtract(arr[1:], arr[:-1], out=enc[1:], casting="unsafe")
    return enc.tobytes()


def _delta_decode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    enc = np.frombuffer(raw, dtype=astype)
    # accumulate IN the target dtype (numcodecs does np.cumsum with an
    # out array of self.dtype): integer wraparound must match
    dec = np.cumsum(enc, dtype=dtype).astype(dtype, copy=False)
    return dec.tobytes()


def _fso_encode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    arr = np.frombuffer(raw, dtype=dtype)
    enc = np.around((arr - conf["offset"]) * conf["scale"])
    return enc.astype(astype, casting="unsafe").tobytes()


def _fso_decode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    enc = np.frombuffer(raw, dtype=astype)
    dec = enc / conf["scale"] + conf["offset"]
    return dec.astype(dtype, casting="unsafe").tobytes()


def _quantize_scale(digits: int) -> float:
    # the published numcodecs dimensioning: digits -> decimal exponent
    # -> number of binary mantissa bits -> power-of-two scale
    precision = 10.0 ** -digits
    exp = math.log10(precision)
    exp = int(math.floor(exp)) if exp < 0 else int(math.ceil(exp))
    bits = math.ceil(math.log2(10.0 ** -exp))
    return 2.0 ** bits


def _quantize_encode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    arr = np.frombuffer(raw, dtype=dtype)
    scale = _quantize_scale(int(conf["digits"]))
    enc = np.around(scale * arr) / scale
    return enc.astype(astype, casting="same_kind").tobytes()


def _quantize_decode(raw: bytes, conf: dict) -> bytes:
    dtype = np.dtype(conf["dtype"])
    astype = np.dtype(conf.get("astype") or conf["dtype"])
    # lossy on encode; decode is just the width restoration
    return np.frombuffer(raw, dtype=astype).astype(
        dtype, casting="same_kind").tobytes()


def _shuffle_encode(raw: bytes, conf: dict) -> bytes:
    es = int(conf.get("elementsize", 4))
    if es <= 1:
        return raw
    count = len(raw) // es
    body = np.frombuffer(raw[: count * es], dtype=np.uint8)
    out = body.reshape(count, es).T.tobytes()
    return out + raw[count * es:]  # trailing remainder stays in place


def _shuffle_decode(raw: bytes, conf: dict) -> bytes:
    es = int(conf.get("elementsize", 4))
    if es <= 1:
        return raw
    count = len(raw) // es
    body = np.frombuffer(raw[: count * es], dtype=np.uint8)
    out = body.reshape(es, count).T.tobytes()
    return out + raw[count * es:]


def _bitround_encode(raw: bytes, conf: dict) -> bytes:
    # numcodecs BitRound: round-half-to-even the float mantissa down
    # to ``keepbits`` bits (Klöwer et al., the ERA5-style lossy float
    # prep that makes the compressor bite).  The stored config has no
    # dtype (numcodecs infers it from the buffer); our write path is
    # <f8 blocks, overridable via an explicit "dtype" entry.
    dtype = np.dtype(conf.get("dtype", "<f8"))
    keepbits = int(conf["keepbits"])
    bits = 52 if dtype.itemsize == 8 else 23
    if not 0 <= keepbits <= bits:
        raise ValueError(f"keepbits must be in [0, {bits}]")
    if keepbits == bits:
        return raw
    itype = np.dtype(f"{dtype.byteorder}u{dtype.itemsize}")
    b = np.frombuffer(raw, dtype=dtype).view(itype).copy()
    maskbits = bits - keepbits
    width = 8 * dtype.itemsize
    mask = itype.type(((1 << width) - 1) ^ ((1 << maskbits) - 1))
    half_quantum1 = itype.type((1 << (maskbits - 1)) - 1)
    with np.errstate(over="ignore"):  # carry into the exponent is the
        b += ((b >> itype.type(maskbits))  # round-up case, not an error
              & itype.type(1)) + half_quantum1
        b &= mask
    return b.view(dtype).tobytes()


def _bitround_decode(raw: bytes, conf: dict) -> bytes:
    return raw  # lossy on encode; stored bytes ARE the floats


def _astype_encode(raw: bytes, conf: dict) -> bytes:
    arr = np.frombuffer(raw, dtype=np.dtype(conf["decode_dtype"]))
    return arr.astype(
        np.dtype(conf["encode_dtype"]), casting="unsafe").tobytes()


def _astype_decode(raw: bytes, conf: dict) -> bytes:
    arr = np.frombuffer(raw, dtype=np.dtype(conf["encode_dtype"]))
    return arr.astype(
        np.dtype(conf["decode_dtype"]), casting="unsafe").tobytes()


def _bytes_codec(codec_id: str):
    """zlib/gzip/lz4/zstd are legal numcodecs filter entries too."""
    from xcube_resampling_spark.sources import lz4 as _lz4
    from xcube_resampling_spark.sources import zstd as _zstd

    if codec_id == "zlib":
        return (lambda b, c: zlib.compress(b, int(c.get("level", 1))),
                lambda b, c: zlib.decompress(b))
    if codec_id == "gzip":
        import gzip as _gzip

        return (lambda b, c: _gzip.compress(b, int(c.get("level", 1))),
                lambda b, c: _gzip.decompress(b))
    if codec_id == "lz4":
        return (lambda b, c: _lz4.compress_framed(b),
                lambda b, c: _lz4.decompress_framed(b))
    if codec_id == "zstd":
        return (lambda b, c: _zstd.compress(b),
                lambda b, c: _zstd.decompress(b))
    return None


_ARRAY_CODECS = {
    "delta": (_delta_encode, _delta_decode),
    "fixedscaleoffset": (_fso_encode, _fso_decode),
    "quantize": (_quantize_encode, _quantize_decode),
    "shuffle": (_shuffle_encode, _shuffle_decode),
    "astype": (_astype_encode, _astype_decode),
    "bitround": (_bitround_encode, _bitround_decode),
}


def _resolve(conf: dict):
    codec_id = conf.get("id")
    pair = _ARRAY_CODECS.get(codec_id) or _bytes_codec(codec_id)
    if pair is None:
        raise NotImplementedError(
            f"zarr v2 filter '{codec_id}' not available in this build "
            f"(supported: {sorted(_ARRAY_CODECS)}, zlib, gzip, lz4, "
            "zstd)"
        )
    return pair


def encode_filters(raw: bytes, filters: list | None) -> bytes:
    """Apply a zarr v2 filter chain in write order (first to last)."""
    for conf in filters or ():
        raw = _resolve(conf)[0](raw, conf)
    return raw


def decode_filters(raw: bytes, filters: list | None) -> bytes:
    """Invert a zarr v2 filter chain (last filter decoded first)."""
    for conf in reversed(filters or ()):
        raw = _resolve(conf)[1](raw, conf)
    return raw
