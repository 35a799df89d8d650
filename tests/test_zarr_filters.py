"""Zarr v2 numcodecs filter chains: codec-level goldens against the
published numcodecs semantics, distributed write->read roundtrips, and
interop with hand-crafted stores shaped like real EO products (packed
int16 + FixedScaleOffset, Delta+Shuffle'd coordinates)."""

import json
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.sources import read_zarr, write_zarr
from xcube_resampling_spark.sources.numcodecs_filters import (
    decode_filters,
    encode_filters,
)


def _raster(spark, w, h, nt=1):
    return spark.range(nt * w * h).select(
        (F.col("id") / (w * h)).cast("int").alias("t"),
        (F.col("id") % (w * h) / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.col("id") * 0.5).cast("double").alias("value"),
    )


class TestCodecs:
    def test_delta_golden(self):
        conf = {"id": "delta", "dtype": "<i4"}
        raw = np.array([5, 7, 10, 10, 3], "<i4").tobytes()
        enc = encode_filters(raw, [conf])
        np.testing.assert_array_equal(
            np.frombuffer(enc, "<i4"), [5, 2, 3, 0, -7])
        assert decode_filters(enc, [conf]) == raw

    def test_delta_astype_narrowing(self):
        # store i8 values as i4 diffs -- the packed-coordinate shape
        conf = {"id": "delta", "dtype": "<i8", "astype": "<i4"}
        vals = np.array([1_000_000_000_000 + 10 * k for k in range(6)],
                        "<i8")
        enc = encode_filters(vals.tobytes(), [conf])
        assert len(enc) == 6 * 4  # first + 5 diffs, all i4
        dec = np.frombuffer(decode_filters(enc, [conf]), "<i8")
        # the first value itself wraps through i4 (numcodecs does the
        # same unsafe cast); diffs reconstruct exactly relative to it
        np.testing.assert_array_equal(np.diff(dec), np.diff(vals))

    def test_delta_float(self):
        conf = {"id": "delta", "dtype": "<f8"}
        vals = np.array([0.5, 1.25, -3.0, 7.5], "<f8")
        enc = encode_filters(vals.tobytes(), [conf])
        dec = np.frombuffer(decode_filters(enc, [conf]), "<f8")
        np.testing.assert_array_equal(dec, vals)

    def test_fixedscaleoffset_golden(self):
        # CMEMS-style packing: f8 -> u1 at scale 10 around offset 1000
        conf = {"id": "fixedscaleoffset", "offset": 1000.0,
                "scale": 10.0, "dtype": "<f8", "astype": "|u1"}
        vals = np.array([1000.0, 1000.1, 1000.5, 1001.0, 1023.5], "<f8")
        enc = encode_filters(vals.tobytes(), [conf])
        np.testing.assert_array_equal(
            np.frombuffer(enc, "|u1"), [0, 1, 5, 10, 235])
        dec = np.frombuffer(decode_filters(enc, [conf]), "<f8")
        np.testing.assert_allclose(dec, vals, atol=0.05)

    def test_quantize_golden(self):
        # digits=1 -> exp=-1 -> bits=ceil(log2(10))=4 -> scale=16
        conf = {"id": "quantize", "digits": 1, "dtype": "<f8"}
        vals = np.array([0.1234, 1.0, 2.71828], "<f8")
        enc = np.frombuffer(encode_filters(vals.tobytes(), [conf]), "<f8")
        np.testing.assert_array_equal(
            enc, np.around(16.0 * vals) / 16.0)
        # decode is identity (lossy on encode only)
        assert decode_filters(enc.tobytes(), [conf]) == enc.tobytes()

    def test_shuffle_roundtrip_with_remainder(self):
        conf = {"id": "shuffle", "elementsize": 4}
        raw = bytes(range(23))  # 5 elements + 3 remainder bytes
        enc = encode_filters(raw, [conf])
        assert enc[-3:] == raw[-3:]  # remainder kept in place
        # byte-transpose golden for the first element's lanes
        assert enc[0] == 0 and enc[5] == 1 and enc[10] == 2
        assert decode_filters(enc, [conf]) == raw

    def test_astype(self):
        conf = {"id": "astype", "encode_dtype": "<i2",
                "decode_dtype": "<i8"}
        vals = np.array([1, -2, 300], "<i8")
        enc = encode_filters(vals.tobytes(), [conf])
        assert len(enc) == 6
        np.testing.assert_array_equal(
            np.frombuffer(decode_filters(enc, [conf]), "<i8"), vals)

    def test_chain_order(self):
        # encode applies first-to-last; decode must invert in reverse
        chain = [
            {"id": "delta", "dtype": "<i4"},
            {"id": "shuffle", "elementsize": 4},
            {"id": "zlib", "level": 6},
        ]
        raw = np.arange(100, dtype="<i4").tobytes()
        enc = encode_filters(raw, chain)
        assert decode_filters(enc, chain) == raw
        # deltas of arange are tiny -> shuffle + zlib crush it
        assert len(enc) < len(raw) // 4

    def test_bitround(self):
        # round-half-to-even to keepbits mantissa bits; decode identity
        conf = {"id": "bitround", "keepbits": 6}
        vals = np.linspace(-17.3, 42.9, 257)
        enc = np.frombuffer(
            encode_filters(vals.tobytes(), [conf]), "<f8")
        nz = vals != 0
        rel = np.abs(enc[nz] - vals[nz]) / np.abs(vals[nz])
        assert rel.max() < 2.0 ** -6
        # dropped mantissa bits are exactly zero
        assert (enc.view(np.uint64) & np.uint64((1 << 46) - 1) == 0).all()
        assert decode_filters(enc.tobytes(), [conf]) == enc.tobytes()
        # keepbits = full mantissa -> identity
        full = {"id": "bitround", "keepbits": 52}
        assert encode_filters(vals.tobytes(), [full]) == vals.tobytes()
        with pytest.raises(ValueError):
            encode_filters(vals.tobytes(),
                           [{"id": "bitround", "keepbits": 60}])

    def test_unknown_filter_raises(self):
        with pytest.raises(NotImplementedError, match="vlen-utf8"):
            decode_filters(b"", [{"id": "vlen-utf8"}])


class TestDistributedRoundtrip:
    @pytest.mark.parametrize("filters", [
        [{"id": "delta", "dtype": "<f8"}],
        [{"id": "shuffle", "elementsize": 8}],
        [{"id": "quantize", "digits": 5, "dtype": "<f8"}],
        [{"id": "delta", "dtype": "<f8"},
         {"id": "shuffle", "elementsize": 8}],
    ])
    def test_write_read(self, spark, tmp_path, filters):
        w, h = 25, 17
        df = _raster(spark, w, h)
        path = str(tmp_path / "store_f")
        # NaN fill + Delta doesn't roundtrip (cumsum propagates the
        # padded edge-chunk NaNs -- numcodecs corrupts identically);
        # delta chains use a numeric fill, like real packed products
        fill = 0.0 if any(f["id"] == "delta" for f in filters) \
            else float("nan")
        write_zarr(df, path, "v", (h, w), (8, 8), compressor="zstd",
                   fill_value=fill, filters=filters)
        meta = json.load(open(f"{path}/v/.zarray"))
        assert meta["filters"] == filters
        got = read_zarr(spark, path, "v").toPandas().sort_values(
            ["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        assert len(got) == w * h
        if any(f["id"] == "quantize" for f in filters):
            np.testing.assert_allclose(
                got["value"].to_numpy(), exp["value"].to_numpy(),
                atol=1e-5)
        else:
            np.testing.assert_array_equal(
                got["value"].to_numpy(), exp["value"].to_numpy())


class TestHandCraftedInterop:
    def test_packed_int16_fixedscaleoffset(self, spark, tmp_path):
        """The classic satellite-product layout: physical floats packed
        to <i2 by FixedScaleOffset, zlib-compressed -- written here
        byte-by-byte from the numcodecs definitions, NOT by our writer."""
        h = w = 8
        vals = (np.arange(h * w, dtype="<f8").reshape(h, w) / 10.0
                + 280.0)
        conf = {"id": "fixedscaleoffset", "offset": 280.0,
                "scale": 100.0, "dtype": "<f8", "astype": "<i2"}
        packed = np.around((vals - 280.0) * 100.0).astype("<i2")
        store = tmp_path / "sat"
        (store / "sst").mkdir(parents=True)
        (store / ".zgroup").write_text('{"zarr_format": 2}')
        (store / "sst" / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [h, w], "chunks": [h, w],
            "dtype": "<f8",
            "compressor": {"id": "zlib", "level": 1},
            "fill_value": "NaN", "order": "C", "filters": [conf],
        }))
        (store / "sst" / "0.0").write_bytes(
            zlib.compress(packed.tobytes(), 1))
        got = read_zarr(spark, str(store), "sst").toPandas() \
            .sort_values(["j", "i"])
        np.testing.assert_allclose(
            got["value"].to_numpy(), vals.ravel(), atol=1e-9)

    def test_int_delta_chunked_store(self, spark, tmp_path):
        """Delta over int32 pixels (the packed-counter shape Delta is
        actually for -- exact by integer arithmetic), two chunks, with
        CF scale/offset decoding on top."""
        h, w = 4, 10
        vals = (np.arange(h * w, dtype="<i4").reshape(h, w) * 3 + 7)
        dconf = {"id": "delta", "dtype": "<i4"}
        store = tmp_path / "cnt"
        (store / "n").mkdir(parents=True)
        (store / ".zgroup").write_text('{"zarr_format": 2}')
        (store / "n" / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [h, w], "chunks": [h, 5],
            "dtype": "<i4",
            "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0, "order": "C", "filters": [dconf],
        }))
        (store / "n" / ".zattrs").write_text(json.dumps({
            "scale_factor": 0.5, "add_offset": 100.0,
        }))
        for k in range(2):
            chunk = np.ascontiguousarray(vals[:, k * 5:(k + 1) * 5])
            (store / "n" / f"0.{k}").write_bytes(zlib.compress(
                encode_filters(chunk.tobytes(), [dconf]), 1))
        got = read_zarr(spark, str(store), "n", decode_cf=True) \
            .toPandas().sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), vals.ravel() * 0.5 + 100.0)

    def test_compressed_filtered_coordinates(self, spark, tmp_path):
        """read_zarr_grid_mapping must decode compressed + Delta'd,
        multi-chunk 1-D coordinate arrays (real stores compress
        coords too)."""
        from xcube_resampling_spark.sources.zarr import (
            read_zarr_grid_mapping,
        )

        store = tmp_path / "cm"
        store.mkdir()
        (store / ".zgroup").write_text('{"zarr_format": 2}')
        x = np.arange(10, dtype="<f8") * 0.25 + 100.0
        y = np.arange(6, dtype="<f8")[::-1] * 0.25 + 40.0
        dconf = {"id": "delta", "dtype": "<f8"}
        for name, arr, cs in (("x", x, 4), ("y", y, 6)):
            d = store / name
            d.mkdir()
            (d / ".zarray").write_text(json.dumps({
                "zarr_format": 2, "shape": [len(arr)], "chunks": [cs],
                "dtype": "<f8",
                "compressor": {"id": "zlib", "level": 1},
                "fill_value": None, "order": "C", "filters": [dconf],
            }))
            for k in range(-(-len(arr) // cs)):
                part = arr[k * cs:(k + 1) * cs]
                # per-chunk delta, as zarr applies filters per chunk
                (d / str(k)).write_bytes(zlib.compress(
                    encode_filters(part.tobytes(), [dconf]), 1))
        gm = read_zarr_grid_mapping(str(store))
        assert gm is not None
        np.testing.assert_allclose(np.asarray(gm.x_coords), x)
        np.testing.assert_allclose(np.asarray(gm.y_coords), y)
