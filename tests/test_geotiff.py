"""GeoTIFF / COG source + sink tests.

Codec layer (LZW with early-change widths, PackBits, predictor) is
property-tested standalone; the container layer roundtrips through the
repo's own writer plus hand-framed fixtures for the layouts the writer
does not emit (strips with a short last strip, chunky interleave,
big-endian) so the reader's spec coverage does not silently shrink to
"whatever our writer produces".
"""

import os
import struct
import zlib

import numpy as np
import pytest

from xcube_resampling_spark.sources.geotiff import (
    BytesRangeReader,
    COMPRESSION_DEFLATE,
    COMPRESSION_LZW,
    COMPRESSION_NONE,
    COMPRESSION_PACKBITS,
    CountingRangeReader,
    FileRangeReader,
    _decode_tile_bytes,
    _encode_tile_bytes,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    open_geotiff_dataset,
    read_geotiff,
    read_geotiff_grid_mapping,
    read_geotiff_meta,
    write_geotiff,
)


def _pixels(spark, arr3d):
    nt, h, w = arr3d.shape
    rows = [
        (t, j, i, float(arr3d[t, j, i]))
        for t in range(nt) for j in range(h) for i in range(w)
        if not np.isnan(arr3d[t, j, i])
    ]
    return spark.createDataFrame(rows, "t int, j int, i int, value double")


class TestCodecs:
    def test_lzw_bit_width_boundaries(self):
        # enough distinct 2-grams to push the table past 511/1023/2047
        # and through a 4094-entry reset
        rng = np.random.default_rng(3)
        data = bytes(rng.integers(0, 256, 200_000, dtype=np.uint8))
        enc = _lzw_encode(data)
        assert _lzw_decode(enc) == data
        assert len(enc) > 0

    def test_lzw_compresses_runs(self):
        data = b"A" * 10_000
        enc = _lzw_encode(data)
        assert len(enc) < 500
        assert _lzw_decode(enc) == data

    def test_lzw_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(st.binary(max_size=4096))
        @settings(max_examples=100, deadline=None)
        def check(data):
            assert _lzw_decode(_lzw_encode(data)) == data

        check()

    def test_lzw_rejects_bad_first_code(self):
        # a stream whose first code after Clear is non-literal
        acc = (256 << 9) | 300  # Clear, then code 300
        blob = acc << (24 - 18)
        with pytest.raises(ValueError, match="LZW"):
            _lzw_decode(blob.to_bytes(3, "big"))

    def test_packbits_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(st.binary(max_size=2048))
        @settings(max_examples=100, deadline=None)
        def check(data):
            assert _packbits_decode(_packbits_encode(data)) == data

        check()

    def test_packbits_noop_128(self):
        assert _packbits_decode(bytes([128, 0, 65])) == b"A"

    @pytest.mark.parametrize("dt", ["uint8", "int16", "uint16",
                                    "int32", "float32", "float64"])
    @pytest.mark.parametrize("comp", [COMPRESSION_NONE, COMPRESSION_LZW,
                                      COMPRESSION_DEFLATE,
                                      COMPRESSION_PACKBITS])
    def test_tile_roundtrip(self, dt, comp):
        a = (np.arange(32 * 48).reshape(32, 48) % 251).astype(dt)
        for pred in (1, 2):
            if pred == 2 and np.dtype(dt).kind == "f":
                continue
            raw = _encode_tile_bytes(a, comp, pred)
            back = _decode_tile_bytes(raw, comp, pred, np.dtype(dt),
                                      32, 48, 1, "<")
            assert np.array_equal(back[0], a)

    def test_predictor_on_float_raises(self):
        a = np.zeros((16, 16), dtype="float32")
        with pytest.raises(NotImplementedError):
            _decode_tile_bytes(a.tobytes(), COMPRESSION_NONE, 2,
                               np.dtype("float32"), 16, 16, 1, "<")


class TestRoundtrip:
    @pytest.mark.parametrize("compression", ["none", "lzw", "deflate",
                                             "packbits"])
    def test_float_roundtrip(self, spark, tmp_path, compression):
        h, w = 37, 41
        rng = np.random.default_rng(11)
        vals = rng.normal(5, 2, (1, h, w))
        path = str(tmp_path / f"rt_{compression}.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(500000.0, 4e6), xy_res=10.0, tile_size=16,
            compression=compression, dtype="float64",
        )
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        assert np.allclose(
            back["value"].to_numpy().reshape(h, w), vals[0])

    def test_int_predictor_roundtrip(self, spark, tmp_path):
        h, w = 33, 20
        vals = (np.arange(h * w).reshape(1, h, w) % 1000).astype("f8")
        path = str(tmp_path / "ipred.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:3035",
            xy_min=(4e6, 3e6), xy_res=100.0, tile_size=16,
            compression="lzw", dtype="int32",
        )
        ifds, _ = read_geotiff_meta(path)
        assert ifds[0].predictor == 2  # auto for int + lzw
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        assert np.array_equal(
            back["value"].to_numpy().reshape(h, w), vals[0])

    def test_multiband_roundtrip(self, spark, tmp_path):
        nt, h, w = 3, 21, 18
        rng = np.random.default_rng(5)
        vals = rng.normal(0, 1, (nt, h, w))
        path = str(tmp_path / "mb.tif")
        write_geotiff(
            _pixels(spark, vals), path, (nt, h, w), crs="EPSG:4326",
            xy_min=(10.0, 50.0), xy_res=0.01, tile_size=16,
            dtype="float32",
        )
        back = read_geotiff(spark, path).toPandas()
        assert len(back) == nt * h * w
        for t in range(nt):
            sl = (back[back["t"] == t].sort_values(["j", "i"])
                  ["value"].to_numpy().reshape(h, w))
            assert np.allclose(sl, vals[t], atol=1e-6)
        # single-band selection reads only that band's tiles
        one = read_geotiff(spark, path, bands=[1]).toPandas()
        assert set(one["t"]) == {1}

    def test_bigtiff_roundtrip(self, spark, tmp_path):
        h, w = 19, 23
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        path = str(tmp_path / "big.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=30.0, tile_size=16,
            bigtiff=True, dtype="float64",
        )
        with open(path, "rb") as f:
            assert struct.unpack("<H", f.read(4)[2:])[0] == 43
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        assert np.array_equal(
            back["value"].to_numpy().reshape(h, w), vals[0])

    def test_nodata_and_sparse_tiles(self, spark, tmp_path):
        # rows only in the top-left tile: the other tiles are sparse
        # (offset 0 -- GDAL convention) and read back as nodata
        h, w = 40, 40
        vals = np.full((1, h, w), np.nan)
        vals[0, :16, :16] = 7.0
        path = str(tmp_path / "sparse.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            nodata=-9999.0, dtype="float32",
        )
        ifds, _ = read_geotiff_meta(path)
        assert ifds[0].nodata == -9999.0
        assert 0 in ifds[0].offsets  # sparse tiles present
        back = read_geotiff(spark, path, decode_cf=True).toPandas()
        grid = (back.sort_values(["j", "i"])["value"]
                .to_numpy().reshape(h, w))
        assert np.all(grid[:16, :16] == 7.0)
        assert np.all(np.isnan(grid[16:, :]))
        raw = read_geotiff(spark, path).toPandas()
        rg = (raw.sort_values(["j", "i"])["value"]
              .to_numpy().reshape(h, w))
        assert np.all(rg[16:, :] == -9999.0)

    def test_overviews_mean(self, spark, tmp_path):
        h, w = 32, 32
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        path = str(tmp_path / "ov.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            overviews=2, dtype="float64",
        )
        ifds, _ = read_geotiff_meta(path)
        assert len(ifds) == 3
        assert not ifds[0].is_reduced and ifds[1].is_reduced
        ov1 = (read_geotiff(spark, path, overview=1).toPandas()
               .sort_values(["j", "i"])["value"]
               .to_numpy().reshape(16, 16))
        expect = vals[0].reshape(16, 2, 16, 2).mean(axis=(1, 3))
        assert np.allclose(ov1, expect)
        # overview grid mapping: doubled resolution, same bbox origin
        gm0 = read_geotiff_grid_mapping(path)
        gm1 = read_geotiff_grid_mapping(path, overview=1)
        assert gm1.size == (16, 16)
        assert gm1.xy_res == (20, 20)
        assert gm1.x_min == gm0.x_min and gm1.y_max == gm0.y_max

    def test_bbox_prunes_tile_reads(self, spark, tmp_path):
        """Corrupt every tile OUTSIDE the bbox window: a pruned read
        must still succeed (it never touches them), proving pruning
        happens at the byte-range level, not post-filter."""
        h, w = 48, 48
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        path = str(tmp_path / "prune.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            compression="deflate", dtype="float64",
        )
        ifds, _ = read_geotiff_meta(path)
        ifd = ifds[0]
        blob = bytearray(open(path, "rb").read())
        for kj in range(3):
            for ki in range(3):
                if kj == 0 and ki == 0:
                    continue
                ix = ifd.tile_index(0, kj, ki)
                off, cnt = ifd.offsets[ix], ifd.counts[ix]
                blob[off:off + cnt] = b"\xff" * cnt
        open(path, "wb").write(bytes(blob))
        sub = (read_geotiff(spark, path, bbox_ij=(0, 0, 16, 16))
               .toPandas().sort_values(["j", "i"]))
        assert np.array_equal(
            sub["value"].to_numpy().reshape(16, 16), vals[0][:16, :16])
        with pytest.raises(Exception):
            read_geotiff(spark, path).toPandas()

    def test_bytes_range_reader(self, spark, tmp_path):
        h, w = 18, 18
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        path = str(tmp_path / "brr.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            dtype="float64",
        )
        rr = BytesRangeReader(open(path, "rb").read())
        back = (read_geotiff(spark, rr).toPandas()
                .sort_values(["j", "i"]))
        assert np.array_equal(
            back["value"].to_numpy().reshape(h, w), vals[0])

    def test_driver_reads_only_header_ranges(self, tmp_path, spark):
        """COG promise: metadata access touches only leading bytes."""
        h, w = 64, 64
        vals = np.zeros((1, h, w))
        path = str(tmp_path / "head.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            dtype="float32",
        )
        cr = CountingRangeReader(FileRangeReader(path))
        read_geotiff_grid_mapping(cr)
        total = sum(s for _o, s in cr.calls)
        touched = max(o + s for o, s in cr.calls)
        assert touched < 2048  # IFD chain leads the file
        assert total < 4096


class TestGeoKeys:
    def test_projected_crs_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "crs_p.tif")
        vals = np.zeros((1, 17, 17))
        write_geotiff(
            _pixels(spark, vals), path, (17, 17), crs="EPSG:3035",
            xy_min=(4e6, 3e6), xy_res=100.0, tile_size=16,
            dtype="float32",
        )
        gm = read_geotiff_grid_mapping(path)
        assert gm.crs.auth_code == "EPSG:3035"
        assert not gm.crs.is_geographic

    def test_geographic_crs_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "crs_g.tif")
        vals = np.zeros((1, 17, 17))
        write_geotiff(
            _pixels(spark, vals), path, (17, 17), crs="EPSG:4326",
            xy_min=(10.0, 50.0), xy_res=0.5, tile_size=16,
            dtype="float32",
        )
        gm = read_geotiff_grid_mapping(path)
        assert gm.crs.is_geographic
        assert gm.xy_bbox == (10.0, 50.0, 18.5, 58.5)

    def test_non_epsg_crs_write_raises(self, spark, tmp_path):
        from xcube_resampling_spark.crs import CRS

        crs = CRS.from_user_input("+proj=moll +R=6371000")
        with pytest.raises(NotImplementedError, match="non-EPSG"):
            write_geotiff(
                _pixels(spark, np.zeros((1, 17, 17))),
                str(tmp_path / "x.tif"), (17, 17), crs=crs,
                xy_min=(0.0, 0.0), xy_res=1000.0,
            )

    def test_user_defined_crs_read_needs_override(self, spark,
                                                  tmp_path):
        # hand-patch the ProjectedCSType key to 32767 (user-defined)
        path = str(tmp_path / "ud.tif")
        write_geotiff(
            _pixels(spark, np.zeros((1, 17, 17))), path, (17, 17),
            crs="EPSG:32633", xy_min=(0.0, 0.0), xy_res=10.0,
            tile_size=16, dtype="float32",
        )
        blob = bytearray(open(path, "rb").read())
        pcs = struct.pack("<H", 32633)
        ix = bytes(blob).find(struct.pack("<HHH", 3072, 0, 1) + pcs)
        assert ix > 0
        blob[ix + 6:ix + 8] = struct.pack("<H", 32767)
        open(path, "wb").write(bytes(blob))
        with pytest.raises(NotImplementedError, match="user-defined"):
            read_geotiff_grid_mapping(path)
        gm = read_geotiff_grid_mapping(path, crs="EPSG:32633")
        assert gm.crs.auth_code == "EPSG:32633"


def _frame_tiff(bo, entries, payload):
    """Hand-frame a minimal classic TIFF: header + one IFD + payload
    already positioned at known offsets (entries reference them)."""
    n = len(entries)
    ifd_off = 8
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM")
    out += struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", n)
    for tag, typ, cnt, val in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        out += val if isinstance(val, bytes) else struct.pack(
            bo + "I", val)
    out += struct.pack(bo + "I", 0)
    data_off = len(out)
    out += payload
    return bytes(out), data_off


class TestForeignLayouts:
    """Layouts the repo's writer never emits -- strips with a short
    last strip, chunky interleave, big-endian -- hand-framed so the
    reader is tested against the spec, not against our writer."""

    def _strip_file(self, bo, vals, rps, comp=COMPRESSION_NONE,
                    chunky_bands=1):
        h, w = vals.shape[-2], vals.shape[-1]
        dt = np.dtype("int16").newbyteorder(bo)
        strips = []
        for s0 in range(0, h, rps):
            rows = vals[..., s0:s0 + rps, :]
            if chunky_bands > 1:
                # (spp, rows, w) -> interleaved (rows, w, spp)
                rows = np.moveaxis(rows, 0, -1)
            raw = np.ascontiguousarray(rows.astype(dt)).tobytes()
            if comp == COMPRESSION_DEFLATE:
                raw = zlib.compress(raw)
            strips.append(raw)
        # payload at fixed offset after the IFD
        n_entries = 11
        hdr = 8 + 2 + n_entries * 12 + 4
        offs = []
        bps_off = hdr
        fmt_off = hdr + 2 * chunky_bands
        so_off = hdr + 4 * chunky_bands
        bc_off = so_off + 4 * len(strips)
        pos = bc_off + 4 * len(strips)
        for s in strips:
            offs.append(pos)
            pos += len(s)
        payload = b"".join([
            struct.pack(bo + "%dH" % chunky_bands,
                        *([16] * chunky_bands)),
            struct.pack(bo + "%dH" % chunky_bands,
                        *([2] * chunky_bands)),
            struct.pack(bo + "%dI" % len(offs), *offs),
            struct.pack(bo + "%dI" % len(strips),
                        *[len(s) for s in strips]),
        ] + strips)
        if chunky_bands > 2:
            # > 2 shorts: genuinely out of line
            bps_val = struct.pack(bo + "I", bps_off)
            fmt_val = struct.pack(bo + "I", fmt_off)
        else:
            # 1-2 shorts fit the 4-byte inline value field
            bps_val = struct.pack(
                bo + "HH", 16, 16 if chunky_bands == 2 else 0)
            fmt_val = struct.pack(
                bo + "HH", 2, 2 if chunky_bands == 2 else 0)
        # count-1 LONG entries carry the VALUE inline, not an offset
        so_val = struct.pack(
            bo + "I", offs[0] if len(offs) == 1 else so_off)
        bc_val = struct.pack(
            bo + "I",
            len(strips[0]) if len(strips) == 1 else bc_off)
        entries = [
            (256, 3, 1, struct.pack(bo + "HH", w, 0)),
            (257, 3, 1, struct.pack(bo + "HH", h, 0)),
            (258, 3, chunky_bands, bps_val),
            (259, 3, 1, struct.pack(bo + "HH", comp, 0)),
            (262, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (273, 4, len(offs), so_val),
            (277, 3, 1, struct.pack(bo + "HH", chunky_bands, 0)),
            (278, 3, 1, struct.pack(bo + "HH", rps, 0)),
            (279, 4, len(strips), bc_val),
            (284, 3, 1, struct.pack(bo + "HH", 1, 0)),
            (339, 3, chunky_bands, fmt_val),
        ]
        blob, _ = _frame_tiff(bo, entries, payload)
        return blob

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_strips_short_last_strip(self, spark, bo):
        h, w = 11, 7  # rps=4 -> last strip has 3 rows
        vals = (np.arange(h * w).reshape(h, w) % 300 - 100)
        blob = self._strip_file(bo, vals, rps=4)
        back = (read_geotiff(spark, BytesRangeReader(blob))
                .toPandas().sort_values(["j", "i"]))
        assert np.array_equal(
            back["value"].to_numpy().reshape(h, w), vals)

    def test_strips_deflate(self, spark):
        h, w = 10, 6
        vals = np.arange(h * w).reshape(h, w) % 128
        blob = self._strip_file("<", vals, rps=4,
                                comp=COMPRESSION_DEFLATE)
        back = (read_geotiff(spark, BytesRangeReader(blob))
                .toPandas().sort_values(["j", "i"]))
        assert np.array_equal(
            back["value"].to_numpy().reshape(h, w), vals)

    def test_chunky_interleave(self, spark):
        # PlanarConfiguration=1: samples interleaved per pixel
        nt, h, w = 2, 6, 5
        vals = np.arange(nt * h * w).reshape(nt, h, w) % 200
        blob = self._strip_file("<", vals, rps=6, chunky_bands=nt)
        back = read_geotiff(spark, BytesRangeReader(blob)).toPandas()
        for t in range(nt):
            sl = (back[back["t"] == t].sort_values(["j", "i"])
                  ["value"].to_numpy().reshape(h, w))
            assert np.array_equal(sl, vals[t])

    def test_bare_tiff_needs_model_tags(self, spark):
        vals = np.zeros((4, 4), dtype=int)
        blob = self._strip_file("<", vals, rps=4)
        with pytest.raises(ValueError, match="ModelPixelScale"):
            read_geotiff_grid_mapping(BytesRangeReader(blob))


class TestPipeline:
    def test_open_and_resample(self, spark, tmp_path):
        """GeoTIFF -> open_geotiff_dataset -> resample_in_space
        (affine downscale), the reference's rioxarray entry path."""
        from xcube_resampling_spark.gridmapping import GridMapping
        from xcube_resampling_spark.operators.spatial import (
            resample_in_space,
        )

        h, w = 24, 24
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        path = str(tmp_path / "pipe.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(500000.0, 4e6), xy_res=10.0, tile_size=16,
            dtype="float64",
        )
        ds, gm = open_geotiff_dataset(spark, path)
        target = GridMapping.regular(
            (12, 12), (500000.0, 4e6), 20.0, gm.crs)
        out = resample_in_space(ds, source_gm=gm, target_gm=target)
        got = (out.data_vars["band_data"].df.toPandas()
               .sort_values(["j", "i"])["value"]
               .to_numpy().reshape(12, 12))
        expect = vals[0].reshape(12, 2, 12, 2).mean(axis=(1, 3))
        assert np.allclose(got, expect)


class TestReviewRegressions:
    """Regressions for the round-6 review findings: overview nodata,
    PixelIsPoint overview registration, NaN-to-int refusal."""

    def test_overview_nodata_masked(self, spark, tmp_path):
        # data only in the top-left quadrant; overview tiles outside
        # it are sparse and must fill with NODATA, and decode_cf must
        # mask them -- the writer now tags GDAL_NODATA on EVERY IFD
        h, w = 64, 64
        vals = np.full((1, h, w), np.nan)
        vals[0, :32, :32] = 5.0
        path = str(tmp_path / "ovnd.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(0.0, 0.0), xy_res=10.0, tile_size=16,
            overviews=1, nodata=-9999.0, dtype="float32",
        )
        ifds, _ = read_geotiff_meta(path)
        assert ifds[0].nodata == -9999.0
        assert ifds[1].nodata == -9999.0  # was: None (level-0 only)
        grid = (read_geotiff(spark, path, overview=1, decode_cf=True)
                .toPandas().sort_values(["j", "i"])["value"]
                .to_numpy().reshape(32, 32))
        assert np.all(grid[:16, :16] == 5.0)
        assert np.all(np.isnan(grid[16:, 16:]))
        raw = (read_geotiff(spark, path, overview=1).toPandas()
               .sort_values(["j", "i"])["value"]
               .to_numpy().reshape(32, 32))
        assert np.all(raw[16:, 16:] == -9999.0)

    def test_pixel_is_point_overview_origin(self, spark, tmp_path):
        # PixelIsPoint shifts the grid by half a FULL-RES pixel at
        # every overview level; shifting by half an overview pixel
        # would misregister level 1 against level 0 by sx/2
        h, w = 32, 32
        path = str(tmp_path / "pip.tif")
        write_geotiff(
            _pixels(spark, np.zeros((1, h, w))), path, (h, w),
            crs="EPSG:32633", xy_min=(0.0, 0.0), xy_res=10.0,
            tile_size=16, overviews=1, dtype="float32",
        )
        # patch GTRasterTypeGeoKey 1025: PixelIsArea(1)->PixelIsPoint(2)
        blob = bytearray(open(path, "rb").read())
        key = struct.pack("<HHHH", 1025, 0, 1, 1)
        ix = bytes(blob).find(key)
        assert ix > 0
        blob[ix:ix + 8] = struct.pack("<HHHH", 1025, 0, 1, 2)
        open(path, "wb").write(bytes(blob))
        gm0 = read_geotiff_grid_mapping(path)
        gm1 = read_geotiff_grid_mapping(path, overview=1)
        assert gm0.x_min == -5.0  # tiepoint is now a cell center
        assert gm1.x_min == gm0.x_min  # same half-SOURCE-pixel shift
        assert gm1.y_max == gm0.y_max
        assert gm1.xy_res == (20, 20)

    def test_parse_ifd_srational_and_undefined(self):
        # SRATIONAL (type 10) decodes signed pairs; UNDEFINED (type 7)
        # keeps raw bytes -- neither is silently dropped
        import struct

        from xcube_resampling_spark.sources.geotiff import (
            BytesRangeReader, _parse_ifd,
        )

        # classic little-endian IFD at offset 0: 2 entries + next=0,
        # SRATIONAL value out-of-line at offset 30
        ifd = struct.pack("<H", 2)
        ifd += struct.pack("<HHI", 37380, 10, 1) + struct.pack("<I", 30)
        ifd += struct.pack("<HHI", 700, 7, 4) + b"\x01\x02\x03\x04"
        ifd += struct.pack("<I", 0)  # next IFD
        assert len(ifd) == 30
        ifd += struct.pack("<ii", -3, 2)  # -1.5
        tags, nxt = _parse_ifd(BytesRangeReader(ifd), 0, "<", False)
        assert nxt == 0
        assert tags[37380] == (10, (-1.5,))
        assert tags[700] == (7, (b"\x01\x02\x03\x04",))

    def test_j_axis_up_write_not_flipped(self, spark, tmp_path):
        # a j-up grid counts rows upward from y_min; the writer must
        # remap j -> h-1-j so the file's top row holds the y_max data
        # (it silently wrote a vertically flipped file before r7)
        from xcube_resampling_spark.gridmapping import GridMapping

        h, w = 17, 16
        vals = np.arange(h * w, dtype="f8").reshape(1, h, w)
        gm = GridMapping.regular(
            (w, h), (10.0, 50.0), 0.5, "EPSG:4326", is_j_axis_up=True,
        )
        path = str(tmp_path / "jup.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), gm=gm, tile_size=16,
            dtype="float64",
        )
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        got = back["value"].to_numpy().reshape(h, w)
        # read_geotiff yields j-down rows: row 0 = y_max edge = the
        # j-up grid's LAST row
        assert np.allclose(got, vals[0][::-1])
        gm_back = read_geotiff_grid_mapping(path)
        assert gm_back.xy_bbox == (10.0, 50.0, 18.0, 58.5)

        # the raw crs+xy_min path takes the same remap via j_axis_up=
        path2 = str(tmp_path / "jup_raw.tif")
        write_geotiff(
            _pixels(spark, vals), path2, (h, w), crs="EPSG:4326",
            xy_min=(10.0, 50.0), xy_res=0.5, tile_size=16,
            dtype="float64", j_axis_up=True,
        )
        got2 = (read_geotiff(spark, path2).toPandas()
                .sort_values(["j", "i"])["value"]
                .to_numpy().reshape(h, w))
        assert np.allclose(got2, vals[0][::-1])

    def test_int_nan_without_nodata_raises(self, spark, tmp_path):
        # an explicit NaN VALUE row (decode_cf reads produce these);
        # _pixels would drop it as an absent pixel, so build directly
        df = spark.createDataFrame(
            [(0, 0, 0, 3.0), (0, 0, 1, float("nan"))],
            "t int, j int, i int, value double")
        with pytest.raises(Exception, match="integer dtype"):
            write_geotiff(
                df, str(tmp_path / "bad.tif"),
                (16, 16), crs="EPSG:32633", xy_min=(0.0, 0.0),
                xy_res=10.0, tile_size=16, dtype="int32",
            )


class TestJpegCompression:
    """TIFF compression 7 -- JPEG tiles through the clean-room T.81
    codec (the aerial/visual-imagery COG flavor)."""

    def test_jpeg_tile_roundtrip_smooth(self, spark, tmp_path):
        h, w = 34, 39
        jj, ii = np.mgrid[0:h, 0:w]
        vals = (120 + 60 * np.sin(jj / 9.0) * np.cos(ii / 7.0)
                ).astype("u1").astype("f8")[None]
        path = str(tmp_path / "jp.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(5e5, 4e6), xy_res=10.0, tile_size=16,
            compression="jpeg", dtype="uint8",
        )
        ifds, _ = read_geotiff_meta(path)
        assert ifds[0].compression == 7
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        got = back["value"].to_numpy().reshape(h, w)
        err = np.abs(got - vals[0]).max()
        assert err <= 8  # smooth content at q90

    def test_jpeg_requires_uint8(self, spark, tmp_path):
        vals = np.zeros((1, 8, 8))
        with pytest.raises(ValueError, match="uint8"):
            write_geotiff(
                _pixels(spark, vals), str(tmp_path / "x.tif"), (8, 8),
                crs="EPSG:4326", xy_min=(0.0, 0.0), xy_res=1.0,
                compression="jpeg", dtype="float32",
            )

    def test_jpegtables_tag_spliced(self, spark, tmp_path):
        # strip each tile's DQT/DHT into a shared JPEGTables tag
        # (the form GDAL writes) and confirm decode still works
        import struct as _s

        h, w = 16, 16
        vals = np.full((1, h, w), 99.0)
        path = str(tmp_path / "jt.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:4326",
            xy_min=(0.0, 0.0), xy_res=1.0, tile_size=16,
            compression="jpeg", dtype="uint8",
        )
        from xcube_resampling_spark.sources.geotiff import (
            TAG_JPEG_TABLES,
            _decode_tile_bytes,
        )

        data = open(path, "rb").read()
        soi = data.find(b"\xff\xd8")
        eoi = data.find(b"\xff\xd9", soi) + 2
        tile = data[soi:eoi]

        # split: tables (DQT/DHT) vs the rest
        tables, rest, pos = b"", b"", 2
        while pos < len(tile) - 2:
            marker = tile[pos + 1]
            if marker == 0xDA:
                rest += tile[pos:-2]
                break
            (seglen,) = _s.unpack_from(">H", tile, pos + 2)
            seg = tile[pos:pos + 2 + seglen]
            if marker in (0xDB, 0xC4):
                tables += seg
            else:
                rest += seg
            pos += 2 + seglen
        jpeg_tables = b"\xff\xd8" + tables + b"\xff\xd9"
        bare_tile = b"\xff\xd8" + rest + b"\xff\xd9"
        cube = _decode_tile_bytes(
            bare_tile, 7, 1, np.dtype("u1"), 16, 16, 1, "<",
            jpeg_tables=jpeg_tables)
        assert np.all(np.abs(cube.astype(int) - 99) <= 2)

    def test_chunky_rgb_jpeg_tile_decodes(self):
        # photometric-color COGs store 3-sample chunky JPEG tiles
        from xcube_resampling_spark.extensions.jpegcodec import (
            encode_jpeg,
        )
        from xcube_resampling_spark.sources.geotiff import (
            _decode_tile_bytes,
        )

        rgb = np.zeros((16, 16, 3), np.uint8)
        rgb[:, :, 0] = 200
        rgb[:, :, 2] = 50
        cube = _decode_tile_bytes(
            encode_jpeg(rgb, quality=95), 7, 1, np.dtype("u1"),
            16, 16, 3, "<")
        assert cube.shape == (3, 16, 16)
        assert abs(int(cube[0].mean()) - 200) <= 3
        assert int(cube[1].mean()) <= 6
        assert abs(int(cube[2].mean()) - 50) <= 4


class TestPredictor3:
    """TIFF TechNote 3 floating-point predictor (GDAL PREDICTOR=3)."""

    def test_spec_fixture_hand_computed(self):
        # one row, two float32 values [1.0, 2.0]:
        #   big-endian bytes   3F 80 00 00 | 40 00 00 00
        #   MSB-first planes   3F 40 | 80 00 | 00 00 | 00 00
        #   byte delta         3F 01 40 80 00 00 00 00
        enc = _encode_tile_bytes(
            np.array([[1.0, 2.0]], dtype="float32"),
            COMPRESSION_NONE, 3)
        assert enc == bytes.fromhex("3F01408000000000")
        back = _decode_tile_bytes(
            enc, COMPRESSION_NONE, 3, np.dtype("float32"),
            1, 2, 1, "<")
        assert np.array_equal(back[0], [[1.0, 2.0]])
        # the plane layout is endian-normalized: the IFD byte order
        # must NOT change the decode
        back_be = _decode_tile_bytes(
            enc, COMPRESSION_NONE, 3, np.dtype("float32"),
            1, 2, 1, ">")
        assert np.array_equal(back_be[0], [[1.0, 2.0]])

    @pytest.mark.parametrize("dt", ["float32", "float64"])
    @pytest.mark.parametrize("comp", [COMPRESSION_NONE,
                                      COMPRESSION_LZW,
                                      COMPRESSION_DEFLATE])
    def test_tile_roundtrip(self, dt, comp):
        rng = np.random.default_rng(5)
        a = rng.normal(0, 100, (32, 48)).astype(dt)
        a[3, 7] = np.nan
        a[0, 0] = -np.inf
        raw = _encode_tile_bytes(a, comp, 3)
        back = _decode_tile_bytes(raw, comp, 3, np.dtype(dt),
                                  32, 48, 1, "<")
        np.testing.assert_array_equal(back[0], a)

    def test_multisample_stride(self):
        # spp > 1: the byte delta runs at stride spp (libtiff fpAcc);
        # build the encoded row by hand from two interleaved samples
        vals = np.array([[1.0, 2.0]], dtype="float32")  # 1 px, 2 spp
        be = vals.astype(">f4").tobytes()
        planes = bytes(be[k] for k in (0, 4, 1, 5, 2, 6, 3, 7))
        row = np.frombuffer(planes, dtype="u1").astype("i4")
        enc = row.copy()
        enc[2:] = (row[2:] - row[:-2]) % 256  # stride 2
        back = _decode_tile_bytes(
            enc.astype("u1").tobytes(), COMPRESSION_NONE, 3,
            np.dtype("float32"), 1, 1, 2, "<")
        assert back.shape == (2, 1, 1)
        assert back[0, 0, 0] == 1.0 and back[1, 0, 0] == 2.0

    def test_file_roundtrip(self, spark, tmp_path):
        h, w = 37, 41
        rng = np.random.default_rng(11)
        vals = rng.normal(5, 2, (1, h, w))
        path = str(tmp_path / "rt_pred3.tif")
        write_geotiff(
            _pixels(spark, vals), path, (h, w), crs="EPSG:32633",
            xy_min=(500000.0, 4e6), xy_res=10.0, tile_size=16,
            compression="deflate", predictor=3, dtype="float32",
        )
        back = (read_geotiff(spark, path).toPandas()
                .sort_values(["j", "i"]))
        np.testing.assert_allclose(
            back["value"].to_numpy().reshape(h, w),
            vals[0], rtol=1e-6)
        # a float32-precision predictor-3 file is ~the same size as
        # its predictor-1 twin but must DECLARE predictor 3
        from xcube_resampling_spark.sources.geotiff import (
            read_geotiff_meta,
        )

        ifds, _ = read_geotiff_meta(path)
        assert ifds[0].predictor == 3

    def test_predictor3_needs_float(self, spark, tmp_path):
        vals = np.zeros((1, 4, 4))
        with pytest.raises(ValueError, match="needs a float"):
            write_geotiff(
                _pixels(spark, vals), str(tmp_path / "x.tif"), (4, 4),
                crs="EPSG:32633", xy_min=(0.0, 0.0), xy_res=1.0,
                compression="deflate", predictor=3, dtype="int32",
            )
        with pytest.raises(ValueError, match="LZW or Deflate"):
            write_geotiff(
                _pixels(spark, vals), str(tmp_path / "y.tif"), (4, 4),
                crs="EPSG:32633", xy_min=(0.0, 0.0), xy_res=1.0,
                compression="none", predictor=3, dtype="float32",
            )
