"""Kerchunk-style virtual zarr (sources/kerchunk.py): reference
builders for HDF5 / NetCDF-3 files and band-granule directories, the
RefChunkStore contract, ranged (never whole-file) reads, and the
distributed read path through read_zarr(store=...)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.sources import (
    RefChunkStore,
    granule_dir_refs,
    hdf5_refs,
    load_refs,
    netcdf3_refs,
    read_zarr,
    save_refs,
    write_hdf5,
    write_netcdf3,
)
from xcube_resampling_spark.sources.hdf5 import encode_hdf5
from xcube_resampling_spark.sources.netcdf3 import encode_netcdf3


def _raster(spark, w, h, nt=1):
    return spark.range(nt * w * h).select(
        (F.col("id") / (w * h)).cast("int").alias("t"),
        (F.col("id") % (w * h) / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.col("id") * 0.5).cast("double").alias("value"),
    )


class TestRefStore:
    def test_inline_and_range_refs(self, tmp_path):
        data = bytes(range(200))
        (tmp_path / "blob.bin").write_bytes(data)
        store = RefChunkStore({
            "meta": '{"zarr_format": 2}',
            "b64": "base64:" + __import__("base64")
                   .b64encode(b"\x01\x02").decode(),
            "whole": ["blob.bin"],
            "range": ["blob.bin", 50, 10],
        }, base_dir=str(tmp_path))
        assert store.get("meta") == b'{"zarr_format": 2}'
        assert store.get("b64") == b"\x01\x02"
        assert store.get("whole") == data
        assert store.get("range") == data[50:60]
        assert store.get("missing") is None
        assert set(store.known_keys()) == {"meta", "b64", "whole",
                                           "range"}

    def test_wraps_full_kerchunk_doc(self, tmp_path):
        doc = {"version": 1, "refs": {"k": "v"}}
        save_refs(doc["refs"], str(tmp_path / "r.json"))
        loaded = load_refs(str(tmp_path / "r.json"))
        assert loaded["version"] == 1
        assert RefChunkStore(loaded).get("k") == b"v"

    def test_store_is_picklable(self):
        import pickle

        s = RefChunkStore({"k": "v"}, base_dir="/x")
        s2 = pickle.loads(pickle.dumps(s))
        assert s2.get("k") == b"v"


class TestHdf5Refs:
    def test_contiguous_dataset(self, spark, tmp_path):
        data = np.arange(48, dtype="<f8").reshape(6, 8) * 0.25
        p = str(tmp_path / "one.h5")
        with open(p, "wb") as fp:
            fp.write(encode_hdf5("sst", data, ("y", "x"),
                                 var_attrs={"units": "K"}))
        refs = hdf5_refs(p)
        za = json.loads(refs["sst/.zarray"])
        assert za["shape"] == [6, 8] and za["chunks"] == [6, 8]
        assert za["compressor"] is None and za["filters"] is None
        # the single chunk is a RANGE into the archive, not a copy
        tgt, off, ln = refs["sst/0.0"]
        assert tgt == p and ln == 48 * 8
        got = read_zarr(spark, "virtual", "sst",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel())

    def test_chunked_shuffle_deflate(self, spark, tmp_path):
        """compress=True chunked datasets: the shuffle+deflate pipeline
        maps to zarr zlib + numcodecs shuffle -- decoded by the SAME
        filter module the zarr reader uses."""
        data = np.arange(35 * 22, dtype="<f8").reshape(35, 22)
        p = str(tmp_path / "cz.h5")
        with open(p, "wb") as fp:
            fp.write(encode_hdf5("v", data, ("y", "x"),
                                 chunks=(16, 16), compress=True))
        refs = hdf5_refs(p)
        za = json.loads(refs["v/.zarray"])
        assert za["compressor"]["id"] == "zlib"
        assert za["filters"] == [{"id": "shuffle", "elementsize": 8}]
        # 3x2 chunk grid referenced chunk-for-chunk
        keys = [k for k in refs if k.startswith("v/") and
                not k.endswith((".zarray", ".zattrs"))]
        assert sorted(keys) == sorted(
            f"v/{j}.{i}" for j in range(3) for i in range(2))
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel())

    def test_unmappable_pipeline_rejected(self, tmp_path):
        # szip chunks (filter 4) cannot be referenced verbatim: no
        # zarr codec decodes the libhdf5 szip framing
        data = np.arange(64, dtype="<i4").reshape(8, 8)
        p = str(tmp_path / "sz.h5")
        with open(p, "wb") as fp:
            fp.write(encode_hdf5("v", data, ("y", "x"),
                                 chunks=(8, 8), compress="szip"))
        with pytest.raises(NotImplementedError, match="zarr mapping"):
            hdf5_refs(p)


class TestNetcdf3Refs:
    def test_fixed_variable(self, spark, tmp_path):
        data = np.arange(40, dtype="<f4").reshape(5, 8)
        p = str(tmp_path / "c.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3("rad", data, ("y", "x"),
                                    var_attrs={"scale_factor": 2.0}))
        refs = netcdf3_refs(p)
        za = json.loads(refs["rad/.zarray"])
        assert za["dtype"] == ">f4"
        assert json.loads(refs["rad/.zattrs"])["scale_factor"] == 2.0
        got = read_zarr(spark, "virtual", "rad",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel().astype("f8"))

    def test_record_variable_one_chunk_per_record(self, spark,
                                                  tmp_path):
        data = np.arange(3 * 4 * 5, dtype="<f8").reshape(3, 4, 5)
        p = str(tmp_path / "rec.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3("v", data, ("t", "y", "x"),
                                    record_dim=True))
        refs = netcdf3_refs(p)
        za = json.loads(refs["v/.zarray"])
        assert za["shape"] == [3, 4, 5] and za["chunks"] == [1, 4, 5]
        assert {k for k in refs if k[2:3].isdigit() or
                k.startswith("v/0") or k.startswith("v/1") or
                k.startswith("v/2")} >= {"v/0.0.0", "v/1.0.0",
                                         "v/2.0.0"}
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel())

    def test_cdf5_file(self, spark, tmp_path):
        data = np.arange(12, dtype="<f8").reshape(3, 4)
        p = str(tmp_path / "c5.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3("v", data, ("y", "x"), version=5))
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(netcdf3_refs(p))) \
            .toPandas().sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), data.ravel())


class TestGeotiffRefs:
    def test_deflate_cog_tiles(self, spark, tmp_path):
        """Deflate COG tiles referenced chunk-for-chunk; the virtual
        read must equal the native GeoTIFF reader."""
        from xcube_resampling_spark.sources import read_geotiff
        from xcube_resampling_spark.sources.kerchunk import (
            geotiff_refs,
        )

        w, h = 40, 30
        df = _raster(spark, w, h)
        p = str(tmp_path / "a.tif")
        from xcube_resampling_spark.sources import write_geotiff

        write_geotiff(df, p, (h, w), xy_min=(0.0, 0.0), xy_res=1.0,
                      crs="EPSG:4326", tile_size=16,
                      compression="deflate", dtype="float64")
        refs = geotiff_refs(p)
        za = json.loads(refs["band_1/.zarray"])
        assert za["shape"] == [h, w] and za["chunks"] == [16, 16]
        assert za["compressor"]["id"] == "zlib"
        # every tile is a RANGE ref (tiles are stored padded)
        assert all(isinstance(refs[f"band_1/{j}.{i}"], list)
                   for j in range(2) for i in range(3))
        got = read_zarr(spark, "virtual", "band_1",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["j", "i"])
        native = read_geotiff(spark, p).toPandas() \
            .sort_values(["j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), native["value"].to_numpy())

    def test_predictor_refused(self, spark, tmp_path):
        from xcube_resampling_spark.sources import write_geotiff
        from xcube_resampling_spark.sources.kerchunk import (
            geotiff_refs,
        )

        p = str(tmp_path / "pred.tif")
        write_geotiff(_raster(spark, 16, 16), p, (16, 16),
                      xy_min=(0.0, 0.0), xy_res=1.0, crs="EPSG:4326",
                      tile_size=16, compression="deflate",
                      predictor=2, dtype="int32")
        with pytest.raises(NotImplementedError, match="predictor"):
            geotiff_refs(p)


class TestGranuleDir:
    @pytest.mark.parametrize("writer,exact_bands", [
        ("netcdf3", True), ("hdf5", True),
        ("netcdf3", False), ("hdf5", False),
    ])
    def test_virtual_cube_matches_native_read(self, spark, tmp_path,
                                              writer, exact_bands):
        """A granule directory read as ONE virtual zarr cube must equal
        the native granule reader -- including a short edge band
        (inlined padded chunk)."""
        w = 12
        h = 16 if exact_bands else 14  # band_rows=4 -> short last band
        df = _raster(spark, w, h)
        path = str(tmp_path / "gran")
        if writer == "netcdf3":
            write_netcdf3(df, path, "v", (h, w), band_rows=4)
        else:
            write_hdf5(df, path, "v", (h, w), band_rows=4)
        refs = granule_dir_refs(path)
        za = json.loads(refs["v/.zarray"])
        assert za["shape"] == [h, w] and za["chunks"] == [4, w]
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        assert len(got) == h * w
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())
        if not exact_bands:
            # the edge band must be inline, full bands must be ranges
            assert isinstance(refs["v/3.0"], str)
            assert refs["v/3.0"].startswith("base64:")
            assert isinstance(refs["v/0.0"], list)

    def test_3d_cube(self, spark, tmp_path):
        w, h, nt = 6, 8, 2
        df = _raster(spark, w, h, nt)
        path = str(tmp_path / "gran3")
        write_hdf5(df, path, "v", (nt, h, w), band_rows=4)
        refs = granule_dir_refs(path)
        za = json.loads(refs["v/.zarray"])
        assert za["shape"] == [nt, h, w]
        assert za["chunks"] == [nt, 4, w]
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(refs)).toPandas() \
            .sort_values(["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_bbox_prunes_ranged_reads(self, spark, tmp_path):
        """The virtual cube inherits the zarr reader's chunk pruning:
        a window read touches only intersecting granule ranges."""
        w, h = 16, 16
        df = _raster(spark, w, h)
        path = str(tmp_path / "granp")
        write_netcdf3(df, path, "v", (h, w), band_rows=4)
        refs = granule_dir_refs(path)
        out = read_zarr(spark, "virtual", "v", bbox_ij=(0, 4, 8, 8),
                        store=RefChunkStore(refs)).toPandas()
        assert len(out) == 4 * 8
        assert out["j"].between(4, 7).all()

    def test_record_layout_granules_rejected(self, tmp_path):
        """Review regression: a granule whose variable is NOT a single
        block (record layout -> one chunk per record) must be refused
        with a clear error, never combined into a silently corrupt
        cube."""
        d = tmp_path / "recdir"
        d.mkdir()
        data = np.arange(24, dtype="<f8").reshape(2, 3, 4)
        (d / "part-00000.nc").write_bytes(
            encode_netcdf3("v", data, ("t", "y", "x"),
                           record_dim=True))
        (d / "_meta.json").write_text(json.dumps(
            {"var": "v", "shape": [2, 3, 4], "band_rows": 3}))
        with pytest.raises(NotImplementedError, match="multiple chunk"):
            granule_dir_refs(str(d))

    def test_pipeline_order_guard(self):
        """Review regression: deflate anywhere but last (or repeated)
        has no zarr mapping -- zarr always inflates first."""
        from xcube_resampling_spark.sources.kerchunk import (
            _h5_pipeline_to_zarr,
        )

        comp, filt = _h5_pipeline_to_zarr(
            [(2, [8], 0), (1, [1], 0)])  # shuffle, deflate = OK
        assert comp == {"id": "zlib", "level": 1}
        assert filt == [{"id": "shuffle", "elementsize": 8}]
        with pytest.raises(NotImplementedError):
            _h5_pipeline_to_zarr([(1, [1], 0), (2, [8], 0)])
        with pytest.raises(NotImplementedError):
            _h5_pipeline_to_zarr([(1, [1], 0), (1, [2], 0)])

    def test_header_only_io(self, tmp_path):
        """Ref building must not read the data section: build refs for
        a file whose data region far exceeds its header and confirm the
        refs point INTO the file rather than inlining bytes."""
        data = np.zeros((400, 500), "<f8")  # 1.6 MB of data
        p = str(tmp_path / "big.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3("v", data, ("y", "x")))
        refs = netcdf3_refs(p)
        ref = refs["v/0.0"]
        assert isinstance(ref, list) and ref[2] == 400 * 500 * 8

    def test_concat_time_refs(self, spark, tmp_path):
        """MultiZarrToZarr shape: one granule directory per 'day'
        combined into a (T, h, w) cube along a new time axis."""
        from xcube_resampling_spark.sources import concat_time_refs

        w, h = 10, 8
        days = []
        for day in range(3):
            df = _raster(spark, w, h).withColumn(
                "value", F.col("value") + day * 1000.0)
            p = str(tmp_path / f"day{day}")
            write_netcdf3(df, p, "v", (h, w), band_rows=4)
            days.append(granule_dir_refs(p))
        cube = concat_time_refs(days, "v")
        za = json.loads(cube["v/.zarray"])
        assert za["shape"] == [3, h, w]
        assert za["chunks"] == [1, 4, w]
        got = read_zarr(spark, "virtual", "v",
                        store=RefChunkStore(cube)).toPandas()
        assert len(got) == 3 * h * w
        base = _raster(spark, w, h).toPandas().set_index(["j", "i"])
        for _, r in got.iterrows():
            assert r["value"] == base.loc[(r["j"], r["i"]),
                                          "value"] + r["t"] * 1000.0

    def test_concat_rewrites_array_dimensions(self, spark, tmp_path):
        """A 2-D input's _ARRAY_DIMENSIONS gains the new leading time
        axis in the combined cube (verbatim copy would advertise a
        2-D dim list on a 3-D array)."""
        from xcube_resampling_spark.sources import (
            concat_time_refs,
            netcdf3_refs,
        )

        data = np.arange(12, dtype="<f8").reshape(3, 4)
        days = []
        for day in range(2):
            p = str(tmp_path / f"single{day}.nc")
            with open(p, "wb") as fp:
                fp.write(encode_netcdf3("v", data + day, ("lat", "lon")))
            days.append(netcdf3_refs(p))
        assert json.loads(days[0]["v/.zattrs"])[
            "_ARRAY_DIMENSIONS"] == ["lat", "lon"]
        cube = concat_time_refs(days, "v")
        assert json.loads(cube["v/.zattrs"])[
            "_ARRAY_DIMENSIONS"] == ["time", "lat", "lon"]

    def test_concat_rejects_heterogeneous(self, spark, tmp_path):
        from xcube_resampling_spark.sources import concat_time_refs

        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        write_netcdf3(_raster(spark, 8, 8), a, "v", (8, 8),
                      band_rows=4)
        write_netcdf3(_raster(spark, 6, 6), b, "v", (6, 6),
                      band_rows=3)
        with pytest.raises(ValueError, match="disagrees"):
            concat_time_refs(
                [granule_dir_refs(a), granule_dir_refs(b)], "v")

    def test_http_targets(self, spark, tmp_path):
        """Targets can be URLs: ranged GETs over real sockets (the
        actual remote-archive pattern)."""
        from xcube_resampling_spark.sources import LocalHttpStoreServer

        w, h = 8, 8
        df = _raster(spark, w, h)
        path = str(tmp_path / "granh")
        write_netcdf3(df, path, "v", (h, w), band_rows=4)
        with LocalHttpStoreServer(path) as srv:
            refs = granule_dir_refs(path, sources={
                f: f"{srv.url}/{f}" for f in os.listdir(path)
            })
            rows = read_zarr(
                spark, "virtual", "v", store=RefChunkStore(refs)
            ).collect()
        assert len(rows) == h * w
        exp = {(r["j"], r["i"]): r["value"]
               for r in df.collect()}
        for r in rows:
            assert exp[(r["j"], r["i"])] == r["value"]


class TestReviewRegressions:
    def test_scalar_variable_valid_zarr_metadata(self, tmp_path):
        """0-d variables (CF grid-mapping scalars like 'crs') must get
        spec-valid zarr v2 metadata: chunks == [] with chunk key '0',
        not a [1]-chunked 0-d array."""
        from xcube_resampling_spark.sources import netcdf3_refs
        from xcube_resampling_spark.sources.netcdf3 import (
            encode_netcdf3,
        )

        p = str(tmp_path / "scalar.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3(
                "crs", np.int32(42).reshape(()), ()))
        refs = netcdf3_refs(p)
        za = json.loads(refs["crs/.zarray"])
        assert za["shape"] == [] and za["chunks"] == []
        target, off, length = refs["crs/0"]
        with open(p, "rb") as fp:
            fp.seek(off)
            raw = fp.read(length)
        assert np.frombuffer(raw, ">i4")[0] == 42

    def test_heterogeneous_granules_refused(self, spark, tmp_path):
        """A granule directory whose bands disagree on codec chain
        (mixed .nc/.h5 writers) must refuse instead of building a
        manifest whose .zarray lies about some chunks' bytes."""
        from xcube_resampling_spark.sources import granule_dir_refs
        from xcube_resampling_spark.sources.hdf5 import encode_hdf5

        w, h = 6, 8
        path = str(tmp_path / "mixed")
        write_netcdf3(_raster(spark, w, h), path, "v", (h, w),
                      band_rows=4)
        # overwrite band 1 with a deflate-compressed HDF5 granule of
        # the same block shape
        data = np.arange(4 * w, dtype="<f8").reshape(4, w)
        with open(os.path.join(path, "part-00001.nc"), "wb") as fp:
            os.unlink(fp.name)
        with open(os.path.join(path, "part-1.h5"), "wb") as fp:
            fp.write(encode_hdf5("v", data, ("y", "x"),
                                 chunks=(4, w), compress=True))
        with pytest.raises(ValueError, match="disagrees with band 0"):
            granule_dir_refs(path)

    def test_refchunkstore_pickles_without_reader_cache(self):
        import pickle

        from xcube_resampling_spark.sources import RefChunkStore

        store = RefChunkStore({"a/.zarray": "{}"})
        store._readers["http://example/x"] = object()  # unpicklable
        clone = pickle.loads(pickle.dumps(store))
        assert clone.refs == store.refs
        assert clone._readers == {}

    def test_virtual_cube_into_temporal_resample(self, spark, tmp_path):
        """End-to-end archive workflow: per-day granule directories ->
        one kerchunk virtual cube -> NaN-aware temporal mean, without
        rewriting a byte of the archive."""
        from xcube_resampling_spark.operators.temporal import (
            resample_time_agg,
        )
        from xcube_resampling_spark.sources import concat_time_refs

        w, h = 6, 4
        days = []
        for day in range(4):
            df = _raster(spark, w, h).withColumn(
                "value", F.col("value") + day * 100.0)
            p = str(tmp_path / f"d{day}")
            write_netcdf3(df, p, "v", (h, w), band_rows=2)
            days.append(granule_dir_refs(p))
        cube = read_zarr(
            spark, "virtual", "v",
            store=RefChunkStore(concat_time_refs(days, "v")))
        # frame indices 0..3, period 2 -> bins 0 and 2
        out = resample_time_agg(cube, "mean", 2)
        got = {(r.t, r.j, r.i): r.value for r in out.collect()}
        base = {(r.j, r.i): r.value
                for r in _raster(spark, w, h).collect()}
        for (j, i), v in base.items():
            assert got[(0, j, i)] == pytest.approx(v + 50.0)
            assert got[(2, j, i)] == pytest.approx(v + 250.0)


class TestParquetRefs:
    """Parquet-refs (kerchunk v2) manifests: .zmetadata consolidated
    JSON + per-array refs.<n>.parq record files -- the layout very
    large reference sets ship in."""

    def _refs(self):
        import base64

        return {
            ".zgroup": '{"zarr_format": 2}',
            "v/.zarray": json.dumps({
                "zarr_format": 2, "shape": [4, 6], "chunks": [2, 3],
                "dtype": "<f8", "compressor": None,
                "fill_value": None, "order": "C", "filters": None,
            }),
            "v/.zattrs": '{"_ARRAY_DIMENSIONS": ["y", "x"]}',
            # chunk grid 2x2: one ranged, one inline, one whole-file;
            # v/0.1 deliberately ABSENT
            "v/0.0": ["data.bin", 0, 10],
            "v/1.0": "base64:"
                     + base64.b64encode(b"\x00\x01\xff").decode(),
            "v/1.1": ["whole.bin"],
        }

    def test_roundtrip_preserves_every_ref_form(self, tmp_path):
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        refs = self._refs()
        # record_size 3 < 4 chunks -> the manifest spans two record
        # files, exercising the record arithmetic
        save_refs_parquet(refs, str(tmp_path / "refs"), record_size=3)
        assert (tmp_path / "refs" / ".zmetadata").exists()
        assert (tmp_path / "refs" / "v" / "refs.0.parq").exists()
        assert (tmp_path / "refs" / "v" / "refs.1.parq").exists()
        back = load_refs_parquet(str(tmp_path / "refs"))
        assert json.loads(back[".zgroup"]) == {"zarr_format": 2}
        assert json.loads(back["v/.zarray"]) \
            == json.loads(refs["v/.zarray"])
        assert json.loads(back["v/.zattrs"]) \
            == json.loads(refs["v/.zattrs"])
        assert back["v/0.0"] == ["data.bin", 0, 10]
        assert back["v/1.0"] == refs["v/1.0"]
        assert back["v/1.1"] == ["whole.bin"]
        assert "v/0.1" not in back  # absent stays absent

    def test_store_accepts_manifest_paths(self, tmp_path):
        from xcube_resampling_spark.sources import (
            save_refs,
            save_refs_parquet,
        )

        (tmp_path / "data.bin").write_bytes(bytes(range(100)))
        (tmp_path / "whole.bin").write_bytes(b"whole")
        refs = self._refs()
        save_refs(refs, str(tmp_path / "r.json"))
        save_refs_parquet(refs, str(tmp_path / "refs"))
        js = RefChunkStore(str(tmp_path / "r.json"))
        pq = RefChunkStore(str(tmp_path / "refs"))
        for key in ("v/.zarray", "v/0.0", "v/1.0", "v/1.1", "v/0.1"):
            assert js.get(key) == pq.get(key), key
        # relative targets resolve against the MANIFEST's directory
        assert pq.get("v/0.0") == bytes(range(10))
        assert pq.get("v/1.1") == b"whole"

    def test_lazy_store_pickles_path_only(self, spark, tmp_path):
        import pickle

        from xcube_resampling_spark.sources import (
            ParquetRefChunkStore,
            save_refs_parquet,
        )

        w, h = 12, 16
        df = _raster(spark, w, h)
        gran = str(tmp_path / "gran")
        write_netcdf3(df, gran, "v", (h, w), band_rows=4)
        refs = granule_dir_refs(gran)
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir)
        store = ParquetRefChunkStore(mdir)
        # the pickle payload must stay O(1) in manifest size -- the
        # whole point of the lazy store (a dict-backed RefChunkStore
        # ships every ref in every task closure)
        blob = pickle.dumps(store)
        assert len(blob) < 1000, len(blob)
        clone = pickle.loads(blob)
        assert clone.get("v/.zarray") == RefChunkStore(refs).get(
            "v/.zarray")
        got = read_zarr(spark, "virtual", "v", store=clone).toPandas() \
            .sort_values(["t", "j", "i"])
        exp = df.toPandas().sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            got["value"].to_numpy(), exp["value"].to_numpy())

    def test_parquet_manifest_matches_json_manifest_reads(
            self, spark, tmp_path):
        # same granule dir, two manifest encodings, identical cube --
        # including the inlined short edge band
        from xcube_resampling_spark.sources import (
            ParquetRefChunkStore,
            save_refs_parquet,
        )

        w, h = 12, 14  # band_rows=4 -> short last band (inline chunk)
        df = _raster(spark, w, h)
        gran = str(tmp_path / "gran")
        write_netcdf3(df, gran, "v", (h, w), band_rows=4)
        refs = granule_dir_refs(gran)
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir, record_size=2)
        a = read_zarr(spark, "virtual", "v",
                      store=RefChunkStore(refs)).toPandas() \
            .sort_values(["t", "j", "i"])
        b = read_zarr(spark, "virtual", "v",
                      store=ParquetRefChunkStore(mdir)).toPandas() \
            .sort_values(["t", "j", "i"])
        np.testing.assert_array_equal(
            a["value"].to_numpy(), b["value"].to_numpy())

    def test_scalar_array_roundtrip(self, tmp_path):
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        refs = {
            "s/.zarray": json.dumps({
                "zarr_format": 2, "shape": [], "chunks": [],
                "dtype": "<i4", "compressor": None,
                "fill_value": None, "order": "C", "filters": None,
            }),
            "s/0": ["f.bin", 8, 4],
        }
        save_refs_parquet(refs, str(tmp_path / "refs"))
        back = load_refs_parquet(str(tmp_path / "refs"))
        assert back["s/0"] == ["f.bin", 8, 4]

    def test_rewrite_with_smaller_record_count_drops_stale_files(
            self, tmp_path):
        # second write with a LARGER record_size produces fewer record
        # files; stale ones from the first write must not survive to
        # be re-read under the new record arithmetic
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        refs = self._refs()
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir, record_size=1)  # 4 record files
        save_refs_parquet(refs, mdir, record_size=100)  # 1 record file
        import os as _os

        left = sorted(_os.listdir(tmp_path / "refs" / "v"))
        assert left == ["refs.0.parq"]
        back = load_refs_parquet(mdir)
        assert back["v/0.0"] == ["data.bin", 0, 10]
        assert back["v/1.1"] == ["whole.bin"]
        assert "v/0.1" not in back

    def test_metadata_only_rewrite_cleans_all_var_dirs(self, tmp_path):
        # review regression: a rewrite where a var keeps its .zarray
        # but ships NO chunk refs must still clear that var's old
        # record files (they would resurrect deleted chunks under the
        # new record arithmetic)
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        refs = self._refs()
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir, record_size=1)
        meta_only = {k: v for k, v in refs.items()
                     if k.rsplit("/", 1)[-1].startswith(".")}
        save_refs_parquet(meta_only, mdir, record_size=100)
        back = load_refs_parquet(mdir)
        assert "v/0.0" not in back
        assert "v/1.1" not in back
        assert json.loads(back["v/.zarray"]) \
            == json.loads(refs["v/.zarray"])

    def test_out_of_grid_chunk_key_refused_on_write(self, tmp_path):
        from xcube_resampling_spark.sources import save_refs_parquet

        refs = self._refs()
        refs["v/2.0"] = ["x.bin", 0, 4]   # grid is 2x2
        with pytest.raises(ValueError, match="outside the 2x2"):
            save_refs_parquet(refs, str(tmp_path / "refs"))
        refs = self._refs()
        refs["v/0.3"] = ["x.bin", 0, 4]   # per-dim overflow aliases
        with pytest.raises(ValueError, match="outside the 2x2"):
            save_refs_parquet(refs, str(tmp_path / "r2"))

    def test_record_arithmetic_mismatch_refused_on_read(self, tmp_path):
        # a .zmetadata whose record_size disagrees with the record
        # files must fail loudly, not alias rows onto wrong chunks
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        mdir = tmp_path / "refs"
        save_refs_parquet(self._refs(), str(mdir), record_size=1)
        doc = json.loads((mdir / ".zmetadata").read_text())
        doc["record_size"] = 100
        (mdir / ".zmetadata").write_text(json.dumps(doc))
        with pytest.raises(ValueError, match="record arithmetic"):
            load_refs_parquet(str(mdir))

    def test_lazy_store_reloads_after_manifest_rewrite(self, tmp_path):
        # review regression: the per-process cache is keyed by the
        # .zmetadata stat, so a rewritten manifest at the same path is
        # reloaded, not served stale
        import os as _os

        from xcube_resampling_spark.sources import (
            ParquetRefChunkStore,
            save_refs_parquet,
        )

        refs = self._refs()
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir)
        s1 = ParquetRefChunkStore(mdir)
        assert "v/0.0" in s1.known_keys()
        refs2 = dict(refs)
        refs2["v/0.0"] = ["other.bin", 7, 3]
        save_refs_parquet(refs2, mdir)
        # ensure the stat actually changes even on coarse-mtime
        # filesystems
        zp = _os.path.join(mdir, ".zmetadata")
        st = _os.stat(zp)
        _os.utime(zp, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
        s2 = ParquetRefChunkStore(mdir)
        s2._ensure()
        assert s2.refs["v/0.0"] == ["other.bin", 7, 3]


class TestParquetRefsProperty:
    """Property: save_refs_parquet . load_refs_parquet is the identity
    on byte content -- for ANY chunk grid, record size, and mix of
    inline / ranged / whole-file / absent chunks, every key resolves
    to the same bytes through both manifest encodings."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        shape=st.lists(st.integers(1, 9), min_size=0, max_size=3),
        chunk_frac=st.lists(st.integers(1, 9), min_size=3, max_size=3),
        record_size=st.integers(1, 7),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_any_grid(self, tmp_path_factory, shape,
                                chunk_frac, record_size, seed):
        import base64
        import random

        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        rng = random.Random(seed)
        chunks = [min(c, s) for c, s in zip(chunk_frac, shape)]
        grid = [-(-s // c) for s, c in zip(shape, chunks)]
        refs = {
            "v/.zarray": json.dumps({
                "zarr_format": 2, "shape": shape, "chunks": chunks,
                "dtype": "<f8", "compressor": None,
                "fill_value": None, "order": "C", "filters": None,
            }),
            ".zgroup": '{"zarr_format": 2}',
        }
        keys = []

        def walk(prefix, dims):
            if not dims:
                keys.append(".".join(map(str, prefix)) or "0")
                return
            for k in range(dims[0]):
                walk(prefix + [k], dims[1:])

        walk([], grid)
        for ck in keys:
            kind = rng.randrange(4)
            if kind == 0:
                continue  # absent chunk
            if kind == 1:
                refs[f"v/{ck}"] = "base64:" + base64.b64encode(
                    rng.randbytes(rng.randrange(0, 9))).decode()
            elif kind == 2:
                refs[f"v/{ck}"] = [
                    f"t{rng.randrange(3)}.bin",
                    rng.randrange(0, 1 << 40),
                    rng.randrange(1, 1 << 20),
                ]
            else:
                refs[f"v/{ck}"] = [f"t{rng.randrange(3)}.bin"]
        mdir = tmp_path_factory.mktemp("prefs")
        save_refs_parquet(refs, str(mdir), record_size=record_size)
        back = load_refs_parquet(str(mdir))
        want_keys = set(refs)
        assert set(back) == want_keys
        for k, ref in refs.items():
            got = back[k]
            if isinstance(ref, str) and not k.rsplit(
                    "/", 1)[-1].startswith("."):
                # inline chunks normalize to base64 form; compare bytes
                want = (base64.b64decode(ref[7:])
                        if ref.startswith("base64:")
                        else ref.encode())
                assert base64.b64decode(got[7:]) == want, k
            elif isinstance(ref, list):
                # generated refs are [target, offset, size] or
                # [target]; both shapes round-trip verbatim
                assert got == ref, k
            else:
                assert json.loads(got) == json.loads(ref), k

    def test_failed_rewrite_leaves_old_manifest_intact(self, tmp_path):
        # second-review regression: validation must complete for ALL
        # vars before any existing record file is deleted -- a bad
        # chunk key in a rewrite must not half-destroy the manifest
        from xcube_resampling_spark.sources import (
            load_refs_parquet,
            save_refs_parquet,
        )

        refs = {
            "v/.zarray": json.dumps({
                "zarr_format": 2, "shape": [4, 6], "chunks": [2, 3],
                "dtype": "<f8", "compressor": None,
                "fill_value": None, "order": "C", "filters": None,
            }),
            "v/0.0": ["data.bin", 0, 10],
        }
        mdir = str(tmp_path / "refs")
        save_refs_parquet(refs, mdir)
        bad = dict(refs)
        bad["v/9.9"] = ["x.bin", 0, 4]
        with pytest.raises(ValueError, match="outside the"):
            save_refs_parquet(bad, mdir)
        back = load_refs_parquet(mdir)
        assert back["v/0.0"] == ["data.bin", 0, 10]


class TestParquetRefsScale:
    """The scale contract of ParquetRefChunkStore: a ~1M-ref manifest
    loads ONCE per process in bounded time/memory, and the class-level
    cache is LRU-bounded so a long-lived executor reading many
    distinct manifests does not accumulate one ref dict per path."""

    @staticmethod
    def _big_manifest(tmp_path, n=1_000_000):
        import json as _json

        from xcube_resampling_spark.sources import save_refs_parquet

        refs = {
            "v/.zarray": _json.dumps({
                "shape": [n], "chunks": [1], "dtype": "<f8",
                "compressor": None, "filters": None, "fill_value": 0,
                "zarr_format": 2, "order": "C",
            }),
            ".zgroup": _json.dumps({"zarr_format": 2}),
        }
        for i in range(n):
            refs[f"v/{i}"] = ["data.bin", i * 8, 8]
        mdir = str(tmp_path / "bigrefs")
        save_refs_parquet(refs, mdir)
        return mdir, n

    def test_million_refs_one_load_per_process(self, tmp_path):
        import time as _time
        import tracemalloc

        import xcube_resampling_spark.sources.kerchunk as km

        mdir, n = self._big_manifest(tmp_path)
        km.ParquetRefChunkStore._cache.clear()
        loads = {"n": 0}
        orig = km.load_refs_parquet
        km.load_refs_parquet = (
            lambda p: (loads.__setitem__("n", loads["n"] + 1), orig(p))[1]
        )
        try:
            # latency load, NOT under tracemalloc (its per-allocation
            # hooks inflate a 1M-insert load ~15x) and as CPU time
            # (wall clock is meaningless when a 32-core bench shares
            # the box): measured ~4.5 s for 1M refs
            t0 = _time.process_time()
            s1 = km.ParquetRefChunkStore(mdir)
            s1._ensure()
            open_cpu = _time.process_time() - t0
            # a SECOND store instance in the same process (what every
            # further task in this executor amounts to) reuses the
            # cached dict: zero additional loads, instant open
            t0 = _time.process_time()
            s2 = km.ParquetRefChunkStore(mdir)
            s2._ensure()
            second_open = _time.process_time() - t0
            assert loads["n"] == 1
            # memory bound on a separate cold load, under tracemalloc
            km.ParquetRefChunkStore._cache.clear()
            tracemalloc.start()
            km.ParquetRefChunkStore(mdir)._ensure()
            _, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            assert loads["n"] == 2
        finally:
            km.load_refs_parquet = orig
        assert len(s1.refs) == n + 2
        assert s1.refs[f"v/{n - 1}"] == ["data.bin", (n - 1) * 8, 8]
        assert open_cpu < 45.0, open_cpu
        assert second_open < 0.05, second_open
        # resident bound: ~300 B/ref expected; fail if it balloons past
        # 1 KB/ref (the "per-process memory expectation" in the
        # docstring would then be a lie)
        assert peak < 1000 * n, peak

    def test_cache_is_lru_bounded(self, tmp_path):
        import json as _json

        import xcube_resampling_spark.sources.kerchunk as km
        from xcube_resampling_spark.sources import save_refs_parquet

        def tiny(i):
            refs = {
                "v/.zarray": _json.dumps({
                    "shape": [2], "chunks": [1], "dtype": "<f8",
                    "compressor": None, "filters": None,
                    "fill_value": 0, "zarr_format": 2, "order": "C",
                }),
                "v/0": ["d.bin", 0, 8],
                "v/1": ["d.bin", 8, 8],
            }
            mdir = str(tmp_path / f"m{i}")
            save_refs_parquet(refs, mdir)
            return mdir

        km.ParquetRefChunkStore._cache.clear()
        cap = km.ParquetRefChunkStore.MAX_CACHED_MANIFESTS
        dirs = [tiny(i) for i in range(cap + 3)]
        stores = [km.ParquetRefChunkStore(d) for d in dirs]
        for s in stores:
            s._ensure()
        assert len(km.ParquetRefChunkStore._cache) == cap
        # most recently used paths survive, oldest were evicted
        cached_paths = {k[0] for k in km.ParquetRefChunkStore._cache}
        assert cached_paths == {
            __import__("os").path.abspath(d) for d in dirs[-cap:]
        }
        # an evicted path reloads on demand (correct, just not cached)
        assert stores[0].refs["v/0"] == ["d.bin", 0, 8]
        fresh = km.ParquetRefChunkStore(dirs[0])
        fresh._ensure()
        assert fresh.refs["v/1"] == ["d.bin", 8, 8]

    def test_concurrent_hits_do_not_reload(self, tmp_path):
        # the LRU hit path is pop+reinsert; without the class lock two
        # racing threads turn a HIT into a duplicate multi-second load
        import json as _json
        import threading

        import xcube_resampling_spark.sources.kerchunk as km
        from xcube_resampling_spark.sources import save_refs_parquet

        refs = {
            "v/.zarray": _json.dumps({
                "shape": [4], "chunks": [1], "dtype": "<f8",
                "compressor": None, "filters": None, "fill_value": 0,
                "zarr_format": 2, "order": "C",
            }),
            **{f"v/{i}": ["d.bin", i * 8, 8] for i in range(4)},
        }
        mdir = str(tmp_path / "c")
        save_refs_parquet(refs, mdir)
        km.ParquetRefChunkStore._cache.clear()
        loads = {"n": 0}
        orig = km.load_refs_parquet

        def counting(p):
            loads["n"] += 1
            return orig(p)

        km.load_refs_parquet = counting
        try:
            km.ParquetRefChunkStore(mdir)._ensure()  # prime the cache
            errs = []

            def hit():
                try:
                    for _ in range(200):
                        km.ParquetRefChunkStore(mdir)._ensure()
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            threads = [threading.Thread(target=hit) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            km.load_refs_parquet = orig
        assert not errs
        assert loads["n"] == 1, loads["n"]
