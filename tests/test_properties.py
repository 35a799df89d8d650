"""Property-based tests (hypothesis) -- beyond the reference's golden-value
strategy: invariants that must hold for *any* grid/input.

Driver-side properties run per-example (no JVM); Spark properties batch all
generated cases into one DataFrame so the JVM round-trip happens once.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xcube_resampling_spark.crs import CRS, CRS_WGS84
from xcube_resampling_spark.gridmapping import GridMapping

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


class TestGridMappingProperties:
    @given(
        w=st.integers(2, 500), h=st.integers(2, 500),
        x0=st.floats(-170, 160), y0=st.floats(-80, 60),
        res=st.floats(0.001, 0.05),
    )
    @settings(max_examples=200, deadline=None)
    def test_ij_xy_transform_roundtrip(self, w, h, x0, y0, res):
        if y0 + res * h > 90:
            return
        gm = GridMapping.regular((w, h), (x0, y0), res, CRS_WGS84)
        (a, b, c), (d, e, f) = gm.ij_to_xy_transform
        (a2, b2, c2), (d2, e2, f2) = gm.xy_to_ij_transform
        for i, j in ((0, 0), (w - 1, h - 1), (w // 2, h // 3)):
            x = a * i + b * j + c
            y = d * i + e * j + f
            i2 = a2 * x + b2 * y + c2
            j2 = d2 * x + e2 * y + f2
            assert i2 == pytest.approx(i, abs=1e-6)
            assert j2 == pytest.approx(j, abs=1e-6)

    @given(
        w=st.integers(2, 100), h=st.integers(2, 100),
        x0=st.floats(-170, 160), y0=st.floats(-80, 60),
        res=st.floats(0.001, 0.05),
    )
    @settings(max_examples=100, deadline=None)
    def test_from_coords_recovers_regular_grid(self, w, h, x0, y0, res):
        if y0 + res * h > 90:
            return
        gm = GridMapping.regular((w, h), (x0, y0), res, CRS_WGS84)
        gm2 = GridMapping.from_coords(
            np.asarray(gm.x_coords), np.asarray(gm.y_coords), CRS_WGS84
        )
        assert gm2.is_regular
        assert gm2.size == (w, h)
        # from_coords snaps the inferred resolution (round_to_fraction,
        # reference helpers.py:203-239) -- recovery is approximate
        assert gm2.x_res == pytest.approx(res, rel=1e-3)

    @given(
        x=st.floats(-179.999, 180), y=st.floats(-85, 85),
    )
    @settings(max_examples=200, deadline=None)
    def test_utm_transform_roundtrip(self, x, y):
        """Transverse-Mercator forward/inverse must invert each other
        within the zone's validity band."""
        utm = CRS.from_epsg(32632)
        lon0 = 9.0
        if abs(x - lon0) > 5.0 or abs(x - lon0) < 1e-6:
            return
        from xcube_resampling_spark.crs import Transformer

        fwd = Transformer(CRS_WGS84, utm)
        inv = Transformer(utm, CRS_WGS84)
        ex, ey = fwd.transform(np.array([x]), np.array([y]))
        bx, by = inv.transform(ex, ey)
        assert bx[0] == pytest.approx(x, abs=1e-6)
        assert by[0] == pytest.approx(y, abs=1e-6)


class TestSparkBatchedProperties:
    """One generated batch -> one Spark job per property."""

    def test_lon360_roundtrip_random(self, spark):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.functions import (
            from_lon_360,
            to_lon_360,
        )

        rng = np.random.default_rng(7)
        lons = rng.uniform(-180.0 + 1e-9, 180.0, 5000)
        df = spark.createDataFrame(
            [(float(v),) for v in lons], "lon double"
        )
        bad = df.select(
            "lon",
            from_lon_360(to_lon_360(F.col("lon"))).alias("back"),
            to_lon_360(F.col("lon")).alias("l360"),
        ).filter(
            (F.abs(F.col("back") - F.col("lon")) > 1e-12)
            | (F.col("l360") < 0) | (F.col("l360") >= 360.0)
        )
        assert bad.count() == 0

    def test_coarsen_mean_bounded_by_min_max(self, spark):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.operators.coarsen import (
            aggregate_windows,
        )

        rng = np.random.default_rng(11)
        rows = [
            (0, int(k // 97), int(k % 97), float(v))
            for k, v in enumerate(rng.normal(0, 100, 9700))
        ]
        df = spark.createDataFrame(rows, "t int, J int, I int, value double")
        mean = aggregate_windows(df, "mean", 10, 10, False)
        lo = aggregate_windows(df, "min", 10, 10, False)
        hi = aggregate_windows(df, "max", 10, 10, False)
        j = (
            mean.withColumnRenamed("value", "m")
            .join(lo.withColumnRenamed("value", "lo"), ["t", "J", "I"])
            .join(hi.withColumnRenamed("value", "hi"), ["t", "J", "I"])
        )
        bad = j.filter(
            (F.col("m") < F.col("lo") - 1e-9)
            | (F.col("m") > F.col("hi") + 1e-9)
        )
        assert bad.count() == 0

    def test_affine_identity_matrix_is_identity(self, spark):
        from pyspark.sql import functions as F

        from xcube_resampling_spark.operators.affine import resample_pixels

        rng = np.random.default_rng(13)
        w, h = 40, 30
        vals = rng.uniform(-10, 10, w * h)
        src = spark.createDataFrame(
            [
                (0, k // w, k % w, float(v))
                for k, v in enumerate(vals)
            ],
            "t int, j int, i int, value double",
        )
        out = resample_pixels(
            spark, src, ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
            (w, h), (w, h), 1, 0, "mean", False, -1.0, False,
        )
        diff = out.alias("o").join(
            src.alias("s"),
            (F.col("o.j") == F.col("s.j")) & (F.col("o.i") == F.col("s.i")),
        ).filter(F.abs(F.col("o.value") - F.col("s.value")) > 1e-12)
        assert diff.count() == 0
        assert out.count() == w * h


class TestCodecProperties:
    """Driver-side codec invariants for the blosc1 and NetCDF-3 binary
    formats: any payload must roundtrip byte-exactly."""

    @given(
        data=st.binary(min_size=0, max_size=5000),
        typesize=st.sampled_from([1, 2, 4, 8, 16]),
        shuffle=st.booleans(),
        blocksize=st.sampled_from([None, 64, 1024]),
    )
    @settings(max_examples=150, deadline=None)
    def test_blosc1_roundtrip_any_bytes(
        self, data, typesize, shuffle, blocksize
    ):
        from xcube_resampling_spark.sources import blosc1

        frame = blosc1.encode(
            data, typesize=typesize, shuffle=shuffle, blocksize=blocksize
        )
        assert blosc1.decode(frame) == data
        # header invariant: cbytes field == frame length
        import struct

        assert struct.unpack_from("<I", frame, 12)[0] == len(frame)

    @given(
        shape=st.tuples(st.integers(1, 7), st.integers(1, 9)),
        dtype=st.sampled_from(["f8", "f4", "i4", "i2", "i1"]),
        record=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=100, deadline=None)
    def test_netcdf3_roundtrip_any_array(self, shape, dtype, record, seed):
        from xcube_resampling_spark.sources.netcdf3 import (
            decode_netcdf3, encode_netcdf3,
        )

        rng = np.random.default_rng(seed)
        data = rng.integers(-120, 120, shape).astype(dtype)
        blob = encode_netcdf3(
            "v", data, ("d0", "d1"), record_dim=record,
            global_attrs={"seed": int(seed)},
        )
        parsed = decode_netcdf3(blob)
        np.testing.assert_array_equal(parsed["vars"]["v"]["data"], data)
        assert parsed["attrs"]["seed"] == seed
        assert len(blob) % 4 == 0

    @given(
        shape=st.tuples(st.integers(1, 7), st.integers(1, 9)),
        dtype=st.sampled_from(["<f8", ">f4", "<i4", ">i2", "<u2"]),
        chunked=st.booleans(),
        compress=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=80, deadline=None)
    def test_hdf5_roundtrip_any_array(
        self, shape, dtype, chunked, compress, seed
    ):
        from xcube_resampling_spark.sources.hdf5 import (
            decode_hdf5, encode_hdf5,
        )

        rng = np.random.default_rng(seed)
        data = rng.integers(-120, 120, shape).astype(dtype)
        chunks = (
            (max(1, shape[0] // 2), max(1, shape[1] // 2))
            if (chunked or compress) else None
        )
        blob = encode_hdf5(
            "v", data, ("d0", "d1"), chunks=chunks, compress=compress,
            global_attrs={"seed": int(seed)},
        )
        parsed = decode_hdf5(blob)
        got = parsed["vars"]["v"]["data"]
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, data)
        assert parsed["attrs"]["seed"] == seed

    @given(
        shape=st.tuples(st.integers(1, 9), st.integers(1, 11)),
        codec=st.sampled_from(["gzip", "blosc", None]),
        sharded=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_zarr3_chunk_roundtrip_any_block(
        self, shape, codec, sharded, seed
    ):
        """Driver-side zarr v3 codec invariants: any block roundtrips
        through the encode/decode chain, and any shard through the
        indexed shard layout."""
        from xcube_resampling_spark.sources.zarr3 import (
            _decode_chain,
            _decode_shard,
            _encode_chain,
            _encode_shard,
        )

        rng = np.random.default_rng(seed)
        data = rng.normal(0, 50, (1,) + shape)
        chain = []
        if codec == "gzip":
            chain = [{"name": "gzip", "configuration": {"level": 1}}]
        elif codec == "blosc":
            chain = [{"name": "blosc"}]
        chain = chain + [{"name": "crc32c"}]
        if sharded:
            # inner chunks = halves (padded up to even dims)
            pad = tuple((1,) + tuple(s + s % 2 for s in shape))
            block = np.zeros(pad)
            block[:, :shape[0], :shape[1]] = data
            inner = (1, pad[1] // 2 or 1, pad[2] // 2 or 1)
            shard = _encode_shard(block, inner, chain)
            back = _decode_shard(
                shard, pad, inner, np.dtype("<f8"), chain,
                [{"name": "bytes",
                  "configuration": {"endian": "little"}},
                 {"name": "crc32c"}],
                "end", float("nan"),
            )
            np.testing.assert_array_equal(back, block)
        else:
            raw = _encode_chain(data.tobytes(), chain, 8)
            back = np.frombuffer(
                _decode_chain(raw, chain), dtype="<f8"
            ).reshape(data.shape)
            np.testing.assert_array_equal(back, data)

    @given(
        lons=st.lists(st.floats(-179.9, 179.9), min_size=1, max_size=8),
        lats=st.lists(st.floats(-84.0, 84.0), min_size=1, max_size=8),
        code=st.sampled_from(
            [3035, 3857, 3413, 2154, 5070, 3395, 6933, 4087, 27700,
             23032, 29873, 2056, 5514, 5041, 5042, 2048, 24200, 27572,
             8857, 8858, 8859, 28992]
        ),
    )
    @settings(max_examples=150, deadline=None)
    def test_any_registry_crs_roundtrips(self, lons, lats, code):
        """Forward-inverse closure for every projected CRS in the
        registry, including the datum-shifted ED50 zones."""
        from xcube_resampling_spark.crs import Transformer

        n = min(len(lons), len(lats))
        lo = np.array(lons[:n])
        la = np.array(lats[:n])
        crs = CRS.from_epsg(code)
        # keep points inside each projection's sane domain
        if crs.kind == "tmerc":
            lon0 = crs.param("lon_0")
            lo = lon0 + np.clip(lo - lon0, -6.0, 6.0)
        if crs.kind == "stere":
            la = np.abs(la) * np.sign(crs.param("lat_0"))
            la = np.clip(np.abs(la), 45.0, 84.0) * np.sign(
                crs.param("lat_0")
            )
        if crs.kind == "lcc":
            la = np.clip(la, 20.0, 70.0)
        if crs.kind == "omerc":
            # stay away from the oblique poles of the aposphere
            lonc = crs.param("lonc")
            lo = lonc + np.clip(lo - lonc, -60.0, 60.0)
            la = np.clip(la, -60.0, 60.0)
        if crs.kind == "sterea":
            lo = crs.param("lon_0") + np.clip(
                lo - crs.param("lon_0"), -60.0, 60.0)
            la = np.clip(la, crs.param("lat_0") - 60.0,
                         crs.param("lat_0") + 60.0)
        if crs.kind == "somerc":
            # the rotated Mercator blows up near (90 - lat_0, lon_0
            # +- 180); the clipped box keeps far clear of it
            lon0 = crs.param("lon_0")
            lo = lon0 + np.clip(lo - lon0, -60.0, 60.0)
            la = np.clip(la, -60.0, 60.0)
        if crs.kind == "krovak":
            # oblique conic: stay within the cone's sane quadrant
            lon0 = crs.param("lon_0")
            lo = lon0 + np.clip(lo - lon0, -30.0, 30.0)
            la = np.clip(la, 20.0, 70.0)
        if crs.kind == "aea":
            la = np.clip(la, 10.0, 70.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        x, y = fwd.transform(lo, la)
        lo2, la2 = inv.transform(x, y)
        # datum-shifted paths close to ~cm (the h=0 assumption of the
        # Helmert bridge), projection-only paths to sub-micrometer
        atol = 1e-6 if crs.towgs84 else 1e-8
        np.testing.assert_allclose(lo2, lo, atol=atol)
        np.testing.assert_allclose(la2, la, atol=atol)

    @given(
        lons=st.lists(st.floats(-179.9, 179.9), min_size=1, max_size=8),
        lats=st.lists(st.floats(-89.9, 89.9), min_size=1, max_size=8),
        lat0=st.floats(-80.0, 80.0),
        lon0=st.floats(-179.0, 179.0),
    )
    @settings(max_examples=100, deadline=None)
    def test_orthographic_roundtrips_or_nan(self, lons, lats, lat0, lon0):
        """Orthographic (no EPSG code -> not in the registry sample):
        any origin, any input -- visible points close at machine
        precision (the inverse is exact ray-ellipsoid intersection),
        back-hemisphere points are NaN in BOTH coordinates."""
        from xcube_resampling_spark.crs import Transformer

        n = min(len(lons), len(lats))
        lo = np.array(lons[:n])
        la = np.array(lats[:n])
        crs = CRS.orthographic(lat_0=lat0, lon_0=lon0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        x, y = fwd.transform(lo, la)
        assert (np.isnan(x) == np.isnan(y)).all()
        # machine-precision closure holds away from the exact limb
        # (the tangency is a double root of the ray intersection, so
        # float error there is amplified to ~sqrt(eps) ~ 0.1 m)
        cosang = (
            np.sin(np.radians(la)) * np.sin(np.radians(lat0))
            + np.cos(np.radians(la)) * np.cos(np.radians(lat0))
            * np.cos(np.radians(lo - lon0))
        )
        vis = ~np.isnan(x) & (cosang > 1e-6)
        if vis.any():
            lo2, la2 = inv.transform(x[vis], y[vis])
            np.testing.assert_allclose(la2, la[vis], atol=1e-8)
            # longitude error is ill-conditioned near the poles
            # (ground distance per degree shrinks as cos(lat)), so
            # compare the ANGULAR GROUND DISTANCE: |dlon|*cos(lat)
            # at 1e-8 deg ~ 1 mm -- same bound as latitude, properly
            # conditioned at every latitude
            lon_err = np.abs(lo2 - lo[vis]) * np.cos(
                np.radians(la[vis]))
            assert (lon_err <= 1e-8).all(), lon_err.max()


class TestMediaCodecProperties:
    """Roundtrip invariants for the clean-room media codecs: any
    shape/dtype the encoder accepts must decode byte-exactly."""

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_any_image(self, h, w, c, seed):
        from xcube_resampling_spark.extensions.imagecodec import (
            decode_png, encode_png,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == (h, w, c)
        assert (back == img).all()

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_roundtrip_any_image(self, h, w, seed):
        from xcube_resampling_spark.extensions.imagecodec import (
            decode_bmp, encode_bmp,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    @given(
        n=st.integers(0, 300),
        ch=st.integers(1, 3),
        dtype=st.sampled_from(["u1", "<i2", "<i4"]),
        rate=st.integers(1, 192000),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_any_pcm(self, n, ch, dtype, rate, seed):
        from xcube_resampling_spark.extensions.audiocodec import (
            decode_wav, encode_wav,
        )

        rng = np.random.default_rng(seed)
        dt = np.dtype(dtype)
        info = np.iinfo(dt)
        s = rng.integers(
            info.min, int(info.max) + 1, (n, ch)).astype(dt)
        back, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert back.shape == (n, ch) and (back == s).all()

    @given(
        n=st.integers(0, 5),
        h=st.integers(1, 5),
        w=st.integers(1, 5),
        chroma=st.sampled_from(["mono", "444", "420"]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_y4m_roundtrip_any_frames(self, n, h, w, chroma, seed):
        from xcube_resampling_spark.extensions.videocodec import (
            decode_y4m, encode_y4m,
        )

        rng = np.random.default_rng(seed)
        if chroma == "420":
            h, w = h * 2, w * 2  # 4:2:0 needs even dims
        y = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        if chroma == "mono":
            u = v = None
        else:
            cs = (h, w) if chroma == "444" else (h // 2, w // 2)
            u = rng.integers(0, 256, (n, *cs), dtype=np.uint8)
            v = rng.integers(0, 256, (n, *cs), dtype=np.uint8)
        by, bu, bv, meta = decode_y4m(encode_y4m(y, u, v))
        assert (by == y).all()
        if u is None:
            assert bu is None and bv is None
        else:
            assert (bu == u).all() and (bv == v).all()


class TestWktProperties:
    """WKT emission/parsing closure under arbitrary parameters."""

    @given(
        kind=st.sampled_from(
            ["tmerc", "laea", "merc", "cea", "eqc", "lcc", "aea",
             "sinu", "ortho", "moll", "eqearth", "aeqd", "stere_obl"]),
        lat0=st.floats(-60.0, 60.0),
        lon0=st.floats(-179.0, 179.0),
        x0=st.floats(-2e6, 2e6),
        y0=st.floats(-2e6, 2e6),
        k0=st.floats(0.9995, 1.0005),
        ell_i=st.integers(0, 2),
    )
    @settings(max_examples=150, deadline=None)
    def test_any_params_roundtrip_through_wkt(
            self, kind, lat0, lon0, x0, y0, k0, ell_i):
        """to_wkt -> crs_from_wkt is transform-identical for random
        parameters on every emitted family (not just registry values)."""
        from xcube_resampling_spark.crs import _Ellipsoid, _ELLIPSOIDS
        from xcube_resampling_spark.wkt import crs_from_wkt
        from xcube_resampling_spark.crs import Transformer

        ell = _Ellipsoid(*_ELLIPSOIDS[
            ["WGS84", "GRS80", "Intl1924"][ell_i]])
        params = {"lon_0": lon0, "x_0": x0, "y_0": y0}
        if kind in ("tmerc", "laea", "ortho", "aeqd", "stere_obl"):
            params["lat_0"] = lat0
        if kind in ("tmerc", "merc", "stere_obl"):
            params["k_0"] = k0
        if kind in ("cea", "eqc"):
            params["lat_ts"] = lat0
        if kind in ("lcc", "aea"):
            la = max(min(lat0, 60.0), -60.0)
            params["lat_0"] = la
            params["lat_1"] = la - 4.0
            params["lat_2"] = la + 4.0
        if kind in ("lcc", "aea") and abs(lat0) < 2.0:
            # conic constant degenerates when the standard parallels
            # straddle the equator symmetrically (n -> 0)
            params["lat_0"] = params["lat_1"] = 20.0
            params["lat_2"] = 30.0
        crs = CRS(kind, "fuzz", ell, tuple(sorted(params.items())))
        again = crs_from_wkt(crs.to_wkt())
        assert again.kind == crs.kind
        assert again.ellipsoid == crs.ellipsoid
        # transform-identical on a probe grid near the origin
        rng = np.random.default_rng(11)
        base_lat = params.get("lat_0", params.get("lat_ts", 0.0))
        base_lat = max(min(base_lat, 80.0), -80.0)
        lo = lon0 + rng.uniform(-5, 5, 20)
        la = np.clip(base_lat + rng.uniform(-5, 5, 20), -85, 85)
        fa = Transformer.from_crs(CRS_WGS84, crs)
        fb = Transformer.from_crs(CRS_WGS84, again)
        xa, ya = fa.transform(lo, la)
        xb, yb = fb.transform(lo, la)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)

    def test_gridmapping_accepts_wkt_and_proj_strings(self):
        """The operator surface takes CRS as WKT/PROJ text (parity:
        reference passes any pyproj input through its GridMapping)."""
        ref = GridMapping.regular((100, 80), (500000.0, 5.4e6),
                                  100.0, CRS.from_epsg(32633))
        via_wkt = GridMapping.regular(
            (100, 80), (500000.0, 5.4e6), 100.0,
            CRS.from_epsg(32633).to_wkt())
        via_proj = GridMapping.regular(
            (100, 80), (500000.0, 5.4e6), 100.0,
            "+proj=utm +zone=33 +datum=WGS84")
        assert via_wkt.crs.kind == ref.crs.kind
        assert via_proj.crs.kind == ref.crs.kind
        np.testing.assert_array_equal(via_wkt.x_coords, ref.x_coords)
        np.testing.assert_array_equal(via_proj.y_coords, ref.y_coords)


class TestNewCodecProperties:
    """Roundtrip invariants for the round-9 codecs: FLAC (lossless),
    AVI/DIB (lossless), szip (lossless), any input the encoders
    accept."""

    @given(
        n=st.integers(1, 3000),
        ch=st.integers(1, 4),
        bps=st.sampled_from([8, 16, 24]),
        block=st.sampled_from([192, 256, 4096]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_flac_roundtrip_any_pcm(self, n, ch, bps, block, seed):
        from xcube_resampling_spark.extensions.flaccodec import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(seed)
        lim = 1 << (bps - 1)
        x = rng.integers(-lim, lim, (n, ch)).astype(
            np.int16 if bps <= 16 else np.int32)
        back, sr = decode_flac(
            encode_flac(x, 16000, bps=bps, block_size=block))
        assert sr == 16000
        assert (back == x).all()

    @given(
        n_frames=st.integers(1, 6),
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        fps=st.integers(1, 60),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_avi_dib_roundtrip_any_frames(
        self, n_frames, h, w, fps, seed
    ):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi,
            encode_avi,
        )

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                  for _ in range(n_frames)]
        out, meta = decode_avi(encode_avi(frames, fps=fps))
        assert meta["n_frames"] == n_frames
        assert meta["fps"] == (fps, 1)
        for a, b in zip(frames, out):
            assert (a == b).all()

    @given(
        n=st.integers(1, 2000),
        bits=st.sampled_from([8, 16, 32]),
        j=st.sampled_from([4, 8, 16, 32]),
        ppsl=st.integers(1, 300),
        nn=st.booleans(),
        smooth=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_szip_roundtrip_any_samples(
        self, n, bits, j, ppsl, nn, smooth, seed
    ):
        from xcube_resampling_spark.sources.szip import (
            SZ_EC_OPTION_MASK,
            SZ_LSB_OPTION_MASK,
            SZ_NN_OPTION_MASK,
            szip_decode,
            szip_encode,
        )

        rng = np.random.default_rng(seed)
        hi = (1 << bits) - 1
        if smooth:
            x = np.cumsum(rng.integers(-3, 4, n))
            x = (x - x.min()).astype(np.uint64)
            x = np.minimum(x, hi)
        else:
            x = rng.integers(0, hi + 1, n).astype(np.uint64)
        dt = {8: "<u1", 16: "<u2", 32: "<u4"}[bits]
        raw = x.astype(dt).tobytes()
        opts = SZ_EC_OPTION_MASK | SZ_LSB_OPTION_MASK
        if nn:
            opts |= SZ_NN_OPTION_MASK
        enc = szip_encode(raw, opts, bits, j, ppsl)
        assert szip_decode(enc, n, opts, bits, j, ppsl) == raw

    @given(
        n=st.integers(0, 2000),
        ch=st.integers(1, 2),
        n_frames=st.integers(1, 5),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_avi_audio_track_roundtrip(self, n, ch, n_frames, seed):
        from xcube_resampling_spark.extensions.avicodec import (
            decode_avi_audio,
            encode_avi,
        )

        rng = np.random.default_rng(seed)
        audio = rng.integers(-32768, 32768, (max(n, 1), ch)).astype(
            np.int16)
        frames = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
                  for _ in range(n_frames)]
        data = encode_avi(frames, audio=audio, audio_rate=22050)
        got, rate = decode_avi_audio(data)
        assert rate == 22050
        assert (got == audio).all()


class TestFilterChainProperties:
    """Roundtrip invariants for the zarr v2 numcodecs filter chains
    (sources/numcodecs_filters.py) over arbitrary shapes/dtypes."""

    @given(
        n=st.integers(0, 4000),
        dtype=st.sampled_from(["<i2", "<i4", "<i8", ">i4", "<f8"]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_delta_roundtrip_any_ints(self, n, dtype, seed):
        from xcube_resampling_spark.sources.numcodecs_filters import (
            decode_filters,
            encode_filters,
        )

        rng = np.random.default_rng(seed)
        dt = np.dtype(dtype)
        if dt.kind == "f":
            # dyadic rationals: float delta is exact on these
            vals = (rng.integers(-2**30, 2**30, n) / 1024.0).astype(dt)
        else:
            info = np.iinfo(dt)
            vals = rng.integers(info.min, info.max, n,
                                dtype=dt.newbyteorder("=")).astype(dt)
        conf = {"id": "delta", "dtype": dtype}
        enc = encode_filters(vals.tobytes(), [conf])
        assert np.array_equal(
            np.frombuffer(decode_filters(enc, [conf]), dt), vals)

    @given(
        n=st.integers(0, 2000),
        es=st.integers(1, 16),
        extra=st.integers(0, 15),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_shuffle_roundtrip_any_size(self, n, es, extra, seed):
        from xcube_resampling_spark.sources.numcodecs_filters import (
            decode_filters,
            encode_filters,
        )

        rng = np.random.default_rng(seed)
        raw = rng.bytes(n * es + extra)
        conf = {"id": "shuffle", "elementsize": es}
        assert decode_filters(
            encode_filters(raw, [conf]), [conf]) == raw

    @given(
        n=st.integers(0, 1000),
        chain=st.lists(
            st.sampled_from(["delta", "shuffle", "zlib", "zstd",
                             "lz4"]),
            min_size=0, max_size=4),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_arbitrary_chain_roundtrip(self, n, chain, seed):
        from xcube_resampling_spark.sources.numcodecs_filters import (
            decode_filters,
            encode_filters,
        )

        rng = np.random.default_rng(seed)
        vals = rng.integers(-1000, 1000, n, dtype="<i4")
        # well-formed chains put array filters before byte codecs
        # (delta can't view a compressed stream as i4 -- numcodecs
        # rejects that order too)
        chain = sorted(
            chain, key=lambda c: c in ("zlib", "zstd", "lz4"))
        confs = []
        for c in chain:
            if c == "delta":
                confs.append({"id": "delta", "dtype": "<i4"})
            elif c == "shuffle":
                confs.append({"id": "shuffle", "elementsize": 4})
            else:
                confs.append({"id": c})
        raw = vals.tobytes()
        assert decode_filters(
            encode_filters(raw, confs), confs) == raw


class TestKerchunkProperties:
    """Any single-variable classic file maps to references whose
    virtual read reproduces the array (driver-side decode through
    RefChunkStore -- no Spark in the loop, so hypothesis can afford
    many examples)."""

    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        version=st.sampled_from([1, 2, 5]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_netcdf3_refs_cover_array(self, h, w, version, seed,
                                      tmp_path_factory):
        from xcube_resampling_spark.sources.kerchunk import (
            RefChunkStore,
            netcdf3_refs,
        )
        from xcube_resampling_spark.sources.netcdf3 import (
            encode_netcdf3,
        )

        rng = np.random.default_rng(seed)
        data = rng.normal(0, 1, (h, w))
        d = tmp_path_factory.mktemp("kc")
        p = str(d / "f.nc")
        with open(p, "wb") as fp:
            fp.write(encode_netcdf3("v", data, ("y", "x"),
                                    version=version))
        import json as _json

        refs = netcdf3_refs(p)
        store = RefChunkStore(refs)
        za = _json.loads(store.get("v/.zarray"))
        assert za["shape"] == [h, w]
        raw = store.get("v/0.0")
        got = np.frombuffer(raw, za["dtype"]).reshape(h, w)
        np.testing.assert_array_equal(got, data)
