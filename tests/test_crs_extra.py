"""Goldens + roundtrips for the extended CRS registry: web mercator,
polar stereographic, rotated pole.

Golden values are published test points: EPSG:3857 world edge
(20037508.342789244 m), Snyder (1987) numerical example for south polar
stereographic (p. 315, International 1924 ellipsoid), and the CORDEX
EUR-11 rotated-pole property (rotated origin -> 18.0E, 50.75N).
"""

import math
import numpy as np
import pytest

from xcube_resampling_spark.crs import CRS, CRS_WGS84, Transformer


class TestWebMercator:
    def test_known_points(self):
        t = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3857))
        x, y = t.transform(np.array([180.0, 0.0]), np.array([0.0, 45.0]))
        assert x[0] == pytest.approx(20037508.342789244, abs=1e-6)
        assert y[0] == pytest.approx(0.0, abs=1e-9)
        assert y[1] == pytest.approx(5621521.486192066, abs=1e-6)

    def test_roundtrip(self):
        lon = np.linspace(-179.0, 179.0, 41)
        lat = np.linspace(-84.0, 84.0, 41)
        fwd = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3857))
        inv = Transformer.from_crs(CRS.from_epsg(3857), CRS_WGS84)
        x, y = fwd.transform(lon, lat)
        lon2, lat2 = inv.transform(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, atol=1e-10)


class TestPolarStereographic:
    def test_snyder_south_example(self):
        # Snyder 1987 p. 315: International 1924 ellipsoid, lat_ts=-71,
        # lon0=-100; (lat -75, lon 150) -> (-1540033.6, -560526.4)
        cf = dict(
            grid_mapping_name="polar_stereographic",
            latitude_of_projection_origin=-90.0,
            standard_parallel=-71.0,
            straight_vertical_longitude_from_pole=-100.0,
            semi_major_axis=6378388.0,
            inverse_flattening=297.0,
        )
        ps = CRS.from_cf(cf)
        geo = CRS("geographic", "g", ps.ellipsoid)
        x, y = Transformer.from_crs(geo, ps).transform(
            np.array([150.0]), np.array([-75.0])
        )
        assert x[0] == pytest.approx(-1540033.6, abs=0.1)
        assert y[0] == pytest.approx(-560526.4, abs=0.1)
        lon, lat = Transformer.from_crs(ps, geo).transform(x, y)
        assert lon[0] == pytest.approx(150.0, abs=1e-9)
        assert lat[0] == pytest.approx(-75.0, abs=1e-9)

    def test_3413_pole_and_roundtrip(self):
        fwd = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3413))
        x, y = fwd.transform(np.array([-45.0]), np.array([90.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-6)
        assert y[0] == pytest.approx(0.0, abs=1e-6)
        lon = np.array([-45.0, 10.0, -120.0, 170.0])
        lat = np.array([89.0, 75.0, 60.0, 55.0])
        inv = Transformer.from_crs(CRS.from_epsg(3413), CRS_WGS84)
        lon2, lat2 = inv.transform(*fwd.transform(lon, lat))
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_3031_roundtrip(self):
        fwd = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3031))
        inv = Transformer.from_crs(CRS.from_epsg(3031), CRS_WGS84)
        lon = np.array([0.0, 90.0, -170.0, 45.0])
        lat = np.array([-89.0, -75.0, -60.0, -71.0])
        lon2, lat2 = inv.transform(*fwd.transform(lon, lat))
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_scale_true_at_standard_parallel(self):
        # variant B: distances are true at lat_ts; one degree of longitude
        # at 70N spans cos(70 deg) * pi/180 * N(70) on the ellipsoid
        fwd = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3413))
        x, y = fwd.transform(np.array([-45.0, -44.9]), np.array([70.0, 70.0]))
        d = float(np.hypot(x[1] - x[0], y[1] - y[0]))
        a, e2 = 6378137.0, 0.0066943799901413165
        nrad = a / np.sqrt(1 - e2 * np.sin(np.radians(70.0)) ** 2)
        arc = np.cos(np.radians(70.0)) * np.radians(0.1) * nrad
        assert d == pytest.approx(arc, rel=1e-5)


class TestRotatedPole:
    CF = dict(
        grid_mapping_name="rotated_latitude_longitude",
        grid_north_pole_latitude=39.25,
        grid_north_pole_longitude=-162.0,
    )

    def test_cordex_eur11_origin(self):
        # rotated (0, 0) of the EUR-11 pole maps to (18.0E, 50.75N)
        rp = CRS.from_cf(self.CF)
        lon, lat = Transformer.from_crs(rp, CRS_WGS84).transform(
            np.array([0.0]), np.array([0.0])
        )
        assert lon[0] == pytest.approx(18.0, abs=1e-12)
        assert lat[0] == pytest.approx(50.75, abs=1e-12)

    def test_rotated_pole_maps_to_pole_params(self):
        rp = CRS.from_cf(self.CF)
        lon, lat = Transformer.from_crs(rp, CRS_WGS84).transform(
            np.array([0.0]), np.array([90.0])
        )
        assert lat[0] == pytest.approx(39.25, abs=1e-12)
        assert lon[0] == pytest.approx(-162.0, abs=1e-9)

    def test_roundtrip(self):
        rp = CRS.from_cf(self.CF)
        fwd = Transformer.from_crs(CRS_WGS84, rp)
        inv = Transformer.from_crs(rp, CRS_WGS84)
        rng = np.random.default_rng(7)
        lon = rng.uniform(-30.0, 60.0, 200)
        lat = rng.uniform(20.0, 75.0, 200)
        lon2, lat2 = inv.transform(*fwd.transform(lon, lat))
        np.testing.assert_allclose(lon2, lon, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, atol=1e-10)

    def test_is_geographic_but_not_equal_to_wgs84(self):
        rp = CRS.from_cf(self.CF)
        assert rp.is_geographic  # degree-based, like pyproj
        assert not rp.equals(CRS_WGS84)

    def test_cf_roundtrip(self):
        rp = CRS.from_cf(self.CF)
        cf = rp.to_cf()
        assert cf["grid_mapping_name"] == "rotated_latitude_longitude"
        assert CRS.from_cf(cf).equals(rp)


class TestLambertConformalConic:
    def test_snyder_ellipsoidal_example(self):
        """Snyder 'Map Projections -- A Working Manual' sec. 15 numerical
        example (Clarke 1866, lat1 33N, lat2 45N, origin 23N 96W; point
        35N 75W -> x 1,894,410.9  y 1,564,649.5)."""
        from xcube_resampling_spark.crs import (
            CRS, _Ellipsoid, _lcc_forward, _lcc_inverse,
        )

        crs = CRS(
            "lcc", "snyder", _Ellipsoid(6378206.4, 294.978698214),
            params=(("lat_1", 33.0), ("lat_2", 45.0), ("lat_0", 23.0),
                    ("lon_0", -96.0), ("x_0", 0.0), ("y_0", 0.0)),
        )
        x, y = _lcc_forward(crs, -75.0, 35.0)
        assert float(x) == pytest.approx(1894410.9, abs=0.5)
        assert float(y) == pytest.approx(1564649.5, abs=0.5)
        lon, lat = _lcc_inverse(crs, x, y)
        assert float(lon) == pytest.approx(-75.0, abs=1e-9)
        assert float(lat) == pytest.approx(35.0, abs=1e-9)

    def test_lambert93_origin_and_roundtrip(self):
        from xcube_resampling_spark.crs import CRS, Transformer

        l93 = CRS.from_epsg(2154)
        tr = Transformer.from_crs(CRS.from_epsg(4326), l93)
        x, y = tr.transform(np.array([3.0]), np.array([46.5]))
        assert float(x[0]) == pytest.approx(700000.0, abs=1e-6)
        assert float(y[0]) == pytest.approx(6600000.0, abs=1e-6)
        inv = Transformer.from_crs(l93, CRS.from_epsg(4326))
        rng = np.random.default_rng(3)
        lon = rng.uniform(-4, 9, 500)
        lat = rng.uniform(41, 51, 500)
        px, py = tr.transform(lon, lat)
        lon2, lat2 = inv.transform(px, py)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_canada_atlas_roundtrip(self):
        from xcube_resampling_spark.crs import CRS, Transformer

        ca = CRS.from_epsg(3978)
        fwd = Transformer.from_crs(CRS.from_epsg(4326), ca)
        inv = Transformer.from_crs(ca, CRS.from_epsg(4326))
        rng = np.random.default_rng(4)
        lon = rng.uniform(-140, -50, 500)
        lat = rng.uniform(42, 83, 500)
        px, py = fwd.transform(lon, lat)
        lon2, lat2 = inv.transform(px, py)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_cf_roundtrip_and_1sp_degenerate(self):
        from xcube_resampling_spark.crs import CRS, _lcc_setup

        l93 = CRS.from_epsg(2154)
        back = CRS.from_cf(l93.to_cf())
        assert back.kind == "lcc"
        assert back.param("lat_1") == 49.0 and back.param("lat_2") == 44.0
        # 1SP degenerate cone: n == sin(lat_1)
        one = CRS.from_cf(
            {
                "grid_mapping_name": "lambert_conformal_conic",
                "standard_parallel": 40.0,
                "latitude_of_projection_origin": 40.0,
                "longitude_of_central_meridian": 0.0,
            }
        )
        n, _, _ = _lcc_setup(one)
        assert n == pytest.approx(np.sin(np.radians(40.0)), abs=1e-15)


class TestAlbersEqualArea:
    def test_snyder_ellipsoidal_example(self):
        """Snyder sec. 14 numerical example (Clarke 1866, lat1 29.5N,
        lat2 45.5N, origin 23N 96W; point 35N 75W ->
        x 1,885,472.7  y 1,535,925.0)."""
        from xcube_resampling_spark.crs import (
            CRS, _Ellipsoid, _aea_forward, _aea_inverse,
        )

        crs = CRS(
            "aea", "snyder", _Ellipsoid(6378206.4, 294.978698214),
            params=(("lat_1", 29.5), ("lat_2", 45.5), ("lat_0", 23.0),
                    ("lon_0", -96.0), ("x_0", 0.0), ("y_0", 0.0)),
        )
        x, y = _aea_forward(crs, -75.0, 35.0)
        assert float(x) == pytest.approx(1885472.7, abs=0.5)
        assert float(y) == pytest.approx(1535925.0, abs=0.5)
        lon, lat = _aea_inverse(crs, x, y)
        assert float(lon) == pytest.approx(-75.0, abs=1e-9)
        # authalic series is order e^6 -> ~1e-8 deg
        assert float(lat) == pytest.approx(35.0, abs=1e-7)

    def test_conus_roundtrip(self):
        from xcube_resampling_spark.crs import CRS, Transformer

        conus = CRS.from_epsg(5070)
        fwd = Transformer.from_crs(CRS.from_epsg(4326), conus)
        inv = Transformer.from_crs(conus, CRS.from_epsg(4326))
        rng = np.random.default_rng(6)
        lon = rng.uniform(-125, -66, 500)
        lat = rng.uniform(24, 50, 500)
        px, py = fwd.transform(lon, lat)
        lon2, lat2 = inv.transform(px, py)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-7)

    def test_equal_area_property(self):
        """The projection's defining property: a small geodesic cell keeps
        its area (checked via the Jacobian of the forward map)."""
        from xcube_resampling_spark.crs import CRS, _aea_forward

        conus = CRS.from_epsg(5070)
        a = 6378137.0
        e2 = conus.ellipsoid.e2
        lon, lat = -100.0, 40.0
        d = 1e-4
        x0, y0 = _aea_forward(conus, lon, lat)
        x1, y1 = _aea_forward(conus, lon + d, lat)
        x2, y2 = _aea_forward(conus, lon, lat + d)
        jac = abs(
            (float(x1) - float(x0)) * (float(y2) - float(y0))
            - (float(x2) - float(x0)) * (float(y1) - float(y0))
        )
        # true ellipsoidal cell area
        phi = np.radians(lat)
        s = np.sin(phi)
        m_rad = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        n_rad = a / np.sqrt(1 - e2 * s * s)
        cell = (
            m_rad * np.radians(d) * n_rad * np.cos(phi) * np.radians(d)
        )
        assert jac == pytest.approx(cell, rel=1e-5)

    def test_cf_roundtrip(self):
        from xcube_resampling_spark.crs import CRS

        conus = CRS.from_epsg(5070)
        back = CRS.from_cf(conus.to_cf())
        assert back.kind == "aea"
        assert back.param("lat_1") == 29.5 and back.param("lat_2") == 45.5


class TestSinusoidal:
    def test_snyder_sphere_example(self):
        """Snyder (1987) Appendix A sinusoidal sphere example: R = 1,
        lon_0 = -90, point (-75, -50) -> x = 0.1682814, y = -0.8726646."""
        from xcube_resampling_spark.crs import _Ellipsoid, _sinu_forward

        crs = CRS(
            "sinu", "unit sphere", _Ellipsoid(1.0, float("inf")),
            params=(("lon_0", -90.0), ("x_0", 0.0), ("y_0", 0.0)),
        )
        x, y = _sinu_forward(crs, np.array([-75.0]), np.array([-50.0]))
        assert float(x[0]) == pytest.approx(0.1682814, abs=1e-7)
        assert float(y[0]) == pytest.approx(-0.8726646, abs=1e-7)

    def test_northing_matches_krueger_meridian_arc(self):
        """Ellipsoidal sinusoidal northing is the meridian arc (Snyder
        3-21, trig series).  Cross-check against a fully independent
        derivation: the Krueger-series transverse Mercator northing at the
        central meridian with k_0 = 1 is the same arc length."""
        from xcube_resampling_spark.crs import (
            _Ellipsoid, _sinu_forward, _tmerc_forward,
        )

        ell = _Ellipsoid(6378137.0, 298.257223563)
        sinu = CRS("sinu", "s", ell,
                   params=(("lon_0", 0.0), ("x_0", 0.0), ("y_0", 0.0)))
        tm = CRS("tmerc", "t", ell,
                 params=(("k_0", 1.0), ("lat_0", 0.0), ("lon_0", 0.0),
                         ("x_0", 0.0), ("y_0", 0.0)))
        lats = np.array([-80.0, -33.3, 0.0, 12.5, 45.0, 71.2])
        lon0 = np.zeros_like(lats)
        _, y_sinu = _sinu_forward(sinu, lon0, lats)
        _, y_tm = _tmerc_forward(tm, lon0, lats)
        np.testing.assert_allclose(y_sinu, y_tm, atol=1e-6)

    def test_easting_matches_parallel_radius(self):
        """Ellipsoidal easting = nu * cos(phi) * dlam (radius of the
        parallel circle); check against the numerical derivative of the
        independent transverse-Mercator easting at the central meridian."""
        from xcube_resampling_spark.crs import (
            _Ellipsoid, _sinu_forward, _tmerc_forward,
        )

        ell = _Ellipsoid(6378137.0, 298.257223563)
        sinu = CRS("sinu", "s", ell,
                   params=(("lon_0", 0.0), ("x_0", 0.0), ("y_0", 0.0)))
        tm = CRS("tmerc", "t", ell,
                 params=(("k_0", 1.0), ("lat_0", 0.0), ("lon_0", 0.0),
                         ("x_0", 0.0), ("y_0", 0.0)))
        lat = 47.25
        dlon = 1e-5
        x_s, _ = _sinu_forward(sinu, np.array([dlon]), np.array([lat]))
        x_t, _ = _tmerc_forward(tm, np.array([dlon]), np.array([lat]))
        assert float(x_s[0]) == pytest.approx(float(x_t[0]), rel=1e-9)

    def test_roundtrip_ellipsoid_and_sphere(self):
        from xcube_resampling_spark.crs import CRS_SINU_MODIS

        esri = CRS.from_string("ESRI:54008")
        lons = np.array([-179.0, -75.3, 0.0, 9.1, 120.7, 179.5])
        lats = np.array([-82.0, -50.0, 0.0, 53.2, 33.3, 81.0])
        for crs in (esri, CRS_SINU_MODIS):
            t_fwd = Transformer.from_crs(CRS_WGS84, crs)
            t_inv = Transformer.from_crs(crs, CRS_WGS84)
            x, y = t_fwd.transform(lons, lats)
            lon2, lat2 = t_inv.transform(x, y)
            np.testing.assert_allclose(lon2, lons, atol=1e-9)
            np.testing.assert_allclose(lat2, lats, atol=1e-9)

    def test_equal_area_property(self):
        """Sinusoidal is equal-area: forward-map Jacobian == true
        ellipsoidal cell area."""
        from xcube_resampling_spark.crs import _sinu_forward

        crs = CRS.from_string("ESRI:54008")
        a = crs.ellipsoid.a
        e2 = crs.ellipsoid.e2
        lon, lat = 31.0, 52.0
        d = 1e-4
        x0, y0 = _sinu_forward(crs, np.array([lon]), np.array([lat]))
        x1, y1 = _sinu_forward(crs, np.array([lon + d]), np.array([lat]))
        x2, y2 = _sinu_forward(crs, np.array([lon]), np.array([lat + d]))
        jac = abs(
            (float(x1[0]) - float(x0[0])) * (float(y2[0]) - float(y0[0]))
            - (float(x2[0]) - float(x0[0])) * (float(y1[0]) - float(y0[0]))
        )
        phi = np.radians(lat)
        s = np.sin(phi)
        m_rad = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        n_rad = a / np.sqrt(1 - e2 * s * s)
        cell = m_rad * np.radians(d) * n_rad * np.cos(phi) * np.radians(d)
        assert jac == pytest.approx(cell, rel=1e-4)

    def test_modis_tile_origin(self):
        """MODIS grid sanity: the sinusoidal world half-width is
        pi * R = 20015109.354 m (tile h00's west edge)."""
        from xcube_resampling_spark.crs import CRS_SINU_MODIS

        t = Transformer.from_crs(CRS_WGS84, CRS_SINU_MODIS)
        x, y = t.transform(np.array([-180.0]), np.array([0.0]))
        assert float(x[0]) == pytest.approx(-20015109.354, abs=0.01)
        assert float(y[0]) == 0.0

    def test_cf_and_spec_roundtrip(self):
        from xcube_resampling_spark.crs import CRS_SINU_MODIS

        for crs in (CRS.from_string("ESRI:54008"), CRS_SINU_MODIS):
            back = CRS.from_cf(crs.to_cf())
            assert back.kind == "sinu"
            assert back.ellipsoid.e2 == crs.ellipsoid.e2
            spec_back = CRS.from_spec(crs.to_spec())
            assert spec_back.equals(crs)
        cf = CRS_SINU_MODIS.to_cf()
        assert cf.get("earth_radius") == 6371007.181


class TestBritishNationalGrid:
    def test_osgb_worked_example(self):
        """Ordnance Survey 'A guide to coordinate systems in Great
        Britain' worked example: OSGB36 lat 52d39'27.2531\"N,
        lon 1d43'4.5177\"E -> E 651409.903, N 313177.270 (Airy 1830)."""
        from xcube_resampling_spark.crs import _tmerc_forward

        bng = CRS.from_epsg(27700)
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        x, y = _tmerc_forward(bng, np.array([lon]), np.array([lat]))
        assert float(x[0]) == pytest.approx(651409.903, abs=2e-3)
        assert float(y[0]) == pytest.approx(313177.270, abs=2e-3)

    def test_roundtrip_and_origin(self):
        bng = CRS.from_epsg(27700)
        t = Transformer.from_crs(CRS_WGS84, bng)
        ti = Transformer.from_crs(bng, CRS_WGS84)
        lons = np.array([-6.0, -2.0, 0.0, 1.5])
        lats = np.array([50.0, 53.0, 55.5, 58.0])
        x, y = t.transform(lons, lats)
        lon2, lat2 = ti.transform(x, y)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)
        # true origin (49N 2W) maps to the false origin offsets
        x0, y0 = t.transform(np.array([-2.0]), np.array([49.0]))
        assert float(x0[0]) == pytest.approx(400000.0, abs=1e-6)
        assert float(y0[0]) == pytest.approx(-100000.0, abs=1e-6)


class TestEtrs89Utm:
    def test_matches_wgs84_utm_to_sub_mm(self):
        """GRS80 vs WGS84 flattening differs in the 10th digit; the same
        point projects to within a millimeter of WGS84 UTM but NOT
        identically (distinct ellipsoid constants flow through)."""
        a = CRS.from_epsg(25832)
        b = CRS.from_epsg(32632)
        t_a = Transformer.from_crs(CRS_WGS84, a)
        t_b = Transformer.from_crs(CRS_WGS84, b)
        xa, ya = t_a.transform(np.array([9.3]), np.array([52.1]))
        xb, yb = t_b.transform(np.array([9.3]), np.array([52.1]))
        assert abs(float(xa[0] - xb[0])) < 1e-3
        assert abs(float(ya[0] - yb[0])) < 1e-3
        assert a.ellipsoid != b.ellipsoid


class TestWorldMercator:
    def test_snyder_ellipsoidal_example(self):
        """Snyder sec. 7 numerical example (Clarke 1866): phi 35N,
        lam 75W, lon_0 180W -> x = 11688673.7 m, y = 4139145.6 m."""
        from xcube_resampling_spark.crs import (
            _Ellipsoid, _merc_forward,
        )

        crs = CRS(
            "merc", "snyder", _Ellipsoid(6378206.4, 294.978698214),
            params=(("k_0", 1.0), ("lon_0", -180.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        x, y = _merc_forward(crs, np.array([-75.0]), np.array([35.0]))
        assert float(x[0]) == pytest.approx(11688673.7, abs=0.2)
        assert float(y[0]) == pytest.approx(4139145.6, abs=0.2)

    def test_3395_roundtrip_and_equator_scale(self):
        m = CRS.from_epsg(3395)
        t = Transformer.from_crs(CRS_WGS84, m)
        ti = Transformer.from_crs(m, CRS_WGS84)
        lons = np.array([-179.0, -10.0, 0.0, 120.0])
        lats = np.array([-70.0, -5.0, 0.0, 65.0])
        x, y = t.transform(lons, lats)
        lon2, lat2 = ti.transform(x, y)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)
        # the equator is true-scale: x(1 deg) = a * pi/180
        x1, _ = t.transform(np.array([1.0]), np.array([0.0]))
        assert float(x1[0]) == pytest.approx(
            6378137.0 * np.pi / 180.0, rel=1e-12
        )


class TestEaseGrid2:
    def test_world_edge_matches_epsg_bound(self):
        """EPSG:6933's published projected extent is
        x = +-17367530.4451615 m (epsg.io / EPSG registry)."""
        g = CRS.from_epsg(6933)
        t = Transformer.from_crs(CRS_WGS84, g)
        x, y = t.transform(np.array([180.0]), np.array([0.0]))
        assert float(x[0]) == pytest.approx(17367530.4451615, abs=1e-4)
        assert float(y[0]) == 0.0

    def test_equal_area_property_and_roundtrip(self):
        from xcube_resampling_spark.crs import _cea_forward

        g = CRS.from_epsg(6933)
        a, e2 = g.ellipsoid.a, g.ellipsoid.e2
        lon, lat = 11.0, -47.0
        d = 1e-4
        x0, y0 = _cea_forward(g, np.array([lon]), np.array([lat]))
        x1, y1 = _cea_forward(g, np.array([lon + d]), np.array([lat]))
        x2, y2 = _cea_forward(g, np.array([lon]), np.array([lat + d]))
        jac = abs(
            (float(x1[0]) - float(x0[0])) * (float(y2[0]) - float(y0[0]))
            - (float(x2[0]) - float(x0[0])) * (float(y1[0]) - float(y0[0]))
        )
        phi = np.radians(lat)
        s = np.sin(phi)
        m_rad = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        n_rad = a / np.sqrt(1 - e2 * s * s)
        cell = m_rad * np.radians(d) * n_rad * np.cos(phi) * np.radians(d)
        assert jac == pytest.approx(cell, rel=1e-4)
        t = Transformer.from_crs(CRS_WGS84, g)
        ti = Transformer.from_crs(g, CRS_WGS84)
        lons = np.array([-150.0, 0.0, 30.25, 179.0])
        lats = np.array([-80.0, 0.0, 30.0, 84.0])
        x, y = t.transform(lons, lats)
        lon2, lat2 = ti.transform(x, y)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)


class TestEquidistantCylindrical:
    def test_meridian_is_arc_length_and_roundtrip(self):
        """EPSG method 1028 northing is the meridian arc: cross-check
        against the independent Krueger TM northing at the central
        meridian; x at the equator is a * lam."""
        from xcube_resampling_spark.crs import _eqc_forward, _tmerc_forward

        g = CRS.from_epsg(4087)
        tm = CRS(
            "tmerc", "t", g.ellipsoid,
            params=(("k_0", 1.0), ("lat_0", 0.0), ("lon_0", 0.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        lats = np.array([-66.0, -10.0, 0.0, 23.5, 71.0])
        zeros = np.zeros_like(lats)
        _, y_eqc = _eqc_forward(g, zeros, lats)
        _, y_tm = _tmerc_forward(tm, zeros, lats)
        np.testing.assert_allclose(y_eqc, y_tm, atol=1e-6)
        x, _ = _eqc_forward(g, np.array([90.0]), np.array([0.0]))
        assert float(x[0]) == pytest.approx(
            6378137.0 * np.pi / 2, rel=1e-12
        )
        t = Transformer.from_crs(CRS_WGS84, g)
        ti = Transformer.from_crs(g, CRS_WGS84)
        lons = np.array([-170.0, -5.0, 60.0])
        lats = np.array([-75.0, 42.0, 80.0])
        xx, yy = t.transform(lons, lats)
        lon2, lat2 = ti.transform(xx, yy)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)


class TestNewFamiliesCf:
    def test_cf_and_spec_roundtrips(self):
        for code, kind in ((27700, "tmerc"), (3395, "merc"),
                           (6933, "cea"), (4087, "eqc"), (25833, "tmerc")):
            crs = CRS.from_epsg(code)
            assert crs.kind == kind
            back = CRS.from_cf(crs.to_cf())
            assert back.kind == kind
            assert back.ellipsoid.a == crs.ellipsoid.a
            spec_back = CRS.from_spec(crs.to_spec())
            assert spec_back.equals(crs)
        # the spherical-mercator CF mapping still decodes as webmerc
        wm = CRS.from_epsg(3857)
        assert CRS.from_cf(wm.to_cf()).kind == "webmerc"


class TestDatumShift:
    def test_epsg_9606_worked_example(self):
        """EPSG Guidance Note 7-2 position-vector example (WGS72 ->
        WGS84): dz = +4.5 m, rz = +0.554\", ds = +0.219 ppm applied to
        (3657660.66, 255768.55, 5201382.11) gives
        (3657660.78, 255778.43, 5201387.75)."""
        from xcube_resampling_spark.crs import _helmert

        X, Y, Z = _helmert(
            (0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219),
            np.array([3657660.66]), np.array([255768.55]),
            np.array([5201382.11]),
        )
        assert float(X[0]) == pytest.approx(3657660.78, abs=0.01)
        assert float(Y[0]) == pytest.approx(255778.43, abs=0.01)
        assert float(Z[0]) == pytest.approx(5201387.75, abs=0.01)

    def test_geocentric_roundtrip(self):
        from xcube_resampling_spark.crs import (
            _Ellipsoid, _geocentric_to_geodetic, _geodetic_to_geocentric,
        )

        ell = _Ellipsoid(6378137.0, 298.257223563)
        lons = np.array([-170.0, -10.0, 0.0, 45.5, 179.0])
        lats = np.array([-85.0, -33.0, 0.0, 52.1, 88.0])
        X, Y, Z = _geodetic_to_geocentric(ell, lons, lats)
        lon2, lat2 = _geocentric_to_geodetic(ell, X, Y, Z)
        np.testing.assert_allclose(lon2, lons, atol=1e-11)
        np.testing.assert_allclose(lat2, lats, atol=1e-11)

    def test_helmert_seven_param_roundtrip(self):
        from xcube_resampling_spark.crs import _helmert

        p = (-87.0, -98.0, -121.0, 0.4, -0.3, 0.6, 1.2)
        X = np.array([3900000.0]); Y = np.array([300000.0])
        Z = np.array([5000000.0])
        X2, Y2, Z2 = _helmert(p, X, Y, Z)
        X3, Y3, Z3 = _helmert(p, X2, Y2, Z2, inverse=True)
        np.testing.assert_allclose(
            [float(X3[0]), float(Y3[0]), float(Z3[0])],
            [float(X[0]), float(Y[0]), float(Z[0])], atol=1e-9,
        )

    def test_ed50_utm_shift_magnitude_and_roundtrip(self):
        """ED50 vs WGS84 in central Europe differs by ~100-250 m on the
        ground; the same WGS84 point must land at measurably different
        UTM coordinates in EPSG:23032 vs EPSG:32632, and the transform
        must invert to sub-mm."""
        ed = CRS.from_epsg(23032)
        wgs = CRS.from_epsg(32632)
        assert ed.towgs84 == (-87.0, -98.0, -121.0)
        fwd = Transformer.from_crs(CRS_WGS84, ed)
        inv = Transformer.from_crs(ed, CRS_WGS84)
        lons = np.array([9.0]); lats = np.array([52.0])
        xe, ye = fwd.transform(lons, lats)
        xw, yw = Transformer.from_crs(CRS_WGS84, wgs).transform(lons, lats)
        shift = float(np.hypot(xe - xw, ye - yw)[0])
        assert 50.0 < shift < 300.0
        lon2, lat2 = inv.transform(xe, ye)
        np.testing.assert_allclose(lon2, lons, atol=1e-9)
        np.testing.assert_allclose(lat2, lats, atol=1e-9)

    def test_geographic_to_geographic_datum_shift(self):
        """An ED50 geographic CRS shifts lon/lat even though both ends
        are 'geographic'."""
        from xcube_resampling_spark.crs import _Ellipsoid, _ELLIPSOIDS

        ed50_geo = CRS(
            "geographic", "ED50", _Ellipsoid(*_ELLIPSOIDS["Intl1924"]),
            towgs84=(-87.0, -98.0, -121.0),
        )
        t = Transformer.from_crs(ed50_geo, CRS_WGS84)
        lon, lat = t.transform(np.array([9.0]), np.array([52.0]))
        # ED50 coordinates sit NE of WGS84 ones in Europe: converting the
        # numeric values to WGS84 moves them south-west by ~1-4 arcsec
        assert float(lon[0]) < 9.0
        assert float(lat[0]) < 52.0
        assert abs(float(lat[0]) - 52.0) * 3600 < 10
        # projection-only CRSs (no towgs84) keep the fast identity path
        t2 = Transformer.from_crs(CRS_WGS84, CRS.from_string("CRS84"))
        x, y = t2.transform(np.array([9.0]), np.array([52.0]))
        assert float(x[0]) == 9.0 and float(y[0]) == 52.0

    def test_spec_roundtrip_with_towgs84(self):
        ed = CRS.from_epsg(23032)
        back = CRS.from_spec(ed.to_spec())
        assert back.equals(ed)
        assert back.towgs84 == (-87.0, -98.0, -121.0)
        # old 6-field specs (no towgs84 tail) still parse
        legacy = "|".join(CRS.from_epsg(32632).to_spec().split("|")[:6])
        assert CRS.from_spec(legacy).kind == "tmerc"


class TestGeostationary:
    def test_goes_pug_worked_example(self):
        """GOES-R ABI PUG Vol 3 sec 5.1.2.8 worked example (GRS80,
        h = 35786023, lon_0 = -75, sweep x): scan angles
        (x, y) = (-0.024052, 0.095340) rad map to
        (lat, lon) = (33.846162, -84.690932)."""
        h = 35786023.0
        g = CRS.geostationary(
            lon_0=-75.0, sweep="x", h=h, ellipsoid="GRS80"
        )
        inv = Transformer.from_crs(g, CRS_WGS84)
        lon, lat = inv.transform(
            np.array([-0.024052 * h]), np.array([0.095340 * h])
        )
        assert float(lon[0]) == pytest.approx(-84.690932, abs=1e-5)
        assert float(lat[0]) == pytest.approx(33.846162, abs=1e-5)
        # forward of the same ground point returns the scan angles
        fwd = Transformer.from_crs(CRS_WGS84, g)
        x, y = fwd.transform(np.array([-84.690932]), np.array([33.846162]))
        assert float(x[0]) / h == pytest.approx(-0.024052, abs=1e-6)
        assert float(y[0]) / h == pytest.approx(0.095340, abs=1e-6)

    def test_spherical_closed_form(self):
        """Independent plane-trig derivation on a sphere: a point at
        geocentric angle psi from nadir subtends
        atan(sin(psi) / (radius_g - cos(psi))) at the satellite."""
        import math

        from xcube_resampling_spark.crs import _Ellipsoid, _geos_forward

        h, a = 35785831.0, 6378137.0
        sph = CRS(
            "geos", "s", _Ellipsoid(a, float("inf")),
            params=(("h", h), ("lon_0", 0.0), ("sweep_x", 0.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        rg = 1.0 + h / a
        for psi_deg in (5.0, 30.0, 60.0):
            psi = math.radians(psi_deg)
            expect = h * math.atan(math.sin(psi) / (rg - math.cos(psi)))
            # along the equator: x carries the angle, y = 0
            x, y = _geos_forward(
                sph, np.array([psi_deg]), np.array([0.0])
            )
            assert float(x[0]) == pytest.approx(expect, rel=1e-12)
            assert float(y[0]) == 0.0
            # along the central meridian: y carries it, x = 0
            x, y = _geos_forward(
                sph, np.array([0.0]), np.array([psi_deg])
            )
            assert float(y[0]) == pytest.approx(expect, rel=1e-12)
            assert float(x[0]) == 0.0

    def test_roundtrip_both_sweeps(self):
        lons = np.array([-80.0, -75.0, -60.0, -40.0])
        lats = np.array([10.0, 0.0, 45.0, -55.0])
        for sweep in ("x", "y"):
            g = CRS.geostationary(lon_0=-75.0, sweep=sweep)
            fwd = Transformer.from_crs(CRS_WGS84, g)
            inv = Transformer.from_crs(g, CRS_WGS84)
            x, y = fwd.transform(lons, lats)
            lon2, lat2 = inv.transform(x, y)
            np.testing.assert_allclose(lon2, lons, atol=1e-9)
            np.testing.assert_allclose(lat2, lats, atol=1e-9)
        # nadir maps to the grid origin for both sweeps
        x, y = fwd.transform(np.array([-75.0]), np.array([0.0]))
        assert float(x[0]) == 0.0 and float(y[0]) == 0.0

    def test_far_side_is_nan(self):
        """Points beyond the horizon (the far side of the Earth) are not
        visible from the satellite and must come back NaN, not a bogus
        coordinate."""
        g = CRS.geostationary(lon_0=0.0, sweep="y")
        fwd = Transformer.from_crs(CRS_WGS84, g)
        x, y = fwd.transform(
            np.array([178.0, 0.0]), np.array([0.0, 10.0])
        )
        assert np.isnan(x[0]) and np.isnan(y[0])
        assert np.isfinite(x[1]) and np.isfinite(y[1])

    def test_cf_roundtrip_and_legacy_fixed_angle(self):
        g = CRS.geostationary(lon_0=9.5, sweep="y", h=35785831.0)
        cf = g.to_cf()
        assert cf["grid_mapping_name"] == "geostationary"
        assert cf["sweep_angle_axis"] == "y"
        back = CRS.from_cf(cf)
        assert back.kind == "geos"
        assert back.param("sweep_x") == 0.0
        assert back.param("h") == 35785831.0
        # legacy CF 1.6 encoding: fixed_angle_axis is the OTHER axis
        legacy = {k: v for k, v in cf.items() if k != "sweep_angle_axis"}
        legacy["fixed_angle_axis"] = "x"
        assert CRS.from_cf(legacy).param("sweep_x") == 0.0
        spec_back = CRS.from_spec(g.to_spec())
        assert spec_back.equals(g)


class TestObliqueMercator:
    def test_epsg_gn72_worked_example(self):
        """EPSG Guidance Note 7-2, Hotine Oblique Mercator variant B
        worked example: Timbalai 1948 / RSO Borneo (m), EPSG:29873.
        phi = 5d23'14.1129"N, lam = 115d48'19.8196"E ->
        E = 679245.73, N = 596562.78."""
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        crs = CRS.from_epsg(29873)
        geo = CRS("geographic", "Timbalai geographic", crs.ellipsoid, ())
        lat = 5 + 23 / 60 + 14.1129 / 3600
        lon = 115 + 48 / 60 + 19.8196 / 3600
        x, y = Transformer.from_crs(geo, crs).transform(
            np.array([lon]), np.array([lat])
        )
        assert abs(x[0] - 679245.73) < 0.01
        assert abs(y[0] - 596562.78) < 0.01
        lo, la = Transformer.from_crs(crs, geo).transform(x, y)
        np.testing.assert_allclose(lo, [lon], atol=1e-9)
        np.testing.assert_allclose(la, [lat], atol=1e-9)

    def test_center_maps_to_false_coordinates(self):
        """Variant B: the projection CENTER (lat_0, lonc) maps exactly
        to (Ec, Nc)."""
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        crs = CRS.from_epsg(29873)
        geo = CRS("geographic", "g", crs.ellipsoid, ())
        x, y = Transformer.from_crs(geo, crs).transform(
            np.array([115.0]), np.array([4.0])
        )
        assert abs(x[0] - 590476.87) < 1e-6
        assert abs(y[0] - 442857.65) < 1e-6

    def test_cf_roundtrip(self):
        from xcube_resampling_spark.crs import CRS

        crs = CRS.from_epsg(29873)
        back = CRS.from_cf(crs.to_cf())
        assert back.kind == "omerc"
        assert abs(back.param("alpha") - crs.param("alpha")) < 1e-12
        assert abs(back.param("gamma") - crs.param("gamma")) < 1e-12
        assert back.param("x_0") == crs.param("x_0")

    def test_alpha_90_special_case_rejected_clearly(self):
        import pytest

        from xcube_resampling_spark.crs import CRS, _Ellipsoid, _ELLIPSOIDS
        from xcube_resampling_spark.crs import _omerc_setup

        swiss = CRS(
            "omerc", "alpha-90", _Ellipsoid(*_ELLIPSOIDS["WGS84"]),
            params=(("k_0", 1.0), ("lat_0", 46.95), ("lonc", 7.44),
                    ("alpha", 90.0), ("gamma", 90.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        with pytest.raises(NotImplementedError, match="alpha"):
            _omerc_setup(swiss)


class TestSwissObliqueMercator:
    def test_center_maps_to_false_origin(self):
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        for code, e0, n0 in ((2056, 2600000.0, 1200000.0),
                             (21781, 600000.0, 200000.0)):
            crs = CRS.from_epsg(code)
            g = CRS("geographic", "g", crs.ellipsoid, ())
            lat0 = 46 + 57 / 60 + 8.66 / 3600
            lon0 = 7 + 26 / 60 + 22.5 / 3600
            x, y = Transformer.from_crs(g, crs).transform(
                np.array([lon0]), np.array([lat0])
            )
            assert abs(x[0] - e0) < 1e-6
            assert abs(y[0] - n0) < 1e-6

    def test_cross_check_against_hotine_limit(self):
        """Independent validation: EPSG lists CH1903+/LV95 as
        representable either via method 9814 (this implementation,
        Rosenmund double projection) or as Hotine variant B with
        azimuth 90.  The generic aposphere omerc at alpha =
        90 - 1e-7 deg must agree with somerc to ~1 cm across all of
        Switzerland (the residual is exactly the alpha perturbation,
        ~1.1 cm per 100 km)."""
        import numpy as np

        from xcube_resampling_spark.crs import (
            CRS, Transformer, _Ellipsoid, _ELLIPSOIDS,
        )

        sw = CRS.from_epsg(2056)
        g = CRS("geographic", "g", sw.ellipsoid, ())
        lat0 = 46 + 57 / 60 + 8.66 / 3600
        lon0 = 7 + 26 / 60 + 22.5 / 3600
        hom = CRS(
            "omerc", "swiss-as-hotine",
            _Ellipsoid(*_ELLIPSOIDS["Bessel1841"]),
            params=(("k_0", 1.0), ("lat_0", lat0), ("lonc", lon0),
                    ("alpha", 89.9999999), ("gamma", 89.9999999),
                    ("x_0", 2600000.0), ("y_0", 1200000.0)),
        )
        lo = np.linspace(6.0, 10.4, 9)
        la = np.linspace(45.9, 47.7, 9)
        LO, LA = np.meshgrid(lo, la)
        xs, ys = Transformer.from_crs(g, sw).transform(
            LO.ravel(), LA.ravel()
        )
        xh, yh = Transformer.from_crs(g, hom).transform(
            LO.ravel(), LA.ravel()
        )
        assert np.abs(xs - xh).max() < 0.02
        assert np.abs(ys - yh).max() < 0.02

    def test_roundtrip_wide_domain(self):
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        crs = CRS.from_epsg(21781)
        g = CRS("geographic", "g", crs.ellipsoid, ())
        lo = np.linspace(-50.0, 65.0, 20)
        la = np.linspace(-55.0, 55.0, 20)
        LO, LA = np.meshgrid(lo, la)
        x, y = Transformer.from_crs(g, crs).transform(
            LO.ravel(), LA.ravel()
        )
        lo2, la2 = Transformer.from_crs(crs, g).transform(x, y)
        np.testing.assert_allclose(lo2, LO.ravel(), atol=1e-9)
        np.testing.assert_allclose(la2, LA.ravel(), atol=1e-9)


class TestKrovak:
    def test_epsg_gn72_worked_example(self):
        """EPSG Guidance Note 7-2 Krovak worked example (S-JTSK):
        phi = 50d12'32.4416"N, lam = 34d30'59.1790" East of Ferro ->
        Southing 1050538.63, Westing 568991.00; EPSG:5514 East-North
        negates both."""
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        crs = CRS.from_epsg(5514)
        g = CRS("geographic", "g", crs.ellipsoid, ())
        lat = 50 + 12 / 60 + 32.4416 / 3600
        lon = (34 + 30 / 60 + 59.1790 / 3600) - (17 + 40 / 60)
        x, y = Transformer.from_crs(g, crs).transform(
            np.array([lon]), np.array([lat])
        )
        assert abs(x[0] - (-568991.00)) < 0.02
        assert abs(y[0] - (-1050538.63)) < 0.02
        lo, la = Transformer.from_crs(crs, g).transform(x, y)
        np.testing.assert_allclose(lo, [lon], atol=1e-9)
        np.testing.assert_allclose(la, [lat], atol=1e-9)

    def test_czechia_has_negative_east_north(self):
        """The whole of Czechia/Slovakia lands in the negative E/N
        quadrant under EPSG:5514 -- the standard sanity check for
        Krovak East North axes."""
        import numpy as np

        from xcube_resampling_spark.crs import CRS, Transformer

        crs = CRS.from_epsg(5514)
        g = CRS("geographic", "g", crs.ellipsoid, ())
        LO, LA = np.meshgrid(np.linspace(12.1, 22.5, 8),
                             np.linspace(47.8, 51.0, 8))
        x, y = Transformer.from_crs(g, crs).transform(
            LO.ravel(), LA.ravel()
        )
        assert (x < 0).all() and (y < 0).all()
        assert (-950000 < x).all() and (-1350000 < y).all()


class TestSouthernHemisphereNationalGrids:
    """EPSG:2193 (NZTM2000), EPSG:3577 (Australian Albers), EPSG:3112
    (GA Lambert): southern-hemisphere parameterizations of the already
    golden-verified tmerc/aea/lcc machinery -- origin anchors and
    machine-precision roundtrips over each grid's home territory."""

    def test_origins_and_roundtrips(self):
        import numpy as np

        from xcube_resampling_spark.crs import CRS, CRS_WGS84, Transformer

        cases = [
            (2193, 173.0, 1600000.0, 10000000.0, (166, 179, -47, -34)),
            (3577, 132.0, 0.0, 0.0, (113, 154, -44, -10)),
            (3112, 134.0, 0.0, 0.0, (113, 154, -44, -10)),
        ]
        for code, lon0, fe, fn, (w, e, s, n) in cases:
            crs = CRS.from_epsg(code)
            fwd = Transformer.from_crs(CRS_WGS84, crs)
            inv = Transformer.from_crs(crs, CRS_WGS84)
            ox, oy = fwd.transform(np.array([lon0]), np.array([0.0]))
            assert abs(ox[0] - fe) < 1e-6, code
            assert abs(oy[0] - fn) < 1e-6, code
            LO, LA = np.meshgrid(np.linspace(w, e, 8),
                                 np.linspace(s, n, 8))
            x, y = fwd.transform(LO.ravel(), LA.ravel())
            lo2, la2 = inv.transform(x, y)
            np.testing.assert_allclose(lo2, LO.ravel(), atol=1e-7)
            np.testing.assert_allclose(la2, LA.ravel(), atol=1e-7)

    def test_nztm_false_northing_keeps_coords_positive(self):
        import numpy as np

        from xcube_resampling_spark.crs import CRS, CRS_WGS84, Transformer

        crs = CRS.from_epsg(2193)
        x, y = Transformer.from_crs(CRS_WGS84, crs).transform(
            np.array([174.7772]), np.array([-41.2889])  # Wellington
        )
        assert 1_000_000 < x[0] < 2_100_000
        assert 4_700_000 < y[0] < 6_300_000


class TestOrthographic:
    """Ellipsoidal orthographic (EPSG method 9840; crs.py _ortho_*).

    Golden: the IOGP Guidance Note 7-2 worked example for the
    Orthographic method -- WGS 84, origin 55N 5E, FE = FN = 0; the
    point 53d48'33.82"N 2d07'46.38"E maps to
    E = -189011.711 m, N = -128640.567 m.
    """

    LAT = 53 + 48 / 60 + 33.82 / 3600
    LON = 2 + 7 / 60 + 46.38 / 3600

    def test_epsg_gn72_worked_example(self):
        crs = CRS.orthographic(lat_0=55.0, lon_0=5.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([self.LON]), np.array([self.LAT]))
        assert float(x[0]) == pytest.approx(-189011.711, abs=0.01)
        assert float(y[0]) == pytest.approx(-128640.567, abs=0.01)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        lo, la = inv.transform(x, y)
        assert float(lo[0]) == pytest.approx(self.LON, abs=1e-9)
        assert float(la[0]) == pytest.approx(self.LAT, abs=1e-9)

    def test_origin_maps_to_false_coordinates(self):
        crs = CRS.orthographic(
            lat_0=-33.0, lon_0=151.0,
            false_easting=10000.0, false_northing=20000.0,
        )
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([151.0]), np.array([-33.0]))
        assert float(x[0]) == pytest.approx(10000.0, abs=1e-6)
        assert float(y[0]) == pytest.approx(20000.0, abs=1e-6)

    def test_spherical_limit_closed_form(self):
        """On a sphere the orthographic forward is Snyder (1987)
        eq. 20-3/20-4: x = R cosphi sin(lam), y = R (cosphi1 sinphi
        - sinphi1 cosphi cos lam) -- the ellipsoidal machinery must
        reduce to it exactly when e2 = 0."""
        import math

        from xcube_resampling_spark.crs import _Ellipsoid, _ortho_forward

        R = 6370997.0
        sph = CRS(
            "ortho", "s", _Ellipsoid(R, float("inf")),
            params=(("lat_0", 40.0), ("lon_0", -100.0),
                    ("x_0", 0.0), ("y_0", 0.0)),
        )
        phi1, lam0 = math.radians(40.0), -100.0
        for lon, lat in ((-110.0, 30.0), (-75.0, 55.0), (-100.0, 40.0)):
            phi = math.radians(lat)
            lam = math.radians(lon - lam0)
            ex = R * math.cos(phi) * math.sin(lam)
            ey = R * (math.cos(phi1) * math.sin(phi)
                      - math.sin(phi1) * math.cos(phi) * math.cos(lam))
            x, y = _ortho_forward(sph, np.array([lon]), np.array([lat]))
            assert float(x[0]) == pytest.approx(ex, abs=1e-6)
            assert float(y[0]) == pytest.approx(ey, abs=1e-6)

    def test_back_hemisphere_is_nan(self):
        crs = CRS.orthographic(lat_0=55.0, lon_0=5.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([-175.0]), np.array([-55.0]))
        assert np.isnan(x[0]) and np.isnan(y[0])

    def test_roundtrip_visible_disk(self):
        """Machine-precision closure over the visible hemisphere,
        including near-limb points where the Newton iteration is
        damped by the fold of the forward map."""
        crs = CRS.orthographic(lat_0=55.0, lon_0=5.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(7)
        lons = rng.uniform(-180.0, 180.0, 4000)
        lats = rng.uniform(-90.0, 90.0, 4000)
        x, y = fwd.transform(lons, lats)
        vis = ~np.isnan(x)
        assert vis.sum() > 1000
        lo, la = inv.transform(x[vis], y[vis])
        np.testing.assert_allclose(lo, lons[vis], atol=1e-9)
        np.testing.assert_allclose(la, lats[vis], atol=1e-9)

    def test_cf_and_spec_roundtrip(self):
        crs = CRS.orthographic(lat_0=55.0, lon_0=5.0)
        assert CRS.from_cf(crs.to_cf()).equals(crs)
        assert CRS.from_spec(crs.to_spec()).equals(crs)
        assert crs.to_cf()["grid_mapping_name"] == "orthographic"


class TestMollweide:
    """Mollweide (Snyder 1987 sec. 31; PROJ 'moll', ESRI:54009)."""


    def test_defining_equations_hold(self):
        """Independent verification: for engine output (x, y), recover
        theta from y and check BOTH Snyder defining equations
        (2t + sin 2t = pi sin phi, and the x formula) via bisection --
        a different solver than the engine's Newton iteration."""
        crs = CRS.from_user_input("ESRI:54009")
        a = crs.ellipsoid.a
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        for lon, lat in [(-75.0, 50.0), (12.0, -33.0), (179.0, 80.0),
                         (-140.0, -5.0)]:
            x, y = fwd.transform(np.array([lon]), np.array([lat]))
            phi = math.radians(lat)
            # bisection on 2t + sin 2t = pi sin phi over [-pi/2, pi/2]
            lo, hi = -math.pi / 2, math.pi / 2
            for _ in range(200):
                mid = (lo + hi) / 2
                if 2 * mid + math.sin(2 * mid) < math.pi * math.sin(phi):
                    lo = mid
                else:
                    hi = mid
            t = (lo + hi) / 2
            ex = a * (2 * math.sqrt(2) / math.pi) * math.radians(lon) \
                * math.cos(t)
            ey = a * math.sqrt(2) * math.sin(t)
            assert float(x[0]) == pytest.approx(ex, abs=1e-5)
            assert float(y[0]) == pytest.approx(ey, abs=1e-5)

    def test_published_world_extent(self):
        """World Mollweide bounds: x_max = 2*sqrt(2)*a at (180, 0) and
        y_max = sqrt(2)*a at the pole (the ESRI:54009 published extent
        +-18040095.7 / +-9020047.85 for a = 6378137)."""
        crs = CRS.from_user_input("ESRI:54009")
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([180.0, 0.0]), np.array([0.0, 90.0]))
        assert float(x[0]) == pytest.approx(18040095.696, abs=1e-2)
        assert float(y[1]) == pytest.approx(9020047.848, abs=1e-2)

    def test_equal_area_property(self):
        """The area scale factor of the sphere->plane map is 1
        everywhere (finite differences on the R = a sphere)."""
        crs = CRS.mollweide()
        a = crs.ellipsoid.a
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        rng = np.random.default_rng(3)
        lons = rng.uniform(-170, 170, 50)
        lats = rng.uniform(-80, 80, 50)
        d = 1e-5
        x0, y0 = fwd.transform(lons, lats)
        xl, yl = fwd.transform(lons + d, lats)
        xp, yp = fwd.transform(lons, lats + d)
        jac = np.abs(
            (xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)
        ) / np.radians(d) ** 2
        sphere = a * a * np.cos(np.radians(lats))
        np.testing.assert_allclose(jac, sphere, rtol=1e-4)

    def test_roundtrip_and_interchange(self):
        crs = CRS.mollweide(lon_0=10.0, false_easting=100.0,
                            false_northing=-200.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(5)
        lons = rng.uniform(-180, 180, 2000)
        lats = rng.uniform(-89.9, 89.9, 2000)
        x, y = fwd.transform(lons, lats)
        lo, la = inv.transform(x, y)
        np.testing.assert_allclose(lo, lons, atol=1e-8)
        np.testing.assert_allclose(la, lats, atol=1e-8)
        assert CRS.from_string(crs.to_wkt()).params == crs.params
        assert CRS.from_string(crs.to_proj()).params == crs.params
        # CF carries it as crs_wkt only (no CF grid_mapping_name)
        cf = crs.to_cf()
        assert "grid_mapping_name" not in cf
        back = CRS.from_cf(cf)
        assert back.kind == "moll" and back.params == crs.params

    def test_poles_map_all_longitudes_to_zero_x(self):
        crs = CRS.mollweide()
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([-120.0, 30.0, 180.0]),
                             np.array([90.0, 90.0, -90.0]))
        np.testing.assert_allclose(x, 0.0, atol=1e-6)


class TestEqualEarth:
    """Equal Earth (EPSG method 1078; Savric/Patterson/Jenny 2019)."""

    def test_published_equatorial_extent(self):
        """EPSG:8857's published projected extent: x = +-17243959.06 m
        at (lon 180, lat 0) -- pins Rq and the polynomial at theta=0."""
        crs = CRS.from_epsg(8857)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([180.0]), np.array([0.0]))
        assert float(x[0]) == pytest.approx(17243959.06, abs=0.5)
        assert float(y[0]) == pytest.approx(0.0, abs=1e-9)

    def test_equal_area_on_the_ellipsoid(self):
        """Area scale vs the WGS84 ELLIPSOID surface element
        (a^2 (1-e2) cos(phi) / (1 - e2 sin^2 phi)^2) is exactly 1 --
        the defining property EPSG method 1078 preserves by going
        through the authalic latitude."""
        crs = CRS.from_epsg(8857)
        ell = crs.ellipsoid
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        rng = np.random.default_rng(11)
        lons = rng.uniform(-170, 170, 50)
        lats = rng.uniform(-80, 80, 50)
        d = 1e-5
        x0, y0 = fwd.transform(lons, lats)
        xl, yl = fwd.transform(lons + d, lats)
        xp, yp = fwd.transform(lons, lats + d)
        jac = np.abs(
            (xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)
        ) / np.radians(d) ** 2
        s = np.sin(np.radians(lats))
        ell_elem = (
            ell.a * ell.a * (1 - ell.e2) * np.cos(np.radians(lats))
            / (1 - ell.e2 * s * s) ** 2
        )
        np.testing.assert_allclose(jac, ell_elem, rtol=1e-4)

    def test_zone_variants_shift_longitude_origin(self):
        g = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(8857))
        am = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(8858))
        xg, yg = g.transform(np.array([-90.0]), np.array([37.0]))
        xa, ya = am.transform(np.array([-90.0]), np.array([37.0]))
        assert float(xa[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(ya[0]) == pytest.approx(float(yg[0]), abs=1e-6)

    def test_roundtrip_and_interchange(self):
        crs = CRS.from_epsg(8859)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(13)
        lons = rng.uniform(-180, 180, 2000)
        lats = rng.uniform(-89.9, 89.9, 2000)
        x, y = fwd.transform(lons, lats)
        lo, la = inv.transform(x, y)
        np.testing.assert_allclose(lo, lons, atol=1e-8)
        # authalic series truncation: ~1e-8 deg, same order as LAEA
        np.testing.assert_allclose(la, lats, atol=1e-6)
        assert CRS.from_string(crs.to_wkt()).params == crs.params
        assert CRS.from_string(crs.to_proj()).params == crs.params
        cf = crs.to_cf()
        assert "grid_mapping_name" not in cf
        back = CRS.from_cf(cf)
        assert back.kind == "eqearth" and back.params == crs.params

    def test_sphere_fallback(self):
        """A spherical ellipsoid short-circuits the authalic machinery
        (beta = phi, Rq = a) without dividing by e = 0."""
        import dataclasses

        from xcube_resampling_spark.crs import _Ellipsoid

        crs = dataclasses.replace(
            CRS.equal_earth(),
            ellipsoid=_Ellipsoid(6371008.7714, float("inf")))
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        x, y = fwd.transform(np.array([33.0]), np.array([21.0]))
        lo, la = inv.transform(x, y)
        assert float(lo[0]) == pytest.approx(33.0, abs=1e-9)
        assert float(la[0]) == pytest.approx(21.0, abs=1e-9)


class TestObliqueStereographic:
    """EPSG method 9809 (double stereographic via the conformal sphere);
    Amersfoort / RD New, the Dutch national grid."""

    def test_epsg_gn72_worked_example(self):
        """EPSG Guidance Note 7-2 worked example: Amersfoort / RD New,
        phi = 53 N, lambda = 6 E -> E 196105.283, N 557057.739 (Bessel
        1841, k0 = 0.9999079, FE/FN 155000/463000)."""
        rd = CRS.from_epsg(28992)
        amersfoort = CRS("geographic", "Amersfoort", rd.ellipsoid,
                         towgs84=rd.towgs84)
        fwd = Transformer.from_crs(amersfoort, rd)
        x, y = fwd.transform(np.array([6.0]), np.array([53.0]))
        assert float(x[0]) == pytest.approx(196105.283, abs=1e-3)
        assert float(y[0]) == pytest.approx(557057.739, abs=1e-3)
        inv = Transformer.from_crs(rd, amersfoort)
        lo, la = inv.transform(x, y)
        assert float(lo[0]) == pytest.approx(6.0, abs=1e-9)
        assert float(la[0]) == pytest.approx(53.0, abs=1e-9)

    def test_origin_scale_and_false_coordinates(self):
        """The natural origin maps to (FE, FN) and the point scale
        there is k0 (finite differences, isotropic by conformality)."""
        rd = CRS.from_epsg(28992)
        g = CRS("geographic", "Amersfoort", rd.ellipsoid)
        rd_nodatum = CRS(rd.kind, rd.name, rd.ellipsoid, rd.params)
        fwd = Transformer.from_crs(g, rd_nodatum)
        lat0 = 52.0 + 9.0 / 60 + 22.178 / 3600
        lon0 = 5.0 + 23.0 / 60 + 15.5 / 3600
        x, y = fwd.transform(np.array([lon0]), np.array([lat0]))
        assert float(x[0]) == pytest.approx(155000.0, abs=1e-6)
        assert float(y[0]) == pytest.approx(463000.0, abs=1e-6)
        # meridional scale at the origin vs the ellipsoid's rho
        # (central difference: forward-difference truncation alone is
        # ~1e-7 here because the scale's minimum sits at the origin)
        d = 1e-5
        x2, y2 = fwd.transform(np.array([lon0]), np.array([lat0 + d]))
        xm, ym = fwd.transform(np.array([lon0]), np.array([lat0 - d]))
        ell = rd.ellipsoid
        s0 = math.sin(math.radians(lat0))
        rho = ell.a * (1 - ell.e2) / (1 - ell.e2 * s0 * s0) ** 1.5
        k = float(np.hypot(x2 - xm, y2 - ym)[0]) / (
            2 * math.radians(d) * rho)
        assert k == pytest.approx(0.9999079, abs=1e-8)

    def test_conformality(self):
        """Finite-difference Jacobian is a similarity transform
        (equal singular values) away from the origin -- the defining
        property of a conformal projection."""
        rd = CRS.from_epsg(28992)
        g = CRS("geographic", "g", rd.ellipsoid)
        fwd = Transformer.from_crs(g, CRS(rd.kind, rd.name, rd.ellipsoid,
                                          rd.params))
        rng = np.random.default_rng(17)
        lons = 5.4 + rng.uniform(-25, 25, 40)
        lats = 52.2 + rng.uniform(-25, 25, 40)
        d = 1e-6
        x0, y0 = fwd.transform(lons, lats)
        xl, yl = fwd.transform(lons + d, lats)
        xp, yp = fwd.transform(lons, lats + d)
        ell = rd.ellipsoid
        s = np.sin(np.radians(lats))
        nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
        rho = ell.a * (1 - ell.e2) / (1 - ell.e2 * s * s) ** 1.5
        # scale along parallel and along meridian, in metres per metre
        k_par = np.hypot(xl - x0, yl - y0) / (
            np.radians(d) * nu * np.cos(np.radians(lats)))
        k_mer = np.hypot(xp - x0, yp - y0) / (np.radians(d) * rho)
        np.testing.assert_allclose(k_par, k_mer, rtol=1e-5)

    def test_wide_domain_roundtrip_and_interchange(self):
        rd = CRS.from_epsg(28992)
        g = CRS("geographic", "g", rd.ellipsoid)
        nod = CRS(rd.kind, rd.name, rd.ellipsoid, rd.params)
        fwd = Transformer.from_crs(g, nod)
        inv = Transformer.from_crs(nod, g)
        rng = np.random.default_rng(19)
        lons = 5.39 + rng.uniform(-60, 60, 3000)
        lats = np.clip(52.16 + rng.uniform(-60, 60, 3000), -89.0, 89.0)
        x, y = fwd.transform(lons, lats)
        lo, la = inv.transform(x, y)
        np.testing.assert_allclose(lo, lons, atol=1e-9)
        np.testing.assert_allclose(la, lats, atol=1e-9)
        again = CRS.from_string(rd.to_wkt())
        assert again.kind == "sterea" and again.params == rd.params
        assert again.towgs84 == pytest.approx(rd.towgs84, abs=1e-6)
        again2 = CRS.from_string(rd.to_proj())
        assert again2.kind == "sterea" and again2.params == rd.params
        assert again2.towgs84 == pytest.approx(rd.towgs84)


class TestAzimuthalEquidistant:
    """aeqd: spherical closed forms (Snyder sec. 25), exact polar
    meridian-arc aspect, and geodesic (Vincenty) oblique ellipsoidal
    aspect -- distances/azimuths from the origin are true."""

    def test_vincenty_published_golden(self):
        """Geoscience Australia's GDA reference line: Flinders Peak ->
        Buninyong on GRS80, s = 54972.271 m, az1 = 306 deg 52'05.37"."""
        from xcube_resampling_spark.crs import (
            _Ellipsoid, _vincenty_inverse,
        )

        ell = _Ellipsoid(6378137.0, 298.257222101)
        p1 = math.radians(-(37 + 57 / 60 + 3.72030 / 3600))
        l1 = math.radians(144 + 25 / 60 + 29.52440 / 3600)
        p2 = np.array([math.radians(-(37 + 39 / 60 + 10.15610 / 3600))])
        l2 = np.array([math.radians(143 + 55 / 60 + 35.38390 / 3600)])
        s, a1 = _vincenty_inverse(ell, p1, l1, p2, l2)
        assert float(s[0]) == pytest.approx(54972.271, abs=5e-3)
        az = math.degrees(float(a1[0])) % 360
        assert az == pytest.approx(306 + 52 / 60 + 5.37 / 3600, abs=1e-5)

    def test_spherical_distance_and_azimuth_are_true(self):
        """rho == R * central angle (independent haversine) and the map
        bearing == the initial great-circle bearing, at every point --
        the projection's defining property."""
        from xcube_resampling_spark.crs import _Ellipsoid

        r = 6371000.0
        crs = CRS("aeqd", "sph", _Ellipsoid(r, float("inf")),
                  params=(("lat_0", 40.0), ("lon_0", -100.0),
                          ("x_0", 0.0), ("y_0", 0.0)))
        g = CRS("geographic", "g", crs.ellipsoid)
        fwd = Transformer.from_crs(g, crs)
        rng = np.random.default_rng(2)
        lo = rng.uniform(-180, 180, 400)
        la = rng.uniform(-89, 89, 400)
        x, y = fwd.transform(lo, la)
        lat0, lon0 = math.radians(40.0), math.radians(-100.0)
        phi, lam = np.radians(la), np.radians(lo)
        hav = 2 * np.arcsin(np.sqrt(
            np.sin((phi - lat0) / 2) ** 2
            + np.cos(lat0) * np.cos(phi) * np.sin((lam - lon0) / 2) ** 2))
        np.testing.assert_allclose(np.hypot(x, y), r * hav, atol=1e-5)
        brg = np.arctan2(
            np.sin(lam - lon0) * np.cos(phi),
            math.cos(lat0) * np.sin(phi)
            - math.sin(lat0) * np.cos(phi) * np.cos(lam - lon0))
        np.testing.assert_allclose(
            np.arctan2(x, y), brg, atol=1e-9)

    def test_polar_rho_is_meridian_arc(self):
        """North polar aspect on WGS84: rho(70N) equals the numerically
        integrated meridian arc pole->70N (independent quadrature)."""
        crs = CRS.azimuthal_equidistant(lat_0=90.0)
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        x, y = fwd.transform(np.array([45.0]), np.array([70.0]))
        ell = crs.ellipsoid
        t = np.linspace(math.radians(70.0), math.pi / 2, 300001)
        arc = np.trapz(
            ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(t) ** 2) ** 1.5, t)
        assert float(np.hypot(x, y)[0]) == pytest.approx(arc, abs=1e-2)
        # x/y split: theta = lon - lon0 measured from the -y axis
        assert float(x[0]) == pytest.approx(
            float(np.hypot(x, y)[0]) * math.sin(math.radians(45.0)))

    def test_roundtrips_all_aspects(self):
        rng = np.random.default_rng(7)
        cases = [
            CRS.azimuthal_equidistant(lat_0=90.0),
            CRS.azimuthal_equidistant(lat_0=-90.0, lon_0=10.0),
            CRS.azimuthal_equidistant(lat_0=40.0, lon_0=-100.0,
                                      false_easting=1e5,
                                      false_northing=-2e5),
            CRS.azimuthal_equidistant(lat_0=0.0, lon_0=120.0),
        ]
        for crs in cases:
            fwd = Transformer.from_crs(CRS_WGS84, crs)
            inv = Transformer.from_crs(crs, CRS_WGS84)
            lo = crs.param("lon_0") + rng.uniform(-85, 85, 500)
            la = np.clip(crs.param("lat_0") + rng.uniform(-80, 80, 500),
                         -89.0, 89.0)
            x, y = fwd.transform(lo, la)
            lo2, la2 = inv.transform(x, y)
            dlo = (lo2 - lo + 180) % 360 - 180
            # polar aspects go through the meridian-arc inverse series
            # (~1e-8 deg); geodesic aspects close to machine precision
            np.testing.assert_allclose(dlo, 0.0, atol=1e-7)
            np.testing.assert_allclose(la2, la, atol=1e-7)

    def test_interchange_and_cf_name(self):
        crs = CRS.azimuthal_equidistant(lat_0=40.0, lon_0=-100.0)
        assert CRS.from_string(crs.to_wkt()).params == crs.params
        assert CRS.from_string(crs.to_proj()).params == crs.params
        cf = crs.to_cf()
        assert cf["grid_mapping_name"] == "azimuthal_equidistant"
        back = CRS.from_cf(cf)
        assert back.kind == "aeqd" and back.params == crs.params


class TestGeneralStereographic:
    """CF 'stereographic' (PROJ stere oblique semantics: conformal
    latitude + spherical stereographic)."""

    def test_spherical_limit_matches_snyder(self):
        """On a sphere the formulas must reduce exactly to Snyder
        21-2..21-4 (independent closed form in the test)."""
        from xcube_resampling_spark.crs import _Ellipsoid

        r = 6371000.0
        crs = CRS("stere_obl", "sph", _Ellipsoid(r, float("inf")),
                  params=(("k_0", 1.0), ("lat_0", 40.0),
                          ("lon_0", -100.0), ("x_0", 0.0), ("y_0", 0.0)))
        g = CRS("geographic", "g", crs.ellipsoid)
        fwd = Transformer.from_crs(g, crs)
        for lon, lat in [(20.0, -20.0), (-150.0, 70.0), (-100.0, 40.0)]:
            x, y = fwd.transform(np.array([lon]), np.array([lat]))
            p1 = math.radians(40.0)
            l0 = math.radians(-100.0)
            ph, lm = math.radians(lat), math.radians(lon)
            k = 2 / (1 + math.sin(p1) * math.sin(ph)
                     + math.cos(p1) * math.cos(ph) * math.cos(lm - l0))
            xs = r * k * math.cos(ph) * math.sin(lm - l0)
            ys = r * k * (math.cos(p1) * math.sin(ph)
                          - math.sin(p1) * math.cos(ph)
                          * math.cos(lm - l0))
            assert float(x[0]) == pytest.approx(xs, abs=1e-6)
            assert float(y[0]) == pytest.approx(ys, abs=1e-6)

    def test_ellipsoidal_conformality_and_origin_scale(self):
        """Conformal (equal meridian/parallel scales) everywhere, and
        point scale k0 at the origin -- central differences."""
        crs = CRS("stere_obl", "obl", CRS_WGS84.ellipsoid,
                  params=(("k_0", 0.9999), ("lat_0", 52.0),
                          ("lon_0", 5.0), ("x_0", 0.0), ("y_0", 0.0)))
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        ell = crs.ellipsoid
        rng = np.random.default_rng(23)
        lons = 5 + rng.uniform(-30, 30, 40)
        lats = 52 + rng.uniform(-30, 30, 40)
        d = 1e-6
        x0, y0 = fwd.transform(lons, lats)
        xl, yl = fwd.transform(lons + d, lats)
        xp, yp = fwd.transform(lons, lats + d)
        s = np.sin(np.radians(lats))
        nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
        rho = ell.a * (1 - ell.e2) / (1 - ell.e2 * s * s) ** 1.5
        k_par = np.hypot(xl - x0, yl - y0) / (
            np.radians(d) * nu * np.cos(np.radians(lats)))
        k_mer = np.hypot(xp - x0, yp - y0) / (np.radians(d) * rho)
        np.testing.assert_allclose(k_par, k_mer, rtol=1e-5)
        # central-difference scale at the origin == k0
        d = 1e-5
        xa, ya = fwd.transform(np.array([5.0]), np.array([52.0 + d]))
        xb, yb = fwd.transform(np.array([5.0]), np.array([52.0 - d]))
        s0 = math.sin(math.radians(52.0))
        rho0 = ell.a * (1 - ell.e2) / (1 - ell.e2 * s0 * s0) ** 1.5
        k = float(np.hypot(xa - xb, ya - yb)[0]) / (
            2 * math.radians(d) * rho0)
        assert k == pytest.approx(0.9999, abs=1e-7)

    def test_roundtrip_and_cf_routing(self):
        crs = CRS("stere_obl", "obl", CRS_WGS84.ellipsoid,
                  params=(("k_0", 0.9999), ("lat_0", 52.0),
                          ("lon_0", 5.0), ("x_0", 0.0), ("y_0", 0.0)))
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(29)
        lo = 5 + rng.uniform(-80, 80, 1000)
        la = np.clip(52 + rng.uniform(-80, 80, 1000), -89, 89)
        x, y = fwd.transform(lo, la)
        lo2, la2 = inv.transform(x, y)
        np.testing.assert_allclose((lo2 - lo + 180) % 360 - 180, 0.0,
                                   atol=1e-8)
        np.testing.assert_allclose(la2, la, atol=1e-8)
        cf = crs.to_cf()
        assert cf["grid_mapping_name"] == "stereographic"
        back = CRS.from_cf(cf)
        assert back.kind == "stere_obl" and back.params == crs.params
        # a polar origin routes onto the polar kind (variant A)
        polar = CRS.from_cf({**cf, "latitude_of_projection_origin": -90.0})
        assert polar.kind == "stere"
        assert CRS.from_string(crs.to_wkt()).params == crs.params
        assert CRS.from_string(crs.to_proj()).params == crs.params
        # +proj=stere with a non-polar lat_0 now parses (PROJ parity)
        obl = CRS.from_string("+proj=stere +lat_0=30 +lon_0=10 "
                              "+ellps=WGS84")
        assert obl.kind == "stere_obl"


class TestVerticalPerspective:
    """CF 'vertical_perspective' (PROJ 'nsper', Snyder sec. 23)."""

    def test_geos_height_roundtrip_and_limb(self):
        crs = CRS("nsper", "n", CRS_WGS84.ellipsoid,
                  params=(("h", 35785831.0), ("lat_0", 0.0),
                          ("lon_0", -75.0), ("x_0", 0.0), ("y_0", 0.0)))
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        inv = Transformer.from_crs(crs, CRS_WGS84)
        rng = np.random.default_rng(31)
        lo = -75 + rng.uniform(-60, 60, 800)
        la = rng.uniform(-60, 60, 800)
        x, y = fwd.transform(lo, la)
        assert not np.isnan(x).any()
        lo2, la2 = inv.transform(x, y)
        np.testing.assert_allclose(lo2, lo, atol=1e-9)
        np.testing.assert_allclose(la2, la, atol=1e-9)
        # far side is NaN (cos c < 1/P)
        x, y = fwd.transform(np.array([105.0]), np.array([0.0]))
        assert np.isnan(x[0]) and np.isnan(y[0])

    def test_orthographic_limit(self):
        """As h -> infinity the perspective view approaches the
        orthographic projection (k' -> 1 scaling of the same plane)."""
        from xcube_resampling_spark.crs import _Ellipsoid

        r = 6371000.0
        sph = _Ellipsoid(r, float("inf"))
        n = CRS("nsper", "n", sph,
                params=(("h", 1e12), ("lat_0", 30.0), ("lon_0", 10.0),
                        ("x_0", 0.0), ("y_0", 0.0)))
        g = CRS("geographic", "g", sph)
        fwd = Transformer.from_crs(g, n)
        x, y = fwd.transform(np.array([25.0]), np.array([45.0]))
        # spherical orthographic closed form (Snyder 20-3/20-4)
        p1, l0 = math.radians(30.0), math.radians(10.0)
        ph, lm = math.radians(45.0), math.radians(25.0)
        xo = r * math.cos(ph) * math.sin(lm - l0)
        yo = r * (math.cos(p1) * math.sin(ph)
                  - math.sin(p1) * math.cos(ph) * math.cos(lm - l0))
        assert float(x[0]) == pytest.approx(xo, rel=1e-5)
        assert float(y[0]) == pytest.approx(yo, rel=1e-5)

    def test_cf_and_interchange(self):
        crs = CRS("nsper", "n", CRS_WGS84.ellipsoid,
                  params=(("h", 35785831.0), ("lat_0", 0.0),
                          ("lon_0", -75.0), ("x_0", 0.0), ("y_0", 0.0)))
        cf = crs.to_cf()
        assert cf["grid_mapping_name"] == "vertical_perspective"
        assert cf["perspective_point_height"] == 35785831.0
        back = CRS.from_cf(cf)
        assert back.kind == "nsper" and back.params == crs.params
        assert CRS.from_string(crs.to_wkt()).params == crs.params
        assert CRS.from_string(crs.to_proj()).params == crs.params
        # earth_radius form builds a spherical CRS
        sph = CRS.from_cf({
            "grid_mapping_name": "vertical_perspective",
            "perspective_point_height": 1e7, "earth_radius": 6371000.0,
        })
        assert sph.ellipsoid.e2 == 0.0


class TestReviewRegressions:
    """Pins for the round-5 self-review findings."""

    def test_mollweide_near_pole_accuracy(self):
        """Newton converges (early-exit loop) even where the defining
        equation's derivative vanishes: sub-mm agreement with a
        bisection solution at 89.99 deg (was ~27 km off with 12 fixed
        iterations)."""
        crs = CRS.mollweide()
        a = crs.ellipsoid.a
        fwd = Transformer.from_crs(CRS_WGS84, crs)
        for lat in (89.9, 89.99, 89.995):
            x, y = fwd.transform(np.array([180.0]), np.array([lat]))
            phi = math.radians(lat)
            lo, hi = 0.0, math.pi / 2
            for _ in range(200):
                mid = (lo + hi) / 2
                if 2 * mid + math.sin(2 * mid) < math.pi * math.sin(phi):
                    lo = mid
                else:
                    hi = mid
            t = (lo + hi) / 2
            ex = a * (2 * math.sqrt(2) / math.pi) * math.pi * math.cos(t)
            ey = a * math.sqrt(2) * math.sin(t)
            assert float(x[0]) == pytest.approx(ex, abs=1e-3)
            assert float(y[0]) == pytest.approx(ey, abs=1e-3)

    def test_cf_earth_radius_is_honored_for_any_mapping(self):
        """CF earth_radius declares a spherical figure; decoding it on
        the WGS84 ellipsoid routed aeqd into the geodesic regime
        (~1.1 km error at 560 km range)."""
        cf = {
            "grid_mapping_name": "azimuthal_equidistant",
            "earth_radius": 6371000.0,
            "latitude_of_projection_origin": 40.0,
            "longitude_of_projection_origin": -100.0,
        }
        crs = CRS.from_cf(cf)
        assert crs.ellipsoid.e2 == 0.0
        assert crs.ellipsoid.a == 6371000.0
        # spherical distance property must hold exactly
        g = CRS("geographic", "g", crs.ellipsoid)
        fwd = Transformer.from_crs(g, crs)
        x, y = fwd.transform(np.array([-95.0]), np.array([42.0]))
        lat0, lon0 = math.radians(40.0), math.radians(-100.0)
        ph, lm = math.radians(42.0), math.radians(-95.0)
        hav = 2 * math.asin(math.sqrt(
            math.sin((ph - lat0) / 2) ** 2
            + math.cos(lat0) * math.cos(ph)
            * math.sin((lm - lon0) / 2) ** 2))
        assert float(np.hypot(x, y)[0]) == pytest.approx(
            6371000.0 * hav, abs=1e-6)
        # stereographic too
        cf2 = {
            "grid_mapping_name": "stereographic", "earth_radius": 6371000.0,
            "latitude_of_projection_origin": 40.0,
            "scale_factor_at_projection_origin": 1.0,
        }
        assert CRS.from_cf(cf2).ellipsoid.e2 == 0.0

    def test_to_cf_spherical_emits_earth_radius_strict_json(self):
        """Spherical CRSs emit CF earth_radius, never
        inverse_flattening=inf (json.dumps would write the non-strict
        token Infinity into .zattrs)."""
        import json

        crs = CRS.from_string(
            "+proj=aeqd +R=6371000 +lat_0=52 +lon_0=10")
        cf = crs.to_cf()
        assert cf["earth_radius"] == 6371000.0
        assert "inverse_flattening" not in cf
        json.dumps(cf, allow_nan=False)  # raises on inf/nan
        back = CRS.from_cf(cf)
        assert back.ellipsoid.e2 == 0.0 and back.params == crs.params

    def test_proj_stere_defaults_match_proj(self):
        """+proj=stere defaults lat_0 to 0 (equatorial oblique), not the
        pole; +lat_ts outside the polar aspects is ignored like PROJ."""
        c = CRS.from_string("+proj=stere +lon_0=10 +ellps=WGS84")
        assert c.kind == "stere_obl"
        assert c.param("lat_0") == 0.0
        c2 = CRS.from_string(
            "+proj=stere +lat_0=30 +lat_ts=60 +lon_0=10 +ellps=WGS84")
        assert c2.kind == "stere_obl"
        assert all(k != "lat_ts" for k, _ in c2.params)
        c3 = CRS.from_string(
            "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84")
        assert c3.kind == "stere"
