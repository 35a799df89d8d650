"""GridMapping core tests.

Goldens replicate /root/reference/tests/gridmapping/test_base.py and
test_coords.py behavior on the key paths.
"""

import math

import numpy as np
import pytest

from xcube_resampling_spark.crs import CRS, CRS_CRS84, CRS_WGS84, Transformer
from xcube_resampling_spark.gridmapping import GridMapping


class TestRegular:
    def test_basics(self):
        gm = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        assert gm.size == (8, 6)
        assert gm.width == 8 and gm.height == 6
        assert gm.is_regular
        assert not gm.is_j_axis_up
        assert gm.xy_bbox == (50.0, 10.0, 50.8, 10.6)
        assert gm.xy_res == (0.1, 0.1)
        np.testing.assert_almost_equal(
            gm.x_coords, 50.05 + 0.1 * np.arange(8)
        )
        np.testing.assert_almost_equal(
            gm.y_coords, 10.55 - 0.1 * np.arange(6)
        )

    def test_invalid(self):
        with pytest.raises(ValueError):
            GridMapping.regular((1, 6), (0, 0), 0.1, CRS_WGS84)
        with pytest.raises(ValueError):
            GridMapping.regular((8, 6), (0, 89), 1.0, CRS_WGS84)

    def test_ij_to_xy_transform(self):
        gm = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        (a, b, c), (d, e, f) = gm.ij_to_xy_transform
        assert (a, b, c) == (0.1, 0.0, 50.0)
        assert (d, e, f) == (0.0, -0.1, 10.6)
        gm_up = GridMapping.regular(
            (8, 6), (50.0, 10.0), 0.1, CRS_WGS84, is_j_axis_up=True
        )
        (a, b, c), (d, e, f) = gm_up.ij_to_xy_transform
        assert (d, e, f) == (0.0, 0.1, 10.0)

    def test_transform_roundtrip(self):
        gm = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        fwd = gm.ij_to_xy_transform
        inv = gm.xy_to_ij_transform
        from xcube_resampling_spark.gridmapping import (
            affine_apply,
            affine_compose,
        )

        x, y = affine_apply(fwd, 2.0, 3.0)
        i, j = affine_apply(inv, x, y)
        assert math.isclose(i, 2.0, abs_tol=1e-12)
        assert math.isclose(j, 3.0, abs_tol=1e-12)
        ident = affine_compose(inv, fwd)
        assert math.isclose(ident[0][0], 1)
        assert math.isclose(ident[1][1], 1)

    def test_ij_transform_to(self):
        src = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        dst = GridMapping.regular((3, 3), (50.0, 10.0), 0.1, CRS_WGS84)
        m = dst.ij_transform_to(src)
        # target (0,0) maps to source (0, 3): same x_min; target y_max=10.3
        ((i_s, _, i_o), (_, j_s, j_o)) = m
        assert math.isclose(i_s, 1.0)
        assert math.isclose(i_o, 0.0, abs_tol=1e-10)
        assert math.isclose(j_s, 1.0)
        assert math.isclose(j_o, 3.0, abs_tol=1e-10)

    def test_scale(self):
        gm = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        gm2 = gm.scale(0.5)
        assert gm2.size == (4, 3)
        assert gm2.xy_res == (0.2, 0.2)
        assert gm2.x_min == 50.0 and gm2.y_min == 10.0

    def test_is_close(self):
        gm = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        gm2 = GridMapping.regular((8, 6), (50.0, 10.0), 0.1, CRS_WGS84)
        gm3 = GridMapping.regular((8, 6), (50.01, 10.0), 0.1, CRS_WGS84)
        assert gm.is_close(gm2)
        assert not gm.is_close(gm3)
        assert gm.is_close(gm3, tolerance=0.1)

    def test_ij_bboxes_tiles(self):
        gm = GridMapping.regular(
            (8, 6), (50.0, 10.0), 0.1, CRS_WGS84, tile_size=(4, 3)
        )
        boxes = gm.ij_bboxes
        assert boxes.shape == (4, 4)
        np.testing.assert_array_equal(boxes[0], [0, 0, 4, 3])
        np.testing.assert_array_equal(boxes[3], [4, 3, 8, 6])
        xy = gm.xy_bboxes
        np.testing.assert_almost_equal(xy[0], [50.0, 10.3, 50.4, 10.6])


class TestFromCoords:
    def test_1d_regular(self):
        x = 50.05 + 0.1 * np.arange(8)
        y = 10.55 - 0.1 * np.arange(6)
        gm = GridMapping.from_coords(x, y, CRS_WGS84)
        assert gm.is_regular
        assert not gm.is_j_axis_up
        assert gm.size == (8, 6)
        np.testing.assert_almost_equal(
            np.array(gm.xy_bbox), [50.0, 10.0, 50.8, 10.6]
        )
        np.testing.assert_almost_equal(np.array(gm.xy_res), [0.1, 0.1])

    def test_1d_j_up(self):
        x = np.arange(0.5, 8.0)
        y = np.arange(0.5, 6.0)
        gm = GridMapping.from_coords(x, y, CRS_WGS84)
        assert gm.is_j_axis_up
        assert gm.is_regular

    def test_1d_irregular(self):
        x = np.array([0.0, 1.0, 3.0, 7.0])
        y = np.array([0.0, 1.0, 2.0, 3.0])
        gm = GridMapping.from_coords(x, y, CRS_WGS84)
        assert not gm.is_regular

    def test_2d_irregular(self):
        lon = np.array([[1.0, 6.0], [0.0, 2.0]])
        lat = np.array([[56.0, 53.0], [52.0, 50.0]])
        gm = GridMapping.from_coords(lon, lat, CRS_WGS84)
        assert not gm.is_regular
        assert not gm.is_j_axis_up
        assert gm.size == (2, 2)
        # resolution is estimated (area-based); must be > 0
        assert gm.x_res > 0 and gm.y_res > 0

    def test_2d_antimeridian(self):
        lon = np.array([[+179.0, -176.0], [+178.0, +180.0]])
        lat = np.array([[56.0, 53.0], [52.0, 50.0]])
        gm = GridMapping.from_coords(lon, lat, CRS_WGS84)
        assert gm.is_lon_360

    def test_to_regular(self):
        lon = np.array([[1.0, 6.0], [0.0, 2.0]])
        lat = np.array([[56.0, 53.0], [52.0, 50.0]])
        gm = GridMapping.from_coords(lon, lat, CRS_WGS84)
        rgm = gm.to_regular()
        assert rgm.is_regular
        assert rgm.width >= 2 and rgm.height >= 2


class TestCRS:
    def test_parse(self):
        assert CRS.from_user_input("EPSG:4326").is_geographic
        assert CRS.from_user_input("OGC:CRS84").is_geographic
        assert not CRS.from_epsg(32632).is_geographic
        assert CRS.from_epsg(3035).name == "ETRS89-extended / LAEA Europe"

    def test_spec_roundtrip(self):
        for crs in (CRS_WGS84, CRS_CRS84, CRS.from_epsg(32632),
                    CRS.from_epsg(3035)):
            spec = crs.to_spec()
            assert CRS.from_spec(spec).equals(crs)

    def test_cf_roundtrip(self):
        for crs in (CRS.from_epsg(32632), CRS.from_epsg(3035)):
            cf = crs.to_cf()
            crs2 = CRS.from_cf(cf)
            assert crs2.kind == crs.kind
            t = Transformer.from_crs(crs, crs2)
            x, y = t.transform(np.array([500000.0]), np.array([4000000.0]))

    def test_laea_epsg_example(self):
        # EPSG Guidance Note 7-2 worked example for method 9820 with
        # ETRS89-LAEA parameters: 50N 5E -> E 3962799.45, N 2999718.85
        t = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(3035))
        x, y = t.transform(np.array([5.0]), np.array([50.0]))
        assert abs(x[0] - 3962799.45) < 0.01
        assert abs(y[0] - 2999718.85) < 0.01

    def test_utm_roundtrip(self):
        t = Transformer.from_crs(CRS_WGS84, CRS.from_epsg(32632))
        ti = Transformer.from_crs(CRS.from_epsg(32632), CRS_WGS84)
        lon = np.array([9.0, 6.0, 12.0])
        lat = np.array([0.0, 45.0, 70.0])
        x, y = t.transform(lon, lat)
        assert abs(x[0] - 500000.0) < 1e-6
        lon2, lat2 = ti.transform(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_transform_bounds(self):
        t = Transformer.from_crs(CRS.from_epsg(32632), CRS.from_epsg(3035))
        b = t.transform_bounds(565300.0, 5933800.0, 565800.0, 5934300.0)
        assert b[0] < b[2] and b[1] < b[3]
