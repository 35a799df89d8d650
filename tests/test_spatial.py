"""Dispatcher goldens replicating /root/reference/tests/test_spatial.py."""

import logging

import numpy as np

from xcube_resampling_spark.crs import CRS_WGS84
from xcube_resampling_spark.gridmapping import GridMapping
from xcube_resampling_spark.operators.spatial import resample_in_space

from .sampledata import (
    create_2x2_dataset_with_irregular_coords,
    create_4x4_dataset_with_irregular_coords,
    create_5x5_dataset_regular_utm,
    create_8x6_dataset_with_regular_coords,
)

nan = np.nan


class TestResampleInSpace:
    def test_affine_route(self, spark):
        source_ds = create_8x6_dataset_with_regular_coords(spark)
        source_gm = source_ds.grid_mapping()
        target_gm = GridMapping.regular(
            (3, 3), (50.0, 10.0), 0.1, source_gm.crs
        )
        out = resample_in_space(source_ds, target_gm, interp_methods=1)
        got = out.to_numpy("refl", (3, 3))
        np.testing.assert_almost_equal(
            got, np.array([[1, 0, 2], [0, 3, 0], [4, 0, 1]])
        )

    def test_rectify_and_downscale(self, spark):
        source_ds = create_4x4_dataset_with_irregular_coords(spark)
        target_gm = GridMapping.regular(
            size=(2, 2), xy_min=(-1, 51), xy_res=2, crs=CRS_WGS84
        )
        out = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods=0
        )
        got = out.to_numpy("rad", (2, 2))
        np.testing.assert_almost_equal(got, np.array([[5, 2], [14, 8]]))

        out = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods=1
        )
        got = out.to_numpy("rad", (2, 2))
        np.testing.assert_almost_equal(
            got, np.array([[7.5, 4.5], [12.5, 9.5]])
        )

    def test_rectify_and_upscale(self, spark):
        source_ds = create_2x2_dataset_with_irregular_coords(spark)
        target_gm = GridMapping.regular(
            size=(4, 4), xy_min=(-1, 49), xy_res=2, crs=CRS_WGS84
        )
        out = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods=0
        )
        got = out.to_numpy("rad", (4, 4))
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [nan, nan, nan, nan],
                    [nan, 1.0, 2.0, nan],
                    [3.0, 3.0, 2.0, nan],
                    [nan, 4.0, nan, nan],
                ]
            ),
        )

    def test_reproject_route(self, spark):
        source_ds = create_5x5_dataset_regular_utm(spark)
        target_gm = GridMapping.regular(
            size=(5, 5), xy_min=(4320080, 3382480), xy_res=80, crs="epsg:3035"
        )
        out = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods=0
        )
        got = out.to_numpy("band_1", (5, 5))
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [1, 1, 2, 3, 4],
                    [6, 6, 7, 8, 9],
                    [11, 12, 12, 13, 14],
                    [16, 17, 17, 18, 19],
                    [21, 17, 17, 18, 19],
                ]
            ),
        )

    def test_reproject_route_geographic(self, spark):
        source_ds = create_5x5_dataset_regular_utm(spark)
        target_gm = GridMapping.regular(
            size=(5, 5), xy_min=(9.9886, 53.5499), xy_res=0.0006,
            crs=CRS_WGS84,
        )
        out = resample_in_space(
            source_ds, target_gm=target_gm, interp_methods=0
        )
        got = out.to_numpy("band_1", (5, 5))
        np.testing.assert_almost_equal(
            got,
            np.array(
                [
                    [7, 8, 8, 8, 9],
                    [12, 13, 13, 13, 14],
                    [12, 13, 13, 13, 14],
                    [17, 18, 18, 18, 19],
                    [22, 23, 23, 23, 24],
                ]
            ),
        )

    def test_no_target_warns_and_returns_input(self, spark, caplog):
        source_ds = create_5x5_dataset_regular_utm(spark)
        with caplog.at_level(logging.WARNING, "xcube_resampling_spark"):
            out = resample_in_space(source_ds)
        assert out is source_ds
        assert any(
            "If source grid mapping is regular `target_gm` must be given"
            in r.message
            for r in caplog.records
        )

    def test_identity_returns_input(self, spark):
        source_ds = create_5x5_dataset_regular_utm(spark)
        target_gm = source_ds.grid_mapping()
        out = resample_in_space(source_ds, target_gm=target_gm)
        assert out is source_ds


class TestPlanResample:
    """plans.plan_resample mirrors the dispatcher's routing."""

    def test_routes(self, spark):
        import numpy as np

        from xcube_resampling_spark.crs import CRS, CRS_WGS84
        from xcube_resampling_spark.plans import plan_resample

        regular = GridMapping.regular((8, 6), (0.0, 0.0), 1.0, CRS_WGS84)
        shifted = GridMapping.regular((8, 6), (2.0, 1.0), 1.0, CRS_WGS84)
        utm = GridMapping.regular(
            (8, 6), (500000.0, 5000000.0), 100.0, CRS.from_epsg(32632)
        )
        jj, ii = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        irregular = GridMapping.from_coords_2d(
            ii + 0.3 * jj, 10.0 - jj + 0.1 * ii, CRS_WGS84
        )

        assert plan_resample(irregular, regular).route == "rectify"
        assert plan_resample(regular, None).route == "identity"
        assert plan_resample(regular, regular).route == "identity"
        assert plan_resample(regular, shifted).route == "affine"
        plan = plan_resample(utm, regular)
        assert plan.route == "reproject"

    def test_pre_downscale_triggers_when_source_finer(self, spark):
        from xcube_resampling_spark.crs import CRS, CRS_WGS84
        from xcube_resampling_spark.plans import plan_pre_downscale

        fine_src = GridMapping.regular(
            (1000, 1000), (500000.0, 5000000.0), 10.0, CRS.from_epsg(32632)
        )
        coarse_dst = GridMapping.regular((10, 10), (9.0, 45.0), 0.1,
                                         CRS_WGS84)
        down = plan_pre_downscale(fine_src, coarse_dst)
        assert down is not None
        assert down[0] < 1.0
        # target at least as fine as the source: no downscale
        # (0.0009 deg =~ 100 m in y at 45N; scales stay >= SCALE_LIMIT)
        same = plan_pre_downscale(
            GridMapping.regular((100, 100), (500000.0, 5000000.0), 100.0,
                                CRS.from_epsg(32632)),
            GridMapping.regular((100, 100), (9.0, 45.0), 0.0009, CRS_WGS84),
        )
        assert same is None
