"""CF-convention grid-mapping discovery tests
(reference tests/gridmapping/test_cfconv.py:55-437 matrix, adapted to the
SparkDataset metadata model)."""

from __future__ import annotations

import numpy as np
import pytest

from xcube_resampling_spark.crs import CRS, CRS_WGS84
from xcube_resampling_spark.dataset import SparkDataset, Variable
from xcube_resampling_spark.gridmapping.cfconv import (
    grid_mapping_from_dataset,
)


def _ds(spark, coords, coord_attrs=None, var_attrs=None, attrs=None):
    df = spark.range(1).selectExpr(
        "CAST(0 AS INT) t", "CAST(0 AS INT) j", "CAST(0 AS INT) i",
        "CAST(1.0 AS DOUBLE) value",
    )
    yx = ("y", "x") if "x" in coords else ("lat", "lon")
    return SparkDataset(
        spark=spark,
        data_vars={
            "band": Variable("band", df, yx, "float64", var_attrs or {})
        },
        coords=coords,
        coord_attrs=coord_attrs or {},
        attrs=attrs or {},
        yx_dims=yx,
    )


class TestDiscovery:
    def test_latlon_by_name(self, spark):
        ds = _ds(spark, {
            "lon": np.arange(0.5, 8.0, 1.0),
            "lat": np.arange(5.5, 0.0, -1.0),
        })
        gm = grid_mapping_from_dataset(ds)
        assert gm.crs.is_geographic
        assert gm.is_regular
        assert gm.size == (8, 6)
        assert gm.xy_var_names == ("lon", "lat")

    def test_projected_by_name_with_crs_arg(self, spark):
        ds = _ds(spark, {
            "x": np.arange(500050.0, 500850.0, 100.0),
            "y": np.arange(5000550.0, 4999950.0, -100.0),
        })
        gm = grid_mapping_from_dataset(ds, crs=CRS.from_epsg(32632))
        assert not gm.crs.is_geographic
        assert gm.size == (8, 6)

    def test_by_standard_name(self, spark):
        ds = _ds(
            spark,
            {
                "a": np.arange(0.5, 8.0, 1.0),
                "b": np.arange(5.5, 0.0, -1.0),
            },
            coord_attrs={
                "a": {"standard_name": "longitude"},
                "b": {"standard_name": "latitude"},
            },
        )
        gm = grid_mapping_from_dataset(ds)
        assert gm.xy_var_names == ("a", "b")
        assert gm.crs.is_geographic

    def test_grid_mapping_attribute(self, spark):
        """CF 'grid_mapping' attr on the data variable pointing at a CRS
        variable (reference cfconv.py:91-100)."""
        tm_attrs = CRS.from_epsg(32632).to_cf()
        ds = _ds(
            spark,
            {
                "x": np.arange(500050.0, 500850.0, 100.0),
                "y": np.arange(5000550.0, 4999950.0, -100.0),
                "tm": 0,
            },
            coord_attrs={"tm": tm_attrs},
            var_attrs={"grid_mapping": "tm"},
        )
        gm = grid_mapping_from_dataset(ds)
        assert not gm.crs.is_geographic
        assert gm.size == (8, 6)

    def test_spatial_ref_convention(self, spark):
        ds = _ds(
            spark,
            {
                "x": np.arange(500050.0, 500850.0, 100.0),
                "y": np.arange(5000550.0, 4999950.0, -100.0),
                "spatial_ref": 0,
            },
            coord_attrs={"spatial_ref": CRS.from_epsg(32632).to_cf()},
        )
        gm = grid_mapping_from_dataset(ds)
        assert not gm.crs.is_geographic

    def test_spatial_ref_crs_wkt_only(self, spark):
        # a grid mapping variable carrying ONLY crs_wkt (no CF
        # grid_mapping_name) -- legal CF, and the only faithful CF form
        # for methods like Krovak; discovery parses the WKT
        ds = _ds(
            spark,
            {
                "x": np.arange(500050.0, 500850.0, 100.0),
                "y": np.arange(5000550.0, 4999950.0, -100.0),
                "spatial_ref": 0,
            },
            coord_attrs={
                "spatial_ref": {
                    "crs_wkt": CRS.from_epsg(32632).to_wkt()
                }
            },
        )
        gm = grid_mapping_from_dataset(ds)
        assert gm.crs.kind == "tmerc"
        assert gm.crs.param("lon_0") == 9.0

    def test_crs_in_dataset_attrs(self, spark):
        ds = _ds(
            spark,
            {
                "x": np.arange(500050.0, 500850.0, 100.0),
                "y": np.arange(5000550.0, 4999950.0, -100.0),
            },
            attrs=CRS.from_epsg(32632).to_cf(),
        )
        gm = grid_mapping_from_dataset(ds)
        assert not gm.crs.is_geographic

    def test_bounds_vars_excluded(self, spark):
        """*_bnds coords must not be picked as axes
        (reference cfconv.py:254-305)."""
        ds = _ds(
            spark,
            {
                "lon": np.arange(0.5, 8.0, 1.0),
                "lat": np.arange(5.5, 0.0, -1.0),
                "lon_bnds": np.zeros((8, 2)),
                "lat_bnds": np.zeros((6, 2)),
            },
        )
        gm = grid_mapping_from_dataset(ds)
        assert gm.xy_var_names == ("lon", "lat")

    def test_2d_coords_irregular(self, spark):
        jj, ii = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
        ds = _ds(
            spark,
            {
                "lon": (ii + 0.3 * jj).astype(float),
                "lat": (10.0 - jj + 0.1 * ii).astype(float),
            },
        )
        gm = grid_mapping_from_dataset(ds, prefer_is_regular=None)
        assert not gm.is_regular
        assert gm.size == (5, 4)

    def test_no_grid_raises(self, spark):
        ds = _ds(spark, {"lon": np.arange(3.0)})
        with pytest.raises(ValueError, match="cannot find any grid"):
            grid_mapping_from_dataset(ds)

    def test_prefer_crs_selection(self, spark):
        """Two candidate grids (geographic + projected): prefer_crs picks
        (reference gridmapping/dataset.py:71-97)."""
        tm_attrs = CRS.from_epsg(32632).to_cf()
        ds = _ds(
            spark,
            {
                "lon": np.arange(0.5, 8.0, 1.0),
                "lat": np.arange(5.5, 0.0, -1.0),
                "x": np.arange(500050.0, 500850.0, 100.0),
                "y": np.arange(5000550.0, 4999950.0, -100.0),
                "tm": 0,
            },
            coord_attrs={"tm": tm_attrs},
            var_attrs={"grid_mapping": "tm"},
        )
        gm = grid_mapping_from_dataset(ds, prefer_crs=CRS_WGS84)
        assert gm.crs.is_geographic
        gm2 = grid_mapping_from_dataset(
            ds, prefer_crs=CRS.from_epsg(32632)
        )
        assert not gm2.crs.is_geographic


class TestReviewRegressions:
    """Pins for the round-5 parity-review findings."""

    def test_geotiff_crs84_with_xy_named_coords(self, spark):
        """rioxarray reads a CRS-84 GeoTIFF as a latitude_longitude grid
        mapping whose 1-D coords are literally named 'x'/'y' -- the
        projected coord bucket must complement the lat-lon proxy
        (reference cfconv.py:246-251 edge case)."""
        ds = _ds(
            spark,
            {
                "x": np.arange(0.5, 8.0, 1.0),
                "y": np.arange(5.5, 0.0, -1.0),
            },
            coord_attrs={
                "spatial_ref": {
                    "grid_mapping_name": "latitude_longitude",
                    "semi_major_axis": 6378137.0,
                    "inverse_flattening": 298.257223563,
                },
            },
            var_attrs={"grid_mapping": "spatial_ref"},
        )
        gm = grid_mapping_from_dataset(ds)
        assert gm.crs.is_geographic
        assert gm.size == (8, 6)
        assert gm.xy_var_names == ("x", "y")

    def test_rotated_pole_rlon_rlat(self, spark):
        """rlon/rlat coords must bind to a rotated_latitude_longitude
        grid-mapping variable (reference cfconv.py:144-146), not to the
        projected bucket and not crash."""
        ds = _ds(
            spark,
            {
                "rlon": np.arange(-10.0 + 0.055, 10.0, 0.11),
                "rlat": np.arange(-8.0 + 0.055, 8.0, 0.11),
            },
            coord_attrs={
                "rotated_pole": {
                    "grid_mapping_name": "rotated_latitude_longitude",
                    "grid_north_pole_latitude": 39.25,
                    "grid_north_pole_longitude": -162.0,
                },
            },
            var_attrs={"grid_mapping": "rotated_pole"},
        )
        ds.yx_dims = ("rlat", "rlon")
        gm = grid_mapping_from_dataset(ds)
        assert gm.crs.kind == "rot_pole"
        assert gm.xy_var_names == ("rlon", "rlat")

    def test_tile_size_inferred_from_variable_chunks(self, spark):
        """With no explicit tile_size the dataset's declared chunking
        wins (reference _find_dataset_tile_size)."""
        ds = _ds(spark, {
            "lon": np.arange(0.05, 100.0, 0.1),
            "lat": np.arange(80.0, 0.0, -0.1),
        })
        v = ds.data_vars["band"]
        from dataclasses import replace as _rp
        try:
            ds.data_vars["band"] = _rp(v, chunks=(256, 512))
        except TypeError:
            v.chunks = (256, 512)
        gm = grid_mapping_from_dataset(ds)
        assert gm.tile_size == (512, 256)

    def test_2d_coord_tile_size_uses_coord_dims(self, spark):
        """Chunk-derived tile size for 2-D coords must key on the COORD
        VARIABLE's own dims (reference _find_dataset_tile_size uses
        coords.x.dims), not dataset.yx_dims -- a lon/lat pair living on
        different dims silently got no tile size."""
        jj, ii = np.meshgrid(np.arange(40), np.arange(50), indexing="ij")
        lon = (ii + 0.3 * jj).astype(float)
        lat = (10.0 - jj + 0.1 * ii).astype(float)
        df = spark.range(1).selectExpr(
            "CAST(0 AS INT) t", "CAST(0 AS INT) j", "CAST(0 AS INT) i",
            "CAST(1.0 AS DOUBLE) value",
        )
        ds = SparkDataset(
            spark=spark,
            data_vars={
                "band": Variable(
                    "band", df, ("rows", "cols"), "float64", {},
                    chunks=(16, 32),
                )
            },
            coords={
                "lon": (("rows", "cols"), lon),
                "lat": (("rows", "cols"), lat),
            },
            coord_attrs={},
            attrs={},
            yx_dims=("y", "x"),  # deliberately NOT the coord dims
        )
        gm = grid_mapping_from_dataset(ds, prefer_is_regular=None)
        assert gm.tile_size == (32, 16)
        assert gm.xy_dim_names == ("cols", "rows")

    def test_public_entry_prefers_regular(self, spark):
        """SparkDataset.grid_mapping (the public entry) defaults
        prefer_is_regular=True like the reference's public
        GridMapping.from_dataset; only the internal function defaults
        None.  With a regular 1-D grid and an irregular 2-D grid in one
        dataset and no preferences, the regular one must win."""
        jj, ii = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
        ds = _ds(
            spark,
            {
                "x": np.arange(0.5, 5.0, 1.0),
                "y": np.arange(3.5, 0.0, -1.0),
                "lon2": (("y", "x"), (ii + 0.3 * jj).astype(float)),
                "lat2": (("y", "x"), (10.0 - jj + 0.1 * ii).astype(float)),
            },
            coord_attrs={
                "lon2": {"standard_name": "longitude"},
                "lat2": {"standard_name": "latitude"},
                "tm": CRS.from_epsg(32632).to_cf(),
            },
            var_attrs={"grid_mapping": "tm"},
        )
        gm = ds.grid_mapping()
        assert gm.is_regular

    def test_default_preference_matches_reference(self, spark):
        """prefer_is_regular defaults to None like the reference: with
        several grid mappings and no preferences, the FIRST one wins
        (not the first regular one)."""
        import inspect

        sig = inspect.signature(grid_mapping_from_dataset)
        assert sig.parameters["prefer_is_regular"].default is None


def test_select_variables_unknown_name_raises(spark):
    from xcube_resampling_spark.dataset import SparkDataset, Variable

    df = spark.range(1).selectExpr(
        "CAST(0 AS INT) t", "CAST(0 AS INT) j", "CAST(0 AS INT) i",
        "CAST(1.0 AS DOUBLE) value",
    )
    ds = SparkDataset(
        spark=spark,
        data_vars={"a": Variable("a", df, ("y", "x"), "float64", {})},
        coords={}, yx_dims=("y", "x"),
    )
    with pytest.raises(KeyError, match="chl_typo"):
        ds.select_variables(["chl_typo"])
    assert list(ds.select_variables(["a"]).data_vars) == ["a"]


def test_to_numpy_int_missing_pixels_take_dtype_fill(spark):
    from xcube_resampling_spark.dataset import SparkDataset, Variable

    df = spark.createDataFrame(
        [(0, 0, 0, 7.0)], "t int, j int, i int, value double"
    )
    ds = SparkDataset(
        spark=spark,
        data_vars={"b": Variable("b", df, ("y", "x"), "uint8", {})},
        coords={}, yx_dims=("y", "x"),
    )
    out = ds.to_numpy("b", (1, 2))
    assert out[0, 0] == 7
    assert out[0, 1] == 255  # uint8 default fill, not INT64_MIN
