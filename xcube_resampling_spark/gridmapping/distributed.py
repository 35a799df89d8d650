"""Distributed grid mapping: 2-D coordinate images as a pixel DataFrame.

The driver-numpy :class:`GridMapping` mirrors the reference's xarray-backed
grid mapping (reference gridmapping/coords.py:176-327), which materializes
the coordinate images in memory.  At 100 TB a swath's lon/lat images are
themselves big data, so this module re-derives the same grid statistics --
area-based resolution estimate, half-pixel-grown bbox, axis orientation,
antimeridian normalization -- from a long-format ``(j, i, x, y)`` DataFrame
with window functions and one scalar aggregation.  The coordinate images
never touch the driver; only a handful of scalars do.

Numeric parity with :func:`GridMapping.from_coords_2d` /
``_estimate_irregular_res`` (base.py:554-750) is exact: identical
edge-repeat semantics for the boundary diffs, identical NaN/zero handling,
identical 0.7*min + 0.3*max blend, and the same ``round_to_fraction``
snapping -- verified by ``tests/test_gridmapping.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..crs import CRS
from .base import GridMapping, _ER
from .helpers import (
    default_xy_var_names,
    round_to_fraction,
    to_int_or_float,
)

__all__ = ["GridMappingDF"]


def _abs_no_nan_col(c):
    """Spark twin of base._abs_no_nan: fabs, NaN or ~0 (atol 1e-8) -> 0."""
    a = F.abs(c)
    return F.when(
        F.isnan(a) | a.isNull() | (a <= 1e-08), F.lit(0.0)
    ).otherwise(a)


@dataclass
class GridMappingDF:
    """An irregular grid whose coordinate images live in the cluster.

    Exposes the scalar surface of :class:`GridMapping` that the resampling
    operators consume (size, xy_res, xy_bbox, crs, orientation flags) plus
    ``coords``: the distributed ``(j, i, x, y)`` pixel DataFrame.
    """

    coords: DataFrame
    size: tuple[int, int]
    crs: CRS
    xy_res: tuple[float, float]
    xy_bbox: tuple[float, float, float, float]
    is_lon_360: bool
    is_j_axis_up: bool
    xy_var_names: tuple[str, str] = ("x", "y")
    xy_dim_names: tuple[str, str] = ("x", "y")
    tile_size: tuple[int, int] | None = None
    is_regular: bool = field(default=False)

    # ------------------------------------------------------------------ #
    # GridMapping-compatible scalar surface

    @property
    def width(self) -> int:
        return self.size[0]

    @property
    def height(self) -> int:
        return self.size[1]

    @property
    def x_res(self) -> float:
        return self.xy_res[0]

    @property
    def y_res(self) -> float:
        return self.xy_res[1]

    @property
    def x_min(self) -> float:
        return self.xy_bbox[0]

    @property
    def y_min(self) -> float:
        return self.xy_bbox[1]

    @property
    def x_max(self) -> float:
        return self.xy_bbox[2]

    @property
    def y_max(self) -> float:
        return self.xy_bbox[3]

    # ------------------------------------------------------------------ #

    @classmethod
    def from_grid_mapping(
        cls, gm: GridMapping, coords: DataFrame
    ) -> "GridMappingDF":
        """Wrap an already-computed (driver-side) grid mapping around a
        distributed coords DataFrame -- copies the scalars, runs no jobs."""
        return cls(
            coords=coords,
            size=gm.size,
            crs=gm.crs,
            xy_res=gm.xy_res,
            xy_bbox=gm.xy_bbox,
            is_lon_360=bool(gm.is_lon_360),
            is_j_axis_up=bool(gm.is_j_axis_up),
            xy_var_names=gm.xy_var_names,
            xy_dim_names=gm.xy_dim_names,
            tile_size=gm.tile_size,
        )

    @classmethod
    def from_coords_df(
        cls,
        coords: DataFrame,
        crs,
        *,
        size: tuple[int, int] | None = None,
        tile_size=None,
        xy_var_names=None,
        xy_dim_names=None,
    ) -> "GridMappingDF":
        """Infer the grid from a distributed (j, i, x, y) DataFrame.

        One window pass (two sort-shuffles: by row for i-direction diffs, by
        column for j-direction diffs) + one scalar aggregation; a second
        pass only if antimeridian normalization rewrites the longitudes
        (parity: GridMapping.from_coords_2d, base.py:554-622).
        """
        crs = CRS.from_user_input(crs)
        stats = _coord_stats(coords, crs)
        w, h = (size if size is not None
                else (stats["w"], stats["h"]))
        is_lon_360 = crs.is_geographic and stats["x_all_max"] > 180.0
        if (
            crs.is_geographic
            and not is_lon_360
            and (stats["wrap_xx"] > 180.0 or stats["wrap_xy"] > 180.0)
        ):
            # antimeridian-crossing swath: normalize lon to 0..360 and
            # re-derive the x statistics (reference coords.py:217-224)
            coords = coords.withColumn(
                "x",
                F.when(F.col("x") >= 0.0, F.col("x"))
                .otherwise(F.col("x") + 360.0),
            )
            stats = _coord_stats(coords, crs)
            is_lon_360 = True

        res = _res_from_stats(stats, crs)
        x_res = y_res = float(res)
        is_j_axis_up = bool(stats["j_axis_up"])
        # bbox grown by half a pixel (base._bbox_from_coords)
        x_min = to_int_or_float(stats["x_first_col_min"] - x_res / 2)
        x_max = to_int_or_float(stats["x_last_col_max"] + x_res / 2)
        if is_j_axis_up:
            y_min = to_int_or_float(stats["y_first_row_min"] - y_res / 2)
            y_max = to_int_or_float(stats["y_last_row_max"] + y_res / 2)
        else:
            y_min = to_int_or_float(stats["y_last_row_min"] - y_res / 2)
            y_max = to_int_or_float(stats["y_first_row_max"] + y_res / 2)
        names = xy_var_names or default_xy_var_names(crs)
        return cls(
            coords=coords,
            size=(int(w), int(h)),
            crs=crs,
            xy_res=(x_res, y_res),
            xy_bbox=(x_min, y_min, x_max, y_max),
            is_lon_360=bool(is_lon_360),
            is_j_axis_up=is_j_axis_up,
            xy_var_names=names,
            xy_dim_names=xy_dim_names or names,
            tile_size=tile_size,
        )

    def to_regular(self, tile_size=None,
                   is_j_axis_up: bool = False) -> GridMapping:
        """Regular target grid covering this swath
        (parity: GridMapping.to_regular, base.py:430-456)."""
        x_min, y_min, x_max, y_max = self.xy_bbox
        x_res, y_res = self.xy_res
        xy_res = min(x_res, y_res) or max(x_res, y_res)
        width = round((x_max - x_min + xy_res) / xy_res)
        height = round((y_max - y_min + xy_res) / xy_res)
        width = width if width >= 2 else 2
        height = height if height >= 2 else 2
        return GridMapping.regular(
            size=(width, height),
            xy_min=(x_min, y_min),
            xy_res=xy_res,
            crs=self.crs,
            tile_size=tile_size if tile_size is not None else self.tile_size,
            is_j_axis_up=is_j_axis_up,
        )


def _coord_stats(coords: DataFrame, crs: CRS) -> dict:
    """All scalar grid statistics in one window pass + ONE aggregation
    job (edge-row/-column extrema come from struct-ordered min/max, so
    no separate width/height pre-scan is needed)."""
    win_i = Window.partitionBy("j").orderBy("i")
    win_j = Window.partitionBy("i").orderBy("j")
    win_j_full = win_j.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    # edge-repeat: the reference extends the (n-1)-length diff arrays by
    # duplicating the last diff (coords.py:239-243); at the last row/col
    # (lead NULL) the repeated diff equals x - lag(x), so one window pass
    # per direction suffices (two sort-shuffles total)
    def diff(col, win):
        return F.coalesce(
            F.lead(col).over(win) - F.col(col),
            F.col(col) - F.lag(col).over(win),
        )

    d = coords.select(
        "j", "i", "x", "y",
        diff("x", win_i).alias("dx_i"),
        diff("y", win_i).alias("dy_i"),
        diff("x", win_j).alias("dx_j"),
        diff("y", win_j).alias("dy_j"),
        F.first("y").over(win_j_full).alias("y_col_first"),
        F.last("y").over(win_j_full).alias("y_col_last"),
    )
    xx = _abs_no_nan_col(F.col("dx_i"))
    xy = _abs_no_nan_col(F.col("dx_j"))
    yx = _abs_no_nan_col(F.col("dy_i"))
    yy = _abs_no_nan_col(F.col("dy_j"))
    x_abs = F.sqrt(xx * xx + xy * xy)
    y_abs = F.sqrt(yx * yx + yy * yy)
    if crs.is_geographic:
        x_len = F.lit(float(_ER)) * F.cos(F.radians(x_abs)) \
            * F.radians(y_abs)
        y_len = F.lit(float(_ER)) * F.radians(y_abs)
    else:
        x_len, y_len = x_abs, y_abs
    area = x_len * y_len
    area_pos = F.when(area > 0.0, area)

    # orientation: the numpy reference is np.all(y[0, :] < y[-1, :]) --
    # a column whose edge y is NaN (or NULL) makes the comparison False
    # there, so the flag must say "not up"; a bare min(y_last - y_first)
    # would SKIP NaN spans (Spark sorts NaN greatest) and flip the axis
    # for data the reference treats as j-axis-down
    span_bad = (
        F.col("y_col_first").isNull() | F.col("y_col_last").isNull()
        | F.isnan("y_col_first") | F.isnan("y_col_last")
    )
    up_flag = (
        F.when(span_bad, F.lit(0))
        .when(F.col("y_col_first") < F.col("y_col_last"), F.lit(1))
        .otherwise(F.lit(0))
    )
    agg = d.agg(
        (F.max("i") + 1).alias("w"),
        (F.max("j") + 1).alias("h"),
        F.min(area_pos).alias("area_min"),
        F.max(area_pos).alias("area_max"),
        F.min(up_flag).alias("up_min"),
        F.max("x").alias("x_all_max"),
        # antimeridian check on the first row / first column diffs only
        # (parity: base.py:571-577 uses x[0, :] and x[:, 0])
        F.max(F.when(F.col("j") == 0, _abs_no_nan_col(F.col("dx_i"))))
        .alias("wrap_xx"),
        F.max(F.when(F.col("i") == 0, _abs_no_nan_col(F.col("dx_j"))))
        .alias("wrap_xy"),
        # edge-row/-column extrema via struct ordering (no w/h needed):
        # min(struct(i, x)) lands on i == 0 with the smallest x there;
        # max(struct(i, x)) on i == w-1 with the largest; the negated-y
        # variants pick the opposite extremum on the same edge
        F.min(F.struct("i", "x")).alias("sx_min"),
        F.max(F.struct("i", "x")).alias("sx_max"),
        F.min(F.struct("j", "y")).alias("sy_first"),
        F.min(F.struct(F.col("j"), (-F.col("y")).alias("ny")))
        .alias("sy_first_neg"),
        F.max(F.struct("j", "y")).alias("sy_last"),
        F.max(F.struct(F.col("j"), (-F.col("y")).alias("ny")))
        .alias("sy_last_neg"),
    ).collect()[0]
    return {
        "w": int(agg.w),
        "h": int(agg.h),
        "area_min": agg.area_min,
        "area_max": agg.area_max,
        "j_axis_up": agg.up_min == 1,
        "x_all_max": agg.x_all_max if agg.x_all_max is not None
        else float("-inf"),
        "wrap_xx": agg.wrap_xx or 0.0,
        "wrap_xy": agg.wrap_xy or 0.0,
        "x_first_col_min": float(agg.sx_min["x"]),
        "x_last_col_max": float(agg.sx_max["x"]),
        "y_first_row_min": float(agg.sy_first["y"]),
        "y_first_row_max": float(-agg.sy_first_neg["ny"]),
        "y_last_row_min": float(-agg.sy_last_neg["ny"]),
        "y_last_row_max": float(agg.sy_last["y"]),
    }


def _res_from_stats(stats: dict, crs: CRS) -> float:
    """0.7*min + 0.3*max blend over quad areas
    (parity: base._estimate_irregular_res, base.py:723-750)."""
    if stats["area_min"] is None or stats["area_max"] is None:
        raise ValueError("cannot estimate resolution: no valid quad areas")
    xy_res_min = math.sqrt(stats["area_min"])
    xy_res_max = math.sqrt(stats["area_max"])
    xy_res = 0.7 * xy_res_min + 0.3 * xy_res_max
    if crs.is_geographic:
        xy_res = math.degrees(xy_res / _ER)
    return float(round_to_fraction(xy_res, digits=1, resolution=0.5))
