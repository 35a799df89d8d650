"""GridMapping: driver-side grid metadata for the Spark engine.

Parity reference: /root/reference/xcube_resampling/gridmapping/base.py:59-913,
regular.py:87-166, coords.py:99-327.  In the reference this object carries
lazy dask coordinate arrays; here it is pure driver-side metadata (plus small
numpy coordinate arrays for irregular grids) that parameterizes generated
Spark query plans.  Grid coordinates of regular grids are never materialized:
they are computed as Spark column expressions
``x = x_min + (i + 0.5) * x_res``.
"""

from __future__ import annotations

import math
from functools import cached_property

import numpy as np

from ..constants import AffineTransformMatrix, DEFAULT_TOLERANCE, FloatInt
from ..crs import CRS, Transformer
from .helpers import (
    affine_compose,
    affine_invert,
    default_xy_var_names,
    from_lon_360,
    normalize_int_pair,
    normalize_number_pair,
    round_to_fraction,
    scale_xy_res_and_size,
    to_int_or_float,
    to_lon_360,
)

__all__ = ["GridMapping"]


class GridMapping:
    """Defines an image grid and the transform from pixel coordinates to
    spatial coordinates in a CRS.

    For regular grids, ``x_coords``/``y_coords`` are derived 1-D arrays.
    For irregular grids they are the 2-D per-pixel coordinate images.
    """

    def __init__(
        self,
        size: tuple[int, int],
        tile_size: tuple[int, int] | None,
        xy_bbox: tuple[FloatInt, FloatInt, FloatInt, FloatInt],
        xy_res: tuple[FloatInt, FloatInt],
        crs: CRS,
        xy_var_names: tuple[str, str],
        xy_dim_names: tuple[str, str],
        is_regular: bool | None = None,
        is_lon_360: bool | None = None,
        is_j_axis_up: bool | None = None,
        x_coords: np.ndarray | None = None,
        y_coords: np.ndarray | None = None,
    ):
        width, height = normalize_int_pair(size)
        if not (width > 1 and height > 1):
            raise ValueError("invalid size")
        tile_width, tile_height = normalize_int_pair(
            tile_size, default=(width, height)
        )
        if not (tile_width > 1 and tile_height > 1):
            raise ValueError("invalid tile_size")
        x_min, y_min, x_max, y_max = xy_bbox
        x_res, y_res = normalize_number_pair(xy_res)
        if not (x_res > 0 and y_res > 0):
            raise ValueError("invalid xy_res")

        self._size = (width, height)
        self._tile_size = (tile_width, tile_height)
        self._xy_bbox = (x_min, y_min, x_max, y_max)
        self._xy_res = (x_res, y_res)
        self._crs = crs
        self._xy_var_names = xy_var_names
        self._xy_dim_names = xy_dim_names
        self._is_regular = is_regular
        self._is_lon_360 = is_lon_360
        self._is_j_axis_up = is_j_axis_up
        self._x_coords = x_coords
        self._y_coords = y_coords

    # -------------------------------------------------------------- #
    # basic properties

    @property
    def size(self) -> tuple[int, int]:
        return self._size

    @property
    def width(self) -> int:
        return self._size[0]

    @property
    def height(self) -> int:
        return self._size[1]

    @property
    def tile_size(self) -> tuple[int, int]:
        return self._tile_size

    @property
    def is_tiled(self) -> bool:
        return self._size != self._tile_size

    @property
    def tile_width(self) -> int:
        return self._tile_size[0]

    @property
    def tile_height(self) -> int:
        return self._tile_size[1]

    @property
    def xy_bbox(self):
        return self._xy_bbox

    @property
    def x_min(self):
        return self._xy_bbox[0]

    @property
    def y_min(self):
        return self._xy_bbox[1]

    @property
    def x_max(self):
        return self._xy_bbox[2]

    @property
    def y_max(self):
        return self._xy_bbox[3]

    @property
    def xy_res(self):
        return self._xy_res

    @property
    def x_res(self):
        return self._xy_res[0]

    @property
    def y_res(self):
        return self._xy_res[1]

    @property
    def crs(self) -> CRS:
        return self._crs

    @property
    def xy_var_names(self) -> tuple[str, str]:
        return self._xy_var_names

    @property
    def xy_dim_names(self) -> tuple[str, str]:
        return self._xy_dim_names

    @property
    def is_regular(self) -> bool | None:
        return self._is_regular

    @property
    def is_lon_360(self) -> bool | None:
        return self._is_lon_360

    @property
    def is_j_axis_up(self) -> bool | None:
        return self._is_j_axis_up

    # -------------------------------------------------------------- #
    # coordinates

    @cached_property
    def x_coords(self) -> np.ndarray:
        if self._x_coords is not None:
            return self._x_coords
        self._assert_regular()
        res = self.x_res
        return np.linspace(
            self.x_min + res / 2, self.x_max - res / 2, self.width
        )

    @cached_property
    def y_coords(self) -> np.ndarray:
        if self._y_coords is not None:
            return self._y_coords
        self._assert_regular()
        res = self.y_res
        y1, y2 = self.y_min + res / 2, self.y_max - res / 2
        if not self.is_j_axis_up:
            y1, y2 = y2, y1
        return np.linspace(y1, y2, self.height)

    @cached_property
    def xy_coords(self) -> np.ndarray:
        """(2, height, width) array of per-pixel x,y coordinates."""
        if self.x_coords.ndim == 2:
            return np.stack([self.x_coords, self.y_coords])
        yy, xx = np.meshgrid(self.y_coords, self.x_coords, indexing="ij")
        return np.stack([xx, yy])

    # -------------------------------------------------------------- #
    # affine transforms (reference base.py:437-496)

    @property
    def ij_to_xy_transform(self) -> AffineTransformMatrix:
        self._assert_regular()
        if self.is_j_axis_up:
            return (
                (self.x_res, 0.0, self.x_min),
                (0.0, self.y_res, self.y_min),
            )
        return (
            (self.x_res, 0.0, self.x_min),
            (0.0, -self.y_res, self.y_max),
        )

    @property
    def xy_to_ij_transform(self) -> AffineTransformMatrix:
        self._assert_regular()
        return affine_invert(self.ij_to_xy_transform)

    def ij_transform_to(self, other: "GridMapping") -> AffineTransformMatrix:
        """Matrix mapping *self* image coords into *other* image coords
        (reference base.py:461-478: ``other.xy_to_ij @ self.ij_to_xy``)."""
        self._assert_regular()
        other._assert_regular()
        return affine_compose(other.xy_to_ij_transform, self.ij_to_xy_transform)

    def ij_transform_from(self, other: "GridMapping") -> AffineTransformMatrix:
        return affine_invert(self.ij_transform_to(other))

    # -------------------------------------------------------------- #
    # tiling / bboxes (reference base.py:499-606)

    @property
    def ij_bbox(self) -> tuple[int, int, int, int]:
        return 0, 0, self.width, self.height

    @property
    def num_tiles(self) -> tuple[int, int]:
        return (
            math.ceil(self.width / self.tile_width),
            math.ceil(self.height / self.tile_height),
        )

    @property
    def ij_bboxes(self) -> np.ndarray:
        """Tile bounding boxes [i_min, j_min, i_max(excl), j_max(excl)],
        row-major over the tile grid."""
        ntx, nty = self.num_tiles
        out = np.zeros((ntx * nty, 4), dtype=np.int64)
        k = 0
        for tj in range(nty):
            for ti in range(ntx):
                i0 = ti * self.tile_width
                j0 = tj * self.tile_height
                out[k] = (
                    i0,
                    j0,
                    min(i0 + self.tile_width, self.width),
                    min(j0 + self.tile_height, self.height),
                )
                k += 1
        return out

    @property
    def xy_bboxes(self) -> np.ndarray:
        """Tile bounding boxes in CRS coordinates (reference
        base.py:521-533)."""
        ij = self.ij_bboxes
        if self.is_j_axis_up:
            off = np.array([self.x_min, self.y_min, self.x_min, self.y_min])
            scale = np.array([self.x_res, self.y_res, self.x_res, self.y_res])
            return off + scale * ij
        off = np.array([self.x_min, self.y_max, self.x_min, self.y_max])
        scale = np.array([self.x_res, -self.y_res, self.x_res, -self.y_res])
        out = off + scale * ij
        out[:, [1, 3]] = out[:, [3, 1]]
        return out

    def ij_bbox_from_xy_bbox(
        self, xy_bbox, xy_border: float = 0.0, ij_border: int = 0
    ) -> tuple[int, int, int, int]:
        boxes = self.ij_bboxes_from_xy_bboxes(
            np.array([xy_bbox], dtype=np.float64),
            xy_border=xy_border,
            ij_border=ij_border,
        )
        return tuple(int(v) for v in boxes[0])

    def ij_bboxes_from_xy_bboxes(
        self, xy_bboxes: np.ndarray, xy_border: float = 0.0, ij_border: int = 0
    ) -> np.ndarray:
        """For each xy bbox, the i,j index bbox of coordinate pixels inside
        it; (-1,-1,-1,-1) when disjoint.

        Parity: reference bboxes.py:28-106 (Numba scan over the full coord
        image per box).  Here a vectorized numpy scan over the (2,H,W)
        coordinate image -- driver-side, used for planning only.
        """
        xy = self.xy_coords  # (2, H, W)
        x, y = xy[0], xy[1]
        h, w = x.shape[-2], x.shape[-1]
        out = np.full((len(xy_bboxes), 4), -1, dtype=np.int64)
        for k, (x_min, y_min, x_max, y_max) in enumerate(xy_bboxes):
            mask = (
                (x >= x_min - xy_border)
                & (x <= x_max + xy_border)
                & (y >= y_min - xy_border)
                & (y <= y_max + xy_border)
            )
            jj, ii = np.nonzero(mask)
            if jj.size == 0:
                continue
            i_min = max(int(ii.min()) - ij_border, 0)
            j_min = max(int(jj.min()) - ij_border, 0)
            i_max = min(int(ii.max()) + 1 + ij_border, w)
            j_max = min(int(jj.max()) + 1 + ij_border, h)
            out[k] = (i_min, j_min, i_max, j_max)
        return out

    @cached_property
    def xy_bbox_computed(self) -> tuple[float, float, float, float]:
        return self._xy_bbox

    # -------------------------------------------------------------- #
    # derivation (reference base.py:145-246, 704-758)

    def derive(
        self,
        xy_var_names: tuple[str, str] | None = None,
        xy_dim_names: tuple[str, str] | None = None,
        tile_size=None,
        is_j_axis_up: bool | None = None,
    ) -> "GridMapping":
        gm = GridMapping(
            size=self._size,
            tile_size=normalize_int_pair(tile_size, default=self._tile_size),
            xy_bbox=self._xy_bbox,
            xy_res=self._xy_res,
            crs=self._crs,
            xy_var_names=xy_var_names or self._xy_var_names,
            xy_dim_names=xy_dim_names or self._xy_dim_names,
            is_regular=self._is_regular,
            is_lon_360=self._is_lon_360,
            is_j_axis_up=(
                self._is_j_axis_up if is_j_axis_up is None else is_j_axis_up
            ),
            x_coords=self._x_coords,
            y_coords=(
                self._y_coords[::-1]
                if (
                    is_j_axis_up is not None
                    and is_j_axis_up != self._is_j_axis_up
                    and self._y_coords is not None
                )
                else self._y_coords
            ),
        )
        return gm

    def scale(self, xy_scale, tile_size=None) -> "GridMapping":
        """Scaled regular grid; factors > 1 upscale (reference
        base.py:207-246)."""
        self._assert_regular()
        x_scale, y_scale = normalize_number_pair(xy_scale)
        new_xy_res, new_size = scale_xy_res_and_size(
            self.xy_res, self.size, (x_scale, y_scale)
        )
        tile = normalize_int_pair(tile_size, default=self.tile_size)
        tile = (min(new_size[0], tile[0]), min(new_size[1], tile[1]))
        return GridMapping.regular(
            new_size,
            (self.x_min, self.y_min),
            new_xy_res,
            self.crs,
            tile_size=tile,
            is_j_axis_up=self.is_j_axis_up,
        ).derive(
            xy_dim_names=self.xy_dim_names, xy_var_names=self.xy_var_names
        )

    @classmethod
    def regular(
        cls,
        size,
        xy_min: tuple[float, float],
        xy_res,
        crs,
        *,
        tile_size=None,
        is_j_axis_up: bool = False,
    ) -> "GridMapping":
        """New regular grid mapping (reference regular.py:87-129)."""
        width, height = normalize_int_pair(size)
        if not (width > 1 and height > 1):
            raise ValueError("invalid size")
        x_min, y_min = normalize_number_pair(xy_min)
        x_res, y_res = normalize_number_pair(xy_res)
        if not (x_res > 0 and y_res > 0):
            raise ValueError("invalid xy_res")
        crs = CRS.from_user_input(crs)
        x_min = to_int_or_float(x_min)
        y_min = to_int_or_float(y_min)
        x_max = to_int_or_float(x_min + x_res * width)
        y_max = to_int_or_float(y_min + y_res * height)
        if crs.is_geographic:
            if y_min < -90:
                raise ValueError("invalid y_min")
            if y_max > 90:
                raise ValueError("invalid size, y_min combination")
        names = default_xy_var_names(crs)
        return cls(
            size=(width, height),
            tile_size=tile_size or (width, height),
            xy_bbox=(x_min, y_min, x_max, y_max),
            xy_res=(x_res, y_res),
            crs=crs,
            xy_var_names=names,
            xy_dim_names=names,
            is_regular=True,
            is_lon_360=(x_max > 180) and crs.is_geographic,
            is_j_axis_up=is_j_axis_up,
        )

    def to_regular(self, tile_size=None,
                   is_j_axis_up: bool = False) -> "GridMapping":
        """Regular grid covering this (possibly irregular) grid
        (reference regular.py:132-166)."""
        if self.is_regular:
            if tile_size is not None or is_j_axis_up != self.is_j_axis_up:
                return self.derive(
                    tile_size=tile_size, is_j_axis_up=is_j_axis_up
                )
            return self
        x_min, y_min, x_max, y_max = self.xy_bbox
        x_res, y_res = self.xy_res
        xy_res = min(x_res, y_res) or max(x_res, y_res)
        width = round((x_max - x_min + xy_res) / xy_res)
        height = round((y_max - y_min + xy_res) / xy_res)
        width = width if width >= 2 else 2
        height = height if height >= 2 else 2
        if tile_size is None:
            tile_size = self.tile_size
        return GridMapping.regular(
            size=(width, height),
            xy_min=(x_min, y_min),
            xy_res=xy_res,
            crs=self.crs,
            tile_size=tile_size,
            is_j_axis_up=is_j_axis_up,
        )

    def transform(self, crs, *, xy_res=None, tile_size=None,
                  tolerance: float = DEFAULT_TOLERANCE) -> "GridMapping":
        """Transform the per-pixel coordinates into another CRS, producing a
        (generally irregular) 2-D-coords grid mapping
        (reference gridmapping/transform.py:40-125)."""
        crs = CRS.from_user_input(crs)
        transformer = Transformer.from_crs(self.crs, crs)
        xy = self.xy_coords
        tx, ty = transformer.transform(xy[0], xy[1])
        return GridMapping.from_coords_2d(
            np.asarray(tx), np.asarray(ty), crs,
            tile_size=tile_size or self.tile_size, xy_res=xy_res,
            tolerance=tolerance,
        )

    # -------------------------------------------------------------- #
    # inference from coordinates (reference coords.py:99-327)

    @classmethod
    def from_coords(cls, x_coords: np.ndarray, y_coords: np.ndarray, crs,
                    *, tile_size=None,
                    tolerance: float = DEFAULT_TOLERANCE,
                    xy_var_names: tuple[str, str] | None = None,
                    xy_dim_names: tuple[str, str] | None = None,
                    ) -> "GridMapping":
        x_coords = np.asarray(x_coords)
        y_coords = np.asarray(y_coords)
        if x_coords.ndim == 1:
            return cls.from_coords_1d(
                x_coords, y_coords, crs, tile_size=tile_size,
                tolerance=tolerance, xy_var_names=xy_var_names,
                xy_dim_names=xy_dim_names,
            )
        return cls.from_coords_2d(
            x_coords, y_coords, crs, tile_size=tile_size,
            tolerance=tolerance, xy_var_names=xy_var_names,
            xy_dim_names=xy_dim_names,
        )

    @classmethod
    def from_coords_1d(cls, x_coords, y_coords, crs, *, tile_size=None,
                       tolerance: float = DEFAULT_TOLERANCE,
                       xy_var_names=None, xy_dim_names=None) -> "GridMapping":
        """Infer grid from 1-D axes (reference coords.py:128-174)."""
        crs = CRS.from_user_input(crs)
        if x_coords.size < 2 or y_coords.size < 2:
            raise ValueError(
                "sizes of x_coords and y_coords 1D arrays must be >= 2"
            )
        size = (x_coords.size, y_coords.size)
        is_lon_360 = bool(np.any(x_coords > 180)) if crs.is_geographic else None

        x_diff = _abs_no_zero(np.diff(x_coords))
        y_diff = _abs_no_zero(np.diff(y_coords))
        if crs.is_geographic and not is_lon_360:
            if np.any(np.nanmax(x_diff) > 180):
                x_coords = to_lon_360(x_coords)
                x_diff = _abs_no_zero(np.diff(x_coords))
                is_lon_360 = True

        x_res = x_diff[0]
        y_res = y_diff[0]
        is_regular = bool(
            np.allclose(x_diff, x_res, atol=tolerance)
            and np.allclose(y_diff, y_res, atol=tolerance)
        )
        if is_regular:
            x_res = float(round_to_fraction(float(x_res), 5, 0.25))
            y_res = float(round_to_fraction(float(y_res), 5, 0.25))
        else:
            x_res = float(round_to_fraction(
                float(np.nanmedian(x_diff)), 2, 0.5))
            y_res = float(round_to_fraction(
                float(np.nanmedian(y_diff)), 2, 0.5))

        is_j_axis_up = bool(y_coords[0] < y_coords[-1])
        bbox = _bbox_from_coords(
            x_coords, y_coords, x_res, y_res, is_j_axis_up
        )
        names = (xy_var_names or default_xy_var_names(crs))
        return cls(
            size=size,
            tile_size=tile_size,
            xy_bbox=bbox,
            xy_res=(to_int_or_float(x_res), to_int_or_float(y_res)),
            crs=crs,
            xy_var_names=names,
            xy_dim_names=xy_dim_names or names,
            is_regular=is_regular,
            is_lon_360=is_lon_360,
            is_j_axis_up=is_j_axis_up,
            x_coords=x_coords if not is_regular else None,
            y_coords=y_coords if not is_regular else None,
        )

    @classmethod
    def from_coords_2d(cls, x_coords, y_coords, crs, *, tile_size=None,
                       xy_res=None, tolerance: float = DEFAULT_TOLERANCE,
                       xy_var_names=None, xy_dim_names=None) -> "GridMapping":
        """Infer grid from 2-D coordinate images
        (reference coords.py:176-327 incl. the area-based resolution
        estimation for irregular swaths)."""
        crs = CRS.from_user_input(crs)
        if x_coords.shape != y_coords.shape:
            raise ValueError(
                "shapes of x_coords and y_coords 2D arrays must be equal"
            )
        height, width = x_coords.shape
        size = (width, height)
        is_lon_360 = bool(np.any(x_coords > 180)) if crs.is_geographic else None

        x = np.asarray(x_coords, dtype=np.float64)
        y = np.asarray(y_coords, dtype=np.float64)
        x_x_diff = _abs_no_nan(np.diff(x[0, :]))
        x_y_diff = _abs_no_nan(np.diff(x[:, 0]))
        y_x_diff = _abs_no_nan(np.diff(y[0, :]))
        y_y_diff = _abs_no_nan(np.diff(y[:, 0]))

        if crs.is_geographic and not is_lon_360:
            if np.any(x_x_diff > 180) or np.any(x_y_diff > 180):
                x_coords = to_lon_360(x_coords)
                x = np.asarray(x_coords, dtype=np.float64)
                x_x_diff = _abs_no_nan(np.diff(x[0, :]))
                x_y_diff = _abs_no_nan(np.diff(x[:, 0]))
                is_lon_360 = True

        if xy_res is not None:
            x_res, y_res = normalize_number_pair(xy_res)
            is_regular = bool(
                np.allclose(x_x_diff, x_res, atol=tolerance)
                and np.allclose(y_y_diff, y_res, atol=tolerance)
                and np.allclose(x_y_diff, 0, atol=tolerance)
                and np.allclose(y_x_diff, 0, atol=tolerance)
            )
        else:
            x_res = x_x_diff[0]
            y_res = y_y_diff[0]
            is_regular = bool(
                np.allclose(x_x_diff, x_res, atol=tolerance)
                and np.allclose(y_y_diff, y_res, atol=tolerance)
                and np.allclose(x_y_diff, 0, atol=tolerance)
                and np.allclose(y_x_diff, 0, atol=tolerance)
            )
            if not is_regular:
                x_res = y_res = _estimate_irregular_res(x, y, crs)

        is_j_axis_up = bool(np.all(y[0, :] < y[-1, :]))
        bbox = _bbox_from_coords(
            x_coords, y_coords, x_res, y_res, is_j_axis_up
        )
        names = (xy_var_names or default_xy_var_names(crs))
        return cls(
            size=size,
            tile_size=tile_size,
            xy_bbox=bbox,
            xy_res=(to_int_or_float(x_res), to_int_or_float(y_res)),
            crs=crs,
            xy_var_names=names,
            xy_dim_names=xy_dim_names or names,
            is_regular=is_regular,
            is_lon_360=is_lon_360,
            is_j_axis_up=is_j_axis_up,
            x_coords=np.asarray(x_coords, dtype=np.float64),
            y_coords=np.asarray(y_coords, dtype=np.float64),
        )

    # -------------------------------------------------------------- #
    # comparison (reference base.py:839-876)

    def is_close(self, other: "GridMapping",
                 tolerance: float = DEFAULT_TOLERANCE) -> bool:
        if self is other:
            return True
        if (
            self.is_j_axis_up == other.is_j_axis_up
            and self.is_lon_360 == other.is_lon_360
            and self.is_regular == other.is_regular
            and self.size == other.size
            and self.tile_size == other.tile_size
            and self.crs == other.crs
        ):
            sxr, syr = self.xy_res
            oxr, oyr = other.xy_res
            if math.isclose(sxr, oxr, abs_tol=tolerance) and math.isclose(
                syr, oyr, abs_tol=tolerance
            ):
                return all(
                    math.isclose(s, o, abs_tol=tolerance)
                    for s, o in zip(self.xy_bbox, other.xy_bbox)
                )
        return False

    # -------------------------------------------------------------- #
    # CF coords (reference coords.py:340-472)

    def to_coords(self, exclude_bounds: bool = False) -> dict[str, np.ndarray]:
        self._assert_regular()
        w, h = self.size
        x1, y1, x2, y2 = self.xy_bbox
        x_res, y_res = self.xy_res
        x_data = np.linspace(x1 + x_res / 2, x2 - x_res / 2, w)
        if self.is_lon_360:
            x_data = from_lon_360(x_data)
        if self.is_j_axis_up:
            y_data = np.linspace(y1 + y_res / 2, y2 - y_res / 2, h)
        else:
            y_data = np.linspace(y2 - y_res / 2, y1 + y_res / 2, h)
        x_name, y_name = self.xy_var_names
        coords = {x_name: x_data, y_name: y_data}
        if not exclude_bounds:
            x_b0 = np.linspace(x1, x2 - x_res, w)
            x_b1 = np.linspace(x1 + x_res, x2, w)
            if self.is_lon_360:
                x_b0, x_b1 = from_lon_360(x_b0), from_lon_360(x_b1)
            if self.is_j_axis_up:
                y_b0 = np.linspace(y1, y2 - y_res, h)
                y_b1 = np.linspace(y1 + y_res, y2, h)
            else:
                y_b0 = np.linspace(y2, y1 + y_res, h)
                y_b1 = np.linspace(y2 - y_res, y1, h)
            coords[f"{x_name}_bnds"] = np.stack([x_b0, x_b1], axis=-1)
            coords[f"{y_name}_bnds"] = np.stack([y_b0, y_b1], axis=-1)
        return coords

    # -------------------------------------------------------------- #

    @classmethod
    def assert_regular(cls, value, name: str = "value"):
        if not isinstance(value, GridMapping):
            raise TypeError(f"{name} must be a GridMapping")
        if not value.is_regular:
            raise ValueError(f"{name} must be a regular grid mapping")

    def _assert_regular(self):
        if not self.is_regular:
            raise NotImplementedError(
                "Operation not implemented for non-regular grid mappings"
            )

    def __repr__(self):
        return (
            f"GridMapping(size={self.size}, xy_bbox={self.xy_bbox}, "
            f"xy_res={self.xy_res}, crs={self.crs.name!r}, "
            f"is_regular={self.is_regular}, "
            f"is_j_axis_up={self.is_j_axis_up})"
        )


# ------------------------------------------------------------------ #
# inference helpers

def _abs_no_zero(array):
    array = np.fabs(array)
    return np.where(np.isclose(array, 0), np.nan, array)


def _abs_no_nan(array):
    array = np.fabs(array)
    return np.where(np.logical_or(np.isnan(array), np.isclose(array, 0)),
                    0, array)


_ER = 6371000


def _estimate_irregular_res(x: np.ndarray, y: np.ndarray, crs: CRS) -> float:
    """Area-based resolution estimation for irregular 2-D coordinates
    (reference coords.py:226-264; same weighting 0.7*min + 0.3*max)."""
    x_x_diff = _abs_no_nan(np.diff(x, axis=1))
    x_y_diff = _abs_no_nan(np.diff(x, axis=0))
    y_x_diff = _abs_no_nan(np.diff(y, axis=1))
    y_y_diff = _abs_no_nan(np.diff(y, axis=0))
    x_x_diff_c = np.concatenate([x_x_diff, x_x_diff[:, -1:]], axis=1)
    y_x_diff_c = np.concatenate([y_x_diff, y_x_diff[:, -1:]], axis=1)
    x_y_diff_c = np.concatenate([x_y_diff, x_y_diff[-1:, :]], axis=0)
    y_y_diff_c = np.concatenate([y_y_diff, y_y_diff[-1:, :]], axis=0)
    x_abs_diff = np.sqrt(np.square(x_x_diff_c) + np.square(x_y_diff_c))
    y_abs_diff = np.sqrt(np.square(y_x_diff_c) + np.square(y_y_diff_c))
    if crs.is_geographic:
        x_abs_diff_r = np.radians(x_abs_diff)
        y_abs_diff_r = np.radians(y_abs_diff)
        x_abs_diff = _ER * np.cos(x_abs_diff_r) * y_abs_diff_r
        y_abs_diff = _ER * y_abs_diff_r
    xy_areas = (x_abs_diff * y_abs_diff).flatten()
    xy_areas = np.where(xy_areas > 0, xy_areas, np.nan)
    xy_res_min = math.sqrt(np.nanmin(xy_areas))
    xy_res_max = math.sqrt(np.nanmax(xy_areas))
    xy_res = 0.7 * xy_res_min + 0.3 * xy_res_max
    if crs.is_geographic:
        xy_res = math.degrees(xy_res / _ER)
    return float(round_to_fraction(xy_res, digits=1, resolution=0.5))


def _bbox_from_coords(x_coords, y_coords, x_res, y_res, is_j_axis_up):
    """xy bbox grown by half a pixel (reference coords.py:297-307)."""
    x_res_05, y_res_05 = x_res / 2, y_res / 2
    x_min = to_int_or_float(float(np.min(x_coords[..., 0])) - x_res_05)
    x_max = to_int_or_float(float(np.max(x_coords[..., -1])) + x_res_05)
    if is_j_axis_up:
        y_min = to_int_or_float(float(np.min(y_coords[0, ...])) - y_res_05)
        y_max = to_int_or_float(float(np.max(y_coords[-1, ...])) + y_res_05)
    else:
        y_min = to_int_or_float(float(np.min(y_coords[-1, ...])) - y_res_05)
        y_max = to_int_or_float(float(np.max(y_coords[0, ...])) + y_res_05)
    return (x_min, y_min, x_max, y_max)
