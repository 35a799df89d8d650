"""CF-convention grid-mapping discovery for SparkDataset.

Parity reference: /root/reference/xcube_resampling/gridmapping/cfconv.py:66-212
and gridmapping/dataset.py:31-102.  Pure driver-side metadata inspection:
scans variable/coordinate attributes per the CF conventions to find candidate
(CRS, x-coords, y-coords) triples, then picks one by ``prefer_crs`` /
``prefer_is_regular``.
"""

from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_TOLERANCE
from ..crs import CRS, CRS_WGS84
from .base import GridMapping


class _Proxy:
    def __init__(self, crs=None, name=None):
        self.crs = crs
        self.name = name
        self.x = None  # (var_name, np.ndarray, dims)
        self.y = None


def _parse_crs_from_attrs(attrs: dict):
    try:
        crs = CRS.from_cf(attrs)
    except (ValueError, TypeError):
        return None
    # Require at least a grid_mapping_name (avoid matching arbitrary attrs)
    if "grid_mapping_name" not in attrs and "crs_wkt" not in attrs:
        return None
    return _Proxy(crs=crs, name=attrs.get("grid_mapping_name"))


def grid_mapping_from_dataset(
    dataset,
    *,
    crs=None,
    tile_size=None,
    prefer_is_regular: bool | None = True,
    prefer_crs=None,
    tolerance: float = DEFAULT_TOLERANCE,
) -> GridMapping:
    """Infer the GridMapping of a SparkDataset via CF conventions."""
    if crs is not None:
        crs = CRS.from_user_input(crs)
    if prefer_crs is not None:
        prefer_crs = CRS.from_user_input(prefer_crs)
    else:
        prefer_crs = crs

    proxies: dict[str | None, _Proxy] = {}

    all_attrs: dict[str, dict] = {}
    for name, var in dataset.data_vars.items():
        all_attrs[name] = var.attrs or {}
    for name, attrs in dataset.coord_attrs.items():
        all_attrs.setdefault(name, attrs or {})

    # 1. grid mapping variables referenced via CF 'grid_mapping' attribute
    #    (reference cfconv.py:91-100); the grid-mapping variable itself lives
    #    in coords/coord_attrs.
    for name, attrs in all_attrs.items():
        gm_var = attrs.get("grid_mapping")
        if gm_var and gm_var not in proxies and gm_var in dataset.coord_attrs:
            p = _parse_crs_from_attrs(dataset.coord_attrs[gm_var])
            if p is not None:
                proxies[gm_var] = p
    # also accept conventional names "spatial_ref"/"crs" coords
    for conv in ("spatial_ref", "crs"):
        if not proxies and conv in dataset.coord_attrs:
            p = _parse_crs_from_attrs(dataset.coord_attrs[conv])
            if p is not None:
                proxies[conv] = p

    # 2. CRS encoded in some variable's attrs (reference cfconv.py:104-109)
    if not proxies:
        for name, attrs in all_attrs.items():
            p = _parse_crs_from_attrs(attrs)
            if p is not None:
                proxies[name] = p
                break

    # 3. CRS in dataset attrs (reference cfconv.py:113-116)
    if not proxies:
        p = _parse_crs_from_attrs(dataset.attrs)
        if p is not None:
            proxies[None] = p

    # Find coordinate variable candidates: 1-D/2-D numpy entries of
    # dataset.coords, excluding bounds vars (reference cfconv.py:254-305).
    bounds_vars = set()
    for name, attrs in all_attrs.items():
        b = attrs.get("bounds")
        if b:
            bounds_vars.add(b)
    for name in list(dataset.coords):
        base, _, suffix = str(name).rpartition("_")
        if suffix in ("bnds", "bounds") and base in dataset.coords:
            bounds_vars.add(name)

    def coord_entry(name):
        arr = np.asarray(dataset.coords[name])
        if arr.ndim == 1:
            dims = (name,)
        else:
            dims = dataset.yx_dims[::-1] if arr.ndim == 2 else None
        return (name, arr, dims)

    latlon = _Proxy()
    projected = _Proxy()

    candidates = [
        n for n in dataset.coords
        if n not in bounds_vars
        and isinstance(dataset.coords[n], np.ndarray | list | tuple)
        and np.asarray(dataset.coords[n]).ndim in (1, 2)
    ]
    # Some products carry 2-D lon/lat as *data* variables
    # (reference fixture sampledata.py:295-421); accept spatial data vars
    # named like coordinates as candidates too if they are driver-resident.
    # (Long-format spatial vars are not scanned here.)

    # by CF standard_name (reference cfconv.py:126-138)
    for n in candidates:
        std = (dataset.coord_attrs.get(n, {}) or {}).get("standard_name")
        if latlon.x is None and std == "longitude":
            latlon.x = coord_entry(n)
        if latlon.y is None and std == "latitude":
            latlon.y = coord_entry(n)
        if projected.x is None and std == "projection_x_coordinate":
            projected.x = coord_entry(n)
        if projected.y is None and std == "projection_y_coordinate":
            projected.y = coord_entry(n)

    # by naming convention (reference cfconv.py:141-156)
    for n in candidates:
        if latlon.x is None and n in ("lon", "longitude"):
            latlon.x = coord_entry(n)
        if latlon.y is None and n in ("lat", "latitude"):
            latlon.y = coord_entry(n)
        if projected.x is None and n in ("x", "xc", "transformed_x"):
            projected.x = coord_entry(n)
        if projected.y is None and n in ("y", "yc", "transformed_y"):
            projected.y = coord_entry(n)

    # Assign coords to proxies (reference cfconv.py:158-181)
    for p in proxies.values():
        src = latlon if p.name == "latitude_longitude" else projected
        p.x, p.y = src.x, src.y

    if latlon.x is not None or latlon.y is not None:
        match = next(
            (p for p in proxies.values() if p.name == "latitude_longitude"),
            None,
        )
        if match is None:
            p = _Proxy(crs=crs or CRS_WGS84, name="latitude_longitude")
            p.x, p.y = latlon.x, latlon.y
            proxies.setdefault("__latlon__", p)
        else:
            if match.x is None:
                match.x = latlon.x
            if match.y is None:
                match.y = latlon.y
    if projected.x is not None or projected.y is not None:
        match = next(
            (p for p in proxies.values()
             if p.name != "latitude_longitude"), None
        )
        if match is None and crs is not None:
            p = _Proxy(crs=crs)
            p.x, p.y = projected.x, projected.y
            proxies.setdefault("__projected__", p)
        elif match is not None:
            if match.x is None:
                match.x = projected.x
            if match.y is None:
                match.y = projected.y

    grid_mappings = []
    for p in proxies.values():
        if (
            p.x is not None
            and p.y is not None
            and p.x[1].size >= 2
            and p.y[1].size >= 2
            and p.x[1].ndim == p.y[1].ndim
        ):
            gm = GridMapping.from_coords(
                p.x[1], p.y[1], p.crs,
                tile_size=tile_size, tolerance=tolerance,
                xy_var_names=(str(p.x[0]), str(p.y[0])),
                xy_dim_names=(
                    (str(p.x[2][0]), str(p.y[2][0]))
                    if p.x[1].ndim == 1
                    else tuple(str(d) for d in dataset.yx_dims[::-1])
                ),
            )
            grid_mappings.append(gm)

    if len(grid_mappings) > 1:
        # selection rules (reference gridmapping/dataset.py:71-97)
        if prefer_crs is not None and prefer_is_regular is not None:
            for gm in grid_mappings:
                if gm.crs == prefer_crs and bool(
                        gm.is_regular) == prefer_is_regular:
                    return gm
            for gm in grid_mappings:
                if (gm.crs.is_geographic and prefer_crs.is_geographic
                        and bool(gm.is_regular) == prefer_is_regular):
                    return gm
        if prefer_crs is not None:
            for gm in grid_mappings:
                if gm.crs == prefer_crs:
                    return gm
            for gm in grid_mappings:
                if gm.crs.is_geographic and prefer_crs.is_geographic:
                    return gm
        if prefer_is_regular is not None:
            for gm in grid_mappings:
                if bool(gm.is_regular) == prefer_is_regular:
                    return gm
    if grid_mappings:
        return grid_mappings[0]
    raise ValueError("cannot find any grid mapping in dataset")
