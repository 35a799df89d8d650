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


def _is_dims_tuple(val) -> bool:
    """True for the xarray-style ``(dims, array)`` coord declaration:
    a 2-tuple whose first element is a tuple/list of dim-name strings."""
    return (
        isinstance(val, tuple) and len(val) == 2
        and isinstance(val[0], (tuple, list))
        and len(val[0]) > 0
        and all(isinstance(d, str) for d in val[0])
    )


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
    prefer_is_regular: bool | None = None,
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
        # a coord may be declared as an xarray-style (dims, array)
        # tuple when its dims differ from the dataset's yx_dims (the
        # reference reads coords.x.dims off the DataArray); bare arrays
        # default to (name,) for 1-D and the dataset's (y, x) for 2-D.
        val = dataset.coords[name]
        cdims = None
        if _is_dims_tuple(val):
            cdims, val = val
            cdims = tuple(str(d) for d in cdims)
        arr = np.asarray(val)
        if cdims is not None:
            dims = cdims
        elif arr.ndim == 1:
            dims = (name,)
        else:
            # natural array order (y_dim, x_dim), like xarray's .dims
            dims = tuple(dataset.yx_dims) if arr.ndim == 2 else None
        return (name, arr, dims)

    latlon = _Proxy()
    rotated = _Proxy()
    projected = _Proxy()

    def _coord_array(val):
        # unwrap the xarray-style (dims, array) tuple form; bare
        # number tuples/lists remain coordinate data as before
        if _is_dims_tuple(val):
            val = val[1]
        if isinstance(val, (np.ndarray, list, tuple)):
            try:
                arr = np.asarray(val)
            except ValueError:
                return None
            return None if arr.dtype == object else arr
        return None

    candidates = [
        n for n in dataset.coords
        if n not in bounds_vars
        and (arr := _coord_array(dataset.coords[n])) is not None
        and arr.ndim in (1, 2)
    ]
    # NOTE: in this engine 2-D lon/lat images must arrive via
    # dataset.coords (driver numpy) or through GridMappingDF for the
    # distributed path -- data variables are long-format DataFrames and
    # carry no driver-resident arrays to scan, unlike the reference's
    # xarray dataset.variables sweep.

    # by CF standard_name (reference cfconv.py:126-138, incl. the
    # rotated-pole grid_longitude/grid_latitude pair)
    for n in candidates:
        std = (dataset.coord_attrs.get(n, {}) or {}).get("standard_name")
        if latlon.x is None and std == "longitude":
            latlon.x = coord_entry(n)
        if latlon.y is None and std == "latitude":
            latlon.y = coord_entry(n)
        if rotated.x is None and std == "grid_longitude":
            rotated.x = coord_entry(n)
        if rotated.y is None and std == "grid_latitude":
            rotated.y = coord_entry(n)
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
        if rotated.x is None and n in ("rlon", "rlongitude"):
            rotated.x = coord_entry(n)
        if rotated.y is None and n in ("rlat", "rlatitude"):
            rotated.y = coord_entry(n)
        if projected.x is None and n in ("x", "xc", "transformed_x"):
            projected.x = coord_entry(n)
        if projected.y is None and n in ("y", "yc", "transformed_y"):
            projected.y = coord_entry(n)

    # Assign coords to proxies by grid-mapping name
    # (reference cfconv.py:158-165)
    for p in proxies.values():
        if p.name == "latitude_longitude":
            src = latlon
        elif p.name == "rotated_latitude_longitude":
            src = rotated
        else:
            src = projected
        p.x, p.y = src.x, src.y

    # Complement rules (reference _complement_grid_mapping_coords,
    # cfconv.py:224-251): each coord bucket either fills the matching
    # proxy's missing axes or creates a proxy when a fallback CRS is
    # known.  The projected bucket matches ANY proxy (name filter None)
    # -- that covers the GeoTIFF CRS-84 edge case where a
    # latitude_longitude mapping comes with coords literally named
    # "x"/"y" as rioxarray reads them.
    def _complement(bucket, name_filter, missing_crs):
        if bucket.x is None and bucket.y is None:
            return
        match = next(
            (p for p in proxies.values()
             if name_filter is None or p.name == name_filter),
            None,
        )
        if match is None and missing_crs is not None:
            p = _Proxy(crs=missing_crs, name=name_filter)
            p.x, p.y = bucket.x, bucket.y
            proxies.setdefault(f"__{name_filter or 'projected'}__", p)
            return
        if match is not None:
            if match.x is None:
                match.x = bucket.x
            if match.y is None:
                match.y = bucket.y

    _complement(latlon, "latitude_longitude", crs or CRS_WGS84)
    _complement(rotated, "rotated_latitude_longitude", crs)
    _complement(projected, None, crs)

    grid_mappings = []
    for p in proxies.values():
        if (
            p.x is not None
            and p.y is not None
            and p.x[1].size >= 2
            and p.y[1].size >= 2
            and p.x[1].ndim == p.y[1].ndim
        ):
            # tile size falls back to the dataset's declared chunking
            # (reference _find_dataset_tile_size via get_dataset_chunks)
            if tile_size is None:
                from .helpers import get_dataset_chunks

                chunks = get_dataset_chunks(dataset)
                if p.x[1].ndim == 1:
                    txd, tyd = str(p.x[2][0]), str(p.y[2][0])
                else:
                    # reference _find_dataset_tile_size keys the chunk
                    # lookup by the COORD VARIABLE's own dims
                    # (coords.x.dims[0]=y, [1]=x), not dataset.yx_dims
                    # -- a 2-D lon/lat pair on different dims would
                    # silently get no tile size otherwise
                    tyd, txd = str(p.x[2][0]), str(p.x[2][1])
                tw_, th_ = chunks.get(txd), chunks.get(tyd)
                eff_tile = (tw_, th_) \
                    if tw_ is not None and th_ is not None else None
            else:
                eff_tile = tile_size
            gm = GridMapping.from_coords(
                p.x[1], p.y[1], p.crs,
                tile_size=eff_tile, tolerance=tolerance,
                xy_var_names=(str(p.x[0]), str(p.y[0])),
                xy_dim_names=(
                    (str(p.x[2][0]), str(p.y[2][0]))
                    if p.x[1].ndim == 1
                    else (str(p.x[2][1]), str(p.x[2][0]))
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
