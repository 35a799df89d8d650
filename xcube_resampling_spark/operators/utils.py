"""Per-variable parameter resolution and shared operator helpers.

Parity reference: /root/reference/xcube_resampling/utils.py:181-332
(per-variable interp/agg/recover/fill resolution keyed by variable name or
dtype, with dtype-driven defaults) and utils.py:77-124 (bbox clip).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    INTERP_METHOD_MAPPING,
    LOG,
    default_agg_method,
    default_fill_value,
    default_interp_method,
    is_int_dtype,
)
from ..gridmapping import GridMapping


def _lookup(mapping, key: str, dtype: str):
    """Mapping lookup by variable name, then by dtype (as str or np.dtype)."""
    if key in mapping:
        return mapping[key]
    if dtype in mapping:
        return mapping[dtype]
    try:
        import numpy as np

        np_dtype = np.dtype(dtype)
        for k, v in mapping.items():
            try:
                if not isinstance(k, str) and np.dtype(k) == np_dtype:
                    return v
            except TypeError:
                continue
    except TypeError:
        pass
    return None


def get_interp_method_int(interp_methods, var_name: str, dtype: str) -> int:
    m = get_interp_method(interp_methods, var_name, dtype)
    if isinstance(m, str):
        m = INTERP_METHOD_MAPPING[m]
    return m


def get_interp_method_str(interp_methods, var_name: str, dtype: str) -> str:
    m = get_interp_method(interp_methods, var_name, dtype)
    if isinstance(m, int):
        m = INTERP_METHOD_MAPPING[m]
    return m


def get_interp_method(interp_methods, var_name: str, dtype: str):
    if isinstance(interp_methods, Mapping):
        m = _lookup(interp_methods, var_name, dtype)
        if m is None:
            LOG.warning(
                "Interpolation method could not be derived for %r; "
                "defaults assigned.", var_name,
            )
            m = default_interp_method(dtype)
        return m
    if isinstance(interp_methods, (int, str)):
        return interp_methods
    return default_interp_method(dtype)


def get_agg_method(agg_methods, var_name: str, dtype: str) -> str:
    if isinstance(agg_methods, Mapping):
        m = _lookup(agg_methods, var_name, dtype)
        if m is None:
            LOG.warning(
                "Aggregation method could not be derived for %r; "
                "defaults assigned.", var_name,
            )
            m = default_agg_method(dtype)
        return m
    if isinstance(agg_methods, str):
        return agg_methods
    return default_agg_method(dtype)


def get_recover_nan(recover_nans, var_name: str, dtype: str) -> bool:
    if isinstance(recover_nans, Mapping):
        m = _lookup(recover_nans, var_name, dtype)
        return bool(m) if m is not None else False
    if isinstance(recover_nans, bool):
        return recover_nans
    return False


def get_fill_value(fill_values, var_name: str, dtype: str):
    if isinstance(fill_values, Mapping):
        m = _lookup(fill_values, var_name, dtype)
        return m if m is not None else default_fill_value(dtype)
    if fill_values is not None:
        return fill_values
    return default_fill_value(dtype)


def prep_interp_methods_downscale(interp_methods):
    """triangular -> bilinear when downscaling
    (reference utils.py:239-251)."""
    if interp_methods == "triangular":
        return "bilinear"
    if isinstance(interp_methods, Mapping) and (
        "triangular" in interp_methods.values()
    ):
        return {
            k: ("bilinear" if v == "triangular" else v)
            for k, v in interp_methods.items()
        }
    return interp_methods


def can_apply_affine_transform(source_gm: GridMapping,
                               target_gm: GridMapping) -> bool:
    """(reference utils.py:181-189)"""
    GridMapping.assert_regular(source_gm, name="source_gm")
    GridMapping.assert_regular(target_gm, name="target_gm")
    return is_equal_crs(source_gm, target_gm)


def is_equal_crs(source_gm: GridMapping, target_gm: GridMapping) -> bool:
    geographic = source_gm.crs.is_geographic and target_gm.crs.is_geographic
    return geographic or source_gm.crs.equals(target_gm.crs)


def clip_pixels_by_ij_bbox(df: DataFrame, ij_bbox) -> DataFrame:
    """Range predicate on pixel indices; Catalyst pushes it into the scan
    (parity with reference utils.py:77-124 coordinate clipping)."""
    i_min, j_min, i_max, j_max = ij_bbox
    return df.filter(
        (F.col("i") >= i_min)
        & (F.col("i") < i_max)
        & (F.col("j") >= j_min)
        & (F.col("j") < j_max)
    )


def is_float_dtype(dtype: str) -> bool:
    return not is_int_dtype(dtype)
