"""Shared constants and type aliases.

Parity reference: /root/reference/xcube_resampling/constants.py:30-82
(fill values, interpolation/aggregation method enums, SCALE_LIMIT, UV_DELTA).
"""

from __future__ import annotations

import logging
import math

FloatInt = int | float
# 2x3 affine matrix ((a, b, c), (d, e, f)):
#   x' = a*x + b*y + c ; y' = d*x + e*y + f
AffineTransformMatrix = tuple[
    tuple[FloatInt, FloatInt, FloatInt], tuple[FloatInt, FloatInt, FloatInt]
]

AGG_METHOD_NAMES = (
    "center",
    "count",
    "first",
    "last",
    "max",
    "mean",
    "median",
    "min",
    "mode",
    "prod",
    "std",
    "sum",
    "var",
)

INTERP_METHOD_MAPPING = {0: "nearest", 1: "bilinear", "nearest": 0, "bilinear": 1}

# Fill values by dtype (reference constants.py:74-77)
FILLVALUE_UINT8 = 255
FILLVALUE_UINT16 = 65535
FILLVALUE_INT = -1
FILLVALUE_FLOAT = math.nan

# If source resolution / target resolution is below this, pre-downscale
# before reproject/rectify (reference constants.py:79).
SCALE_LIMIT = 0.95
# Barycentric tolerance for the rectify point-in-quad test
# (reference constants.py:80).
UV_DELTA = 1e-3

DEFAULT_TOLERANCE = 1.0e-5

LOG = logging.getLogger("xcube_resampling_spark")

INT_DTYPES = ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64")
FLOAT_DTYPES = ("float32", "float64")


def is_int_dtype(dtype: str) -> bool:
    return str(dtype) in INT_DTYPES


def default_fill_value(dtype: str) -> FloatInt:
    """Default fill value by dtype (reference utils.py:307-316)."""
    dtype = str(dtype)
    if dtype == "uint8":
        return FILLVALUE_UINT8
    if dtype == "uint16":
        return FILLVALUE_UINT16
    if is_int_dtype(dtype):
        return FILLVALUE_INT
    return FILLVALUE_FLOAT


def default_interp_method(dtype: str) -> int:
    """0 (nearest) for ints, 1 (bilinear) for floats (reference utils.py:197-198)."""
    return 0 if is_int_dtype(dtype) else 1


def default_agg_method(dtype: str) -> str:
    """'center' for ints, 'mean' for floats (reference utils.py:259-260)."""
    return "center" if is_int_dtype(dtype) else "mean"
