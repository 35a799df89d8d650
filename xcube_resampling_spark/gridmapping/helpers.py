"""Driver-side numeric helpers for grid mappings.

Parity reference: /root/reference/xcube_resampling/gridmapping/helpers.py
(affine matrix ops, lon-360 normalization, fraction rounding, scaling).
Implemented from scratch on plain Python/numpy (no `affine` package).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from ..constants import AffineTransformMatrix, FloatInt


def to_int_or_float(x: FloatInt) -> FloatInt:
    """Snap near-integer floats to int (reference helpers.py:39-48)."""
    if isinstance(x, int):
        return x
    xf = float(x)
    xi = round(xf)
    return xi if math.isclose(xi, xf, rel_tol=1e-5) else xf


def affine_compose(
    m1: AffineTransformMatrix, m2: AffineTransformMatrix
) -> AffineTransformMatrix:
    """Compose 2x3 affine matrices: result applies m2 first, then m1
    (matrix product m1 @ m2, mirroring `affine.Affine` ``m1 * m2``)."""
    (a1, b1, c1), (d1, e1, f1) = m1
    (a2, b2, c2), (d2, e2, f2) = m2
    return (
        (a1 * a2 + b1 * d2, a1 * b2 + b1 * e2, a1 * c2 + b1 * f2 + c1),
        (d1 * a2 + e1 * d2, d1 * b2 + e1 * e2, d1 * c2 + e1 * f2 + f1),
    )


def affine_invert(m: AffineTransformMatrix) -> AffineTransformMatrix:
    """Invert a 2x3 affine matrix (mirrors ``~affine.Affine``)."""
    (a, b, c), (d, e, f) = m
    det = a * e - b * d
    if det == 0:
        raise ValueError("affine matrix is singular")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    return (
        (ia, ib, -(ia * c + ib * f)),
        (id_, ie, -(id_ * c + ie * f)),
    )


def affine_apply(m: AffineTransformMatrix, x, y):
    (a, b, c), (d, e, f) = m
    return a * x + b * y + c, d * x + e * y + f


def normalize_int_pair(value, default=None) -> tuple[int, int] | None:
    if isinstance(value, int):
        return value, value
    if value is not None:
        x, y = value
        return int(x), int(y)
    return default


def normalize_number_pair(value, default=None):
    if isinstance(value, (int, float)):
        return to_int_or_float(value), to_int_or_float(value)
    if value is not None:
        x, y = value
        return to_int_or_float(x), to_int_or_float(y)
    return default


def to_lon_360(lon):
    """lon < 0 -> lon + 360 (reference helpers.py:97-102)."""
    lon = np.asarray(lon)
    return np.where(lon >= 0.0, lon, lon + 360.0)


def from_lon_360(lon):
    """lon > 180 -> lon - 360 (reference helpers.py:105-110)."""
    lon = np.asarray(lon)
    return np.where(lon <= 180.0, lon, lon - 360.0)


# Allowed last-digit quantization steps, keyed by round(100 * step):
# each maps to (integer step multiplier, extra decimal places it needs).
# 0.25 needs two extra places (25 hundredths); 1.0 needs one fewer.
_STEP_TABLE = {
    10: (1, 0),    # 0.1
    20: (2, 0),    # 0.2
    25: (25, 1),   # 0.25
    50: (5, 0),    # 0.5
    100: (1, -1),  # 1
}


def round_to_fraction(value: float, digits: int = 2,
                      resolution: float = 1) -> Fraction:
    """Snap ``value`` to ``digits`` significant digits, quantizing the
    last digit in ``resolution`` steps (0.1, 0.2, 0.25, 0.5 or 1), and
    return the snapped value exactly as a ``Fraction``.

    Behavioral parity with reference helpers.py:203-239 (the resolution
    snapping used when inferring grid resolutions from coordinates);
    implementation is original.
    """
    if digits < 1:
        raise ValueError("digits must be a positive integer")
    hundredths = round(100 * resolution)
    if hundredths not in _STEP_TABLE or not math.isclose(
        100 * resolution, hundredths
    ):
        allowed = sorted(k / 100 for k in _STEP_TABLE)
        raise ValueError(f"resolution must be one of {set(allowed)}")
    if value == 0:
        return Fraction(0, 1)
    step_mult, extra_places = _STEP_TABLE[hundredths]
    mag = abs(value)
    # decimal place of the quantization unit, below the leading digit
    decade = math.floor(math.log10(mag)) - digits - extra_places
    unit = Fraction(10) ** decade
    # float division first (same association as the reference), exact
    # Fraction arithmetic only for the reconstruction
    n_steps = round((mag / unit) / step_mult)
    snapped = Fraction(step_mult * n_steps) * unit
    return -snapped if value < 0 else snapped


def scale_xy_res_and_size(xy_res, size, xy_scale):
    """Scale resolution & size, clamping size to >= 2
    (reference helpers.py:242-255)."""
    x_res, y_res = xy_res
    x_scale, y_scale = xy_scale
    w, h = size
    w, h = round(x_scale * w), round(y_scale * h)
    return (
        (x_res / x_scale, y_res / y_scale),
        (w if w >= 2 else 2, h if h >= 2 else 2),
    )


def default_xy_var_names(crs) -> tuple[str, str]:
    return ("lon", "lat") if crs.is_geographic else ("x", "y")


def get_dataset_chunks(dataset) -> dict[str, int]:
    """Most common declared chunk size per chunked dimension, data
    variables only (reference gridmapping/helpers.py:113-161).

    Each variable contributes its per-dim max chunk size; for every
    dimension the most frequently seen size wins, first-seen winning ties
    (strictly-greater count replaces, matching the reference loop).
    """
    dim_size_counts: dict[str, dict[int, int]] = {}
    for var in dataset.data_vars.values():
        if var.chunks:
            for d, c in zip(var.dims, var.chunks):
                size_counts = dim_size_counts.setdefault(d, {})
                size_counts[c] = size_counts.get(c, 0) + 1
    dim_sizes: dict[str, int] = {}
    for d, size_counts in dim_size_counts.items():
        max_count = 0
        best = 0
        for c, count in size_counts.items():
            if count > max_count:
                max_count = count
                best = c
        dim_sizes[d] = best
    return dim_sizes
