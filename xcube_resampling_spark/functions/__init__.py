"""Scalar column functions of the engine (SURVEY.md section 2.8).

Parity reference: /root/reference/xcube_resampling/gridmapping/helpers.py
(to_lon_360/from_lon_360 at helpers.py:97-110).  All functions are pure
Catalyst expressions (whole-stage codegen, oracle-checkable in ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_lon_360(lon: Column) -> Column:
    """Anti-meridian normalization: [-180, 180) -> [0, 360)
    (reference helpers.py:97-103: ``lon < 0 -> lon + 360``)."""
    return F.when(lon < 0.0, lon + 360.0).otherwise(lon)


def from_lon_360(lon_360: Column) -> Column:
    """Inverse of :func:`to_lon_360` (reference helpers.py:106-110:
    ``lon > 180 -> lon - 360``)."""
    return F.when(lon_360 > 180.0, lon_360 - 360.0).otherwise(lon_360)


__all__ = ["to_lon_360", "from_lon_360"]
