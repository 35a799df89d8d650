"""CF-convention time decoding as pure Catalyst expressions.

NetCDF/zarr granules store time as numbers relative to an epoch --
``units = "days since 2000-01-01"`` with an optional ``calendar``
attribute (CF 1.x section 4.4; the reference ecosystem decodes these
through xarray/cftime when it opens a store).  This module supplies the
same semantics engine-side so a time coordinate column decodes inside
whole-stage codegen, with no Python UDF and an ANSI-SQL twin:

* **Real calendars** (``standard``/``gregorian``/``proleptic_gregorian``)
  decode to a TIMESTAMP column.  The unit parse happens once on the
  driver; the column math splits the value into an integer part
  (long * long nanoseconds -- exact at ANY magnitude, including int64
  "nanoseconds since 1970" axes beyond double's 2**53) and a
  fractional remainder (< one unit, exact in double), so integral
  inputs never round-trip through floating point.
* **Fixed-length calendars** (``360_day``, ``noleap``/``365_day``,
  ``all_leap``/``366_day``) have no TIMESTAMP representation; they
  decode to a ``(year, month, day, hour, minute, second)`` struct by
  integer arithmetic.  The epoch is decomposed driver-side in the same
  calendar, so the column expression is add-divide-mod only.

Scale note: both paths are scalar expressions on the time column --
typically a metadata-sized coordinate array, but safe to run over a
100-TB fact table (codegen, no shuffle, no UDF).

Only the pre-1582 Julian/Gregorian switch of the plain ``julian`` /
``standard`` calendar on proleptic dates differs from cftime; CF data
before 1582 is vanishingly rare and ``standard`` is treated as
proleptic Gregorian here (xarray's default decoding does the same via
pandas for in-range dates).
"""

from __future__ import annotations

import re
from typing import Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "parse_cf_time_units",
    "decode_cf_time",
    "encode_cf_time",
    "decode_cf_time_components",
]

# CF unit word -> NANOSECONDS (fixed-length units only; "months"/
# "years" are refused below, as cftime does for real calendars).
# Nanosecond granularity covers xarray's datetime64[ns] encoding;
# Spark timestamps are microsecond-resolution, so ns values round
# half-up at the very end.
_UNIT_NS = {
    "nanoseconds": 1,
    "nanosecond": 1,
    "ns": 1,
    "microseconds": 1_000,
    "microsecond": 1_000,
    "us": 1_000,
    "milliseconds": 1_000_000,
    "millisecond": 1_000_000,
    "ms": 1_000_000,
    "seconds": 1_000_000_000,
    "second": 1_000_000_000,
    "secs": 1_000_000_000,
    "sec": 1_000_000_000,
    "s": 1_000_000_000,
    "minutes": 60_000_000_000,
    "minute": 60_000_000_000,
    "mins": 60_000_000_000,
    "min": 60_000_000_000,
    "hours": 3_600_000_000_000,
    "hour": 3_600_000_000_000,
    "hrs": 3_600_000_000_000,
    "hr": 3_600_000_000_000,
    "h": 3_600_000_000_000,
    "days": 86_400_000_000_000,
    "day": 86_400_000_000_000,
    "d": 86_400_000_000_000,
}

_UNITS_RE = re.compile(
    r"^\s*(?P<unit>[a-zA-Z]+)\s+since\s+(?P<epoch>.+?)\s*$"
)

# fixed-length calendars: days per month
_CAL_MONTHS = {
    "360_day": (30,) * 12,
    "noleap": (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "365_day": (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "all_leap": (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    "366_day": (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
}

_REAL_CALENDARS = (
    "standard", "gregorian", "proleptic_gregorian", "", None,
)


def parse_cf_time_units(units: str) -> Tuple[int, pd.Timestamp]:
    """Split a CF ``units`` string into (unit_nanoseconds, epoch).

    ``"days since 2000-01-01"`` -> ``(86_400_000_000_000,
    Timestamp("2000-01-01"))``.  The epoch parse accepts anything
    pandas does (date-only, date+time, fractional seconds, UTC
    offsets); ``months``/``years`` units are calendar-dependent and
    refused, matching cftime for real-world calendars."""
    m = _UNITS_RE.match(units)
    if not m:
        raise ValueError(f"unparseable CF time units: {units!r}")
    unit = m.group("unit").lower()
    if unit in ("months", "month", "years", "year"):
        raise ValueError(
            f"CF unit {unit!r} is calendar-dependent and ambiguous; "
            "re-encode the axis in days or seconds"
        )
    if unit not in _UNIT_NS:
        raise ValueError(f"unknown CF time unit {unit!r}")
    epoch = pd.Timestamp(m.group("epoch"))
    if epoch.tzinfo is not None:
        epoch = epoch.tz_convert("UTC").tz_localize(None)
    return _UNIT_NS[unit], epoch


def _ns_to_us(ns: Column) -> Column:
    """Round-half-up ns -> us in exact integer math:
    ``floor((ns + 500) / 1000)``."""
    shifted = ns + F.lit(500)
    k = F.lit(1000).cast("long")
    pm = ((shifted % k) + k) % k
    return ((shifted - pm) / k).cast("long")


def _value_us(values: Column, unit_ns: int) -> Column:
    """``values * unit`` in MICROSECONDS as an exact-where-possible
    long column.

    The integer part multiplies long * long (exact at any magnitude --
    an int64 "nanoseconds since 1970" axis is ~1.7e18, far beyond
    double's 2**53); only the sub-unit fractional remainder touches
    double, where it is < one unit and exact to well under 1 us.  For
    an integral column the remainder is identically zero even past
    2**53, because the two casts round the same way.  The workspace is
    microseconds (Spark's timestamp grain), NOT nanoseconds: an ns
    workspace overflows int64 at ~±292 years for day-unit axes.
    Nanosecond-unit inputs divide once, rounding half-up."""
    vl = values.cast("long")   # truncation toward zero, exact
    rem = values.cast("double") - vl.cast("double")
    if unit_ns >= 1000:
        u = unit_ns // 1000    # every >=us CF unit is a whole-us count
        return vl * F.lit(u) + F.round(
            rem * F.lit(float(u)), 0
        ).cast("long")
    return _ns_to_us(vl + F.round(rem, 0).cast("long"))


def decode_cf_time(
    values: Column, units: str, calendar: str | None = "standard"
) -> Column:
    """Numeric CF time column -> TIMESTAMP (real calendars).

    Exact integer math: ``timestamp_micros((epoch_ns + value *
    unit_ns) / 1000)`` with the multiply split so integral inputs
    never round-trip through double (see :func:`_value_ns`).
    Fractional values (e.g. 0.5 days) are supported; resolution is
    1 microsecond (Spark's timestamp grain), nanosecond inputs round
    half-up.  Fixed-length calendars have no timestamp
    representation -- use :func:`decode_cf_time_components`."""
    cal = (calendar or "standard").lower()
    if cal not in _REAL_CALENDARS:
        if cal in _CAL_MONTHS:
            raise ValueError(
                f"calendar {calendar!r} dates do not exist on the "
                "real timeline; use decode_cf_time_components"
            )
        raise ValueError(f"unknown CF calendar {calendar!r}")
    unit_ns, epoch = parse_cf_time_units(units)
    epoch_us = (int(epoch.value) + 500) // 1000  # ns -> us, half-up
    return F.timestamp_micros(
        F.lit(epoch_us) + _value_us(values, unit_ns)
    )


def encode_cf_time(
    ts: Column, units: str, calendar: str | None = "standard"
) -> Column:
    """TIMESTAMP column -> numeric CF time (inverse of
    :func:`decode_cf_time`); double-valued so fractional units
    round-trip."""
    cal = (calendar or "standard").lower()
    if cal not in _REAL_CALENDARS:
        raise ValueError(
            f"encode_cf_time supports real calendars only, not "
            f"{calendar!r}"
        )
    unit_ns, epoch = parse_cf_time_units(units)
    epoch_us = epoch.value // 1000
    us = F.unix_micros(ts) - F.lit(int(epoch_us))
    return us.cast("double") * F.lit(1000.0) / F.lit(float(unit_ns))


def _decompose_fixed(epoch: pd.Timestamp, cal: str):
    """Epoch (y, m, d, time-of-day-us) plus the calendar's month
    tables.  The epoch's NOMINAL fields are reused in the fixed
    calendar -- cftime semantics: '2000-01-01' means year 2000, month
    1, day 1 OF THAT CALENDAR, not a real-timeline instant."""
    months = _CAL_MONTHS[cal]
    year_days = sum(months)
    # cumulative days before each month (driver-side tuple)
    cum = [0]
    for md in months[:-1]:
        cum.append(cum[-1] + md)
    tod_us = (
        epoch.hour * 3_600_000_000
        + epoch.minute * 60_000_000
        + epoch.second * 1_000_000
        + epoch.microsecond
    )
    if epoch.day > months[epoch.month - 1]:
        raise ValueError(
            f"epoch {epoch} does not exist in calendar {cal!r}"
        )
    epoch_day_of_era = (
        epoch.year * year_days + cum[epoch.month - 1] + (epoch.day - 1)
    )
    return months, year_days, cum, epoch_day_of_era, tod_us


def decode_cf_time_components(
    values: Column, units: str, calendar: str
) -> Column:
    """Numeric CF time -> ``struct(year, month, day, hour, minute,
    second)`` for the fixed-length calendars (``360_day``,
    ``noleap``/``365_day``, ``all_leap``/``366_day``).

    Pure integer Catalyst arithmetic: value -> microseconds since the
    calendar's year-0 origin -> floor-div/mod chain.  The month lookup
    is an ``element_at`` over a 12-element literal array -- no UDF, no
    join."""
    cal = (calendar or "").lower()
    if cal not in _CAL_MONTHS:
        raise ValueError(
            f"calendar {calendar!r} is not fixed-length; use "
            "decode_cf_time"
        )
    unit_ns, epoch = parse_cf_time_units(units)
    months, year_days, cum, epoch_doe, tod_us = _decompose_fixed(
        epoch, cal
    )
    day_us = 86_400_000_000

    total_us = (
        F.lit(epoch_doe * day_us + tod_us)
        + _value_us(values, unit_ns)
    )
    # floor div/mod (exact integer form; total_us can be pre-origin)
    def _floordiv(a: Column, b: int) -> Column:
        bb = F.lit(b).cast("long")
        pm = ((a % bb) + bb) % bb
        return ((a - pm) / bb).cast("long")

    doe = _floordiv(total_us, day_us)
    us_of_day = total_us - doe * F.lit(day_us)
    year = _floordiv(doe, year_days)
    doy = (doe - year * F.lit(year_days)).cast("int")  # 0-based
    # month: last index whose cumulative start <= doy
    cum_arr = F.array(*[F.lit(c) for c in cum])
    month = F.aggregate(
        cum_arr,
        F.lit(0),
        lambda acc, c: F.when(doy >= c, acc + 1).otherwise(acc),
    )
    day = doy - F.element_at(cum_arr, month) + F.lit(1)
    sec_of_day = _floordiv(us_of_day, 1_000_000)
    return F.struct(
        year.cast("int").alias("year"),
        month.cast("int").alias("month"),
        day.cast("int").alias("day"),
        _floordiv(sec_of_day, 3600).cast("int").alias("hour"),
        (_floordiv(sec_of_day, 60) % 60).cast("int").alias("minute"),
        (sec_of_day % 60).cast("int").alias("second"),
    )
