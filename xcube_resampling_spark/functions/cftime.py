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

* **The proleptic Julian calendar** (``julian``) is first-class: every
  fourth year is a leap year with no century rule, so a ``julian``
  axis's epoch names a DIFFERENT real instant than its Gregorian
  reading (13 days apart in the 20th/21st centuries).
  :func:`decode_cf_time` anchors the epoch on the Julian calendar and
  returns true-instant timestamps; :func:`decode_cf_time_components`
  returns the Julian-calendar fields (what cftime's
  ``DatetimeJulian`` carries) via the same 1461-day-era integer
  arithmetic the fixed calendars use.

Scale note: all paths are scalar expressions on the time column --
typically a metadata-sized coordinate array, but safe to run over a
100-TB fact table (codegen, no shuffle, no UDF).

Only the pre-1582 Julian/Gregorian SWITCH of the plain ``standard``
calendar differs from cftime: ``standard`` is treated as proleptic
Gregorian here (xarray's default decoding does the same via pandas for
in-range dates); datasets on a true mixed calendar should declare
``julian``.
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
    "encode_cf_time_components",
    "decode_cf_time_array",
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

# nominal ISO-ish epoch: year (sign allowed, any width), month, day,
# optional time-of-day with fractional seconds.  Used when pandas
# cannot represent the instant (year outside 1677-2262 -- the CMIP
# "days since 0001-01-01" noleap axis -- or a date that only exists
# in the target calendar, e.g. 2000-02-30 in 360_day).
_NOMINAL_RE = re.compile(
    r"^(?P<y>-?\d{1,6})-(?P<m>\d{1,2})-(?P<d>\d{1,2})"
    r"(?:[ T](?P<H>\d{1,2}):(?P<M>\d{1,2})"
    r"(?::(?P<S>\d{1,2})(?P<frac>\.\d+)?)?)?$"
)


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Proleptic-Gregorian days since 1970-01-01 (Howard Hinnant's
    public-domain civil-calendar algorithm, branchless form)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


# the March-based day-of-era of Julian 1969-12-19 == Gregorian
# 1970-01-01 (the two calendars are 13 days apart in 1900-2099)
_JULIAN_EPOCH_DOE = 719470


def _days_from_julian(y: int, m: int, d: int) -> int:
    """Proleptic-JULIAN-calendar date -> days since (Gregorian)
    1970-01-01.  Same March-based month arithmetic as the civil
    algorithm, but the leap rule is every fourth year with no century
    corrections, so the era math is just ``365 y + floor(y / 4)``."""
    y -= m <= 2
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    return y * 365 + y // 4 + doy - _JULIAN_EPOCH_DOE


class _NominalDate:
    """Minimal epoch stand-in when pandas can't represent the instant.

    Carries the nominal calendar fields (what fixed-calendar
    decomposition needs) and a ``value`` in proleptic-Gregorian
    nanoseconds since 1970 (what real-calendar decoding needs --
    Spark timestamps span far beyond pandas' 1677-2262 ns window)."""

    __slots__ = ("year", "month", "day", "hour", "minute", "second",
                 "microsecond")

    def __init__(self, year, month, day, hour=0, minute=0, second=0,
                 microsecond=0):
        self.year, self.month, self.day = year, month, day
        self.hour, self.minute, self.second = hour, minute, second
        self.microsecond = microsecond

    def __repr__(self):
        return (f"_NominalDate({self.year:04d}-{self.month:02d}-"
                f"{self.day:02d} {self.hour:02d}:{self.minute:02d}:"
                f"{self.second:02d}.{self.microsecond:06d})")


def _epoch_ns(epoch, julian: bool = False) -> int:
    """Epoch -> real-instant ns since 1970, computed from the NOMINAL
    fields via the civil-calendar algorithm (``julian=True`` reads the
    fields on the proleptic Julian calendar instead -- the same
    nominal date is a different instant there).  Never touches
    ``pd.Timestamp.value``: pandas parses out-of-ns-range epochs (year
    1) at second resolution and ``.value`` raises OverflowError."""
    fn = _days_from_julian if julian else _days_from_civil
    days = fn(epoch.year, epoch.month, epoch.day)
    sec = (days * 86400 + epoch.hour * 3600 + epoch.minute * 60
           + epoch.second)
    return (sec * 1_000_000_000 + epoch.microsecond * 1000
            + getattr(epoch, "nanosecond", 0))


def _parse_nominal(epoch_str: str) -> _NominalDate:
    m = _NOMINAL_RE.match(epoch_str.strip())
    if not m:
        raise ValueError(f"unparseable CF epoch: {epoch_str!r}")
    frac = m.group("frac")
    us = int(round(float(frac) * 1_000_000)) if frac else 0
    mo, d = int(m.group("m")), int(m.group("d"))
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        raise ValueError(f"invalid CF epoch date: {epoch_str!r}")
    return _NominalDate(
        int(m.group("y")), mo, d,
        int(m.group("H") or 0), int(m.group("M") or 0),
        int(m.group("S") or 0), us,
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
    "standard", "gregorian", "proleptic_gregorian", "julian", "", None,
)


def parse_cf_time_units(units: str) -> Tuple[int, object]:
    """Split a CF ``units`` string into (unit_nanoseconds, epoch).

    The epoch is a ``pd.Timestamp`` when pandas can represent it and a
    :class:`_NominalDate` otherwise (years outside 1677-2262, or dates
    that only exist in a fixed calendar); both expose the nominal
    y/m/d/h/m/s/us nominal fields (instant math goes through
    :func:`_epoch_ns`, which never touches pandas' ns-bounded
    ``.value``).

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
    epoch_str = m.group("epoch")
    try:
        epoch = pd.Timestamp(epoch_str)
        if epoch.tzinfo is not None:
            epoch = epoch.tz_convert("UTC").tz_localize(None)
    except (ValueError, OverflowError):
        # pandas bounds (1677-2262) or a date that only exists in a
        # fixed calendar (e.g. 2000-02-30 in 360_day): fall back to
        # the nominal field parse.  OutOfBoundsDatetime subclasses
        # ValueError.
        epoch = _parse_nominal(epoch_str)
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
    if cal == "julian":
        _check_julian_epoch(epoch)
    epoch_ns = _epoch_ns(epoch, julian=(cal == "julian"))
    epoch_us = (epoch_ns + 500) // 1000  # ns -> us, half-up
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
    if cal == "julian":
        _check_julian_epoch(epoch)
    epoch_ns = _epoch_ns(epoch, julian=(cal == "julian"))
    epoch_us = (epoch_ns + 500) // 1000
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


def _tod_us(epoch) -> int:
    return (
        epoch.hour * 3_600_000_000
        + epoch.minute * 60_000_000
        + epoch.second * 1_000_000
        + epoch.microsecond
    )


def _check_julian_epoch(epoch) -> None:
    ml = (31, 29 if epoch.year % 4 == 0 else 28, 31, 30, 31, 30, 31,
          31, 30, 31, 30, 31)
    if epoch.day > ml[epoch.month - 1]:
        raise ValueError(
            f"epoch {epoch!r} does not exist in calendar 'julian'"
        )


def _floordiv(a: Column, b: int) -> Column:
    """Exact floor division for a possibly negative long column."""
    bb = F.lit(b).cast("long")
    pm = ((a % bb) + bb) % bb
    return ((a - pm) / bb).cast("long")


def _julian_fields_from_doe(doe: Column):
    """March-based Julian day-of-era -> (year, month, day) columns.
    The inverse of ``365 y' + floor(y'/4) + doy``: 1461-day (4-year)
    eras with the leap day at the end of March-year 3 -- no century
    corrections, no lookup arrays."""
    era = _floordiv(doe, 1461)
    die = (doe - era * F.lit(1461)).cast("int")      # 0..1460
    yoe = ((die - _floordiv(die, 1460)) / F.lit(365)).cast("int")
    doy = die - yoe * F.lit(365)                     # 0..365
    mp = ((F.lit(5) * doy + F.lit(2)) / F.lit(153)).cast("int")
    day = doy - ((F.lit(153) * mp + F.lit(2)) / F.lit(5)).cast("int") \
        + F.lit(1)
    month = F.when(mp < 10, mp + 3).otherwise(mp - 9)
    year = era * F.lit(4) + yoe \
        + F.when(month <= 2, F.lit(1)).otherwise(F.lit(0))
    return year, month, day


def decode_cf_time_components(
    values: Column, units: str, calendar: str
) -> Column:
    """Numeric CF time -> ``struct(year, month, day, hour, minute,
    second)`` for the non-Gregorian calendars: the fixed-length ones
    (``360_day``, ``noleap``/``365_day``, ``all_leap``/``366_day``)
    and the proleptic ``julian`` calendar (every fourth year leap, no
    century rule -- cftime's ``DatetimeJulian`` fields).

    Pure integer Catalyst arithmetic: value -> microseconds since the
    calendar's year-0 origin -> floor-div/mod chain.  The fixed
    calendars' month lookup is an ``element_at`` over a 12-element
    literal array; julian uses the 1461-day-era inverse -- no UDF, no
    join either way."""
    cal = (calendar or "").lower()
    if cal == "julian":
        unit_ns, epoch = parse_cf_time_units(units)
        _check_julian_epoch(epoch)
        epoch_doe = (_days_from_julian(epoch.year, epoch.month,
                                       epoch.day)
                     + _JULIAN_EPOCH_DOE)
        day_us = 86_400_000_000
        total_us = (
            F.lit(epoch_doe * day_us + _tod_us(epoch))
            + _value_us(values, unit_ns)
        )
        doe = _floordiv(total_us, day_us)
        us_of_day = total_us - doe * F.lit(day_us)
        year, month, day = _julian_fields_from_doe(doe)
        sec_of_day = _floordiv(us_of_day, 1_000_000)
        return F.struct(
            year.cast("int").alias("year"),
            month.cast("int").alias("month"),
            day.cast("int").alias("day"),
            _floordiv(sec_of_day, 3600).cast("int").alias("hour"),
            (_floordiv(sec_of_day, 60) % 60).cast("int")
            .alias("minute"),
            (sec_of_day % 60).cast("int").alias("second"),
        )
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
    # floor div/mod is exact integer math; total_us can be pre-origin
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


def decode_cf_time_array(values, units: str,
                         calendar: str | None = "standard"):
    """Driver-side numpy twin of :func:`decode_cf_time`: a numeric CF
    time COORDINATE array -> ``datetime64[ns]``.

    Coordinate axes are metadata-sized, so this runs in plain Python
    integers (no int64 overflow while accumulating -- a year-1 epoch
    is ~-6.2e19 ns, outside int64 until the offsets are added back).
    Values whose instant falls outside datetime64[ns]'s ±292-year
    window raise ValueError -- callers keep the raw numbers then.
    Fixed-length calendars have no real-timeline instants and raise
    the same way as :func:`decode_cf_time`."""
    import numpy as np

    cal = (calendar or "standard").lower()
    if cal not in _REAL_CALENDARS:
        if cal in _CAL_MONTHS:
            raise ValueError(
                f"calendar {calendar!r} dates do not exist on the "
                "real timeline; keep the raw values"
            )
        raise ValueError(f"unknown CF calendar {calendar!r}")
    unit_ns, epoch = parse_cf_time_units(units)
    if cal == "julian":
        _check_julian_epoch(epoch)
    epoch_ns = _epoch_ns(epoch, julian=(cal == "julian"))
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        ns = [epoch_ns + int(v) * unit_ns for v in arr.ravel()]
    else:
        # split like the Column twin's _value_us: the integer part
        # multiplies in exact Python ints (a double product of
        # ~1.7e18 ns would be 256-ns-granular), only the sub-unit
        # remainder touches float
        def _one(v):
            f = float(v)
            iv = int(f)  # truncation toward zero, exact
            return epoch_ns + iv * unit_ns + round((f - iv) * unit_ns)

        ns = [_one(v) for v in arr.ravel()]
    # -2**63 itself is numpy's NaT sentinel, not a valid instant
    lo, hi = -2 ** 63 + 1, 2 ** 63 - 1
    if any(n < lo or n > hi for n in ns):
        raise ValueError(
            "decoded instants fall outside the datetime64[ns] range"
        )
    return np.asarray(ns, dtype="int64").astype(
        "datetime64[ns]").reshape(arr.shape)


def encode_cf_time_components(
    components: Column, units: str, calendar: str
) -> Column:
    """Fixed-calendar component struct -> numeric CF time: the inverse
    of :func:`decode_cf_time_components` (same integer arithmetic,
    run forward).  ``components`` is a struct with
    ``year month day hour minute second`` fields; the result is a
    DOUBLE in the unit of ``units`` (fractional when the instant does
    not land on a whole unit).  ``julian`` components encode through
    the same 1461-day-era arithmetic their decode uses.  Pure
    Catalyst -- element_at month lookup, no UDF."""
    cal = (calendar or "").lower()
    day_us = 86_400_000_000
    y = components.getField("year").cast("long")
    mo = components.getField("month").cast("int")
    d = components.getField("day").cast("long")
    us_of_day = (
        components.getField("hour").cast("long") * F.lit(3_600_000_000)
        + components.getField("minute").cast("long")
        * F.lit(60_000_000)
        + components.getField("second").cast("long") * F.lit(1_000_000)
    )
    if cal == "julian":
        unit_ns, epoch = parse_cf_time_units(units)
        _check_julian_epoch(epoch)
        epoch_doe = (_days_from_julian(epoch.year, epoch.month,
                                       epoch.day)
                     + _JULIAN_EPOCH_DOE)
        tod_us = _tod_us(epoch)
        # forward form of _julian_fields_from_doe: March-based year
        yp = y - F.when(mo <= 2, F.lit(1)).otherwise(F.lit(0))
        doy = (((F.lit(153)
                 * (mo + F.when(mo > 2, F.lit(-3)).otherwise(F.lit(9)))
                 + F.lit(2)) / F.lit(5)).cast("long")
               + d - F.lit(1))
        doe = yp * F.lit(365) + _floordiv(yp, 4) + doy
    elif cal not in _CAL_MONTHS:
        raise ValueError(
            f"calendar {calendar!r} is not fixed-length; use "
            "encode_cf_time"
        )
    else:
        unit_ns, epoch = parse_cf_time_units(units)
        months, year_days, cum, epoch_doe, tod_us = _decompose_fixed(
            epoch, cal
        )
        cum_arr = F.array(*[F.lit(c) for c in cum])
        doe = (y * F.lit(year_days)
               + F.element_at(cum_arr, mo).cast("long")
               + d - F.lit(1))
    total_us = doe * F.lit(day_us) + us_of_day
    delta_us = total_us - F.lit(epoch_doe * day_us + tod_us)
    if unit_ns >= 1000:
        # keep the whole-unit quotient in exact integer math (a single
        # double product exceeds 2**53 for fine units far from the
        # epoch); only the sub-unit remainder touches double
        u = F.lit(unit_ns // 1000).cast("long")
        pm = ((delta_us % u) + u) % u
        q = ((delta_us - pm) / u).cast("long")
        return (q.cast("double")
                + pm.cast("double") * F.lit(1000.0)
                / F.lit(float(unit_ns)))
    return (delta_us.cast("double") * F.lit(1000.0)
            / F.lit(float(unit_ns)))
