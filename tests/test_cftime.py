"""CF time decoding (functions/cftime.py): real calendars against
pandas, fixed-length calendars against a pure-Python mirror of the
published cftime semantics."""

import pandas as pd
import pytest
from xcube_resampling_spark.functions.cftime import (
    _CAL_MONTHS,
    decode_cf_time,
    decode_cf_time_components,
    encode_cf_time,
    parse_cf_time_units,
)

from pyspark.sql import functions as F


def _decode_py(value, units, cal):
    """Driver-side mirror for fixed calendars (independent arithmetic:
    per-unit loops instead of div/mod chains)."""
    unit_ns, epoch = parse_cf_time_units(units)
    months = _CAL_MONTHS[cal]
    total_us = (round(value * unit_ns) + 500) // 1000  # ns -> us
    tod = (epoch.hour * 3600 + epoch.minute * 60 + epoch.second) \
        * 1_000_000 + epoch.microsecond
    y, m, d = epoch.year, epoch.month, epoch.day
    us = tod + total_us
    day_us = 86_400_000_000
    days, us = divmod(us, day_us)
    d += days
    while d > months[m - 1]:
        d -= months[m - 1]
        m += 1
        if m == 13:
            m, y = 1, y + 1
    while d < 1:
        m -= 1
        if m == 0:
            m, y = 12, y - 1
        d += months[m - 1]
    sec = us // 1_000_000
    return (y, m, int(d), sec // 3600, (sec // 60) % 60, sec % 60)


class TestUnitsParse:
    def test_common_forms(self):
        assert parse_cf_time_units("days since 2000-01-01") == (
            86_400_000_000_000, pd.Timestamp("2000-01-01"))
        assert parse_cf_time_units(
            "seconds since 1970-01-01 00:00:00") == (
            1_000_000_000, pd.Timestamp("1970-01-01"))
        u, e = parse_cf_time_units(
            "hours since 1900-01-01 06:30:15.25")
        assert u == 3_600_000_000_000
        assert e == pd.Timestamp("1900-01-01 06:30:15.25")

    def test_utc_offset_normalized(self):
        _, e = parse_cf_time_units("days since 2000-01-01 00:00:00+02")
        assert e == pd.Timestamp("1999-12-31 22:00:00")

    def test_rejects(self):
        with pytest.raises(ValueError, match="unparseable"):
            parse_cf_time_units("2000-01-01")
        with pytest.raises(ValueError, match="calendar-dependent"):
            parse_cf_time_units("months since 2000-01-01")
        with pytest.raises(ValueError, match="unknown CF time unit"):
            parse_cf_time_units("fortnights since 2000-01-01")


class TestRealCalendar:
    def test_decode_matches_pandas(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (1.5,), (366.0,), (-365.0,)], "v double")
        got = [
            r.ts for r in df.select(
                decode_cf_time(
                    F.col("v"), "days since 2000-01-01").alias("ts")
            ).collect()
        ]
        base = pd.Timestamp("2000-01-01")
        want = [base + pd.Timedelta(days=v)
                for v in (0.0, 1.5, 366.0, -365.0)]
        assert [pd.Timestamp(t) for t in got] == want

    def test_integer_input_and_seconds_units(self, spark):
        df = spark.createDataFrame([(946684800,)], "v long")
        (row,) = df.select(
            decode_cf_time(
                F.col("v"), "seconds since 1970-01-01").alias("ts")
        ).collect()
        assert pd.Timestamp(row.ts) == pd.Timestamp("2000-01-01")

    def test_roundtrip_encode(self, spark):
        units = "hours since 1987-06-05 04:03:02"
        df = spark.createDataFrame(
            [(0.0,), (25.5,), (-12.25,), (87660.0,)], "v double")
        got = df.select(
            encode_cf_time(
                decode_cf_time(F.col("v"), units), units
            ).alias("v2"), "v"
        ).collect()
        for r in got:
            assert r.v2 == pytest.approx(r.v, abs=1e-9)

    def test_microsecond_exactness_far_from_epoch(self, spark):
        # 10^9 seconds + 1 us: a double-seconds path would lose the us
        units = "microseconds since 1970-01-01"
        df = spark.createDataFrame(
            [(1_000_000_000_000_001,)], "v long")
        (row,) = df.select(
            decode_cf_time(F.col("v"), units).alias("ts")).collect()
        assert pd.Timestamp(row.ts).microsecond == 1

    def test_nanoseconds_since_epoch_exact_beyond_2_53(self, spark):
        # xarray's datetime64[ns] encoding: int64 ns since 1970 is
        # ~1.7e18, far beyond double's 2**53 -- the split integer
        # path must keep every microsecond
        units = "nanoseconds since 1970-01-01"
        v = 1_755_300_123_456_789_000  # 2026-08-16ish, us-aligned
        df = spark.createDataFrame([(v,)], "v long")
        (row,) = df.select(
            decode_cf_time(F.col("v"), units).alias("ts")).collect()
        assert pd.Timestamp(row.ts).value == v

    def test_ns_rounds_half_up_to_us(self, spark):
        units = "nanoseconds since 1970-01-01"
        df = spark.createDataFrame([(1_500,), (1_499,)], "v long")
        got = sorted(pd.Timestamp(r.ts).microsecond for r in df.select(
            decode_cf_time(F.col("v"), units).alias("ts")).collect())
        assert got == [1, 2]

    def test_fixed_calendar_refused(self, spark):
        with pytest.raises(ValueError, match="decode_cf_time_components"):
            decode_cf_time(
                F.col("v"), "days since 2000-01-01", "360_day")
        with pytest.raises(ValueError, match="unknown CF calendar"):
            decode_cf_time(
                F.col("v"), "days since 2000-01-01", "discworld")


class TestFixedCalendars:
    @pytest.mark.parametrize("cal,value,want", [
        # 360_day: every month is 30 days
        ("360_day", 0, (2000, 1, 1, 0, 0, 0)),
        ("360_day", 29, (2000, 1, 30, 0, 0, 0)),
        ("360_day", 30, (2000, 2, 1, 0, 0, 0)),
        ("360_day", 359, (2000, 12, 30, 0, 0, 0)),
        ("360_day", 360, (2001, 1, 1, 0, 0, 0)),
        ("360_day", -1, (1999, 12, 30, 0, 0, 0)),
        # noleap: 2000-02-29 does not exist
        ("noleap", 58, (2000, 2, 28, 0, 0, 0)),
        ("noleap", 59, (2000, 3, 1, 0, 0, 0)),
        ("noleap", 365, (2001, 1, 1, 0, 0, 0)),
        # all_leap: every Feb has 29
        ("all_leap", 59, (2000, 2, 29, 0, 0, 0)),
        ("all_leap", 366, (2001, 1, 1, 0, 0, 0)),
    ])
    def test_known_dates(self, spark, cal, value, want):
        df = spark.createDataFrame([(float(value),)], "v double")
        (row,) = df.select(
            decode_cf_time_components(
                F.col("v"), "days since 2000-01-01", cal).alias("c")
        ).collect()
        c = row.c
        assert (c.year, c.month, c.day, c.hour, c.minute,
                c.second) == want

    def test_time_of_day_and_epoch_offset(self, spark):
        # epoch with a time-of-day; half-day value
        units = "hours since 1850-01-01 12:00:00"
        df = spark.createDataFrame([(13.5,)], "v double")
        (row,) = df.select(
            decode_cf_time_components(
                F.col("v"), units, "noleap").alias("c")
        ).collect()
        c = row.c
        assert (c.year, c.month, c.day, c.hour, c.minute,
                c.second) == (1850, 1, 2, 1, 30, 0)

    @pytest.mark.parametrize("cal", sorted(_CAL_MONTHS))
    def test_matches_python_mirror(self, spark, cal):
        import numpy as np

        units = "days since 2000-03-15 06:00:00"
        rng = np.random.RandomState(7)
        values = [int(v) for v in rng.randint(-200_000, 200_000, 40)]
        values += [0, 1, -1, 365, -365, 36_000]
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(values)],
            "idx int, v double",
        )
        rows = df.select(
            "idx",
            decode_cf_time_components(
                F.col("v"), units, cal).alias("c"),
        ).collect()
        for r in rows:
            c = r.c
            got = (c.year, c.month, c.day, c.hour, c.minute, c.second)
            assert got == _decode_py(values[r.idx], units, cal), (
                cal, values[r.idx])

    def test_nonexistent_epoch_refused(self, spark):
        with pytest.raises(ValueError, match="does not exist"):
            decode_cf_time_components(
                F.col("v"), "days since 2000-01-31", "360_day")

    def test_real_calendar_refused(self):
        with pytest.raises(ValueError, match="not fixed-length"):
            decode_cf_time_components(
                F.col("v"), "days since 2000-01-01", "standard")


class TestOutOfBoundsEpochs:
    def test_cmip_noleap_year_one_epoch(self, spark):
        # the canonical CMIP/CESM axis: days since 0001-01-01, noleap.
        # Year 1 is outside pandas' ns bounds (1677-2262); the nominal
        # parse must carry it.  cftime: 730000 days / 365 = 2000 years
        # exactly -> 2001-01-01.
        df = spark.createDataFrame([(730000.0,), (0.0,)], "v double")
        rows = df.select(
            "v",
            decode_cf_time_components(
                F.col("v"), "days since 0001-01-01", "noleap"
            ).alias("c"),
        ).collect()
        got = {r.v: (r.c.year, r.c.month, r.c.day) for r in rows}
        assert got[0.0] == (1, 1, 1)
        assert got[730000.0] == (2001, 1, 1)

    def test_360day_epoch_only_valid_in_that_calendar(self, spark):
        # 2000-02-30 exists in the 360-day calendar but not on the
        # real timeline; pd.Timestamp refuses it, the nominal parse
        # must accept it
        df = spark.createDataFrame([(0.0,), (1.0,)], "v double")
        rows = df.select(
            "v",
            decode_cf_time_components(
                F.col("v"), "days since 2000-02-30", "360_day"
            ).alias("c"),
        ).collect()
        got = {r.v: (r.c.year, r.c.month, r.c.day) for r in rows}
        assert got[0.0] == (2000, 2, 30)
        assert got[1.0] == (2000, 3, 1)

    def test_real_calendar_beyond_pandas_bounds(self, spark):
        # decode_cf_time spans Spark's timestamp range, not pandas':
        # days since 0001-01-01 (proleptic Gregorian), value 730485 =
        # exactly the days to 2001-01-01 (computed with the same
        # public civil-calendar algorithm Python's datetime uses)
        import datetime

        want_days = (datetime.date(2001, 1, 1)
                     - datetime.date(1, 1, 1)).days
        df = spark.createDataFrame([(float(want_days),)], "v double")
        (row,) = df.select(
            decode_cf_time(
                F.col("v"), "days since 0001-01-01").alias("ts")
        ).collect()
        assert pd.Timestamp(row.ts) == pd.Timestamp("2001-01-01")

    def test_nominal_rejects_garbage(self):
        from xcube_resampling_spark.functions.cftime import (
            _parse_nominal,
        )

        with pytest.raises(ValueError, match="unparseable CF epoch"):
            _parse_nominal("January 1st 2000")
        with pytest.raises(ValueError, match="invalid CF epoch"):
            _parse_nominal("2000-13-01")


class TestDecodeArray:
    def test_float_values_exact_at_large_magnitude(self):
        import numpy as np

        from xcube_resampling_spark.functions.cftime import (
            decode_cf_time_array,
        )

        # ~1.7e18 ns product: a double multiply would be 256-ns
        # granular; the int/frac split must keep exact ns
        v = 1_700_000_000_123.0  # ms since epoch, exactly integral
        out = decode_cf_time_array(
            np.array([v]), "milliseconds since 1970-01-01")
        assert out.astype("int64")[0] == int(v) * 1_000_000

    def test_nat_sentinel_rejected(self):
        import numpy as np

        from xcube_resampling_spark.functions.cftime import (
            decode_cf_time_array,
        )

        with pytest.raises(ValueError, match="datetime64"):
            decode_cf_time_array(
                np.array([-(2 ** 63) + 0], dtype="int64"),
                "nanoseconds since 1970-01-01")


class TestEncodeComponents:
    def test_roundtrip_identity_all_fixed_calendars(self, spark):
        import numpy as np

        from xcube_resampling_spark.functions.cftime import (
            encode_cf_time_components,
        )

        units = "hours since 2000-03-15 06:00:00"
        rng = np.random.RandomState(11)
        values = [float(v) for v in rng.randint(-500_000, 500_000, 30)]
        for cal in sorted(_CAL_MONTHS):
            df = spark.createDataFrame(
                [(v,) for v in values], "v double")
            got = df.select(
                "v",
                encode_cf_time_components(
                    decode_cf_time_components(F.col("v"), units, cal),
                    units, cal,
                ).alias("v2"),
            ).collect()
            for r in got:
                assert r.v2 == pytest.approx(r.v, abs=1e-9), cal

    def test_known_value(self, spark):
        from xcube_resampling_spark.functions.cftime import (
            encode_cf_time_components,
        )

        df = spark.createDataFrame(
            [(2001, 1, 1, 0, 0, 0)],
            "year int, month int, day int, hour int, minute int,"
            " second int",
        )
        comp = F.struct("year", "month", "day", "hour", "minute",
                        "second")
        (row,) = df.select(
            encode_cf_time_components(
                comp, "days since 2000-01-01", "360_day").alias("v")
        ).collect()
        assert row.v == 360.0

    def test_real_calendar_refused(self):
        from xcube_resampling_spark.functions.cftime import (
            encode_cf_time_components,
        )

        with pytest.raises(ValueError, match="not fixed-length"):
            encode_cf_time_components(
                F.col("c"), "days since 2000-01-01", "standard")

    def test_encode_exact_for_fine_units_far_from_epoch(self, spark):
        # ns units ~180 years out: a single double product would be
        # >=1024-ns-granular; the integer quotient path must encode a
        # whole-second instant exactly
        from xcube_resampling_spark.functions.cftime import (
            encode_cf_time_components,
        )

        units = "microseconds since 1850-01-01"
        df = spark.createDataFrame(
            [(2030, 6, 15, 12, 0, 0)],
            "year int, month int, day int, hour int, minute int,"
            " second int",
        )
        comp = F.struct("year", "month", "day", "hour", "minute",
                        "second")
        (row,) = df.select(
            encode_cf_time_components(comp, units, "noleap").alias("v")
        ).collect()
        # independent integer mirror
        months = _CAL_MONTHS["noleap"]
        cum = [0]
        for md in months[:-1]:
            cum.append(cum[-1] + md)
        doe = 2030 * 365 + cum[5] + 14
        epoch_doe = 1850 * 365 + 0 + 0
        want_us = (doe - epoch_doe) * 86_400_000_000 + 12 * 3_600_000_000
        assert row.v == float(want_us)
        assert int(row.v) == want_us  # integral, not 512-ns-off


class TestCivilAlgorithm:
    def test_days_from_civil_matches_datetime(self):
        import datetime
        import random

        from xcube_resampling_spark.functions.cftime import (
            _days_from_civil,
        )

        rng = random.Random(13)
        epoch = datetime.date(1970, 1, 1)
        for _ in range(500):
            y = rng.randint(1, 9999)
            m = rng.randint(1, 12)
            d = rng.randint(1, 28)
            want = (datetime.date(y, m, d) - epoch).days
            assert _days_from_civil(y, m, d) == want, (y, m, d)
        # leap-day and boundary pins
        for y, m, d in ((2000, 2, 29), (1900, 2, 28), (2024, 12, 31),
                        (1, 1, 1), (9999, 12, 31), (1582, 10, 15)):
            want = (datetime.date(y, m, d) - epoch).days
            assert _days_from_civil(y, m, d) == want, (y, m, d)


def _julian_py(value, units):
    """Independent Julian-calendar mirror: per-day loop with the
    every-fourth-year leap rule (no century corrections)."""
    unit_ns, epoch = parse_cf_time_units(units)
    total_us = (round(value * unit_ns) + 500) // 1000
    tod = (epoch.hour * 3600 + epoch.minute * 60 + epoch.second) \
        * 1_000_000 + epoch.microsecond
    y, m, d = epoch.year, epoch.month, epoch.day
    us = tod + total_us
    day_us = 86_400_000_000
    days, us = divmod(us, day_us)
    d += days

    def _ml(yy, mm):
        base = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
        if mm == 2 and yy % 4 == 0:
            return 29
        return base[mm - 1]

    while d > _ml(y, m):
        d -= _ml(y, m)
        m += 1
        if m == 13:
            m, y = 1, y + 1
    while d < 1:
        m -= 1
        if m == 0:
            m, y = 12, y - 1
        d += _ml(y, m)
    sec = us // 1_000_000
    return (y, m, int(d), sec // 3600, (sec // 60) % 60, sec % 60)


class TestJulianCalendar:
    def test_components_match_python_mirror(self, spark):
        import numpy as np

        units = "days since 2000-03-15 06:00:00"
        rng = np.random.RandomState(11)
        values = [int(v) for v in rng.randint(-200_000, 200_000, 40)]
        values += [0, 1, -1, 365, -365, 36_000]
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(values)],
            "idx int, v double",
        )
        rows = df.select(
            "idx",
            decode_cf_time_components(
                F.col("v"), units, "julian").alias("c"),
        ).collect()
        for r in rows:
            c = r.c
            got = (c.year, c.month, c.day, c.hour, c.minute, c.second)
            assert got == _julian_py(values[r.idx], units), \
                values[r.idx]

    def test_century_years_are_leap(self, spark):
        # 1900 is a leap year on the Julian calendar (no century
        # rule): day 59 after 1900-01-01 is Feb 29, day 60 is Mar 1
        df = spark.createDataFrame(
            [(59.0,), (60.0,)], "v double")
        rows = df.select(decode_cf_time_components(
            F.col("v"), "days since 1900-01-01", "julian").alias("c")
        ).collect()
        got = [(r.c.year, r.c.month, r.c.day) for r in rows]
        assert got == [(1900, 2, 29), (1900, 3, 1)]

    def test_instant_anchoring_13_day_offset(self, spark):
        # the julian epoch 2000-01-01 IS the real instant (Gregorian)
        # 2000-01-14: the same units string decodes 13 days later than
        # its standard-calendar reading
        df = spark.createDataFrame([(0.0,)], "v double")
        r = df.select(
            decode_cf_time(F.col("v"), "days since 2000-01-01",
                           "julian").alias("j"),
            decode_cf_time(F.col("v"), "days since 2000-01-01",
                           "standard").alias("g"),
        ).collect()[0]
        assert (r.j - r.g).days == 13
        assert r.j == pd.Timestamp("2000-01-14")

    def test_decode_array_julian_anchor(self):
        import numpy as np

        from xcube_resampling_spark.functions.cftime import (
            decode_cf_time_array,
        )

        got = decode_cf_time_array(
            np.array([0, 1]), "days since 2000-01-01", "julian")
        np.testing.assert_array_equal(
            got, np.array(["2000-01-14", "2000-01-15"],
                          dtype="datetime64[ns]"))

    def test_encode_roundtrip_components(self, spark):
        from xcube_resampling_spark.functions.cftime import (
            encode_cf_time_components,
        )

        units = "hours since 1899-12-31 18:00:00"
        df = spark.createDataFrame(
            [(float(v),) for v in (-100000, -17, 0, 5, 1461 * 24,
                                   999999)],
            "v double",
        )
        back = df.select(
            F.col("v"),
            encode_cf_time_components(
                decode_cf_time_components(F.col("v"), units, "julian"),
                units, "julian",
            ).alias("b"),
        ).collect()
        for r in back:
            assert r.b == pytest.approx(r.v), r.v

    def test_encode_instant_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(float(v),) for v in (-3650, 0, 1, 400 * 365)],
            "v double")
        back = df.select(
            F.col("v"),
            encode_cf_time(
                decode_cf_time(F.col("v"), "days since 1950-06-01",
                               "julian"),
                "days since 1950-06-01", "julian",
            ).alias("b"),
        ).collect()
        for r in back:
            assert r.b == pytest.approx(r.v), r.v

    def test_julian_only_epoch_date(self, spark):
        # 1900-02-29 exists on the Julian calendar (pandas rejects it,
        # so the nominal fallback must carry it) -- and 1901-02-29
        # exists in NO year%4!=0 Julian year and is refused
        df = spark.createDataFrame([(0.0,)], "v double")
        r = df.select(decode_cf_time_components(
            F.col("v"), "days since 1900-02-29", "julian").alias("c")
        ).collect()[0]
        assert (r.c.year, r.c.month, r.c.day) == (1900, 2, 29)
        with pytest.raises(ValueError, match="does not exist"):
            decode_cf_time_components(
                F.col("v"), "days since 1901-02-29", "julian")
        with pytest.raises(ValueError, match="does not exist"):
            decode_cf_time(
                F.col("v"), "days since 1901-02-29", "julian")


class TestJulianDayAlgorithm:
    def test_pinned_equivalences(self):
        from xcube_resampling_spark.functions.cftime import (
            _days_from_civil,
            _days_from_julian,
        )

        # Julian 1969-12-19 == Gregorian 1970-01-01
        assert _days_from_julian(1969, 12, 19) == 0
        # the 1582 reform jump: Julian 1582-10-05 == Gregorian
        # 1582-10-15
        assert _days_from_julian(1582, 10, 5) \
            == _days_from_civil(1582, 10, 15)
        # both calendars agree between 200-03-01 and 300-02-28
        # (era offset is zero there)
        assert _days_from_julian(250, 6, 1) \
            == _days_from_civil(250, 6, 1)

    def test_consecutive_days_across_leap_boundaries(self):
        from xcube_resampling_spark.functions.cftime import (
            _days_from_julian,
        )

        ml = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
        for y0 in (1898, -6, 99):  # spans century + negative years
            prev = None
            for y in range(y0, y0 + 5):
                for m in range(1, 13):
                    dm = 29 if (m == 2 and y % 4 == 0) else ml[m - 1]
                    for d in range(1, dm + 1):
                        got = _days_from_julian(y, m, d)
                        if prev is not None:
                            assert got == prev + 1, (y, m, d)
                        prev = got
