"""Temporal resampling operators (operators/temporal.py).

Semantics pinned against numpy/pandas (skipna reducers, np.interp,
DataFrame.ffill) -- the same oracles xcube's resample_in_time inherits
from xarray.
"""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xcube_resampling_spark.operators.temporal import (
    TIME_REDUCERS,
    composite_best_pixel,
    forward_fill_time,
    interp_weights,
    resample_time_agg,
    resample_time_interp,
)

NAN = float("nan")
DAYS = (1, 2, 4, 7, 11, 16)


def _cube(spark):
    """Two pixels x six irregular frames; pixel (0,1) has gaps, pixel
    (1,0) is all-NaN in the second bucket (days 16+)."""
    rows = []
    vals_01 = [2.0, NAN, 6.0, NAN, 3.0, 5.0]
    vals_10 = [1.0, 4.0, 4.0, 9.0, 2.0, NAN]
    for t, v in zip(DAYS, vals_01):
        rows.append((t, 0, 1, v))
    for t, v in zip(DAYS, vals_10):
        rows.append((t, 1, 0, v))
    return spark.createDataFrame(
        rows, "t long, j int, i int, value double"
    )


def _collect(df):
    return {
        (r.t, r.j, r.i): r.value
        for r in df.collect()
    }


def _eq(a, b):
    if a is None or b is None:
        return a is b
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == pytest.approx(b)


class TestAgg:
    def test_all_reducers_match_numpy(self, spark):
        cube = _cube(spark)
        # bucket 0 = days < 15 (frames 1,2,4,7,11); bucket 1 = day 16
        win_01 = np.array([2.0, NAN, 6.0, NAN, 3.0])
        win_10 = np.array([1.0, 4.0, 4.0, 9.0, 2.0])
        expect = {
            "mean": (np.nanmean(win_01), np.nanmean(win_10)),
            "median": (np.nanmedian(win_01), np.nanmedian(win_10)),
            "min": (np.nanmin(win_01), np.nanmin(win_10)),
            "max": (np.nanmax(win_01), np.nanmax(win_10)),
            "sum": (np.nansum(win_01), np.nansum(win_10)),
            "std": (np.nanstd(win_01), np.nanstd(win_10)),
            "var": (np.nanvar(win_01), np.nanvar(win_10)),
            "count": (3.0, 5.0),
            "first": (2.0, 1.0),   # earliest VALID observation
            "last": (3.0, 2.0),    # latest VALID observation
        }
        assert set(expect) == set(TIME_REDUCERS)
        for method, (e01, e10) in expect.items():
            got = _collect(resample_time_agg(cube, method, 15))
            assert _eq(got[(0, 0, 1)], e01), method
            assert _eq(got[(0, 1, 0)], e10), method

    def test_all_nan_bucket(self, spark):
        cube = _cube(spark)
        # pixel (1,0), bin [15, 30) (day 16) is the single NaN obs
        for method, want in [
            ("mean", NAN), ("min", NAN), ("max", NAN), ("std", NAN),
            ("first", NAN), ("last", NAN),
            ("sum", 0.0), ("count", 0.0),
        ]:
            got = _collect(resample_time_agg(cube, method, 15))
            assert _eq(got[(15, 1, 0)], want), method

    def test_bin_start_labels(self, spark):
        cube = _cube(spark)
        got = _collect(resample_time_agg(cube, "count", 5))
        # bin-start labels in input units (xcube convention):
        # days 1,2,4 -> bin 0; 7 -> 5; 11 -> 10; 16 -> 15
        assert got[(0, 1, 0)] == 3.0
        assert got[(5, 1, 0)] == 1.0
        assert got[(10, 1, 0)] == 1.0
        assert got[(15, 1, 0)] == 0.0

    def test_invalid_method(self, spark):
        with pytest.raises(ValueError, match="invalid time reducer"):
            resample_time_agg(_cube(spark), "mode", 15)

    def test_negative_labels_floor_not_truncate(self, spark):
        # pre-epoch frames: day -7 belongs to bin [-15, 0) labeled
        # -15, NOT to bin 0 (which a toward-zero cast would produce,
        # silently doubling bin 0's width)
        cube = spark.createDataFrame(
            [(-7, 0, 0, 1.0), (-15, 0, 0, 3.0), (7, 0, 0, 5.0)],
            "t long, j int, i int, value double",
        )
        got = _collect(resample_time_agg(cube, "mean", 15))
        assert got[(-15, 0, 0)] == 2.0  # days -15 and -7
        assert got[(0, 0, 0)] == 5.0    # day 7 only


class TestInterpWeights:
    def test_linear_brackets(self):
        rows = interp_weights((1, 4, 10), (1, 2, 10), "linear")
        assert (1, 1, 1.0) in rows            # exact hit -> one row
        assert (1, 2, pytest.approx(2 / 3)) in [
            (a, b, pytest.approx(w)) for a, b, w in rows
        ] or any(
            a == 1 and b == 2 and w == pytest.approx(2 / 3)
            for a, b, w in rows
        )
        assert any(
            a == 4 and b == 2 and w == pytest.approx(1 / 3)
            for a, b, w in rows
        )
        assert (10, 10, 1.0) in rows

    def test_weights_sum_to_one_per_target(self):
        rows = interp_weights(DAYS, (1, 3, 9, 14, 16), "linear")
        per = {}
        for _, t_out, w in rows:
            per[t_out] = per.get(t_out, 0.0) + w
        assert all(v == pytest.approx(1.0) for v in per.values())

    def test_nearest_tie_goes_earlier(self):
        # 3 is equidistant from 2 and 4 -> earlier frame wins
        rows = interp_weights((2, 4), (3,), "nearest")
        assert rows == [(2, 3, 1.0)]

    def test_extrapolation_refused(self):
        with pytest.raises(ValueError, match="outside source span"):
            interp_weights(DAYS, (0,), "linear")
        with pytest.raises(ValueError, match="outside source span"):
            interp_weights(DAYS, (17,), "nearest")

    def test_duplicate_labels_refused(self):
        with pytest.raises(ValueError, match="duplicate source"):
            interp_weights((1, 1, 2), (1,), "linear")
        # duplicated targets would double their weights through the
        # gather's SUM -- refused loudly
        with pytest.raises(ValueError, match="duplicate target"):
            interp_weights((1, 2), (1, 1), "linear")

    def test_invalid_method(self):
        with pytest.raises(ValueError, match="invalid interp"):
            interp_weights(DAYS, (2,), "cubic")


class TestInterp:
    def test_linear_matches_np_interp(self, spark):
        cube = _cube(spark)
        targets = (1, 3, 9, 13, 16)
        got = _collect(
            resample_time_interp(cube, DAYS, targets, "linear")
        )
        # pixel (1,0) is NaN-free until day 16 exclusive
        clean = np.array([1.0, 4.0, 4.0, 9.0, 2.0])
        for t_out in (1, 3, 9):
            want = float(np.interp(t_out, DAYS[:5], clean))
            assert got[(t_out, 1, 0)] == pytest.approx(want)

    def test_nan_bracket_propagates(self, spark):
        cube = _cube(spark)
        got = _collect(
            resample_time_interp(cube, DAYS, (3, 9), "linear")
        )
        # pixel (0,1): day 3 brackets (2, 4) with NaN at day 2
        assert math.isnan(got[(3, 0, 1)])
        # day 9 brackets (7, 11) with NaN at day 7
        assert math.isnan(got[(9, 0, 1)])

    def test_exact_hit_passthrough_keeps_nan(self, spark):
        cube = _cube(spark)
        got = _collect(
            resample_time_interp(cube, DAYS, (2, 4), "linear")
        )
        assert math.isnan(got[(2, 0, 1)])
        assert got[(4, 0, 1)] == 6.0

    def test_nearest(self, spark):
        cube = _cube(spark)
        got = _collect(
            resample_time_interp(cube, DAYS, (5, 6), "nearest")
        )
        # 5 -> frame 4 (dist 1 vs 2); 6 -> frame 7 (dist 1 vs 2)
        assert got[(5, 1, 0)] == 4.0
        assert got[(6, 1, 0)] == 9.0

    def test_missing_bracket_row_yields_nan(self, spark):
        # SPARSE cube: the pixel has a row at t=4 but NO row at t=7
        # (absent chunk / filtered frame, not a NaN observation) --
        # target 5 brackets (4, 7), and a bare inner-join SUM would
        # silently emit the scaled-down partial 2/3*10
        cube = spark.createDataFrame(
            [(4, 0, 0, 10.0), (11, 0, 0, 20.0)],
            "t long, j int, i int, value double",
        )
        got = _collect(
            resample_time_interp(cube, (4, 7, 11), (5, 4), "linear")
        )
        assert math.isnan(got[(5, 0, 0)])
        assert got[(4, 0, 0)] == 10.0  # exact hit still passes through

    def test_plan_is_one_shuffle_one_broadcast(self, spark):
        # the documented plan: ONE shuffle Exchange (the groupBy), ONE
        # BroadcastExchange (the weight table).  Uniform bracket counts
        # (all targets strictly between frames) additionally keep the
        # n_exp column OFF the broadcast row -- the sparse guard is a
        # literal compare, not a first() buffer
        cube = _cube(spark)
        df = resample_time_interp(cube, DAYS, (3, 9), "linear")
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [ln for ln in plan.split("\n") if "Reused" not in ln]
        shuffles = [ln for ln in lines
                    if "Exchange" in ln and "BroadcastExchange" not in ln]
        broadcasts = [ln for ln in lines if "BroadcastExchange" in ln]
        assert len(shuffles) == 1, plan
        assert len(broadcasts) == 1, plan
        assert "n_exp" not in plan  # uniform -> literal expectation
        # MIXED bracket counts (target 4 is an exact frame hit) fall
        # back to the n_exp column + first() -- still 1 shuffle
        df2 = resample_time_interp(cube, DAYS, (3, 4), "linear")
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "n_exp" in plan2
        shuffles2 = [
            ln for ln in plan2.split("\n")
            if "Exchange" in ln and "BroadcastExchange" not in ln
            and "Reused" not in ln
        ]
        assert len(shuffles2) == 1, plan2


class TestForwardFill:
    def test_matches_pandas_ffill(self, spark):
        cube = _cube(spark)
        got = _collect(forward_fill_time(cube))
        series = pd.Series(
            [2.0, NAN, 6.0, NAN, 3.0, 5.0], index=list(DAYS)
        ).ffill()
        for t in DAYS:
            assert _eq(got[(t, 0, 1)], series.loc[t])

    def test_leading_gap_stays_nan(self, spark):
        cube = spark.createDataFrame(
            [(1, 0, 0, NAN), (2, 0, 0, NAN), (3, 0, 0, 7.0),
             (4, 0, 0, NAN)],
            "t long, j int, i int, value double",
        )
        got = _collect(forward_fill_time(cube))
        assert math.isnan(got[(1, 0, 0)])
        assert math.isnan(got[(2, 0, 0)])
        assert got[(3, 0, 0)] == 7.0
        assert got[(4, 0, 0)] == 7.0

    def test_row_count_preserved(self, spark):
        cube = _cube(spark)
        assert forward_fill_time(cube).count() == cube.count()


class TestComposite:
    def test_max_value_wins(self, spark):
        cube = _cube(spark)
        got = {(r.j, r.i): (r.t, r.value)
               for r in composite_best_pixel(cube).collect()}
        assert got[(0, 1)] == (4, 6.0)
        assert got[(1, 0)] == (7, 9.0)

    def test_tie_breaks_to_earliest_frame(self, spark):
        cube = spark.createDataFrame(
            [(5, 0, 0, 3.0), (2, 0, 0, 3.0), (9, 0, 0, 3.0)],
            "t long, j int, i int, value double",
        )
        got = composite_best_pixel(cube).collect()
        assert (got[0].t, got[0].value) == (2, 3.0)

    def test_all_nan_pixel_absent(self, spark):
        cube = spark.createDataFrame(
            [(1, 0, 0, NAN), (2, 0, 0, NAN), (1, 0, 1, 1.0)],
            "t long, j int, i int, value double",
        )
        rows = composite_best_pixel(cube).collect()
        assert len(rows) == 1 and rows[0].i == 1

    def test_separate_score_column(self, spark):
        # min-cloud style: score is its own column, negated for "min"
        cube = spark.createDataFrame(
            [(1, 0, 0, 10.0, -0.8), (2, 0, 0, 20.0, -0.1)],
            "t long, j int, i int, value double, neg_cloud double",
        )
        got = composite_best_pixel(cube, score_col="neg_cloud").collect()
        assert got[0].value == 20.0 and got[0].t == 2


# ------------------------------------------------------------------ #
# streaming rollup (the live-ingest shape of resample_time_agg)


def _ts_cube(spark):
    rows = [
        ("2024-01-01 03:00:00", 0, 0, 1.0),
        ("2024-01-01 15:00:00", 0, 0, 3.0),
        ("2024-01-01 21:00:00", 0, 0, NAN),
        ("2024-01-02 06:00:00", 0, 0, 8.0),
        ("2024-01-01 09:00:00", 0, 1, NAN),
        ("2024-01-01 18:00:00", 0, 1, NAN),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, j int, i int, value double"
    )
    return df.select(
        df.ts_s.cast("timestamp").alias("ts"), "j", "i", "value"
    )


class TestStreamingCubeRollup:
    def test_batch_semantics(self, spark):
        from xcube_resampling_spark.streaming.windows import (
            streaming_cube_rollup,
        )

        out = streaming_cube_rollup(_ts_cube(spark), "1 day")
        got = {
            (r.win_start.strftime("%m-%d"), r.j, r.i): r
            for r in out.collect()
        }
        day1 = got[("01-01", 0, 0)]
        assert day1.mean_value == pytest.approx(2.0)  # NaN skipped
        assert (day1.n_valid, day1.n_obs) == (2, 3)
        day2 = got[("01-02", 0, 0)]
        assert day2.mean_value == 8.0
        all_nan = got[("01-01", 0, 1)]
        assert math.isnan(all_nan.mean_value)
        assert (all_nan.n_valid, all_nan.n_obs) == (0, 2)

    def test_streaming_matches_batch(self, spark, tmp_path):
        from xcube_resampling_spark.streaming.windows import (
            streaming_cube_rollup,
        )

        src = str(tmp_path / "cube")
        _ts_cube(spark).write.parquet(src)
        stream = spark.readStream.schema(
            "ts timestamp, j int, i int, value double"
        ).parquet(src)
        assert stream.isStreaming
        out = streaming_cube_rollup(stream, "1 day")
        q = (
            out.writeStream.format("memory")
            .queryName("cube_rollup_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        live = {
            (r.win_start, r.j, r.i): (r.mean_value, r.n_valid, r.n_obs)
            for r in spark.sql("SELECT * FROM cube_rollup_test").collect()
        }
        batch = {
            (r.win_start, r.j, r.i): (r.mean_value, r.n_valid, r.n_obs)
            for r in streaming_cube_rollup(
                _ts_cube(spark), "1 day"
            ).collect()
        }
        assert set(live) == set(batch)
        for k in batch:
            for a, b in zip(live[k], batch[k]):
                assert _eq(float(a), float(b))


# ------------------------------------------------------------------ #
# properties (driver-side mapping math: no Spark session needed)


class TestInterpWeightProperties:
    @given(
        axis=st.lists(
            st.integers(0, 10_000), min_size=2, max_size=40, unique=True
        ),
        frac=st.lists(
            st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=20
        ),
    )
    @settings(max_examples=60, deadline=None)
    def test_linear_weights_partition_unity(self, axis, frac):
        axis = sorted(axis)
        lo, hi = axis[0], axis[-1]
        targets = sorted({int(lo + f * (hi - lo)) for f in frac})
        rows = interp_weights(axis, targets, "linear")
        per: dict[int, float] = {}
        for t_src, t_out, w in rows:
            assert t_src in axis
            assert 0.0 <= w <= 1.0
            per[t_out] = per.get(t_out, 0.0) + w
        for t_out in targets:
            assert per[t_out] == pytest.approx(1.0)

    @given(
        axis=st.lists(
            st.integers(0, 10_000), min_size=2, max_size=40, unique=True
        ),
        frac=st.floats(0.0, 1.0, allow_nan=False),
    )
    @settings(max_examples=60, deadline=None)
    def test_nearest_picks_min_distance(self, axis, frac):
        axis = sorted(axis)
        t_out = int(axis[0] + frac * (axis[-1] - axis[0]))
        ((t_src, _, w),) = interp_weights(axis, [t_out], "nearest")
        assert w == 1.0
        best = min(abs(s - t_out) for s in axis)
        assert abs(t_src - t_out) == best
        # tie -> earlier frame
        tied = [s for s in axis if abs(s - t_out) == best]
        assert t_src == min(tied)

    @given(
        axis=st.lists(
            st.integers(0, 1000), min_size=2, max_size=20, unique=True
        ),
    )
    @settings(max_examples=40, deadline=None)
    def test_exact_frame_hits_are_passthrough(self, axis):
        for method in ("linear", "nearest"):
            rows = interp_weights(sorted(axis), sorted(axis), method)
            assert sorted(rows) == sorted(
                (s, s, 1.0) for s in axis
            )


# ------------------------------------------------------------------ #
# dataset-level dispatcher


class TestResampleInTimeDataset:
    def _ds(self, spark):
        from xcube_resampling_spark.dataset import SparkDataset

        nt, h, w = 6, 3, 4
        rng = np.random.RandomState(3)
        cube = rng.rand(nt, h, w)
        cube[1, 0, 0] = NAN
        times = np.array(
            ["2024-01-01", "2024-01-04", "2024-01-09", "2024-01-16",
             "2024-01-20", "2024-01-31"], dtype="datetime64[D]")
        static = np.arange(h * w, dtype=float).reshape(h, w)
        return SparkDataset.from_numpy(
            spark,
            data_vars={"sst": (("time", "y", "x"), cube),
                       "dem": (("y", "x"), static)},
            coords={"time": times,
                    "y": np.arange(h), "x": np.arange(w)},
        ), cube, times

    def test_downsample_datetime_coord(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, cube, times = self._ds(spark)
        # 10-day bins in the coord's own unit (days)
        out = resample_in_time(ds, period=10, agg_methods="mean")
        new_t = out.coords["time"]
        assert new_t.dtype == times.dtype
        days = times.astype("int64")
        starts = sorted({(d // 10) * 10 for d in days})
        np.testing.assert_array_equal(new_t.astype("int64"), starts)
        got = out.to_numpy("sst", (len(starts), 3, 4))
        for k, s in enumerate(starts):
            sel = (days // 10) * 10 == s
            want = np.nanmean(cube[sel], axis=0)
            np.testing.assert_allclose(got[k], want)

    def test_interp_mode_and_passthrough(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, cube, times = self._ds(spark)
        days = times.astype("int64")
        targets = [int(days[0]) + 5, int(days[-1])]
        out = resample_in_time(ds, target_times=targets,
                               interp_methods="linear")
        np.testing.assert_array_equal(
            out.coords["time"].astype("int64"), targets)
        got = out.to_numpy("sst", (2, 3, 4))
        # target 0 sits between frames 1 and 2 (days 3 and 8 rel)
        lo, hi = 1, 2
        w = (targets[0] - days[lo]) / (days[hi] - days[lo])
        want = cube[lo] * (1 - w) + cube[hi] * w
        # the NaN hole is at frame 1 -> that pixel must be NaN
        np.testing.assert_allclose(got[0], want)
        np.testing.assert_allclose(got[1], cube[-1])
        # 2-D static variable passes through untouched
        assert out.data_vars["dem"].df is ds.data_vars["dem"].df

    def test_exactly_one_mode_required(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, _, _ = self._ds(spark)
        with pytest.raises(ValueError, match="exactly one"):
            resample_in_time(ds)
        with pytest.raises(ValueError, match="exactly one"):
            resample_in_time(ds, period=10, target_times=[1])

    def test_per_var_agg_methods(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, cube, times = self._ds(spark)
        out = resample_in_time(
            ds, period=100, agg_methods={"sst": "max"})
        got = out.to_numpy("sst", (1, 3, 4))
        np.testing.assert_allclose(
            got[0], np.nanmax(cube, axis=0))

    def test_last_reducer_is_time_ordered(self, spark):
        # regression: relabeling frames to a bucket INDEX before the
        # agg made min_by/max_by tie on a constant key -- 'last' must
        # pick by real frame time, whatever the row order
        from xcube_resampling_spark.dataset import SparkDataset
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        cube = np.array(
            [[[1.0]], [[5.0]], [[3.0]]])  # frames 0,1,2 of 1x1 px
        ds = SparkDataset.from_numpy(
            spark,
            data_vars={"v": (("time", "y", "x"), cube)},
            coords={"time": np.array([0, 10, 20])},
        )
        out = resample_in_time(ds, period=100, agg_methods="last")
        assert out.to_numpy("v", (1, 1, 1))[0, 0, 0] == 3.0
        out = resample_in_time(ds, period=100, agg_methods="first")
        assert out.to_numpy("v", (1, 1, 1))[0, 0, 0] == 1.0

    def test_wildcard_mapping_and_typo_raises(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, cube, _ = self._ds(spark)
        out = resample_in_time(ds, period=100,
                               agg_methods={"*": "max"})
        np.testing.assert_allclose(
            out.to_numpy("sst", (1, 3, 4))[0],
            np.nanmax(cube, axis=0))
        with pytest.raises(ValueError, match="invalid time agg"):
            resample_in_time(ds, period=100, agg_methods="medain")
        with pytest.raises(ValueError, match="invalid time interp"):
            resample_in_time(ds, target_times=[19723],
                             interp_methods="cubic")

    def test_driver_side_time_var_stays_consistent(self, spark):
        # a ('time',)-dimensioned metadata variable must follow the
        # new axis, not silently keep the old length
        from xcube_resampling_spark.dataset import (
            SparkDataset,
            Variable,
        )
        from xcube_resampling_spark.operators.temporal import (
            resample_in_time,
        )

        ds, cube, times = self._ds(spark)
        qc = np.array([0.0, 1.0, np.nan, 3.0, 4.0, 5.0])
        ds.data_vars["qc"] = Variable(
            "qc", None, ("time",), "float64", {}, data=qc)
        out = resample_in_time(ds, period=10, agg_methods="mean")
        days = times.astype("int64")
        starts = sorted({(d // 10) * 10 for d in days})
        got = out.data_vars["qc"].data
        assert got.shape == (len(starts),)
        for k, s in enumerate(starts):
            sel = (days // 10) * 10 == s
            want = np.nanmean(qc[sel])
            assert got[k] == pytest.approx(want)
        # interp mode too
        targets = [int(days[0]), int(days[2])]
        out2 = resample_in_time(ds, target_times=targets)
        np.testing.assert_allclose(
            out2.data_vars["qc"].data, [qc[0], qc[2]])


class TestGapFillFamily:
    def test_backward_fill_matches_pandas(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            backward_fill_time,
        )

        cube = _cube(spark)
        got = _collect(backward_fill_time(cube))
        series = pd.Series(
            [2.0, NAN, 6.0, NAN, 3.0, 5.0], index=list(DAYS)
        ).bfill()
        for t in DAYS:
            assert _eq(got[(t, 0, 1)], series.loc[t])

    def test_backward_fill_trailing_gap_stays_nan(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            backward_fill_time,
        )

        cube = spark.createDataFrame(
            [(1, 0, 0, 7.0), (2, 0, 0, NAN), (3, 0, 0, NAN)],
            "t long, j int, i int, value double",
        )
        got = _collect(backward_fill_time(cube))
        assert got[(1, 0, 0)] == 7.0
        assert math.isnan(got[(2, 0, 0)])
        assert math.isnan(got[(3, 0, 0)])

    def test_interpolate_na_matches_pandas(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            interpolate_na_time,
        )

        cube = _cube(spark)
        got = _collect(interpolate_na_time(cube))
        # pandas interpolate with the index as abscissa == xarray's
        # interpolate_na(method="linear", use_coordinate=True)
        series = pd.Series(
            [2.0, NAN, 6.0, NAN, 3.0, 5.0],
            index=pd.Index(list(DAYS), dtype="float64"),
        ).interpolate(method="index")
        for t in DAYS:
            assert _eq(got[(t, 0, 1)], series.loc[float(t)]), t

    def test_interpolate_na_edge_gaps_stay_nan(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            interpolate_na_time,
        )

        cube = spark.createDataFrame(
            [(0, 0, 0, NAN), (5, 0, 0, 10.0), (10, 0, 0, NAN),
             (20, 0, 0, 30.0), (30, 0, 0, NAN)],
            "t long, j int, i int, value double",
        )
        got = _collect(interpolate_na_time(cube))
        assert math.isnan(got[(0, 0, 0)])     # leading: no left bracket
        assert got[(5, 0, 0)] == 10.0
        # 10 is 1/3 of the way from 5 to 20: 10 + (30-10)/3
        assert got[(10, 0, 0)] == pytest.approx(10 + 20 / 3)
        assert math.isnan(got[(30, 0, 0)])    # trailing gap

    def test_rolling_matches_pandas_time_window(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        vals = pd.Series(
            [2.0, NAN, 6.0, NAN, 3.0, 5.0],
            index=pd.to_datetime(list(DAYS), unit="D"),
        )
        for method, pdm in (("mean", "mean"), ("sum", "sum"),
                            ("max", "max"), ("count", "count")):
            got = _collect(rolling_time_agg(cube, method, 5))
            want = getattr(vals.rolling("5D"), pdm)()
            for k, t in enumerate(DAYS):
                w = want.iloc[k]
                if method == "sum" and (math.isnan(w)):
                    w = 0.0
                assert _eq(got[(t, 0, 1)], float(w)), (method, t)

    def test_rolling_invalid_method(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        with pytest.raises(ValueError, match="invalid rolling"):
            rolling_time_agg(_cube(spark), "mode", 5)

    def test_rolling_window_must_be_positive(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        with pytest.raises(ValueError, match="window must be >= 1"):
            rolling_time_agg(_cube(spark), "mean", 0)


class TestRollingRowsFrame:
    def test_rows_mode_matches_pandas_fixed_window(self, spark):
        # xarray rolling(time=3) == pandas rolling(3): trailing 3
        # OBSERVATIONS, min_periods defaulting to the window
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        vals = {
            (0, 1): pd.Series([2.0, NAN, 6.0, NAN, 3.0, 5.0]),
            (1, 0): pd.Series([1.0, 4.0, 4.0, 9.0, 2.0, NAN]),
        }
        got = _collect(rolling_time_agg(cube, "mean", 3, frame="rows"))
        for (j, i), series in vals.items():
            want = series.rolling(3).mean()
            for k, t in enumerate(DAYS):
                assert _eq(got[(t, j, i)], float(want.iloc[k])), (j, i, t)

    def test_rows_mode_min_periods(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        got = _collect(
            rolling_time_agg(cube, "mean", 3, frame="rows",
                             min_periods=2)
        )
        for (j, i), series in (
            ((0, 1), pd.Series([2.0, NAN, 6.0, NAN, 3.0, 5.0])),
            ((1, 0), pd.Series([1.0, 4.0, 4.0, 9.0, 2.0, NAN])),
        ):
            want = series.rolling(3, min_periods=2).mean()
            for k, t in enumerate(DAYS):
                assert _eq(got[(t, j, i)], float(want.iloc[k])), (j, i, t)

    def test_rows_vs_range_differ_on_irregular_axis(self, spark):
        # at day 16, rows-3 sees days {7, 11, 16} while range-15 sees
        # days {2..16} -- the two frames are genuinely different ops
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        rows3 = _collect(
            rolling_time_agg(cube, "count", 3, frame="rows",
                             min_periods=0))
        range15 = _collect(rolling_time_agg(cube, "count", 15))
        assert rows3[(16, 1, 0)] == 2.0    # days 7, 11 valid; 16 NaN
        assert range15[(16, 1, 0)] == 4.0  # days 4, 7, 11 valid + 2

    def test_invalid_frame_raises(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        with pytest.raises(ValueError, match="frame must be"):
            rolling_time_agg(_cube(spark), "mean", 3, frame="sliding")


class TestLargeAxisLabelTables:
    def test_broadcast_tables_match_literal_path(self, spark,
                                                 monkeypatch):
        # the broadcast-join relabeling (LABEL_TABLE_THRESHOLD
        # exceeded) must be value-identical to the literal
        # element_at/create_map path, in both agg and interp modes
        import xcube_resampling_spark.operators.temporal as tmod
        from xcube_resampling_spark.dataset import SparkDataset

        nt = 24
        rng = np.random.RandomState(7)
        cube = rng.rand(nt, 2, 2)
        cube[3, 0, 1] = NAN
        times = np.arange(100, 100 + 7 * nt, 7)

        def make():
            return SparkDataset.from_numpy(
                spark,
                data_vars={"v": (("time", "y", "x"), cube)},
                coords={"time": times,
                        "y": np.arange(2), "x": np.arange(2)},
            )

        lit = tmod.resample_in_time(make(), period=30,
                                    agg_methods="mean")
        n_out = len(lit.coords["time"])
        lit_vals = lit.to_numpy("v", (n_out, 2, 2))
        targets = [int(times[0]) + 3, int(times[5])]
        lit2 = tmod.resample_in_time(make(), target_times=targets)
        lit2_vals = lit2.to_numpy("v", (2, 2, 2))

        monkeypatch.setattr(tmod, "LABEL_TABLE_THRESHOLD", 4)
        tab = tmod.resample_in_time(make(), period=30,
                                    agg_methods="mean")
        np.testing.assert_array_equal(
            np.asarray(lit.coords["time"]),
            np.asarray(tab.coords["time"]))
        np.testing.assert_allclose(
            lit_vals, tab.to_numpy("v", (n_out, 2, 2)))
        tab2 = tmod.resample_in_time(make(), target_times=targets)
        np.testing.assert_allclose(
            lit2_vals, tab2.to_numpy("v", (2, 2, 2)))

    def test_50k_frame_axis_plan_stays_bounded(self, spark):
        # a high-cadence 50k-frame axis: the plan must not embed the
        # label axis as literals (50k lits is ~0.5 MB of expression
        # tree and breaks codegen limits) -- and values stay exact
        import xcube_resampling_spark.operators.temporal as tmod
        from xcube_resampling_spark.dataset import SparkDataset

        nt = 50_000
        vals = (np.arange(nt, dtype="float64") % 100.0).reshape(
            nt, 1, 1)
        times = np.arange(nt, dtype="int64") * 2 + 1
        ds = SparkDataset.from_numpy(
            spark,
            data_vars={"v": (("time", "y", "x"), vals)},
            coords={"time": times,
                    "y": np.arange(1), "x": np.arange(1)},
        )
        out = tmod.resample_in_time(ds, period=20_000,
                                    agg_methods="mean")
        df = out.data_vars["v"].df
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(plan) < 50_000, len(plan)
        starts = sorted({int((t // 20_000) * 20_000) for t in times})
        got = out.to_numpy("v", (len(starts), 1, 1))
        days = times
        for k, s in enumerate(starts):
            sel = (days // 20_000) * 20_000 == s
            assert got[k, 0, 0] == pytest.approx(
                float(np.mean(vals[sel, 0, 0])))

    def test_min_periods_validation(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        with pytest.raises(ValueError, match="min_periods.*<= window"):
            rolling_time_agg(cube, "mean", 3, frame="rows",
                             min_periods=30)
        with pytest.raises(ValueError, match="min_periods must be >= 0"):
            rolling_time_agg(cube, "mean", 3, frame="rows",
                             min_periods=-1)

    def test_center_matches_pandas(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        cube = _cube(spark)
        series = {
            (0, 1): pd.Series([2.0, NAN, 6.0, NAN, 3.0, 5.0]),
            (1, 0): pd.Series([1.0, 4.0, 4.0, 9.0, 2.0, NAN]),
        }
        for n in (3, 4):  # odd + even centering conventions
            got = _collect(
                rolling_time_agg(cube, "mean", n, frame="rows",
                                 center=True, min_periods=1))
            for (j, i), s in series.items():
                want = s.rolling(n, center=True, min_periods=1).mean()
                for k, t in enumerate(DAYS):
                    assert _eq(got[(t, j, i)], float(want.iloc[k])), \
                        (n, j, i, t)

    def test_center_requires_rows_frame(self, spark):
        from xcube_resampling_spark.operators.temporal import (
            rolling_time_agg,
        )

        with pytest.raises(ValueError, match="center=True requires"):
            rolling_time_agg(_cube(spark), "mean", 3, center=True)
