"""Block-aggregation reducer semantics vs numpy references.

Mirrors /root/reference/tests/test_coarsen.py: every reducer applied to 2x2
windows must equal its numpy(-nan) counterpart with the reference's dtype
rules (coarsen.py:93-111, constants.py:51-65).
"""

import numpy as np
import pytest

from xcube_resampling_spark.dataset import numpy_to_pixels
from xcube_resampling_spark.operators.coarsen import (
    aggregate_windows,
    position_for,
)

nan = np.nan

FLOAT_BLOCK = np.array(
    [
        [1.0, 2.0, nan, 4.0],
        [3.0, 0.0, nan, nan],
        [0.0, 0.0, 5.0, -2.0],
        [7.0, 1.0, 3.0, 5.0],
    ]
)

INT_BLOCK = np.array(
    [
        [1, 2, 3, 4],
        [3, 0, 7, 7],
        [0, 0, 5, -2],
        [7, 1, 3, 5],
    ],
    dtype=np.int64,
)


def windows(arr):
    """2x2 windows of a 4x4 array -> dict[(J, I)] = flat window."""
    out = {}
    for wj in range(2):
        for wi in range(2):
            out[(wj, wi)] = arr[
                2 * wj : 2 * wj + 2, 2 * wi : 2 * wi + 2
            ].ravel()
    return out


def run_agg(spark, arr, method, is_int):
    from pyspark.sql import functions as F

    df = numpy_to_pixels(spark, arr)
    grouped = df.select(
        "t",
        (F.col("j") / 2).cast("int").alias("J"),
        (F.col("i") / 2).cast("int").alias("I"),
        "value",
    )
    res = aggregate_windows(grouped, method, 2, 2, is_int)
    out = {}
    for r in res.collect():
        out[(r["J"], r["I"])] = (
            np.nan if r["value"] is None else r["value"]
        )
    return out


FLOAT_CASES = {
    "mean": lambda w: np.nanmean(w),
    "median": lambda w: np.nanmedian(w),
    "min": lambda w: np.nanmin(w),
    "max": lambda w: np.nanmax(w),
    "sum": lambda w: np.nansum(w),
    "prod": lambda w: np.nanprod(w),
    "std": lambda w: np.nanstd(w),
    "var": lambda w: np.nanvar(w),
    "count": lambda w: np.count_nonzero(w),
}


class TestCoarsenFloat:
    @pytest.mark.parametrize("method", sorted(FLOAT_CASES))
    def test_reducer(self, spark, method):
        import warnings

        got = run_agg(spark, FLOAT_BLOCK, method, is_int=False)
        for key, w in windows(FLOAT_BLOCK).items():
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                expected = FLOAT_CASES[method](w)
            np.testing.assert_almost_equal(
                got[key], expected, decimal=10,
                err_msg=f"{method} window {key}",
            )


class TestCoarsenInt:
    @pytest.mark.parametrize(
        "method", ["mean", "median", "min", "max", "sum", "count", "prod"]
    )
    def test_reducer(self, spark, method):
        plain = {
            "mean": lambda w: np.rint(np.mean(w)),
            "median": lambda w: np.rint(np.median(w)),
            "min": np.min,
            "max": np.max,
            "sum": np.sum,
            "count": np.count_nonzero,
            "prod": np.prod,
        }
        got = run_agg(spark, INT_BLOCK.astype(np.float64), method, is_int=True)
        for key, w in windows(INT_BLOCK).items():
            expected = plain[method](w)
            np.testing.assert_almost_equal(
                got[key], float(expected), decimal=10,
                err_msg=f"{method} window {key}",
            )

    def test_mode_tie_break_lowest_wins(self, spark):
        arr = np.array(
            [
                [1, 2, 5, 5],
                [2, 1, 5, 3],
                [9, 9, 0, 0],
                [8, 8, 0, 7],
            ],
            dtype=np.float64,
        )
        got = run_agg(spark, arr, "mode", is_int=True)
        # window (0,0): {1:2, 2:2} tie -> lowest value 1 wins
        assert got[(0, 0)] == 1
        # window (0,1): 5 occurs 3x
        assert got[(0, 1)] == 5
        # window (1,0): {9:2, 8:2} tie -> 8
        assert got[(1, 0)] == 8
        # window (1,1): 0 occurs 3x
        assert got[(1, 1)] == 0


class TestPositional:
    def test_positions(self):
        assert position_for("first", 2, 2) == (0, 0)
        assert position_for("last", 2, 2) == (1, 1)
        assert position_for("center", 2, 2) == (1, 1)
        assert position_for("center", 3, 3) == (1, 1)
        assert position_for("center", 4, 5) == (2, 2)
