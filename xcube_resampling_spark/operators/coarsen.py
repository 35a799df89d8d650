"""Block-aggregation reducers as Spark SQL aggregations.

Parity reference: /root/reference/xcube_resampling/coarsen.py:50-155 and
constants.py:51-65.  The reference reduces k x k pixel windows with
numpy/numba kernels inside ``dask.array.coarsen``; relationally this is a
``GROUP BY (j div k, i div k)`` -- a single map-side-combinable shuffle that
Catalyst executes with partial aggregation automatically.

Semantics replicated exactly:

* floats use NaN-aware reducers (coarsen.py:99-103): NaN -> NULL before
  aggregating; an all-NaN window yields NaN (except ``sum`` -> 0 and
  ``prod`` -> 1, matching np.nansum/np.nanprod).
* integer windows aggregate plainly (fill values participate); float-typed
  results are rounded half-to-even and cast back (coarsen.py:104-111) --
  Spark ``bround`` == np.rint.
* ``count`` is np.count_nonzero (constants.py:53): counts everything except
  exact zeros -- NaN counts as non-zero.
* ``mode`` tie-break: the lowest value among the most frequent wins
  (coarsen.py:149-153, ascending histogram scan).
* ``first``/``last``/``center`` pick the window element at a fixed position;
  these never need the full window (see ``position_for``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POSITIONAL_METHODS = ("first", "last", "center")


def position_for(method: str, k_j: int, k_i: int) -> tuple[int, int]:
    """Window-local (pj, pi) picked by a positional reducer.

    first -> (0, 0); last -> (k-1, k-1); center -> (k//2, k//2)
    (reference coarsen.py:50-69).
    """
    if method == "first":
        return 0, 0
    if method == "last":
        return k_j - 1, k_i - 1
    if method == "center":
        return k_j // 2, k_i // 2
    raise ValueError(method)


def _nan_to_null(c: Column) -> Column:
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


def aggregate_windows(
    df: DataFrame,
    agg_method: str,
    k_j: int,
    k_i: int,
    is_int: bool,
    group_cols: tuple[str, ...] = ("t", "J", "I"),
    value_col: str = "value",
) -> DataFrame:
    """Aggregate a complete intermediate pixel grid into windows.

    ``df`` must contain *every* window subpixel (missing source coverage
    already replaced by the fill value), with window-id columns ``J``, ``I``
    and the subpixel value in ``value_col``.  Returns one row per window with
    columns ``group_cols + (value,)``.
    """
    v = F.col(value_col)
    keys = [F.col(c) for c in group_cols]
    window_size = k_j * k_i

    if agg_method == "mode":
        # two-level: count occurrences, then pick (max count, min value)
        counted = df.groupBy(*group_cols, value_col).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return counted.groupBy(*group_cols).agg(
            F.max_by(
                F.col(value_col), F.struct(F.col("cnt"), -F.col(value_col))
            ).alias("value")
        )

    if agg_method == "count":
        # np.count_nonzero: everything except exact zero counts (incl. NaN)
        agg = (
            F.lit(window_size)
            - F.count(F.when(v == 0.0, F.lit(1)))
        ).cast("double").alias("value")
        return df.groupBy(*keys).agg(agg)

    if agg_method == "prod":
        if is_int:
            agg = F.aggregate(
                F.collect_list(v), F.lit(1.0), lambda acc, x: acc * x
            )
        else:
            # np.nanprod: NaNs are ones; empty (all-NaN) -> 1.0
            agg = F.aggregate(
                F.collect_list(_nan_to_null(v)),
                F.lit(1.0),
                lambda acc, x: acc * x,
            )
        return df.groupBy(*keys).agg(agg.alias("value"))

    if is_int:
        # plain reducers; float intermediate results rounded half-even
        # and cast back (reference coarsen.py:104-111)
        if agg_method == "mean":
            agg = F.bround(F.avg(v), 0)
        elif agg_method == "median":
            agg = F.bround(F.percentile(v, F.lit(0.5)), 0)
        elif agg_method == "std":
            agg = F.bround(
                F.coalesce(F.stddev_pop(v), F.lit(0.0)), 0)
        elif agg_method == "var":
            agg = F.bround(F.coalesce(F.var_pop(v), F.lit(0.0)), 0)
        elif agg_method == "min":
            agg = F.min(v)
        elif agg_method == "max":
            agg = F.max(v)
        elif agg_method == "sum":
            agg = F.sum(v)
        else:
            raise ValueError(f"invalid agg_method {agg_method!r}")
        return df.groupBy(*keys).agg(agg.cast("double").alias("value"))

    # float path: NaN-aware reducers (NaN -> NULL -> skipped)
    nv = _nan_to_null(v)
    if agg_method == "mean":
        agg = F.avg(nv)
    elif agg_method == "median":
        agg = F.percentile(nv, F.lit(0.5))
    elif agg_method == "std":
        agg = F.coalesce(
            F.stddev_pop(nv),
            F.when(F.count(nv) > 0, F.lit(0.0)),
        )
    elif agg_method == "var":
        agg = F.coalesce(
            F.var_pop(nv), F.when(F.count(nv) > 0, F.lit(0.0))
        )
    elif agg_method == "min":
        agg = F.min(nv)
    elif agg_method == "max":
        agg = F.max(nv)
    elif agg_method == "sum":
        agg = F.coalesce(F.sum(nv), F.lit(0.0))  # np.nansum: all-NaN -> 0
    else:
        raise ValueError(f"invalid agg_method {agg_method!r}")
    # all-NaN windows -> NULL for most reducers; surface as NaN
    agg = F.coalesce(agg, F.lit(float("nan")))
    return df.groupBy(*keys).agg(agg.alias("value"))
