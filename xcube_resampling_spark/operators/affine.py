"""Affine resampling between regular grids sharing a CRS -- pure Spark SQL.

Parity reference: /root/reference/xcube_resampling/affine.py:52-362.
The reference maps each target pixel to fractional source array coordinates
via a composed 2x3 affine matrix and evaluates a spline of order 0 (nearest)
or 1 (bilinear) with ``dask_image.ndinterp.affine_transform``; downscaling
first upsamples by a residual factor, then reduces k x k windows with
``da.coarsen`` (affine.py:277-313).

Here the same semantics are expressed relationally, with no UDFs:

* the target grid is generated distributed (``spark.range``),
* fractional source coordinates are column arithmetic
  (``src_if = i_scale * i + i_off``),
* the gather is a single equi-join against the source pixel table
  (1 neighbor for nearest, 4 exploded neighbors + pivot for bilinear),
* out-of-bounds semantics replicate scipy's ``mode="constant"``:
  a coordinate outside ``[0, n-1]`` yields the fill value; an interior
  coordinate blends ``v0 + f*(v1-v0)``, which propagates data NaNs even at
  zero weight exactly like the spline evaluation does,
* downscale = the same gather on a k-times finer intermediate grid followed
  by a ``GROUP BY (j div k, i div k)`` window aggregation (coarsen.py here),
  with positional reducers (first/last/center) short-circuited to a single
  gathered subpixel per output pixel -- no shuffle, no window blow-up.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import AffineTransformMatrix, is_int_dtype
from ..dataset import SparkDataset, Variable, grid_df
from ..gridmapping import GridMapping
from .coarsen import POSITIONAL_METHODS, aggregate_windows, position_for
from .utils import (
    num_t as num_t_of,
    can_apply_affine_transform,
    get_agg_method,
    get_fill_value,
    get_interp_method_int,
    get_recover_nan,
)

_HIGHER_ORDER_ERROR = (
    "interp_methods must be one of 0, 1, 'nearest', 'bilinear'. "
    "Higher order is not supported for 3D arrays in affine transforms, "
    "as it causes unintended blending across the non-spatial (e.g., time) "
    "dimension."
)


def affine_transform_dataset(
    source_ds: SparkDataset,
    target_gm: GridMapping,
    source_gm: GridMapping | None = None,
    variables=None,
    interp_methods=None,
    agg_methods=None,
    recover_nans=False,
    fill_values=None,
) -> SparkDataset:
    """Resample a dataset between two regular same-CRS grids
    (reference affine.py:52-137)."""
    if source_gm is None:
        source_gm = source_ds.grid_mapping()

    assert can_apply_affine_transform(source_gm, target_gm), (
        f"Affine transformation cannot be applied to source CRS "
        f"{source_gm.crs.name!r} and target CRS {target_gm.crs.name!r}"
    )

    source_ds = source_ds.select_variables(variables)

    target_ds = resample_dataset(
        source_ds,
        target_gm.ij_transform_to(source_gm),
        (source_gm.xy_dim_names[1], source_gm.xy_dim_names[0]),
        target_gm.size,
        source_gm.size,
        interp_methods,
        agg_methods,
        recover_nans,
        fill_values,
    )

    # assign coordinates + CF spatial_ref from the target grid mapping
    x_name, y_name = target_gm.xy_var_names
    target_ds.coords[x_name] = target_gm.x_coords
    target_ds.coords[y_name] = target_gm.y_coords
    target_ds.coords["spatial_ref"] = 0
    target_ds.coord_attrs["spatial_ref"] = target_gm.crs.to_cf()
    target_ds.yx_dims = (target_gm.xy_dim_names[1], target_gm.xy_dim_names[0])
    return target_ds


def resample_dataset(
    dataset: SparkDataset,
    affine_matrix: AffineTransformMatrix,
    yx_dims: tuple[str, str],
    target_size: tuple[int, int],
    source_size: tuple[int, int],
    interp_methods=None,
    agg_methods=None,
    recover_nans=False,
    fill_values=None,
) -> SparkDataset:
    """Resample every spatial variable through the affine matrix; copy
    non-spatial variables; drop single-spatial-dim variables
    (reference affine.py:140-240)."""
    new_vars: dict[str, Variable] = {}
    for name, var in dataset.data_vars.items():
        if var.is_spatial and var.dims[-2:] == yx_dims:
            num_t = num_t_of(dataset, var)
            df = resample_pixels(
                dataset.spark,
                var.df,
                affine_matrix,
                source_size,
                target_size,
                num_t,
                get_interp_method_int(interp_methods, name, var.dtype),
                get_agg_method(agg_methods, name, var.dtype),
                get_recover_nan(recover_nans, name, var.dtype),
                get_fill_value(fill_values, name, var.dtype),
                is_int_dtype(var.dtype),
            )
            new_vars[name] = var.with_df(df)
        elif yx_dims[0] not in var.dims and yx_dims[1] not in var.dims:
            new_vars[name] = var
    # carry non-spatial coords (e.g. time axis); drop spatial axes and any
    # 2-D coordinate images (they no longer match the resampled grid)
    import numpy as _np

    def _is_spatial_coord(k, v):
        if k in dataset.yx_dims or k == "spatial_ref":
            return True
        if any(k == f"{d}_bnds" for d in dataset.yx_dims):
            return True
        return isinstance(v, _np.ndarray) and v.ndim == 2

    coords = {
        k: v
        for k, v in dataset.coords.items()
        if not _is_spatial_coord(k, v)
    }
    return SparkDataset(
        spark=dataset.spark,
        data_vars=new_vars,
        coords=coords,
        coord_attrs={
            k: v for k, v in dataset.coord_attrs.items() if k in coords
        },
        attrs=dict(dataset.attrs),
        yx_dims=yx_dims,
    )


def resample_pixels(
    spark: SparkSession,
    src_df: DataFrame,
    affine_matrix: AffineTransformMatrix,
    source_size: tuple[int, int],
    target_size: tuple[int, int],
    num_t: int,
    interp_method: int,
    agg_method: str,
    recover_nan: bool,
    fill_value,
    is_int: bool,
) -> DataFrame:
    """Long-format pixel resampling through a target->source affine matrix
    (reference affine.py:243-313)."""
    ((i_scale, _b, i_off), (_d, j_scale, j_off)) = affine_matrix
    # Snap near-integer matrix entries: the composition of two grid
    # transforms is mathematically exact for grid-aligned cases, and
    # float noise (~1e-15) must not flip floor()/neighbor selection.
    i_scale, i_off, j_scale, j_off = (
        _snap(v) for v in (i_scale, i_off, j_scale, j_off)
    )
    if interp_method not in (0, 1):
        raise ValueError(_HIGHER_ORDER_ERROR)
    w, h = target_size

    # Downscale decision replicates the reference literally
    # (affine.py:253: checks matrix[0][0] and matrix[1][0]).
    if (i_scale > 1 or _d > 1) and interp_method != 0:
        k_i = math.ceil(abs(i_scale))
        k_j = math.ceil(abs(j_scale))
        adj = i_scale / k_i, i_off, j_scale / k_j, j_off

        if agg_method in POSITIONAL_METHODS:
            # positional reducer: gather exactly one subpixel per output
            # pixel -- avoids the k*k intermediate entirely
            pj, pi = position_for(agg_method, k_j, k_i)
            grid = grid_df(spark, w, h, num_t).select(
                "t", "j", "i",
                (F.col("j") * k_j + pj).alias("jj"),
                (F.col("i") * k_i + pi).alias("ii"),
            )
            return _gather(
                grid, src_df, adj, source_size, interp_method,
                recover_nan, fill_value, ("jj", "ii"),
            ).select("t", "j", "i", "value")

        # full intermediate grid, then window aggregation
        inter = grid_df(spark, w * k_i, h * k_j, num_t)
        gathered = _gather(
            inter, src_df, adj, source_size, interp_method,
            recover_nan, fill_value, ("j", "i"),
        ).select(
            "t",
            (F.col("j") / k_j).cast("int").alias("J"),
            (F.col("i") / k_i).cast("int").alias("I"),
            "value",
        )
        out = aggregate_windows(gathered, agg_method, k_j, k_i, is_int)
        return out.select(
            "t", F.col("J").alias("j"), F.col("I").alias("i"), "value"
        )

    grid = grid_df(spark, w, h, num_t)
    return _gather(
        grid, src_df, (i_scale, i_off, j_scale, j_off), source_size,
        interp_method, recover_nan, fill_value, ("j", "i"),
    ).select("t", "j", "i", "value")


def _snap(v: float, tol: float = 1e-9) -> float:
    r = round(v)
    if v != r and abs(v - r) <= tol * max(1.0, abs(v)):
        return float(r)
    # also snap to nearest half (common for center-aligned grids)
    r2 = round(v * 2) / 2
    if v != r2 and abs(v - r2) <= tol * max(1.0, abs(v)):
        return float(r2)
    return float(v)


def _gather(
    grid: DataFrame,
    src_df: DataFrame,
    matrix4: tuple[float, float, float, float],
    source_size: tuple[int, int],
    interp_method: int,
    recover_nan: bool,
    fill_value,
    idx_cols: tuple[str, str],
) -> DataFrame:
    """Evaluate the order-0/1 spline gather as join + expressions.

    ``idx_cols`` names the (row, col) columns of *grid* used as target array
    indices; output keeps grid's (t, j, i).
    """
    i_scale, i_off, j_scale, j_off = matrix4
    src_w, src_h = source_size
    fill = F.lit(float(fill_value)).cast("double")
    jj, ii = (F.col(idx_cols[0]), F.col(idx_cols[1]))

    src_if = (F.lit(float(i_scale)) * ii + F.lit(float(i_off)))
    src_jf = (F.lit(float(j_scale)) * jj + F.lit(float(j_off)))

    if interp_method == 0:
        si = F.floor(src_if + 0.5).cast("int")
        sj = F.floor(src_jf + 0.5).cast("int")
        g = grid.select(
            "t", "j", "i", si.alias("si"), sj.alias("sj"),
            (
                (si >= 0) & (si <= src_w - 1) & (sj >= 0) & (sj <= src_h - 1)
            ).alias("in_b"),
        )
        src = src_df.select(
            F.col("t").alias("st"), F.col("j").alias("sj2"),
            F.col("i").alias("si2"), F.col("value").alias("sv"),
        )
        joined = g.join(
            src,
            (g["t"] == src["st"]) & (g["sj"] == src["sj2"])
            & (g["si"] == src["si2"]),
            "left",
        )
        return joined.select(
            "t", "j", "i",
            F.when(
                F.col("in_b"), F.coalesce(F.col("sv"), fill)
            ).otherwise(fill).alias("value"),
        )

    # bilinear (order 1)
    in_b = (
        (src_if >= 0) & (src_if <= src_w - 1)
        & (src_jf >= 0) & (src_jf <= src_h - 1)
    )
    i0 = F.least(F.floor(src_if), F.lit(src_w - 2)).cast("int")
    j0 = F.least(F.floor(src_jf), F.lit(src_h - 2)).cast("int")
    fx = src_if - i0
    fy = src_jf - j0

    g = grid.select(
        "t", "j", "i",
        i0.alias("i0"), j0.alias("j0"),
        fx.alias("fx"), fy.alias("fy"), in_b.alias("in_b"),
    ).filter(F.col("in_b"))  # out-of-bounds pixels re-added as fill below

    tags = F.array(
        *[
            F.struct(F.lit(dj).alias("dj"), F.lit(di).alias("di"))
            for dj in (0, 1)
            for di in (0, 1)
        ]
    )
    nbrs = g.select(
        "t", "j", "i", "fx", "fy",
        F.explode(tags).alias("tag"),
        "i0", "j0",
    ).select(
        "t", "j", "i", "fx", "fy",
        F.col("tag.dj").alias("dj"), F.col("tag.di").alias("di"),
        (F.col("j0") + F.col("tag.dj")).alias("sj"),
        (F.col("i0") + F.col("tag.di")).alias("si"),
    )
    src = src_df.select(
        F.col("t").alias("st"), F.col("j").alias("sj2"),
        F.col("i").alias("si2"), F.col("value").alias("sv"),
    )
    joined = nbrs.join(
        src,
        (nbrs["t"] == src["st"]) & (nbrs["sj"] == src["sj2"])
        & (nbrs["si"] == src["si2"]),
        "left",
    ).select(
        "t", "j", "i", "fx", "fy", "dj", "di",
        F.coalesce(F.col("sv"), fill).alias("sv"),
    )

    def pick(dj, di):
        return F.max(
            F.when((F.col("dj") == dj) & (F.col("di") == di), F.col("sv"))
        )

    piv = joined.groupBy("t", "j", "i", "fx", "fy").agg(
        pick(0, 0).alias("v00"),
        pick(0, 1).alias("v01"),
        pick(1, 0).alias("v10"),
        pick(1, 1).alias("v11"),
    )

    fx_c, fy_c = F.col("fx"), F.col("fy")

    def blend(v00, v01, v10, v11):
        vu0 = v00 + fx_c * (v01 - v00)
        vu1 = v10 + fx_c * (v11 - v10)
        return vu0 + fy_c * (vu1 - vu0)

    if recover_nan:
        def z(c):  # NaN -> 0 (zero-filled image)
            return F.when(F.isnan(c), F.lit(0.0)).otherwise(c)

        def m(c):  # inverse NaN mask
            return F.when(F.isnan(c), F.lit(0.0)).otherwise(F.lit(1.0))

        scaled = blend(*[z(F.col(c)) for c in ("v00", "v01", "v10", "v11")])
        norm = blend(*[m(F.col(c)) for c in ("v00", "v01", "v10", "v11")])
        value = F.when(
            F.abs(norm) <= F.lit(1e-8), F.lit(float("nan"))
        ).otherwise(scaled / norm)
    else:
        value = blend(
            F.col("v00"), F.col("v01"), F.col("v10"), F.col("v11")
        )

    computed = piv.select("t", "j", "i", value.alias("value"))

    # re-add out-of-bounds target pixels as fill
    oob = grid.select(
        "t", "j", "i",
        i0.alias("_i0"), src_if.alias("_sif"), src_jf.alias("_sjf"),
    ).filter(~(
        (F.col("_sif") >= 0) & (F.col("_sif") <= src_w - 1)
        & (F.col("_sjf") >= 0) & (F.col("_sjf") <= src_h - 1)
    )).select("t", "j", "i", fill.alias("value"))
    return computed.unionByName(oob)
