"""Temporal resampling over a multi-frame cube: the `resample_in_time`
workflow a user of the reference's ecosystem runs right after
`resample_in_space` -- downsample a daily stack to monthly means,
gap-fill clouds forward in time, and build a best-pixel composite.

All four operators are single-shuffle DataFrame plans
(operators/temporal.py): the bucket reducers and the composite are
map-side-combinable aggregations, the interpolating upsample is a
broadcast weighted gather over the metadata-sized time axis, and the
forward fill is one pixel-key exchange plus a sorted window scan.

Run:  python examples/resample_time.py
"""

import os
import sys

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark.operators.temporal import (  # noqa: E402
    composite_best_pixel,
    forward_fill_time,
    interpolate_na_time,
    resample_time_agg,
    resample_time_interp,
    rolling_time_agg,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("resample-time-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- a 90-day stack of 512x512 scenes, one frame every 3 days,
    # with a moving cloud mask (NaN holes) -- the Sentinel-2-ish shape
    days = tuple(range(0, 90, 3))
    w = h = 512
    n_frames = len(days)
    base = spark.range(n_frames * h * w)
    fr = (F.col("id") % n_frames).cast("int")
    px = (F.col("id") / n_frames).cast("long")
    j = (px / w).cast("int")
    i = (px % w).cast("int")
    day = F.element_at(F.array(*[F.lit(d) for d in days]), fr + 1)
    signal = (
        F.sin(j * F.lit(0.02)) * F.cos(i * F.lit(0.02))
        + day * F.lit(0.001)
    )
    cloudy = ((j + i + fr * 37) % 11) < 2  # ~18% cloud holes
    cube = base.select(
        day.cast("long").alias("t"), j.alias("j"), i.alias("i"),
        F.when(cloudy, F.lit(float("nan"))).otherwise(signal)
        .alias("value"),
    )
    print(f"cube: {n_frames} frames x {h}x{w} px "
          f"= {n_frames * h * w:,} rows")

    # --- monthly (30-day-bucket) means, NaN-aware
    monthly = resample_time_agg(cube, "mean", period=30)
    print("monthly mean frames:",
          sorted(r.t for r in monthly.select("t").distinct().collect()))

    # --- gap-fill the clouds from the latest earlier clear frame
    filled = forward_fill_time(cube)
    holes_before = cube.filter(F.isnan("value")).count()
    holes_after = filled.filter(F.isnan("value")).count()
    print(f"cloud holes {holes_before:,} -> {holes_after:,} "
          "after forward fill (leading gaps only)")

    # --- re-grid to a regular 5-day axis by linear interpolation
    targets = tuple(range(0, 88, 5))
    regular = resample_time_interp(cube, days, targets, "linear")
    print("interpolated frames:", regular.select("t").distinct().count(),
          f"(targets {targets[0]}..{targets[-1]} step 5)")

    # --- linear NaN interpolation (clouds between clear frames)
    interp_filled = interpolate_na_time(cube)
    holes_interp = interp_filled.filter(F.isnan("value")).count()
    print(f"cloud holes {holes_before:,} -> {holes_interp:,} "
          "after linear interpolate_na (edge gaps only)")

    # --- 15-day trailing rolling mean (RANGE frame in days)
    rolled = rolling_time_agg(cube, "mean", 15)
    print("rolling 15-day mean frames:",
          rolled.select("t").distinct().count())

    # --- xarray-style row-count rolling: trailing 3 OBSERVATIONS,
    # centered, value only where >= 2 of them are valid
    rolled_rows = rolling_time_agg(
        cube, "mean", 3, frame="rows", center=True, min_periods=2
    )
    print("centered 3-obs rolling valid px:",
          rolled_rows.filter(~F.isnan("value")).count())

    # --- greenest-pixel composite (max value across all frames)
    comp = composite_best_pixel(cube)
    stats = comp.agg(
        F.count(F.lit(1)).alias("px"),
        F.round(F.avg("value"), 4).alias("mean_best"),
    ).first()
    print(f"composite: {stats.px:,} pixels, mean best value "
          f"{stats.mean_best}")

    spark.stop()


if __name__ == "__main__":
    main()
