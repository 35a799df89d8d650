"""Build and consume a multi-level ``.levels`` pyramid store -- the
reference workflow's first step (its large-reproject notebook opens
``LC-1x2025x2025-2.0.0.levels`` from S3 and selects the base level;
reference examples/resample_in_space_large_example_reproject_dataset
.ipynb cell 3).

The engine writes one complete CF zarr store per level (level k+1 the
2x downscale of level k -- a narrow decimation or one map-side-
combinable window mean), records ``.zlevels``, and reopens any level
cold as a resample-ready ``(SparkDataset, GridMapping)``.  The same
pyramid writes unchanged through the flat object-store adapter, which
is how it would land on S3.

Run:  python examples/pyramid_store.py
"""

import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark import CRS, GridMapping  # noqa: E402
from xcube_resampling_spark.operators.spatial import (  # noqa: E402
    resample_in_space,
)
from xcube_resampling_spark.sources import (  # noqa: E402
    num_zarr_levels,
    open_zarr_levels,
    write_zarr_levels,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("pyramid-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # --- a 2048x1024 UTM grid, generated distributively
    w, h = 2048, 1024
    gm = GridMapping.regular(
        (w, h), (500000.0, 5000000.0), 100.0, CRS.from_epsg(32632),
        tile_size=(256, 256),
    )
    pixels = spark.range(w * h).select(
        F.lit(0).cast("int").alias("t"),
        (F.col("id") / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.sin(F.col("id") % w * 0.01)
         + F.cos((F.col("id") / w) * 0.01)).alias("value"),
    )

    path = os.path.join(tempfile.gettempdir(), "example_cube.levels")
    n = write_zarr_levels(
        pixels, path, "band", gm, agg_method="mean",
    )
    print(f"wrote {n}-level pyramid at {path}")
    print(f"levels on disk: {num_zarr_levels(path)}")

    # --- open the coarsest overview and resample it further
    ds_top, gm_top = open_zarr_levels(spark, path, level=-1)
    print(f"top level: {gm_top.size[0]}x{gm_top.size[1]} px "
          f"@ {gm_top.x_res:.0f} m")

    target = GridMapping.regular(
        (64, 32), (500000.0, 5000000.0), gm_top.x_res * 2, gm.crs,
    )
    out = resample_in_space(ds_top, target, source_gm=gm_top,
                            agg_methods="mean")
    n_out = out.data_vars["band"].df.count()
    print(f"resampled top level to {target.size[0]}x{target.size[1]} "
          f"({n_out} pixels)")
    spark.stop()


if __name__ == "__main__":
    main()
