"""Reproject a regular WGS84 cube to the European LAEA grid (EPSG:3035),
demonstrating clip pushdown -- the same workflow as the reference's
large-grid example
(/root/reference/examples/resample_in_space_large_example_reproject_dataset.ipynb),
where pre-clipping the source to the target footprint cut compute from
50.4 s to 27.1 s.  Here the clip happens inside the engine: the
reproject plan joins only source pixels inside the target's
back-projected bbox, and Catalyst pushes the filter to the scan.

Run:  python examples/reproject_dataset.py
"""

import os
import sys

import numpy as np
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark import (  # noqa: E402
    CRS, GridMapping, SparkDataset, resample_in_space,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("reproject-example")
        .getOrCreate()
    )

    # --- a global-ish WGS84 grid (0.05 deg, like a CCI land-cover tile)
    w, h = 2400, 1200
    vals = np.add.outer(np.sin(np.arange(h) * 0.01),
                        np.cos(np.arange(w) * 0.01))
    source_ds = SparkDataset.from_numpy(
        spark,
        data_vars={"lccs_class": (("lat", "lon"), vals)},
        coords={"lon": np.arange(-60.0 + 0.025, 60.0, 0.05),
                "lat": np.arange(75.0 - 0.025, 15.0, -0.05)},
        yx_dims=("lat", "lon"),
    )

    # --- target: LAEA Europe at 5 km, the notebook's grid family
    target_gm = GridMapping.regular(
        (1000, 900), (2500000.0, 1000000.0), 5000.0, CRS.from_epsg(3035)
    )
    out = resample_in_space(source_ds, target_gm,
                            interp_methods="triangular")
    df = out.data_vars["lccs_class"].df
    print("rows:", df.count())
    print(df.orderBy("j", "i").limit(3).toPandas())
    spark.stop()


if __name__ == "__main__":
    main()
