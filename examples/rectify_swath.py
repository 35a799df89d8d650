"""Rectify an irregular satellite swath onto a regular WGS84 grid, then
persist it as an xarray/GDAL-openable CF zarr store.

Mirrors the reference's headline workflow
(/root/reference/examples/rectify_sentinel3.ipynb): an L1 scene whose
geolocation is per-pixel 2-D lon/lat images is rectified with
``resample_in_space`` (which routes irregular sources to the rectify
path), at the notebook's scene size (1890 x 1189 px).

Run:  python examples/rectify_swath.py [out_dir]
"""

import os
import sys
import tempfile

import numpy as np
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from xcube_resampling_spark import (  # noqa: E402
    GridMapping, SparkDataset, resample_in_space,
)
from xcube_resampling_spark.crs import CRS_WGS84  # noqa: E402
from xcube_resampling_spark.sources.zarr import (  # noqa: E402
    open_zarr_dataset, write_zarr_cf,
)


def main(out_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("rectify-swath-example")
        .getOrCreate()
    )

    # --- a synthetic OLCI-like scene: sheared per-pixel lon/lat images
    w, h = 1890, 1189
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lon = 0.01 * ii + 0.003 * jj
    lat = 60.0 - 0.01 * jj + 0.002 * ii
    rad = np.sin(ii * 0.01) + np.cos(jj * 0.01)
    source_ds = SparkDataset.from_numpy(
        spark,
        data_vars={"rtoa": (("y", "x"), rad)},
        coords={"lon": lon, "lat": lat},
        yx_dims=("y", "x"),
    )

    # --- rectify to a regular WGS84 grid (dispatcher picks the rectify
    # path because the source grid is irregular)
    target_gm = GridMapping.regular((1800, 1256), (0.0, 48.0),
                                    0.0125, CRS_WGS84)
    out = resample_in_space(source_ds, target_gm)
    n = out.data_vars["rtoa"].df.count()
    print(f"rectified {w}x{h} swath -> {target_gm.size} grid ({n} px)")

    # --- write a CF-complete zarr store (x/y coords + spatial_ref) and
    # reopen it cold: the reference users' to_zarr/open_zarr round trip
    store = f"{out_dir}/rectified.zarr"
    write_zarr_cf(out.data_vars["rtoa"].df, store, "rtoa", target_gm)
    ds2, gm2 = open_zarr_dataset(spark, store)
    print(f"reopened {store}: vars={sorted(ds2.data_vars)}, "
          f"crs={gm2.crs.name}, size={gm2.size}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
