"""Parquet source/sink for long-format pixel tables with CRS metadata.

Parity notes (SURVEY.md section 2.2):

* the reference's datasets arrive as Zarr/NetCDF ``xr.Dataset``s; here the
  canonical storage is a parquet pixel table ``(var, t, j, i, value)``
  partitioned by spatial tile, so scans prune to the queried window
  (reference's per-tile chunk reads, reference base.py:504-533).
* ``add_spatial_ref`` (reference cfconv.py:320-358) injects a CF
  ``spatial_ref`` entry into an existing store; the Spark-side equivalent
  writes a JSON sidecar with the CF-style CRS attributes next to the
  parquet directory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..gridmapping import GridMapping

CRS_SIDECAR = "_spatial_ref.json"

PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("t", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("i", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def write_pixels(
    df: DataFrame,
    path: str,
    grid_mapping: GridMapping | None = None,
    tile_size: tuple[int, int] = (512, 512),
    mode: str = "overwrite",
) -> None:
    """Write a pixel table partitioned by spatial tile.

    ``tile_j``/``tile_i`` become hive partitions, so a bbox filter prunes
    whole directories (partition pruning = the reference's per-tile bbox
    pruning, base.py:565-606).
    """
    tw, th = tile_size
    # floor, not truncating cast: a negative index would otherwise be
    # WRITTEN to tile 0 but PRUNED to tile -1 by the read path's //
    # arithmetic -- silent row loss for any out-of-origin window
    out = df.withColumn(
        "tile_j", F.floor(F.col("j") / th).cast("int")
    ).withColumn("tile_i", F.floor(F.col("i") / tw).cast("int"))
    writer = out.repartition("tile_j", "tile_i").write.mode(mode)
    writer.partitionBy("tile_j", "tile_i").parquet(path)
    if grid_mapping is not None:
        add_spatial_ref(path, grid_mapping, tile_size)


def add_spatial_ref(
    path: str,
    grid_mapping: GridMapping,
    tile_size: tuple[int, int] | None = None,
) -> None:
    """Attach CF-style CRS metadata to a written pixel store
    (reference cfconv.py:320-358 writes a ``spatial_ref`` Zarr array +
    ``grid_mapping`` attributes; here it is a JSON sidecar)."""
    meta = {
        "spatial_ref": grid_mapping.crs.to_cf(),
        "size": list(grid_mapping.size),
        "xy_bbox": [float(v) for v in grid_mapping.xy_bbox],
        "xy_res": [float(grid_mapping.x_res), float(grid_mapping.y_res)],
        "is_j_axis_up": bool(grid_mapping.is_j_axis_up),
    }
    if tile_size is not None:
        meta["tile_size"] = list(tile_size)
    with open(os.path.join(path, CRS_SIDECAR), "w") as fp:
        json.dump(meta, fp, indent=2)


def read_pixels(
    spark: SparkSession,
    path: str,
    bbox_ij: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Read a pixel table; an optional (i_min, j_min, i_max, j_max) window
    filter prunes tile partitions *and* parquet row groups (both predicates
    reach the scan -- check ``.explain`` for PartitionFilters/PushedFilters).
    """
    df = spark.read.parquet(path)
    if bbox_ij is not None:
        i0, j0, i1, j1 = bbox_ij
        cond = (
            (F.col("i") >= i0) & (F.col("i") < i1)
            & (F.col("j") >= j0) & (F.col("j") < j1)
        )
        if "tile_j" in df.columns and "tile_i" in df.columns:
            meta = read_sidecar(path)
            if meta and "tile_size" in meta:
                tw, th = meta["tile_size"]
                cond = cond & (
                    (F.col("tile_i") >= i0 // tw)
                    & (F.col("tile_i") <= (i1 - 1) // tw)
                    & (F.col("tile_j") >= j0 // th)
                    & (F.col("tile_j") <= (j1 - 1) // th)
                )
        df = df.filter(cond)
    return df.select(
        *[c for c in ("var", "t", "j", "i", "value") if c in df.columns]
    )


def read_sidecar(path: str) -> dict | None:
    sidecar = os.path.join(path, CRS_SIDECAR)
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as fp:
        return json.load(fp)


def read_grid_mapping(path: str) -> GridMapping | None:
    """Reconstruct the GridMapping from a store's CRS sidecar."""
    meta = read_sidecar(path)
    if meta is None:
        return None
    from ..crs import CRS

    crs = CRS.from_cf(meta["spatial_ref"])
    w, h = meta["size"]
    x_min, y_min, _, _ = meta["xy_bbox"]
    return GridMapping.regular(
        (int(w), int(h)), (float(x_min), float(y_min)),
        (float(meta["xy_res"][0]), float(meta["xy_res"][1])), crs,
        is_j_axis_up=bool(meta["is_j_axis_up"]),
    )
