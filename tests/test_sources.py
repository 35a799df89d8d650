"""Tests for the parquet pixel source/sink (tile partitioning, CRS sidecar,
window pruning)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xcube_resampling_spark.crs import CRS_WGS84
from xcube_resampling_spark.gridmapping import GridMapping
from xcube_resampling_spark.sources import (
    CRS_SIDECAR,
    read_grid_mapping,
    read_pixels,
    write_pixels,
)


def _pixels(spark, w, h):
    return spark.range(w * h).select(
        F.lit("band_1").alias("var"),
        F.lit(0).cast("int").alias("t"),
        (F.col("id") / w).cast("int").alias("j"),
        (F.col("id") % w).cast("int").alias("i"),
        (F.col("id") * 0.5).cast("double").alias("value"),
    )


def test_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "store")
    gm = GridMapping.regular((40, 30), (0.0, 0.0), 0.25, CRS_WGS84)
    write_pixels(_pixels(spark, 40, 30), path, gm, tile_size=(16, 16))

    assert os.path.exists(os.path.join(path, CRS_SIDECAR))
    back = read_pixels(spark, path)
    assert back.count() == 40 * 30
    got = {
        (r.j, r.i): r.value
        for r in back.filter(F.col("j") == 3).collect()
    }
    assert got[(3, 7)] == (3 * 40 + 7) * 0.5

    gm2 = read_grid_mapping(path)
    assert gm2 is not None
    assert gm2.size == (40, 30)
    assert gm2.x_res == 0.25
    assert gm2.crs.is_geographic


def test_window_read_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "store")
    gm = GridMapping.regular((64, 64), (0.0, 0.0), 0.1, CRS_WGS84)
    write_pixels(_pixels(spark, 64, 64), path, gm, tile_size=(16, 16))

    window = read_pixels(spark, path, bbox_ij=(0, 0, 16, 16))
    assert window.count() == 16 * 16
    # the tile predicate must reach the scan as a partition filter
    plan = window._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "tile_i" in plan


def test_hive_partition_layout(spark, tmp_path):
    path = str(tmp_path / "store")
    gm = GridMapping.regular((32, 32), (0.0, 0.0), 1.0, CRS_WGS84,
                             is_j_axis_up=True)
    write_pixels(_pixels(spark, 32, 32), path, gm, tile_size=(16, 16))
    tiles = [d for d in os.listdir(path) if d.startswith("tile_j=")]
    assert sorted(tiles) == ["tile_j=0", "tile_j=1"]
    gm2 = read_grid_mapping(path)
    assert gm2.is_j_axis_up is True
