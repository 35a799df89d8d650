"""xcube_resampling_spark: a PySpark-native geospatial resampling engine.

A from-scratch rebuild of the capabilities of xcube-dev/xcube-resampling
(reference snapshot at /root/reference) on Apache Spark DataFrames:
affine resampling, CRS reprojection, swath rectification, block-aggregation
reducers, grid-mapping inference -- plus large-scale training-data operators
(dedup, similarity search, text analysis) on the same engine.
"""

from .crs import CRS, CRS_CRS84, CRS_WGS84, Transformer
from .wkt import crs_from_proj, crs_from_wkt, crs_to_proj, crs_to_wkt
from .dataset import SparkDataset, Variable
from .gridmapping import GridMapping
from .operators.affine import affine_transform_dataset
from .operators.rectify import rectify_dataset
from .operators.reproject import reproject_dataset
from .operators.spatial import resample_in_space
from .operators.temporal import resample_in_time

__version__ = "0.1.0"

__all__ = [
    "CRS",
    "CRS_CRS84",
    "CRS_WGS84",
    "GridMapping",
    "SparkDataset",
    "Transformer",
    "Variable",
    "affine_transform_dataset",
    "rectify_dataset",
    "reproject_dataset",
    "resample_in_space",
    "resample_in_time",
]
