"""Sources and sinks for the long-format pixel tables."""

from .pixels import (
    CRS_SIDECAR,
    PIXEL_SCHEMA,
    add_spatial_ref,
    read_grid_mapping,
    read_pixels,
    write_pixels,
)
from .zarr import ZARR_PIXEL_SCHEMA, read_zarr, write_zarr

__all__ = [
    "CRS_SIDECAR",
    "PIXEL_SCHEMA",
    "ZARR_PIXEL_SCHEMA",
    "add_spatial_ref",
    "read_grid_mapping",
    "read_pixels",
    "read_zarr",
    "write_pixels",
    "write_zarr",
]
