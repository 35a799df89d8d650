"""Sources and sinks for the long-format pixel tables."""

from .pixels import (
    CRS_SIDECAR,
    PIXEL_SCHEMA,
    add_spatial_ref,
    read_grid_mapping,
    read_pixels,
    write_pixels,
)

__all__ = [
    "CRS_SIDECAR",
    "PIXEL_SCHEMA",
    "add_spatial_ref",
    "read_grid_mapping",
    "read_pixels",
    "write_pixels",
]
