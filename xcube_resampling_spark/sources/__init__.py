"""Sources and sinks for the long-format pixel tables."""

from .pixels import (
    CRS_SIDECAR,
    PIXEL_SCHEMA,
    add_spatial_ref,
    read_grid_mapping,
    read_pixels,
    write_pixels,
)
from .netcdf3 import read_netcdf3, write_netcdf3
from .hdf5 import read_hdf5, write_hdf5
from .zarr import (
    ZARR_PIXEL_SCHEMA,
    write_zarr_stream,
    ChunkPut,
    FsChunkPut,
    ObjectStoreChunkPut,
    read_zarr,
    write_zarr,
)
from .zarr3 import read_zarr3, write_zarr3, write_zarr3_stream

__all__ = [
    "CRS_SIDECAR",
    "ChunkPut",
    "FsChunkPut",
    "ObjectStoreChunkPut",
    "PIXEL_SCHEMA",
    "ZARR_PIXEL_SCHEMA",
    "add_spatial_ref",
    "read_grid_mapping",
    "read_hdf5",
    "read_netcdf3",
    "read_pixels",
    "read_zarr",
    "read_zarr3",
    "write_hdf5",
    "write_netcdf3",
    "write_pixels",
    "write_zarr",
    "write_zarr3",
    "write_zarr3_stream",
    "write_zarr_stream",
]
