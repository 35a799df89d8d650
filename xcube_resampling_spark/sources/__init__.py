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
    FlatKVChunkPut,
    FsChunkPut,
    ObjectStoreChunkPut,
    ZipChunkStore,
    open_zarr_dataset,
    read_zarr,
    read_zarr_coord_array,
    read_zarr_grid_mapping,
    write_zarr,
    write_zarr_cf,
)
from .zarr import add_spatial_ref as add_spatial_ref_zarr
from .levels import (
    downscale_level,
    level_grid_mapping,
    num_levels_for,
    num_zarr_levels,
    open_zarr_levels,
    read_levels_meta,
    write_zarr_levels,
)
from .geotiff import (
    BytesRangeReader,
    FileRangeReader,
    RangeReader,
    open_geotiff_dataset,
    read_geotiff,
    read_geotiff_grid_mapping,
    read_geotiff_meta,
    write_geotiff,
)
from .httpstore import (
    HttpChunkStore,
    HttpRangeReader,
    LocalHttpStoreServer,
)
from .kerchunk import (
    ParquetRefChunkStore,
    RefChunkStore,
    concat_time_refs,
    geotiff_refs,
    granule_dir_refs,
    hdf5_refs,
    load_refs,
    load_refs_parquet,
    netcdf3_refs,
    save_refs,
    save_refs_parquet,
)
from .zarr3 import (
    add_spatial_ref3,
    open_zarr3_dataset,
    read_zarr3_coord_array,
    read_zarr3,
    read_zarr3_grid_mapping,
    write_zarr3,
    write_zarr3_cf,
    write_zarr3_stream,
)


def read_netcdf(spark, path, var_name, bbox_ij=None, decode_cf=False):
    """Read any ``.nc`` file or granule directory, classic or NetCDF-4.

    Sniffs the magic bytes of one file driver-side (``CDF\\x01``/``02``/``05``
    -> classic parser, ``\\x89HDF`` -> HDF5 parser) and dispatches --
    the reference's users never know which container a granule uses
    (xarray hides it; reference operators/spatial.py accepts any
    xarray-openable dataset), so neither should ours.
    """
    import os

    probe = path
    if os.path.isdir(path):
        cands = sorted(
            f for f in os.listdir(path)
            if f.endswith((".nc", ".h5", ".nc4"))
        )
        if not cands:
            raise ValueError(f"no .nc/.h5 granules under {path!r}")
        probe = os.path.join(path, cands[0])
    with open(probe, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF":
        return read_netcdf3(spark, path, var_name, bbox_ij=bbox_ij,
                            decode_cf=decode_cf)
    if magic == b"\x89HDF\r\n\x1a\n":
        return read_hdf5(spark, path, var_name, bbox_ij=bbox_ij,
                         decode_cf=decode_cf)
    raise ValueError(
        f"{probe!r} is neither classic NetCDF nor HDF5 "
        f"(magic {magic[:4]!r})")


__all__ = [
    "CRS_SIDECAR",
    "ParquetRefChunkStore",
    "RefChunkStore",
    "concat_time_refs",
    "geotiff_refs",
    "granule_dir_refs",
    "hdf5_refs",
    "load_refs",
    "load_refs_parquet",
    "netcdf3_refs",
    "save_refs",
    "save_refs_parquet",
    "ChunkPut",
    "FsChunkPut",
    "ObjectStoreChunkPut",
    "PIXEL_SCHEMA",
    "ZARR_PIXEL_SCHEMA",
    "add_spatial_ref",
    "read_grid_mapping",
    "read_hdf5",
    "read_netcdf",
    "read_netcdf3",
    "read_pixels",
    "open_zarr_dataset",
    "read_zarr",
    "read_zarr_coord_array",
    "read_zarr_grid_mapping",
    "RangeReader",
    "FileRangeReader",
    "BytesRangeReader",
    "open_geotiff_dataset",
    "read_geotiff",
    "read_geotiff_grid_mapping",
    "read_geotiff_meta",
    "write_geotiff",
    "open_zarr3_dataset",
    "read_zarr3_coord_array",
    "read_zarr3",
    "read_zarr3_grid_mapping",
    "write_hdf5",
    "write_netcdf3",
    "write_pixels",
    "write_zarr",
    "write_zarr_cf",
    "add_spatial_ref_zarr",
    "write_zarr3",
    "write_zarr3_cf",
    "add_spatial_ref3",
    "write_zarr3_stream",
    "write_zarr_stream",
]
