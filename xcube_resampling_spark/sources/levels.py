"""Multi-level (pyramid) zarr stores -- the ``.levels`` layout.

The reference workflow's FIRST step opens exactly such a store: the
resample notebook's ``store.open_data("LC-1x2025x2025-2.0.0.levels")``
(reference examples/resample_in_space_large_example_reproject_dataset
.ipynb cell 3; BASELINE.md "Open remote Zarr multi-level store" row)
yields a multi-resolution dataset whose ``base_dataset`` feeds
``resample_in_space``.

Layout follows the PUBLIC xcube multi-resolution convention
(xcube docs "Multi-Resolution Datasets" specification): a directory
``<name>.levels/`` holding ONE COMPLETE CF zarr store per level --
``0.zarr`` (the base, full resolution), ``1.zarr`` (2x downscaled),
... ``<n-1>.zarr`` -- plus a ``.zlevels`` JSON document carrying the
level metadata (version, number of levels, aggregation method).

Spark-first mapping: every level is produced by ONE narrow filter
(``first`` decimation -- zero shuffles) or one map-side-combinable
2x2-window aggregation of the previous level's pixel DataFrame, then
lands through the distributed chunk writer.  Nothing is ever
materialized driver-side; a 100 TB base layer pyramids with
log2(n) passes whose total output volume is bounded by 4/3 x base.

Window anchoring: level pixel ``(j, i)`` aggregates the 2x2 source
window ``(2j..2j+1, 2i..2i+1)`` -- anchored at j=0/i=0, so for the
usual j-down grids the TOP-LEFT corner is exact and odd edges extend
the bbox at the bottom/right (for j-up grids the bottom-left corner is
exact, matching ``GridMapping.scale``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_resampling_spark.sources.zarr import (
    ChunkPut,
    FsChunkPut,
    open_zarr_dataset,
    write_zarr_cf,
)

LEVELS_META_KEY = ".zlevels"

_AGG_METHODS = ("first", "mean", "min", "max")


def num_levels_for(size: tuple[int, int],
                   tile_size: tuple[int, int]) -> int:
    """Number of pyramid levels: halve until one tile holds the whole
    level (the xcube rule -- the top level is a single-tile overview).
    Halving stops early when the NEXT level would drop either dimension
    below 2 pixels (a 1-wide grid has no resolvable resolution), so
    elongated grids top out with a valid overview instead of crashing
    mid-pyramid."""
    w, h = size
    tw, th = tile_size
    n = 1
    while (w > tw or h > th) \
            and (w + 1) // 2 >= 2 and (h + 1) // 2 >= 2:
        w, h = (w + 1) // 2, (h + 1) // 2
        n += 1
    return n


def level_grid_mapping(gm, level: int):
    """The GridMapping of pyramid ``level`` derived from the base grid:
    res x 2^level, size ceil-halved per level, anchored so that window
    (2j, 2i) of a level maps onto pixel (j, i) of the next."""
    if level == 0:
        return gm
    f = 1 << level
    w, h = gm.size
    w2, h2 = w, h
    for _ in range(level):
        w2, h2 = (w2 + 1) // 2, (h2 + 1) // 2
    if w2 < 2 or h2 < 2:
        raise ValueError(
            f"pyramid level {level} of a {w}x{h} grid would be "
            f"{w2}x{h2}; every level needs >= 2 px per axis -- use "
            f"fewer levels")
    from xcube_resampling_spark.gridmapping import GridMapping

    res2 = (gm.x_res * f, gm.y_res * f)
    if gm.is_j_axis_up:
        xy_min = (gm.x_min, gm.y_min)
    else:
        # j-down: anchor the TOP edge (j=0 exact), extend downward
        xy_min = (gm.x_min, gm.y_max - h2 * res2[1])
    tile = gm.tile_size
    if tile:
        tile = (min(w2, tile[0]), min(h2, tile[1]))
    return GridMapping.regular(
        (w2, h2), xy_min, res2, gm.crs,
        tile_size=tile, is_j_axis_up=bool(gm.is_j_axis_up),
    ).derive(
        xy_dim_names=gm.xy_dim_names, xy_var_names=gm.xy_var_names,
    )


def downscale_level(df: DataFrame, agg_method: str = "first") -> DataFrame:
    """One pyramid step: (t, j, i, value) -> the 2x downscaled pixel
    table.

    * ``first``: decimation -- keep pixel (2j, 2i); a NARROW filter,
      zero shuffles (the xcube default for levels).
    * ``mean``/``min``/``max``: NaN-aware 2x2 window aggregation -- one
      map-side-combinable shuffle; an all-NaN window stays NaN.
    """
    if agg_method not in _AGG_METHODS:
        raise ValueError(
            f"agg_method {agg_method!r} not in {_AGG_METHODS}")
    if agg_method == "first":
        return df.filter(
            (F.col("j") % 2 == 0) & (F.col("i") % 2 == 0)
        ).select(
            "t",
            (F.col("j") / 2).cast("int").alias("j"),
            (F.col("i") / 2).cast("int").alias("i"),
            "value",
        )
    v = F.col("value")
    nn = F.when(F.isnan(v) | v.isNull(), F.lit(None).cast("double")) \
        .otherwise(v.cast("double"))
    agg = {"mean": F.avg, "min": F.min, "max": F.max}[agg_method](nn)
    return df.groupBy(
        "t",
        (F.col("j") / 2).cast("int").alias("j"),
        (F.col("i") / 2).cast("int").alias("i"),
    ).agg(F.coalesce(agg, F.lit(float("nan"))).alias("value"))


def write_zarr_levels(
    df: DataFrame,
    path: str,
    var_name: str,
    grid_mapping,
    num_levels: int | None = None,
    agg_method: str = "first",
    fill_value: float = float("nan"),
    compressor: str = "zlib",
    attrs: dict | None = None,
    nt: int = 0,
    chunk_put: ChunkPut | None = None,
) -> int:
    """Write a ``.levels`` pyramid store from a (t, j, i, value) pixel
    DataFrame: level 0 verbatim, each further level the 2x downscale of
    the previous, every level a complete CF zarr store
    (``write_zarr_cf`` -- x/y coords, spatial_ref, consolidated
    metadata) under ``<path>/<k>.zarr``, plus the ``.zlevels`` JSON.

    Returns the number of levels written.  ``num_levels=None`` derives
    it from the grid's tile size (halve until one tile suffices)."""
    gm = grid_mapping
    if num_levels is None:
        tile = gm.tile_size or gm.size
        num_levels = num_levels_for(gm.size, tile)
    if num_levels < 1:
        raise ValueError("num_levels must be >= 1")
    # validate the DEEPEST level up front (sizes shrink monotonically,
    # so it alone proves every level valid): an explicit num_levels
    # that ceil-halves a dimension below 2 must fail before any bytes
    # land -- a partial .levels store with no .zlevels would otherwise
    # be mis-read as a complete shallower pyramid
    level_grid_mapping(gm, num_levels - 1)
    put = chunk_put if chunk_put is not None else FsChunkPut(path)
    level_df = df
    persisted = []
    for k in range(num_levels):
        gk = level_grid_mapping(gm, k)
        if num_levels > 1:
            # each level feeds two actions (its own store write + the
            # next level's downscale); without the persist, level k
            # replays the base scan and all k prior downscale shuffles.
            # If the CALLER already cached the input (k=0), leave their
            # cache alone -- persisting/unpersisting here would clear
            # the CacheManager entry for their plan on exit
            already = (level_df.storageLevel.useMemory
                       or level_df.storageLevel.useDisk)
            if not already:
                level_df = level_df.persist()
                persisted.append(level_df)
        sub = _sub_put(put, f"{k}.zarr")
        write_zarr_cf(
            level_df, os.path.join(path, f"{k}.zarr"), var_name, gk,
            fill_value=fill_value, compressor=compressor, attrs=attrs,
            nt=nt, chunk_put=sub,
        )
        if k + 1 < num_levels:
            level_df = downscale_level(level_df, agg_method)
        if len(persisted) > 1:
            persisted[-2].unpersist()
    for d in persisted:
        d.unpersist()
    put.put(LEVELS_META_KEY, json.dumps({
        "version": "1.0",
        "num_levels": int(num_levels),
        "agg_methods": {var_name: agg_method},
        "use_saved_levels": True,
    }).encode())
    return num_levels


def read_levels_meta(path: str,
                     store: ChunkPut | None = None) -> dict:
    """The ``.zlevels`` metadata document; falls back to counting
    ``<k>.zarr`` entries for stores written without one."""
    if store is not None:
        raw = store.get(LEVELS_META_KEY)
        if raw is not None:
            return json.loads(raw)
        known = getattr(store, "known_keys", None)
        if callable(known):
            ks = {k.split("/", 1)[0] for k in known()}
            n = sum(1 for k in ks if k.endswith(".zarr")
                    and k[:-5].isdigit())
            if n:
                return {"version": "1.0", "num_levels": n}
        raise FileNotFoundError(f"no {LEVELS_META_KEY} in chunk store")
    mp = os.path.join(path, LEVELS_META_KEY)
    if os.path.exists(mp):
        with open(mp) as fp:
            return json.load(fp)
    n = sum(
        1 for d in os.listdir(path)
        if d.endswith(".zarr") and d[:-5].isdigit()
        and os.path.isdir(os.path.join(path, d))
    )
    if not n:
        raise FileNotFoundError(f"{path!r} is not a .levels store")
    return {"version": "1.0", "num_levels": n}


def num_zarr_levels(path: str, store: ChunkPut | None = None) -> int:
    return int(read_levels_meta(path, store=store)["num_levels"])


def open_zarr_levels(
    spark: SparkSession,
    path: str,
    level: int = 0,
    variables: list[str] | None = None,
    bbox_ij: tuple[int, int, int, int] | None = None,
    decode_cf: bool = False,
    store: ChunkPut | None = None,
):
    """Open one level of a ``.levels`` pyramid store as
    ``(SparkDataset, GridMapping)`` -- the engine's analogue of the
    reference's ``store.open_data(...).get_dataset(level)``
    (``level=0`` == ``base_dataset``).  Negative levels count from the
    top (``level=-1`` is the coarsest overview)."""
    meta = read_levels_meta(path, store=store)  # ONE .zlevels fetch
    n = int(meta["num_levels"])
    if level < 0:
        level += n
    if not 0 <= level < n:
        raise ValueError(f"level {level} out of range [0, {n})")
    sub_store = None
    if store is not None:
        sub_store = _sub_put(store, f"{level}.zarr")
        if variables is None and not callable(
                getattr(sub_store, "known_keys", None)):
            # get-only store: the .zlevels document names the data
            # variables, so the open need not enumerate keys
            ams = meta.get("agg_methods") or {}
            if ams:
                variables = list(ams)
    return open_zarr_dataset(
        spark, os.path.join(path, f"{level}.zarr"),
        variables=variables, bbox_ij=bbox_ij, decode_cf=decode_cf,
        store=sub_store,
    )


class _SubPut(ChunkPut):
    """Prefix view over a ChunkPut: each level store nests under one
    pyramid root (``<k>.zarr/...`` keys), for writes and reads alike."""

    def __init__(self, put: ChunkPut, prefix: str):
        self._put = put
        self._prefix = prefix.rstrip("/")

    def put(self, key: str, data: bytes) -> None:
        self._put.put(f"{self._prefix}/{key}", data)

    def get(self, key: str) -> bytes | None:
        return self._put.get(f"{self._prefix}/{key}")


class _SubPutKnown(_SubPut):
    """Prefix wrapper over a store that CAN enumerate keys.  A separate
    class (chosen by :func:`_sub_put`) so that feature probes of the
    form ``callable(getattr(store, "known_keys", None))`` -- which the
    zarr readers use to decide between pruned and listed reads -- see
    the method only when the underlying store actually has it; a
    raising method on the base class would make a get-only store look
    enumerable and crash the read."""

    def known_keys(self) -> list[str]:
        pre = self._prefix + "/"
        return [
            k[len(pre):] for k in self._put.known_keys()
            if k.startswith(pre)
        ]


def _sub_put(put: ChunkPut, prefix: str) -> _SubPut:
    cls = _SubPutKnown if callable(
        getattr(put, "known_keys", None)) else _SubPut
    return cls(put, prefix)
