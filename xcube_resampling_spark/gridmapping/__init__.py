from .base import GridMapping
from .helpers import (
    affine_apply,
    affine_compose,
    affine_invert,
    from_lon_360,
    get_dataset_chunks,
    round_to_fraction,
    scale_xy_res_and_size,
    to_lon_360,
)

__all__ = [
    "GridMapping",
    "affine_apply",
    "affine_compose",
    "affine_invert",
    "from_lon_360",
    "get_dataset_chunks",
    "round_to_fraction",
    "scale_xy_res_and_size",
    "to_lon_360",
]
