from fv3net_tpu.core.quantity import (
    Quantity,
    zeros_like,
    ones_like,
    full_like,
    where,
)
from fv3net_tpu.core.dataset import Dataset, merge
from fv3net_tpu.core import constants
from fv3net_tpu.core.zarrio import to_zarr, open_zarr, ZarrArray, ZarrGroup

__all__ = [
    "Quantity",
    "Dataset",
    "merge",
    "constants",
    "zeros_like",
    "ones_like",
    "full_like",
    "where",
    "to_zarr",
    "open_zarr",
    "ZarrArray",
    "ZarrGroup",
]
