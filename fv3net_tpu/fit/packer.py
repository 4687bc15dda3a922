"""Pack named variables into a [sample, feature] array and back
(reference: external/fv3fit/fv3fit/_shared/packer.py:52-182 ArrayPacker /
PackingInfo), plus stacking of [tile, nz, ny, nx] model fields into
[sample, z] column samples (the reference's stack-with-unstacked-dims,
_shared/stacking.py:12)."""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Sequence, Tuple

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity


@dataclasses.dataclass
class PackingInfo:
    """Feature layout of a packed array: per-variable feature counts, in
    packing order."""

    names: List[str]
    features: List[int]

    @property
    def total_features(self) -> int:
        return sum(self.features)

    def slices(self) -> Dict[str, slice]:
        out = {}
        start = 0
        for name, nf in zip(self.names, self.features):
            out[name] = slice(start, start + nf)
            start += nf
        return out

    def to_dict(self) -> dict:
        return {"names": self.names, "features": self.features}

    @classmethod
    def from_dict(cls, d: dict) -> "PackingInfo":
        return cls(names=list(d["names"]), features=list(d["features"]))


def pack(
    data: Mapping[str, jnp.ndarray], names: Sequence[str]
) -> Tuple[jnp.ndarray, PackingInfo]:
    """Concatenate variables along the feature axis.

    Each array is [sample] (scalar feature) or [sample, nz].
    Returns ([sample, total_features], PackingInfo).
    """
    arrays = []
    features = []
    for name in names:
        arr = data[name]
        if arr.ndim == 1:
            arr = arr[:, None]
        elif arr.ndim != 2:
            raise ValueError(
                f"{name}: expected [sample] or [sample, z], got shape {arr.shape}"
            )
        arrays.append(arr)
        features.append(arr.shape[1])
    return jnp.concatenate(arrays, axis=1), PackingInfo(list(names), features)


def unpack(
    packed: jnp.ndarray, info: PackingInfo, squeeze_scalar: bool = True
) -> Dict[str, jnp.ndarray]:
    """Invert ``pack``: [sample, total_features] -> per-variable arrays."""
    out = {}
    for name, sl in info.slices().items():
        arr = packed[:, sl]
        if squeeze_scalar and arr.shape[1] == 1:
            arr = arr[:, 0]
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# model-field <-> column-sample stacking
# ---------------------------------------------------------------------------


def stack_columns(field: jnp.ndarray) -> jnp.ndarray:
    """[tile, nz, ny, nx] -> [tile*ny*nx, nz]; 2-D fields [tile, ny, nx]
    -> [tile*ny*nx]."""
    if field.ndim == 4:
        t, nz, ny, nx = field.shape
        return jnp.moveaxis(field, 1, -1).reshape(t * ny * nx, nz)
    if field.ndim == 3:
        t, ny, nx = field.shape
        return field.reshape(t * ny * nx)
    raise ValueError(f"cannot stack shape {field.shape}")


def unstack_columns(
    stacked: jnp.ndarray, grid_shape: Tuple[int, int, int]
) -> jnp.ndarray:
    """Invert stack_columns given (tile, ny, nx)."""
    t, ny, nx = grid_shape
    if stacked.ndim == 2:
        nz = stacked.shape[1]
        return jnp.moveaxis(stacked.reshape(t, ny, nx, nz), -1, 1)
    if stacked.ndim == 1:
        return stacked.reshape(t, ny, nx)
    raise ValueError(f"cannot unstack shape {stacked.shape}")


def dataset_to_samples(ds: Dataset, names: Sequence[str]) -> Dict[str, jnp.ndarray]:
    """Pull named variables from a Dataset of [sample(, z)] Quantities."""
    return {n: jnp.asarray(ds[n].data) for n in names}


def samples_to_dataset(data: Mapping[str, jnp.ndarray]) -> Dataset:
    out = {}
    for name, arr in data.items():
        dims = ("sample",) if arr.ndim == 1 else ("sample", "z")
        out[name] = Quantity(arr, dims)
    return Dataset(out)
