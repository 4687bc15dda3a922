"""Zarr-backed mappers and stacked batches.

reference: external/loaders/loaders/mappers/_xarray.py:9-56 (XarrayMapper),
batches/_batch.py:45-118 (stack/shuffle/subsample into [sample, z]
batches).
"""
from __future__ import annotations

from typing import Iterator, List, Mapping, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core import zarrio
from fv3net_tpu.fit.packer import stack_columns


class ZarrMapper(Mapping[str, Dataset]):
    """Time-keyed Mapping[str, Dataset] over a zarr store with a leading
    time dimension (the XarrayMapper equivalent)."""

    def __init__(self, path: str, time_dim: str = "time"):
        self._ds = zarrio.open_zarr(path)
        self._time_dim = time_dim
        n_times = self._ds.dims.get(time_dim)
        if n_times is None:
            raise ValueError(f"no {time_dim!r} dimension in {path}")
        self._keys = [str(i) for i in range(n_times)]

    def __getitem__(self, key: str) -> Dataset:
        i = self._keys.index(key)
        return self._ds.isel({self._time_dim: i})

    def __iter__(self) -> Iterator[str]:
        return iter(self._keys)

    def __len__(self) -> int:
        return len(self._keys)


def stack_dataset(ds: Dataset, variables: Sequence[str]) -> Dataset:
    """Stack [tile, z, y, x] (or [tile, y, x]) variables into [sample(, z)]
    Quantities."""
    out = {}
    for name in variables:
        q = ds[name]
        arr = jnp.asarray(q.data)
        stacked = stack_columns(arr)
        dims = ("sample", "z") if stacked.ndim == 2 else ("sample",)
        out[name] = Quantity(stacked, dims, q.units)
    return Dataset(out)


def batches_from_mapper(
    mapper: Mapping[str, Dataset],
    variables: Sequence[str],
    timesteps: Optional[Sequence[str]] = None,
    timesteps_per_batch: int = 1,
    subsample_ratio: float = 1.0,
    shuffle_seed: Optional[int] = None,
) -> List[Dataset]:
    """Stacked sample batches from a time mapper (reference
    batches/_batch.py:45-118 semantics: group timesteps, stack, optionally
    shuffle/subsample samples)."""
    keys = list(timesteps if timesteps is not None else mapper)
    rng = np.random.RandomState(shuffle_seed)
    if shuffle_seed is not None:
        rng.shuffle(keys)
    batches = []
    for start in range(0, len(keys), timesteps_per_batch):
        group = keys[start : start + timesteps_per_batch]
        stacked = [stack_dataset(mapper[k], variables) for k in group]
        merged = {}
        for name in variables:
            arrs = [s[name].data for s in stacked]
            arr = jnp.concatenate(arrs, axis=0)
            n = arr.shape[0]
            if subsample_ratio < 1.0:
                take = max(1, int(n * subsample_ratio))
                idx = rng.choice(n, size=take, replace=False)
                arr = arr[jnp.asarray(np.sort(idx))]
            merged[name] = Quantity(arr, stacked[0][name].dims)
        batches.append(Dataset(merged))
    return batches


def batches_from_config(config: dict) -> List[Dataset]:
    """Config-dispatched batch loading (the BatchesLoader.from_dict
    analog, reference loaders/_config.py:56-87)."""
    kind = config.get("kind", "zarr")
    if kind == "zarr":
        mapper = ZarrMapper(config["path"], config.get("time_dim", "time"))
        return batches_from_mapper(
            mapper,
            config["variables"],
            timesteps=config.get("timesteps"),
            timesteps_per_batch=config.get("timesteps_per_batch", 1),
            subsample_ratio=config.get("subsample_ratio", 1.0),
            shuffle_seed=config.get("shuffle_seed"),
        )
    raise ValueError(f"unknown batches kind {kind!r}")


def batches_from_netcdf(
    path: str,
    variable_names: Sequence[str],
    in_memory: bool = False,
) -> Sequence[Dataset]:
    """Lazy sequence of Datasets from a directory of netCDF files in
    alphabetical order (reference batches/_batch.py:265-286), selecting
    ``variable_names`` from each."""
    import glob
    import os

    from fv3net_tpu.core.netcdfio import open_netcdf
    from fv3net_tpu.core.safe import get_variables
    from fv3net_tpu.loaders.sequences import Map

    filenames = sorted(glob.glob(os.path.join(path, "*.nc")))

    def load(fname: str) -> Dataset:
        return get_variables(open_netcdf(fname), variable_names)

    seq = Map(load, filenames)
    if in_memory:
        return tuple(seq[i] for i in range(len(seq)))
    return seq
