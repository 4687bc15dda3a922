"""NetCDF-3 ingestion (restart/tile files).

reference: external/vcm/vcm/fv3_restarts.py + xarray_loaders.py
(open_restarts / open_tiles over per-tile netCDF files).  Reading uses
scipy's pure-python NetCDF-3 reader — enough for classic-format FV3
restart categories; NetCDF-4/HDF5 files should be converted to zarr
upstream.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity


def open_netcdf(path: str) -> Dataset:
    """Read one classic NetCDF file into a Dataset."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as f:
        data_vars = {}
        coords = {}
        for name, var in f.variables.items():
            dims = tuple(var.dimensions)
            arr = np.asarray(var.data).copy()
            attrs = {
                k: (v.decode() if isinstance(v, bytes) else v)
                for k, v in var._attributes.items()
            }
            if dims == (name,):
                coords[name] = arr
            else:
                data_vars[name] = Quantity(
                    arr, dims, units=str(attrs.get("units", "")), attrs=attrs
                )
        return Dataset(data_vars, coords=coords)


def open_tiles(prefix: str, n_tiles: int = 6) -> Dataset:
    """Concatenate ``{prefix}.tile{1..6}.nc`` along a new leading 'tile'
    dimension (reference vcm.open_tiles)."""
    datasets = []
    for t in range(1, n_tiles + 1):
        path = f"{prefix}.tile{t}.nc"
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        datasets.append(open_netcdf(path))
    out = {}
    for name in datasets[0]:
        arrs = [np.asarray(d[name].data) for d in datasets]
        q0 = datasets[0][name]
        out[name] = Quantity(
            np.stack(arrs), ("tile",) + q0.dims, q0.units, dict(q0.attrs)
        )
    return Dataset(out, coords=dict(datasets[0].coords))


RESTART_CATEGORIES = [
    "fv_core.res",
    "fv_srf_wnd.res",
    "fv_tracer.res",
    "phy_data",
    "sfc_data",
]


def open_restarts(restart_dir: str) -> Dict[str, Dataset]:
    """Open all restart categories found in a directory
    (reference vcm.open_restarts; categories as in
    workflows/prognostic_c48_run/tests/test_regression.py:78-88)."""
    out = {}
    for category in RESTART_CATEGORIES:
        prefix = os.path.join(restart_dir, category)
        if os.path.exists(f"{prefix}.tile1.nc"):
            out[category] = open_tiles(prefix)
    return out


def write_netcdf(ds: Dataset, path: str) -> None:
    """Write a Dataset as classic NetCDF-3 (for interchange)."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as f:
        dim_sizes: Dict[str, int] = {}
        for name, q in ds.items():
            for d, s in zip(q.dims, q.shape):
                if d not in dim_sizes:
                    dim_sizes[d] = s
                    f.createDimension(d, s)
        for name, coord in ds.coords.items():
            if name not in dim_sizes:
                f.createDimension(name, len(np.asarray(coord)))
            v = f.createVariable(name, np.asarray(coord).dtype, (name,))
            v[:] = np.asarray(coord)
        for name, q in ds.items():
            arr = q.values
            dtype = arr.dtype if arr.dtype != np.float64 else np.dtype("f4")
            v = f.createVariable(name, dtype, q.dims)
            v[:] = arr.astype(dtype)
            if q.units:
                v.units = q.units.encode()
