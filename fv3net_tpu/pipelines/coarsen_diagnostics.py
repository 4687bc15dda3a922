"""Coarsen diagnostic zarrs (C384 -> C48 and friends).

reference: workflows/coarsen_c384_diagnostics/coarsen_c384_diagnostics.py
— CLI coarsening high-resolution diagnostics zarrs to the training
resolution via area-weighted block averages; here the kernel is the
fused (Pallas-backed on TPU) weighted block average, streaming one
timestep at a time.
"""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core import zarrio
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.ops.pallas_kernels import weighted_block_average


def coarsen_diagnostics(
    input_zarr: str,
    output_zarr: str,
    coarsening_factor: int,
    variables: Optional[Sequence[str]] = None,
) -> None:
    """Area-weighted coarsening of every [.., tile, (z,) y, x] variable,
    streamed one time index at a time to bound memory."""
    src = zarrio.open_zarr(input_zarr)
    names = list(variables) if variables else [
        n for n in src if {"y", "x"} <= set(src[n].dims)
    ]
    n_fine = src[names[0]].shape[-1]
    area = jnp.asarray(make_grid(n_fine).area, jnp.float32)
    group = None
    n_time = src[names[0]].shape[0] if "time" in src[names[0]].dims else 1
    for t in range(n_time):
        fields = {}
        for name in names:
            q = src[name]
            arr = jnp.asarray(
                q.values[t] if "time" in q.dims else q.values, jnp.float32
            )
            # weights broadcast under the leading (z) axes
            w = area if arr.ndim == 3 else area[:, None]
            fields[name] = np.asarray(
                weighted_block_average(arr, w, coarsening_factor)
            )
        if group is None:
            group = zarrio.ZarrGroup.create(output_zarr)
            for name, arr in fields.items():
                dims = ("time",) + tuple(src[name].dims[-arr.ndim:])
                group.create_array(
                    name,
                    shape=(0,) + arr.shape,
                    chunks=(1,) + arr.shape,
                    dtype="<f4",
                    dims=dims,
                )
        for name, arr in fields.items():
            za = group[name]
            za.resize_time(t + 1)
            za[(t,)] = arr


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("coarsen-diagnostics")
    parser.add_argument("input_zarr")
    parser.add_argument("output_zarr")
    parser.add_argument("--factor", type=int, default=8)
    parser.add_argument("--variables", nargs="*", default=None)
    args = parser.parse_args(argv)
    coarsen_diagnostics(
        args.input_zarr, args.output_zarr, args.factor, args.variables
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
