"""Pallas TPU kernels for the hot bandwidth-bound ops.

First kernel: fused (area-)weighted block coarsening — the C384->C48
streaming workload (BASELINE config 1; reference CPU path:
external/vcm/vcm/cubedsphere/coarsen.py:183 + the vendored skimage
block_reduce).  The kernel tiles the fine grid into VMEM-sized blocks,
computes ``sum(x*w)`` and ``sum(w)`` per coarse cell in one pass (one
HBM read of x and w, no intermediate materialization), and divides in
the epilogue.

Falls back to the XLA path (fv3net_tpu.ops.coarsen) on non-TPU backends
or awkward shapes; the public entry point picks automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fv3net_tpu.ops import coarsen as _xla


def _wavg_kernel(x_ref, w_ref, num_ref, den_ref, *, factor: int):
    """One grid cell: a (1, BY*f, BX*f) fine tile -> (1, BY, BX) sums.

    Mosaic cannot reshape across the lane dimension, so the block
    reduction is expressed as two matmuls against 0/1 aggregation
    matrices built from iota — which also puts the reduction on the MXU.
    """
    x = x_ref[0]
    w = w_ref[0]
    ny, nx = x.shape
    by, bx = ny // factor, nx // factor
    li = jax.lax.broadcasted_iota(jnp.int32, (by, ny), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (by, ny), 1) // factor
    L = (li == lj).astype(x.dtype)  # [by, ny]
    ri = jax.lax.broadcasted_iota(jnp.int32, (nx, bx), 0) // factor
    rj = jax.lax.broadcasted_iota(jnp.int32, (nx, bx), 1)
    R = (ri == rj).astype(x.dtype)  # [nx, bx]
    xw = x * w
    # full f32 accumulation (the MXU's default bf16 passes lose ~1e-3
    # relative accuracy, unacceptable for conservation sums)
    hi = jax.lax.Precision.HIGHEST
    num_ref[0] = jnp.dot(jnp.dot(L, xw, precision=hi), R, precision=hi)
    den_ref[0] = jnp.dot(jnp.dot(L, w, precision=hi), R, precision=hi)


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def weighted_block_average_pallas(
    x: jnp.ndarray, w: jnp.ndarray, factor: int, interpret: bool = False
) -> jnp.ndarray:
    """Weighted block average of [..., ny, nx] with weights [..., ny, nx]
    (broadcast over leading dims), as a single fused Pallas pass.

    Block layout: coarse-output tiles of (8, 128) -> fine input tiles of
    (8f, 128f), respecting the f32 (8, 128) tiling constraint.
    """
    ny, nx = x.shape[-2:]
    nyc, nxc = ny // factor, nx // factor
    w = jnp.broadcast_to(w, x.shape)
    lead = x.shape[:-2]
    xf = x.reshape((-1, ny, nx))
    wf = w.reshape((-1, ny, nx))

    BY = min(8, nyc)
    BX = min(128, nxc)
    if nyc % BY or nxc % BX:
        return _xla.weighted_block_average(x, w, factor)

    grid = (xf.shape[0], nyc // BY, nxc // BX)
    kernel = functools.partial(_wavg_kernel, factor=factor)
    num, den = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((xf.shape[0], nyc, nxc), x.dtype),
            jax.ShapeDtypeStruct((xf.shape[0], nyc, nxc), x.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, BY * factor, BX * factor),
                lambda b, i, j: (b, i, j),
            ),
            pl.BlockSpec(
                (1, BY * factor, BX * factor),
                lambda b, i, j: (b, i, j),
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, BY, BX), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, BY, BX), lambda b, i, j: (b, i, j)),
        ),
        interpret=interpret,
    )(xf, wf)
    return (num / den).reshape(lead + (nyc, nxc))


def weighted_block_average(x, w, factor: int):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        try:
            return weighted_block_average_pallas(x, w, factor)
        except Exception:
            return _xla.weighted_block_average(x, w, factor)
    return _xla.weighted_block_average(x, w, factor)
