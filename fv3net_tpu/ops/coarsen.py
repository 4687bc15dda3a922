"""Block coarsening ops, pure jnp.

TPU-native replacement for the reference's coarsening layer
(reference: external/vcm/vcm/cubedsphere/coarsen.py:183 weighted_block_average,
:221 edge_weighted_block_average, :463 xarray_block_reduce, :520
horizontal_block_reduce, :557 block_median, :591 block_edge_sum, :750
_block_mode, :795 block_coarsen, :869 block_upsample, and the vendored
skimage block_reduce at external/vcm/vcm/cubedsphere/_skimage.py).

Re-design: instead of dask-chunked xarray ``coarsen`` graphs, a single
reshape exposes the (factor x factor) blocks as two extra axes and every
reduction is one fused XLA op.  Functions act on the last two axes
(..., y, x) by default, so they batch over (tile, z, time, ...) leading
dims and vmap/shard_map cleanly.  The Quantity/Dataset layer adds dim
names at the boundary (fv3net_tpu.cubedsphere).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _blockify(x, factor: int):
    """(..., y, x) -> (..., y/f, f, x/f, f)."""
    *lead, ny, nx = x.shape
    if ny % factor or nx % factor:
        raise ValueError(
            f"spatial shape ({ny},{nx}) not divisible by factor {factor}"
        )
    return x.reshape(*lead, ny // factor, factor, nx // factor, factor)


def block_reduce(x, factor: int, reduction: Callable = jnp.sum):
    """Blockwise reduction over (factor x factor) tiles of the last two axes.

    The Pallas-free equivalent of the vendored skimage block_reduce
    (reference _skimage.py:1-30): one reshape + one reduction, which XLA
    lowers to a tiled VPU reduction with no intermediate materialization.
    """
    b = _blockify(x, factor)
    return reduction(b, axis=(-3, -1))


def block_sum(x, factor: int):
    return block_reduce(x, factor, jnp.sum)


def block_mean(x, factor: int):
    return block_reduce(x, factor, jnp.mean)


def block_median(x, factor: int):
    """Blockwise median (reference coarsen.py:557)."""
    b = _blockify(x, factor)
    *lead, nyc, f1, nxc, f2 = b.shape
    b = jnp.moveaxis(b, -3, -2).reshape(*lead, nyc, nxc, f1 * f2)
    return jnp.median(b, axis=-1)


def block_min(x, factor: int):
    return block_reduce(x, factor, jnp.min)


def block_max(x, factor: int):
    return block_reduce(x, factor, jnp.max)


def block_mode(x, factor: int, where=None):
    """Blockwise mode ("dominant" reduction used for categorical surface
    fields, reference coarsen.py:750 _block_mode).

    Computed by sorting each block and finding the longest run — avoids
    data-dependent shapes so it jits.  Ties break toward the smallest
    value, matching scipy.stats.mode semantics used by the reference.

    ``where``: optional boolean mask (broadcastable to x); excluded
    cells are omitted from the count (the reference's
    nan_policy="omit" over .where()-masked inputs,
    coarsen_restarts.py:1165-1184).
    """
    b = _blockify(x, factor)
    *lead, nyc, f1, nxc, f2 = b.shape
    v = jnp.moveaxis(b, -3, -2).reshape(*lead, nyc, nxc, f1 * f2)
    if where is not None:
        m = _blockify(jnp.broadcast_to(where, x.shape), factor)
        m = jnp.moveaxis(m, -3, -2).reshape(*lead, nyc, nxc, f1 * f2)
        # push masked entries past every real value so the sorted runs
        # of valid values stay contiguous at the front
        big = jnp.asarray(jnp.inf, v.dtype)
        order = jnp.argsort(jnp.where(m, v, big), axis=-1)
        s = jnp.take_along_axis(v, order, axis=-1)
        sm = jnp.take_along_axis(m, order, axis=-1)
        eq = (s[..., :, None] == s[..., None, :]) & sm[..., None, :]
        counts = jnp.where(sm, jnp.sum(eq, axis=-1), -1)
    else:
        s = jnp.sort(v, axis=-1)
        eq = s[..., :, None] == s[..., None, :]
        counts = jnp.sum(eq, axis=-1)
    # first index achieving the max count -> smallest value on ties
    best = jnp.argmax(counts, axis=-1)
    return jnp.take_along_axis(s, best[..., None], axis=-1)[..., 0]


def weighted_block_average(x, weights, factor: int):
    """Area/mass-weighted block average (reference coarsen.py:183).

    ``weights`` broadcasts against ``x`` over leading axes.
    """
    num = block_sum(x * weights, factor)
    den = block_sum(jnp.broadcast_to(weights, x.shape), factor)
    return num / den


def edge_weighted_block_average(x, spacing, factor: int, edge: str = "x"):
    """Coarsen an edge-staggered field: weighted-average along the edge
    direction, subsample along the other (reference coarsen.py:221).

    edge='x': coarsen along the last (x) axis, subsample y.
    edge='y': coarsen along the second-to-last (y) axis, subsample x.
    """
    if edge not in ("x", "y"):
        raise ValueError(f"edge must be 'x' or 'y', got {edge!r}")
    axis = -1 if edge == "x" else -2
    sub_axis = -2 if edge == "x" else -1
    num = _axis_block_sum(x * spacing, factor, axis)
    den = _axis_block_sum(jnp.broadcast_to(spacing, x.shape), factor, axis)
    avg = num / den
    idx = [slice(None)] * avg.ndim
    idx[sub_axis] = slice(None, None, factor)
    return avg[tuple(idx)]


def _axis_block_sum(x, factor: int, axis: int):
    ax = axis % x.ndim
    n = x.shape[ax]
    if n % factor:
        raise ValueError(f"axis size {n} not divisible by factor {factor}")
    shape = x.shape[:ax] + (n // factor, factor) + x.shape[ax + 1 :]
    return x.reshape(shape).sum(axis=ax + 1)


def block_edge_sum(x, factor: int, edge: str = "x"):
    """Sum along the edge direction, subsample the other (reference
    coarsen.py:591) — e.g. for edge lengths."""
    if edge not in ("x", "y"):
        raise ValueError(f"edge must be 'x' or 'y', got {edge!r}")
    axis = -1 if edge == "x" else -2
    sub_axis = -2 if edge == "x" else -1
    summed = _axis_block_sum(x, factor, axis)
    idx = [slice(None)] * summed.ndim
    idx[sub_axis] = slice(None, None, factor)
    return summed[tuple(idx)]


def block_upsample(x, factor: int):
    """Repeat each coarse cell into a (factor x factor) fine block
    (reference coarsen.py:869)."""
    y = jnp.repeat(x, factor, axis=-2)
    return jnp.repeat(y, factor, axis=-1)


_REDUCTIONS = {
    "sum": block_sum,
    "mean": block_mean,
    "median": block_median,
    "min": block_min,
    "max": block_max,
    "mode": block_mode,
}


def block_coarsen(x, factor: int, method: str = "sum"):
    """Named-method dispatch (reference coarsen.py:795)."""
    try:
        fn = _REDUCTIONS[method]
    except KeyError:
        raise ValueError(
            f"unknown coarsening method {method!r}; one of {sorted(_REDUCTIONS)}"
        )
    return fn(x, factor)


def shift_edge_var_to_center(x_edge, axis: int = -1):
    """Average an edge-staggered variable (n+1 points along ``axis``)
    onto cell centers (reference vcm/cubedsphere/coarsen.py
    shift_edge_var_to_center)."""
    lo = jax.lax.slice_in_dim(x_edge, 0, x_edge.shape[axis] - 1, axis=axis)
    hi = jax.lax.slice_in_dim(x_edge, 1, x_edge.shape[axis], axis=axis)
    return 0.5 * (lo + hi)


def coarsen_coords(factor: int, n_fine: int):
    """Coarse-grid 1-based coordinate labels after block coarsening
    (reference coarsen.py:83-163 coordinate handling): fine index i maps
    to coarse cell (i-1)//factor + 1."""
    import numpy as np

    if n_fine % factor:
        raise ValueError(f"{n_fine} not divisible by factor {factor}")
    return np.arange(1, n_fine // factor + 1)


#: reference-name aliases: both reference entry points reduce blocks of
#: the trailing two (y, x) axes with an arbitrary reduction
#: (vcm/cubedsphere/coarsen.py:463 xarray_block_reduce, :520
#: horizontal_block_reduce) — block_reduce already is that operation.
horizontal_block_reduce = block_reduce
xarray_block_reduce = block_reduce
