"""Vertical regridding to coarsened pressure levels.

Equivalent of the reference's ``vcm.cubedsphere.regridz``
(reference: external/vcm/vcm/cubedsphere/regridz.py:31
regrid_to_area_weighted_pressure, :81 regrid_to_edge_weighted_pressure,
:155 _regrid_given_delp, :200 _mask_weights) and
``vcm.interpolate_to_pressure_levels`` (external/vcm/vcm/interpolate.py:77).

Layout convention: 3-D fields are (..., y, x, z) with z innermost so the
PPM remap (fv3net_tpu.ops.remap) runs batched over all columns; the
horizontal block coarsening moves the z axis out of the way internally.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import TOA_PRESSURE
from fv3net_tpu.ops import coarsen as _coarsen
from fv3net_tpu.ops import remap as _remap
from fv3net_tpu.ops import thermo as _thermo

# NCEP-style standard output pressure levels [Pa]
# (reference: external/vcm/vcm/interpolate.py:28-72 PRESSURE_GRID)
PRESSURE_GRID = np.array(
    [
        2500.0, 5000.0, 7500.0, 10000.0, 12500.0, 15000.0, 17500.0, 20000.0,
        22500.0, 25000.0, 27500.0, 30000.0, 32500.0, 35000.0, 37500.0, 40000.0,
        42500.0, 45000.0, 47500.0, 50000.0, 52500.0, 55000.0, 57500.0, 60000.0,
        62500.0, 65000.0, 67500.0, 70000.0, 72500.0, 75000.0, 77500.0, 80000.0,
        82500.0, 85000.0, 87500.0, 90000.0, 92500.0, 95000.0, 97500.0, 100000.0,
    ]
)


def _hcoarsen_weighted(x_yxz, weights_yx, factor: int):
    """Weighted block average over the (y, x) axes of a (..., y, x, z) array."""
    x = jnp.moveaxis(x_yxz, -1, -3)  # (..., z, y, x)
    w = jnp.expand_dims(weights_yx, -3)  # align (..., y, x) under the z axis
    out = _coarsen.weighted_block_average(x, w, factor)
    return jnp.moveaxis(out, -3, -1)


def _hupsample(x_yxz, factor: int):
    x = jnp.moveaxis(x_yxz, -1, -3)
    out = _coarsen.block_upsample(x, factor)
    return jnp.moveaxis(out, -3, -1)


def regrid_to_area_weighted_pressure(
    fields: Dict[str, jnp.ndarray],
    delp: jnp.ndarray,
    area: jnp.ndarray,
    coarsening_factor: int,
    toa_pressure: float = TOA_PRESSURE,
    extrapolate: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Vertically regrid cell-centered fields to coarsened pressure levels
    and mask area weights below the fine surface pressure
    (reference regridz.py:31-79, :155-198).

    Args:
        fields: name -> (..., y, x, z) arrays on the fine grid
        delp: fine pressure thicknesses (..., y, x, z)
        area: cell areas (y, x)
        coarsening_factor: horizontal factor for the coarse pressure field
        extrapolate: if True, mask against coarse layer *midpoints* instead
            of bottom interfaces (allows limited nearest-neighbor extrap)

    Returns:
        (regridded fields on the fine horizontal grid but coarse pressure
        coordinate, masked weights (..., y, x, z))
    """
    delp_coarse = _hcoarsen_weighted(delp, area, coarsening_factor)
    delp_coarse_on_fine = _hupsample(delp_coarse, coarsening_factor)
    return _regrid_given_delp(
        fields, delp, delp_coarse_on_fine, area, toa_pressure, extrapolate
    )


def regrid_to_edge_weighted_pressure(
    fields: Dict[str, jnp.ndarray],
    delp_staggered: jnp.ndarray,
    length: jnp.ndarray,
    coarsening_factor: int,
    toa_pressure: float = TOA_PRESSURE,
    edge: str = "x",
    extrapolate: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Edge-staggered analog of regrid_to_area_weighted_pressure
    (reference regridz.py:81-154): edge-weighted coarse delp along the
    edge direction, subsampled in the other.

    ``delp_staggered`` must already be interpolated to the edge positions
    (see ``stagger_center_to_edge``).
    """
    delp_stag = jnp.moveaxis(delp_staggered, -1, -3)
    coarse = _coarsen.edge_weighted_block_average(
        delp_stag, jnp.expand_dims(length, -3), coarsening_factor, edge=edge
    )
    # upsample back to the fine staggered grid: repeat along the coarsen
    # axis, and along the subsampled axis each coarse row represents the
    # corresponding fine rows
    coarse_up = _coarsen.block_upsample(coarse, coarsening_factor)
    # block_upsample repeats both axes; trim to the staggered fine shape
    coarse_up = coarse_up[..., : delp_stag.shape[-2], : delp_stag.shape[-1]]
    delp_coarse_on_fine = jnp.moveaxis(coarse_up, -3, -1)
    return _regrid_given_delp(
        fields,
        delp_staggered,
        delp_coarse_on_fine,
        length,
        toa_pressure,
        extrapolate,
    )


def stagger_center_to_edge(delp: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interpolate a cell-centered (..., y, x, z) field to edge positions
    along ``axis`` (-2 for x edges, -3 for y edges): midpoint average in the
    interior, nearest-center at the domain boundary (the xgcm grid.interp
    step at reference regridz.py:118-126)."""
    ax = axis % delp.ndim
    lo = jnp.take(delp, jnp.arange(delp.shape[ax] - 1), axis=ax)
    hi = jnp.take(delp, jnp.arange(1, delp.shape[ax]), axis=ax)
    mid = 0.5 * (lo + hi)
    first = jnp.take(delp, jnp.arange(1), axis=ax)
    last = jnp.take(delp, jnp.arange(delp.shape[ax] - 1, delp.shape[ax]), axis=ax)
    return jnp.concatenate([first, mid, last], axis=ax)


def _regrid_given_delp(
    fields, delp_fine, delp_coarse_on_fine, weights, toa_pressure, extrapolate
):
    phalf_coarse = _thermo.pressure_at_interface(
        delp_coarse_on_fine, toa_pressure=toa_pressure
    )
    phalf_fine = _thermo.pressure_at_interface(delp_fine, toa_pressure=toa_pressure)
    regridded = {
        name: _remap.remap_ppm(phalf_fine, f, phalf_coarse, iv=1, kord=1)
        for name, f in fields.items()
    }
    if extrapolate:
        pfull_coarse = _thermo.pressure_at_midpoint_log(
            delp_coarse_on_fine, toa_pressure=toa_pressure
        )
        mask = pfull_coarse < phalf_fine[..., -1:]
    else:
        # <= with a rounding tolerance (reference uses strict <,
        # regridz.py:219): at exact equality the coarse layer lies
        # entirely within the fine column so the value is valid, and
        # cumsum rounding must not flip the comparison — otherwise a
        # uniform-ps cube masks its whole bottom layer to 0/0
        ps_fine = phalf_fine[..., -1:]
        tol = 8 * jnp.finfo(ps_fine.dtype).eps * ps_fine
        mask = phalf_coarse[..., 1:] <= ps_fine + tol
    masked_weights = jnp.where(mask, weights[..., None], 0.0)
    return regridded, masked_weights


def interpolate_to_pressure_levels(
    field: jnp.ndarray,
    delp: jnp.ndarray,
    levels: jnp.ndarray = None,
    ptop: float = TOA_PRESSURE,
) -> jnp.ndarray:
    """Linear interpolation of a (..., z) field onto fixed pressure levels
    (reference: external/vcm/vcm/interpolate.py:77-104); NaN outside the
    column's pressure range."""
    if levels is None:
        levels = jnp.asarray(PRESSURE_GRID, dtype=field.dtype)
    pmid = _thermo.pressure_at_midpoint_log(delp, toa_pressure=ptop)
    target = jnp.broadcast_to(levels, field.shape[:-1] + (levels.shape[-1],))
    return _remap.interpolate_1d(target, pmid, field)
