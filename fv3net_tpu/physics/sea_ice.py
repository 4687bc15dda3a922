"""Zero-layer thermodynamic sea ice coupled to the slab ocean.

The reference's sea ice comes from the GFS surface suite (the ``fice``/
``hice`` fields of the `sfc_data` restart category, reference:
external/vcm/vcm/cubedsphere/coarsen_restarts.py:1210-1336
dominant-surface-type logic).  Here the Semtner zero-layer closure rides
the slab ocean's energy ledger: when the mixed layer's updated
temperature falls below freezing, the deficit freezes ice instead of
supercooling the water; when it rises above freezing under existing ice,
the excess melts ice before the water warms.  The exchange is exact —

    C (T_new - T*) = rho_i L_f (h_new - h)

with C the slab heat capacity — so the coupled system conserves energy
to machine precision.  Ice fraction (for the albedo feedback in the
radiation schemes) saturates over ``h_ref``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from fv3net_tpu.physics.slab_ocean import SlabOceanParams, net_surface_flux


@dataclasses.dataclass(frozen=True)
class SeaIceParams:
    rho_ice: float = 917.0  # kg/m^3
    latent_fusion: float = 3.34e5  # J/kg
    t_freeze: float = 271.35  # K, freezing seawater
    h_ref: float = 0.3  # m: thickness at which the cell reads ~fully icy
    albedo_vis: float = 0.73  # GFS-like bare sea-ice albedos
    albedo_nir: float = 0.33


def ice_fraction(ice_h: jnp.ndarray,
                 params: SeaIceParams = SeaIceParams()) -> jnp.ndarray:
    """Cell ice cover in [0, 1] from thickness (saturating ramp)."""
    return jnp.clip(ice_h / params.h_ref, 0.0, 1.0)


def slab_ice_exchange(
    t_star: jnp.ndarray,
    ice_h: jnp.ndarray,
    heat_capacity,
    params: SeaIceParams = SeaIceParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exchange heat between the slab (unclamped temperature ``t_star``)
    and the ice reservoir.  Returns ``(t_new, ice_h_new)`` satisfying the
    exact ledger above; the surface sits at ``t_freeze`` while any ice
    remains.
    """
    le = params.rho_ice * params.latent_fusion  # J/m^3 of ice
    # freezing: the below-freezing deficit becomes ice growth
    deficit = jnp.maximum(params.t_freeze - t_star, 0.0)
    growth = deficit * heat_capacity / le
    # melting: the above-freezing excess melts ice first
    excess = jnp.maximum(t_star - params.t_freeze, 0.0)
    melt = jnp.minimum(ice_h, excess * heat_capacity / le)
    h_new = ice_h + growth - melt
    # ledger: C (T_new - T*) = le (h_new - h) — freezing releases latent
    # heat into the slab (raising it to the freezing point), melting
    # consumes slab heat; when any ice remains both reduce exactly to
    # T_new = t_freeze
    t_new = jnp.where(
        h_new > 0.0,
        params.t_freeze,
        t_star + deficit - melt * le / heat_capacity,
    )
    return t_new, h_new


def slab_ocean_seaice_update(
    t_surface: jnp.ndarray,
    ice_h: jnp.ndarray,
    diags,
    dt: float,
    ocean_params: SlabOceanParams = SlabOceanParams(),
    ice_params: SeaIceParams = SeaIceParams(),
    land_mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One step of the coupled mixed-layer + zero-layer-ice budget.

    The slab integrates F_net WITHOUT the freezing clamp; the ice
    exchange then enforces the freezing point by moving the imbalance
    into latent heat of fusion.  Land points pass through unchanged
    (their temperature is the thin-slab branch of slab_ocean_update).
    """
    f_net = net_surface_flux(diags)
    depth = ocean_params.mixed_layer_depth_m
    if land_mask is not None:
        depth = jnp.where(land_mask > 0.5, ocean_params.land_depth_m, depth)
    heat_capacity = ocean_params.rho_water * ocean_params.cp_water * depth
    t_star = t_surface + dt * f_net / heat_capacity
    t_new, h_new = slab_ice_exchange(
        t_star, ice_h, heat_capacity, ice_params
    )
    if land_mask is not None:  # no sea ice on land
        t_new = jnp.where(land_mask > 0.5, t_star, t_new)
        h_new = jnp.where(land_mask > 0.5, ice_h, h_new)
    return t_new, h_new
