"""Slab (mixed-layer) ocean: prognostic surface temperature.

The reference's surface temperature comes from the Fortran side's ocean
and land models (driven through ``wrapper.apply_physics()``; aquaplanet
experiments there prescribe SST via namelist or the Prescriber
stepper).  This is the standard mixed-layer closure used by aquaplanet
climate studies: a well-mixed water column of depth ``h`` integrates the
net surface energy flux, making long runs energetically closed instead
of relaxing toward a fixed SST::

    dT_s/dt = F_net / (rho_w * c_w * h)
    F_net = DSWRFsfc - USWRFsfc + DLWRFsfc - ULWRFsfc - SHTFLsfc - LHTFLsfc

(all fluxes in W/m^2, positive as named; F_net positive warms the slab).
Land points (mask > 0.5) use a much thinner effective layer — the usual
bucket-land analog.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SlabOceanParams:
    mixed_layer_depth_m: float = 50.0
    land_depth_m: float = 2.0  # thin effective layer over land
    rho_water: float = 1025.0  # kg/m^3
    cp_water: float = 3990.0  # J/kg/K
    t_min: float = 271.35  # freezing seawater floor, K


def net_surface_flux(diags) -> jnp.ndarray:
    """F_net [W/m^2], positive warming the surface, from the physics
    step's flux diagnostics (GFS flux names).  ``GHFLXsfc`` (ground
    heat flux + snowmelt heat into the Noah soil column,
    physics/soil.py) is subtracted when present so the skin and soil
    budgets close jointly."""
    f = (
        diags["DSWRFsfc"]
        - diags["USWRFsfc"]
        + diags["DLWRFsfc"]
        - diags["ULWRFsfc"]
        - diags["SHTFLsfc"]
        - diags["LHTFLsfc"]
    )
    if "GHFLXsfc" in diags:
        f = f - diags["GHFLXsfc"]
    return f


def slab_ocean_update(
    t_surface: jnp.ndarray,
    diags,
    dt: float,
    params: SlabOceanParams = SlabOceanParams(),
    land_mask=None,
) -> jnp.ndarray:
    """One step of the mixed-layer energy budget; returns new T_s."""
    f_net = net_surface_flux(diags)
    depth = params.mixed_layer_depth_m
    if land_mask is not None:
        depth = jnp.where(
            land_mask > 0.5, params.land_depth_m, depth
        )
    heat_capacity = params.rho_water * params.cp_water * depth
    t_new = t_surface + dt * f_net / heat_capacity
    floored = jnp.maximum(t_new, params.t_min)
    if land_mask is not None:
        # the floor expresses seawater freezing — ocean points only;
        # continental skin temperature may drop below -1.8 C freely
        return jnp.where(land_mask > 0.5, t_new, floored)
    return floored
