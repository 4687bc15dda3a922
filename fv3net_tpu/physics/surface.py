"""Bulk-aerodynamic surface fluxes, pure jnp.

Stand-in for GFS surface-layer physics (in the reference these live in
the Fortran model behind ``wrapper.apply_physics``; their outputs surface
the same names used by runtime diagnostics, reference:
workflows/prognostic_c48_run/runtime/diagnostics/compute.py:183-290).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from fv3net_tpu.core.constants import CP_AIR, GRAVITY, RDGAS
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.microphysics import saturation_specific_humidity


@dataclasses.dataclass(frozen=True)
class SurfaceParams:
    drag_coefficient: float = 1.2e-3  # C_d = C_h = C_q
    gustiness: float = 1.0  # m/s floor on wind speed
    ocean_evaporation_factor: float = 1.0


def bulk_surface_fluxes(
    t_air, q_air, p_sfc, delp_sfc, wind_speed, t_surface,
    params: SurfaceParams = SurfaceParams(),
    evap_factor=None,
) -> Dict[str, jnp.ndarray]:
    """Sensible/latent heat fluxes + momentum drag over a saturated surface.

    Args: lowest-layer air temperature/humidity, surface pressure, lowest
    layer thickness, lowest-layer wind speed, surface (skin/SST)
    temperature.  All (...) arrays.  ``evap_factor``: optional per-point
    evaporation efficiency in [0, 1] (the bucket land beta,
    physics/land.py) multiplying the potential evaporation; the latent
    heat flux scales consistently so surface energy and water budgets
    stay coupled.

    Returns dict with LHTFLsfc [W/m^2], SHTFLsfc [W/m^2], evaporation
    [kg/m^2/s], drag_factor [1/s] (to be applied to lowest-layer wind).
    """
    rho = p_sfc / (RDGAS * t_air)
    v = jnp.maximum(wind_speed, params.gustiness)
    ch = params.drag_coefficient
    shf = rho * CP_AIR * ch * v * (t_surface - t_air)
    qsat_s = saturation_specific_humidity(t_surface, p_sfc)
    evap = (
        params.ocean_evaporation_factor
        * rho * ch * v * jnp.maximum(qsat_s - q_air, 0.0)
    )
    if evap_factor is not None:
        evap = evap * evap_factor
    lv = thermo.latent_heat_vaporization(t_surface)
    lhf = lv * evap
    # momentum: dv/dt = -drag_factor * v on the lowest layer
    mass_sfc = delp_sfc / GRAVITY
    drag_factor = rho * ch * v / mass_sfc
    return {
        "SHTFLsfc": shf,
        "LHTFLsfc": lhf,
        "evaporation": evap,
        "drag_factor": drag_factor,
    }
