"""Bucket land-surface hydrology (Manabe 1969).

The reference's land surface is the GFS Noah LSM inside the Fortran
physics (driven through ``wrapper.apply_physics``; its soil-moisture
fields surface in the `sfc_data` restart category, reference:
external/vcm/vcm/cubedsphere/coarsen_restarts.py:1020-1336 surface-field
handling).  Here the classic bucket closure provides the same physical
role — evaporation limited by soil water, a closed land water budget,
runoff when the bucket fills — as a jittable pure function over all land
columns at once:

    beta = min(1, W / (f * W_max))          evaporation efficiency
    dW/dt = P - beta * E_pot                (runoff clamps W at W_max)

with the standard field capacity W_max = 0.15 m and f = 0.75.  The land
surface-temperature side rides the thin-slab branch of
``physics/slab_ocean.py`` (land_depth_m), so together they close both
the land energy and water budgets.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

RHO_WATER = 1000.0  # kg/m^3 (liquid water equivalent depth conversions)


@dataclasses.dataclass(frozen=True)
class BucketLandParams:
    field_capacity_m: float = 0.15  # W_max, m of liquid water
    beta_threshold_frac: float = 0.75  # evap unlimited above f * W_max
    initial_fraction: float = 0.5  # spin-up fill level


def evaporation_efficiency(
    soil_moisture: jnp.ndarray, params: BucketLandParams = BucketLandParams()
) -> jnp.ndarray:
    """beta in [0, 1]: fraction of potential evaporation the soil can
    supply (Manabe's bucket beta-function)."""
    wcrit = params.beta_threshold_frac * params.field_capacity_m
    return jnp.clip(soil_moisture / wcrit, 0.0, 1.0)


def bucket_hydrology_update(
    soil_moisture: jnp.ndarray,
    precip_rate: jnp.ndarray,  # kg/m^2/s reaching the surface
    evap_rate: jnp.ndarray,  # kg/m^2/s actually evaporated (beta-limited)
    dt: float,
    params: BucketLandParams = BucketLandParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One step of the bucket water budget.

    Returns ``(soil_moisture_new [m], runoff_rate [kg/m^2/s])`` with the
    exact budget  dW * rho_w = (P - E - R) * dt  (runoff is the overflow
    above field capacity plus the clamp keeping W >= 0 against any
    residual over-evaporation).
    """
    w_star = soil_moisture + dt * (precip_rate - evap_rate) / RHO_WATER
    w_new = jnp.clip(w_star, 0.0, params.field_capacity_m)
    runoff = (w_star - w_new) * RHO_WATER / dt
    return w_new, runoff
