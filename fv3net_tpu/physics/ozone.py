"""Linearized ozone photochemistry.

The GFS physics suite carries a prognostic ozone tracer updated by the
``ozphys`` linearized production/loss scheme (inside the reference's
Fortran physics, invoked through ``wrapper.apply_physics()``; the o3mr
tracer appears in its restart files and log statistics).  This is the
standard linearization about a climatology: photochemistry relaxes the
transported ozone field toward the radiation package's climatological
profile with a pressure-dependent timescale — fast (days) in the
mid-stratosphere where photochemical control is strong, slow (months)
in the troposphere where transport dominates::

    d(o3)/dt = (o3_clim(p, lat) - o3) / tau(p)
    log tau linear in log p between (p_strat, tau_strat) and
    (p_trop, tau_trop)
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from fv3net_tpu.physics.radiation import gases


@dataclasses.dataclass(frozen=True)
class OzoneParams:
    tau_strat_days: float = 5.0  # at/above p_strat
    tau_trop_days: float = 180.0  # at/below p_trop
    p_strat: float = 3000.0  # Pa (30 hPa)
    p_trop: float = 30000.0  # Pa (300 hPa)


def ozone_tendency(
    o3, pmid, lat, params: OzoneParams = OzoneParams()
) -> jnp.ndarray:
    """d(o3)/dt [kg/kg/s] (z-last columns; lat [...] broadcast)."""
    clim = gases.ozone_profile(pmid, lat)
    frac = jnp.clip(
        (jnp.log(pmid) - jnp.log(params.p_strat))
        / (jnp.log(params.p_trop) - jnp.log(params.p_strat)),
        0.0,
        1.0,
    )
    log_tau = (
        jnp.log(params.tau_strat_days)
        + frac * (jnp.log(params.tau_trop_days) - jnp.log(params.tau_strat_days))
    )
    tau = jnp.exp(log_tau) * 86400.0
    return (clim - o3) / tau
