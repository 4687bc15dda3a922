"""Stratospheric water-vapor photochemistry (methane oxidation).

The GFS physics suite runs ``h2ophys`` — a linearized production/loss
update of stratospheric specific humidity (NRL scheme; in the reference
this lives inside the out-of-tree Fortran physics invoked via
``wrapper.apply_physics()``, with the ``h2o_phys`` namelist flag).  The
dominant physics: CH4 + 2O2 -> CO2 + 2H2O makes the middle atmosphere
wetter than the tropopause cold-trap value, relaxing specific humidity
toward an equilibrium profile (~3 ppmv at the hygropause rising to
~6-7 ppmv near the stratopause as methane is consumed) with a
photochemical timescale of months::

    dq/dt = (q_eq(p) - q) / tau(p)     for p < p_bottom (stratosphere)

Both the equilibrium and the rate taper off below ``p_bottom`` so the
troposphere is untouched.  Opt-in via the ``stratospheric_h2o``
namelist key (adds water mass by design, like the GFS scheme — runs
with exact-water-closure assertions should keep it off).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# kg/kg per ppmv of H2O (Mw/Md * 1e-6)
_PPMV = 18.015 / 28.964 * 1e-6


@dataclasses.dataclass(frozen=True)
class H2OPhysParams:
    q_hygropause_ppmv: float = 3.0  # entry value at the cold point
    q_stratopause_ppmv: float = 6.5  # after full methane oxidation
    p_bottom: float = 10000.0  # Pa; no update below (troposphere)
    p_top_eq: float = 100.0  # Pa; q_eq saturates to the stratopause value
    tau_days: float = 100.0  # photochemical relaxation timescale


def h2o_tendency(
    q, pmid, params: H2OPhysParams = H2OPhysParams()
) -> jnp.ndarray:
    """dq/dt [kg/kg/s] for z-last columns; zero below ``p_bottom``."""
    lo = jnp.log(params.p_bottom)
    hi = jnp.log(params.p_top_eq)
    # 0 at/below p_bottom -> 1 at/above p_top_eq (log-pressure ramp)
    frac = jnp.clip((lo - jnp.log(pmid)) / (lo - hi), 0.0, 1.0)
    q_eq = (
        params.q_hygropause_ppmv
        + frac * (params.q_stratopause_ppmv - params.q_hygropause_ppmv)
    ) * _PPMV
    tau = params.tau_days * 86400.0
    in_strat = (pmid < params.p_bottom).astype(q.dtype)
    return in_strat * (q_eq - q) / tau
