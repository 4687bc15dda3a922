"""Simplified Betts-Miller moist convective adjustment, pure jnp.

Stand-in for the GFS deep/shallow convection schemes (in the reference
these live in the Fortran physics behind ``apply_physics``).  The
Betts-Miller scheme (Betts & Miller 1986; Frierson 2007 simplified
variant) relaxes convectively unstable columns toward a moist pseudo-
adiabat over a fixed timescale, producing convective precipitation —
the standard choice for gray-radiation aquaplanets.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from fv3net_tpu.core.constants import CP_AIR, KAPPA, RVGAS
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.microphysics import saturation_specific_humidity


@dataclasses.dataclass(frozen=True)
class ConvectionParams:
    tau: float = 7200.0  # relaxation timescale [s]
    rh_ref: float = 0.7  # reference profile relative humidity
    p_top: float = 1.0e4  # no adjustment above this pressure [Pa]
    buoyancy_cap: float = 10.0  # max parcel excess over environment [K]
    # (crude entrainment: the undilute pseudo-adiabat otherwise runs away
    # aloft, making the humidity reference unphysically moist)


def _parcel_profile(T, q, pmid):
    """Temperature of a surface parcel lifted (crudely) moist-
    adiabatically: dry adiabat + latent-heat warming of condensed excess.

    A two-pass approximation adequate for an adjustment scheme: theta
    conserved, then condensation heating added where the parcel exceeds
    saturation.
    """
    p_sfc = pmid[..., -1:]
    T_sfc = T[..., -1:]
    q_sfc = q[..., -1:]
    # dry adiabatic ascent
    T_dry = T_sfc * (pmid / p_sfc) ** KAPPA
    # condensation heating from the vapor excess over saturation at T_dry
    qsat = saturation_specific_humidity(jnp.maximum(T_dry, 150.0), pmid)
    lv = thermo.latent_heat_vaporization(T_dry)
    excess = jnp.maximum(q_sfc - qsat, 0.0)
    # one linearized correction for latent heating
    dqsat_dT = lv * qsat / (RVGAS * jnp.maximum(T_dry, 150.0) ** 2)
    dT = lv * excess / (CP_AIR * (1.0 + lv / CP_AIR * dqsat_dT))
    return T_dry + dT


def betts_miller(
    T, q, pmid, delp, dt: float, params: ConvectionParams = ConvectionParams()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convective adjustment; returns (T, q, convective_precip_rate).

    Columns where the lifted parcel is warmer than the environment
    (positive CAPE proxy) relax T toward the parcel profile and q toward
    ``rh_ref`` saturation, over timescale tau.  The implied column
    moisture loss falls as convective precipitation; the temperature
    reference is shifted (Frierson 2007 correction) so the scheme
    conserves column enthalpy.
    """
    T_ref = _parcel_profile(T, q, pmid)
    w = (T_ref > T) & (pmid > params.p_top)

    T_ref = jnp.minimum(T_ref, T + params.buoyancy_cap)
    q_ref = params.rh_ref * saturation_specific_humidity(T_ref, pmid)

    dT = jnp.where(w, (T_ref - T) * dt / params.tau, 0.0)
    dq = jnp.where(w, (q_ref - q) * dt / params.tau, 0.0)
    dq = jnp.maximum(dq, -q)  # cannot dry below zero humidity

    dm = thermo.layer_mass(delp)
    lv = thermo.latent_heat_vaporization(T)
    wm = (w * dm).sum(axis=-1, keepdims=True)

    # standard Betts-Miller corrections (Frierson 2007):
    # (1) shift the humidity reference so the column precipitates (P >= 0)
    col_dq = (dq * dm).sum(axis=-1, keepdims=True)
    dq_shift = jnp.where(wm > 0, jnp.maximum(col_dq, 0.0) / jnp.maximum(wm, 1.0), 0.0)
    dq = jnp.where(w, dq - dq_shift, 0.0)
    # the shift can over-dry layers that were already near zero humidity:
    # clamp to dq >= -q, then remove the clamp's water residual from the
    # layers that still have moisture (weighted by what they can spare) —
    # otherwise the clip silently CREATES column water
    dq = jnp.maximum(dq, -q)
    col_dq = (dq * dm).sum(axis=-1, keepdims=True)
    excess = jnp.maximum(col_dq, 0.0)
    cap = jnp.maximum(q + dq, 0.0) * dm * w
    cap_sum = cap.sum(axis=-1, keepdims=True)
    take = jnp.where(
        cap_sum > 0.0, excess * cap / jnp.maximum(cap_sum, 1e-30) / dm, 0.0
    )
    dq = dq - take
    # (2) shift dT so cp<dT> + Lv<dq> = 0 for the FINAL dq (column moist
    # enthalpy conserved exactly, including the clamped layers)
    col_h = (CP_AIR * dT * dm + lv * dq * dm).sum(axis=-1, keepdims=True)
    corr = jnp.where(wm > 0, col_h / (CP_AIR * jnp.maximum(wm, 1.0)), 0.0)
    dT = jnp.where(w, dT - corr, 0.0)

    precip = jnp.maximum(-(dq * dm).sum(axis=-1) / dt, 0.0)
    return T + dT, q + dq, precip
