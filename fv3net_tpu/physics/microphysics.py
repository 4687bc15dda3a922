"""Zhao-Carr-style large-scale microphysics (gscond + precpd), pure jnp.

The reference runs the Fortran Zhao-Carr scheme inside GFS physics and
trains ML emulators of its two stages gscond/precpd (reference:
external/emulation/emulation/__init__.py:1-18 hook names,
external/fv3fit/fv3fit/emulation/zhao_carr/ transforms).  This module is
an independent implementation of the same scheme family (Zhao & Carr
1997, MWR): saturation condensation/evaporation of a single cloud-water
species, autoconversion to precipitation, and precipitation
re-evaporation during fall.  Fully vectorized over columns; the single
top-to-bottom dependency (falling precip) is a short ``lax.scan`` over
the z axis.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import CP_AIR, RDGAS, RVGAS
from fv3net_tpu.ops import thermo


EPS = RDGAS / RVGAS  # ~0.622


def saturation_specific_humidity(T, p):
    """qsat from Magnus saturation pressure (consistent with ops.thermo)."""
    es = thermo.saturation_pressure(T)
    es = jnp.minimum(es, 0.9 * p)  # guard very low pressure levels
    return EPS * es / (p - (1.0 - EPS) * es)


def _condensation_adjustment(T, q, p, lv):
    """Linearized saturation adjustment: amount dq to condense (>0) or the
    (positive) saturation deficit (dq<0 meaning room for evaporation)."""
    qsat = saturation_specific_humidity(T, p)
    # d(qsat)/dT from Clausius-Clapeyron
    dqsat_dT = lv * qsat / (RVGAS * T * T)
    return (q - qsat) / (1.0 + (lv / CP_AIR) * dqsat_dT)


@dataclasses.dataclass(frozen=True)
class MicrophysicsParams:
    auto_conversion_rate: float = 1.0e-3  # 1/s
    qc_crit: float = 2.0e-4  # autoconversion threshold kg/kg
    accretion_rate: float = 2.0  # 1/s per unit precip mixing ratio proxy
    evap_rate: float = 2.0e-5  # rain re-evaporation efficiency
    n_adjust: int = 2  # saturation-adjustment iterations


def gscond(T, q, qc, p, dt: float, params: MicrophysicsParams = MicrophysicsParams()):
    """Grid-scale condensation/evaporation (the 'gscond' stage).

    Args/returns are (..., nz) arrays: temperature K, specific humidity
    and cloud water kg/kg, midlayer pressure Pa.  The adjustment is
    INSTANTANEOUS (saturation is removed fully each call, iterated
    ``n_adjust`` times); ``dt`` is accepted for the stage's uniform hook
    signature but does not scale the condensation.
    """
    for _ in range(params.n_adjust):
        lv = thermo.latent_heat_vaporization(T)
        dq = _condensation_adjustment(T, q, p, lv)
        cond = jnp.maximum(dq, -qc)  # evaporation limited by cloud water
        T = T + (lv / CP_AIR) * cond
        q = q - cond
        qc = qc + cond
    return T, q, qc


def precpd(
    T, q, qc, p, delp, dt: float,
    params: MicrophysicsParams = MicrophysicsParams(),
):
    """Precipitation production + fall with re-evaporation (the 'precpd'
    stage).  Returns (T, q, qc, surface_precip_rate [kg/m^2/s]).
    """
    # autoconversion + crude accretion (collection scales with the cloud
    # water itself), limited by available cloud water
    rate = (
        params.auto_conversion_rate + params.accretion_rate * qc
    ) * jnp.maximum(qc - params.qc_crit, 0.0)
    dqp = jnp.minimum(rate * dt, qc)
    qc = qc - dqp

    # fall through the column (top -> bottom) with re-evaporation in
    # subsaturated layers; flux in kg/m^2/s
    lv = thermo.latent_heat_vaporization(T)
    qsat = saturation_specific_humidity(T, p)
    deficit = jnp.maximum(qsat - q, 0.0)

    def body(flux, xs):
        dqp_k, deficit_k, dm_k = xs  # dm = delp/g layer mass
        flux = flux + dqp_k * dm_k / dt
        # re-evaporation proportional to subsaturation, limited by the flux
        evap = jnp.minimum(params.evap_rate * deficit_k * dt * flux, flux)
        flux = flux - evap
        dq_evap = evap * dt / dm_k
        return flux, dq_evap

    dm = thermo.layer_mass(delp)
    # scan over z (axis -1): move z to axis 0
    xs = (
        jnp.moveaxis(dqp, -1, 0),
        jnp.moveaxis(deficit, -1, 0),
        jnp.moveaxis(dm, -1, 0),
    )
    flux0 = jnp.zeros(T.shape[:-1], T.dtype)
    flux_sfc, dq_evap = lax.scan(body, flux0, xs)
    dq_evap = jnp.moveaxis(dq_evap, 0, -1)

    q = q + dq_evap
    T = T - (lv / CP_AIR) * dq_evap
    return T, q, qc, flux_sfc


def microphysics_step(
    T, q, qc, p, delp, dt: float,
    params: MicrophysicsParams = MicrophysicsParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full Zhao-Carr step: gscond then precpd.

    Returns (T, q, qc, surface_precipitation_rate).
    """
    T, q, qc = gscond(T, q, qc, p, dt, params)
    return precpd(T, q, qc, p, delp, dt, params)
