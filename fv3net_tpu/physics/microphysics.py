"""Zhao-Carr large-scale microphysics (gscond + precpd), pure jnp.

The reference runs the Fortran Zhao-Carr scheme inside GFS physics and
trains ML emulators of its two stages gscond/precpd (reference:
external/emulation/emulation/__init__.py:1-18 hook names,
external/fv3fit/fv3fit/emulation/zhao_carr/ transforms).  This module is
an independent implementation of the same scheme (Zhao & Carr 1997,
MWR; Sundqvist et al. 1989 cloud-fraction closure), with the GFS
scheme's structural elements:

- ``gscond``: Sundqvist critical-RH partial condensation — a cloud
  fraction ``b = 1 - sqrt((1-rh)/(1-u00))`` for rh > u00 controls how
  much of the grid box condenses; full saturation adjustment in
  overcast/supersaturated boxes; rate-limited cloud evaporation in
  sub-critical air.  The ice phase blends the latent heat of
  sublimation below freezing (ice fraction ramp 0C..-15C as in the
  Zhao-Carr cloud-ice treatment).
- ``precpd``: Sundqvist autoconversion ``c00*qc*(1-exp(-(qc/qc0)^2))``
  for liquid, temperature-enhanced snow autoconversion for ice,
  separate rain and snow fluxes falling through the column with snow
  melting (consuming latent heat of fusion) where T > 0C, supercooled
  rain freezing (releasing it) where T < 0C, rain re-evaporation and
  snow sublimation in subsaturated layers.

Everything is vectorized over columns; the single top-to-bottom
dependency (falling precipitation) is one ``lax.scan`` over the short z
axis.  Column water (vapor + cloud + surface precip) closes to
roundoff; enthalpy bookkeeping includes fusion for the ice paths
(tested in tests/test_physics.py / tests/test_microphysics_zhao_carr.py).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import (
    CP_AIR,
    LATENT_HEAT_FUSION,
    RDGAS,
    RVGAS,
)
from fv3net_tpu.ops import thermo


EPS = RDGAS / RVGAS  # ~0.622
T_FREEZE = 273.16
T_ICE_ALL = 258.16  # all-ice below -15 C (Zhao-Carr cloud-ice ramp)


def saturation_specific_humidity(T, p):
    """qsat from Magnus saturation pressure (consistent with ops.thermo)."""
    es = thermo.saturation_pressure(T)
    es = jnp.minimum(es, 0.9 * p)  # guard very low pressure levels
    return EPS * es / (p - (1.0 - EPS) * es)


def ice_fraction(T):
    """Cloud-ice fraction: 0 above freezing, 1 below -15 C, linear ramp."""
    return jnp.clip((T_FREEZE - T) / (T_FREEZE - T_ICE_ALL), 0.0, 1.0)


def _latent_heat(T):
    """Condensation latent heat including fusion for the ice fraction."""
    return thermo.latent_heat_vaporization(T) + ice_fraction(T) * LATENT_HEAT_FUSION


def _condensation_adjustment(T, q, p, lv):
    """Linearized saturation adjustment: amount dq to condense (>0) or the
    (positive) saturation deficit (dq<0 meaning room for evaporation)."""
    qsat = saturation_specific_humidity(T, p)
    # d(qsat)/dT from Clausius-Clapeyron
    dqsat_dT = lv * qsat / (RVGAS * T * T)
    return (q - qsat) / (1.0 + (lv / CP_AIR) * dqsat_dT)


@dataclasses.dataclass(frozen=True)
class MicrophysicsParams:
    # gscond (Sundqvist condensation)
    u00: float = 0.80  # critical RH for condensation onset
    evap_timescale: float = 1800.0  # s, cloud evaporation toward u00
    n_adjust: int = 2  # saturation-adjustment iterations
    # precpd
    auto_conversion_rate: float = 1.0e-3  # c00, 1/s (liquid autoconversion)
    qc_crit: float = 2.0e-4  # qc0 autoconversion scale kg/kg
    snow_auto_rate: float = 1.0e-3  # 1/s ice -> snow autoconversion
    qi_crit: float = 1.0e-4  # ice autoconversion scale kg/kg
    accretion_rate: float = 2.0  # 1/s per unit condensate (collection)
    evap_rate: float = 2.0e-5  # rain re-evaporation efficiency
    sub_rate: float = 1.0e-5  # snow sublimation efficiency
    melt_timescale: float = 600.0  # s, snow melting above freezing


def gscond(T, q, qc, p, dt: float, params: MicrophysicsParams = MicrophysicsParams()):
    """Grid-scale condensation/evaporation (the 'gscond' stage).

    Args/returns are (..., nz) arrays: temperature K, specific humidity
    and cloud water kg/kg, midlayer pressure Pa.

    Supersaturated boxes relax fully to saturation (iterated
    ``n_adjust`` times); in the persistence band (u00 < rh < 1) existing
    cloud survives (the Sundqvist cloudy fraction is internally
    saturated even though the grid mean is not); below the critical RH
    the cloud evaporates toward u00 at ``1/evap_timescale``.
    """
    for _ in range(params.n_adjust):
        lv = _latent_heat(T)
        qsat = saturation_specific_humidity(T, p)
        rh = jnp.clip(q / jnp.maximum(qsat, 1e-12), 0.0, 2.0)

        dq_full = _condensation_adjustment(T, q, p, lv)
        cond = jnp.maximum(dq_full, 0.0)

        # evaporation only below the critical RH, rate-limited toward
        # u00 and capped by both the cloud water and the saturation
        # deficit of the box
        room = jnp.maximum(-dq_full, 0.0)  # kg/kg the box can absorb
        evap_frac = jnp.where(
            rh < params.u00,
            jnp.clip(
                (params.u00 - rh)
                / params.u00
                * (dt / params.evap_timescale + 1.0),
                0.0,
                1.0,
            ),
            0.0,
        )
        evap = jnp.minimum(qc, room) * evap_frac

        dqc = cond - evap
        T = T + (lv / CP_AIR) * dqc
        q = q - dqc
        qc = qc + dqc
    return T, q, qc


def sundqvist_cloud_fraction(
    T, q, qc, p, params: MicrophysicsParams = MicrophysicsParams()
):
    """Diagnosed cloud fraction consistent with the gscond closure:
    ``b = 1 - sqrt((1-rh)/(1-u00))`` for rh > u00 (Sundqvist et al.
    1989), zeroed where there is no condensate (the GFS progcld-style
    diagnosis feeding the radiation's cloud optics)."""
    qsat = saturation_specific_humidity(T, p)
    rh = jnp.clip(q / jnp.maximum(qsat, 1e-12), 0.0, 1.0)
    arg = jnp.clip(
        (1.0 - rh) / jnp.maximum(1.0 - params.u00, 1e-6), 0.0, 1.0
    )
    b = 1.0 - jnp.sqrt(arg)
    return jnp.where(qc > 1e-8, b, 0.0)


def precpd(
    T, q, qc, p, delp, dt: float,
    params: MicrophysicsParams = MicrophysicsParams(),
):
    """Precipitation production + fall (the 'precpd' stage).

    Separate rain and snow fluxes: liquid cloud autoconverts/accretes to
    rain (Sundqvist form), ice cloud to snow (temperature-enhanced);
    snow melts where T > 0C consuming fusion heat; rain re-evaporates
    and snow sublimates in subsaturated layers during the fall.

    Returns (T, q, qc, precip_rate, snow_rate) with rates in kg/m^2/s;
    ``precip_rate`` is TOTAL (rain + snow reaching the surface).
    """
    fi = ice_fraction(T)
    qliq = (1.0 - fi) * qc
    qice = fi * qc

    # Sundqvist liquid autoconversion + accretion by the falling rain
    # proxy (scales with total condensate), limited by available water
    praut = (
        params.auto_conversion_rate
        * (1.0 - jnp.exp(-((qliq / params.qc_crit) ** 2)))
        + params.accretion_rate * qc
    ) * qliq
    # ice -> snow: faster when colder (Zhao-Carr psaut temperature form)
    cold = jnp.clip((T_FREEZE - T) / 15.0, 0.0, 2.0)
    psaut = (
        params.snow_auto_rate
        * (1.0 - jnp.exp(-((qice / params.qi_crit) ** 2)))
        * (1.0 + cold)
        + params.accretion_rate * qc
    ) * qice

    d_rain = jnp.minimum(praut * dt, qliq)
    d_snow = jnp.minimum(psaut * dt, qice)
    qc = qc - d_rain - d_snow

    lv = thermo.latent_heat_vaporization(T)
    ls = lv + LATENT_HEAT_FUSION
    qsat = saturation_specific_humidity(T, p)
    deficit = jnp.maximum(qsat - q, 0.0)
    dm = thermo.layer_mass(delp)
    warm = jnp.maximum(T - T_FREEZE, 0.0)
    cold = jnp.maximum(T_FREEZE - T, 0.0)
    melt_frac = jnp.minimum(
        dt / params.melt_timescale * warm / 2.0, 1.0
    )  # fraction of the snow flux melting in this layer
    frz_frac = jnp.minimum(
        dt / params.melt_timescale * cold / 2.0, 1.0
    )  # fraction of (supercooled) rain freezing in this layer

    def body(carry, xs):
        rain, snow = carry
        d_rain_k, d_snow_k, deficit_k, dm_k, melt_k, frz_k = xs
        rain = rain + d_rain_k * dm_k / dt
        snow = snow + d_snow_k * dm_k / dt
        # snow melt where the layer is above freezing (cools the layer);
        # supercooled rain freezes where below (warms the layer)
        melt = snow * melt_k
        frz = rain * frz_k
        snow = snow - melt + frz
        rain = rain + melt - frz
        # re-evaporation / sublimation in subsaturated air
        evap_r = jnp.minimum(params.evap_rate * deficit_k * dt * rain, rain)
        evap_s = jnp.minimum(params.sub_rate * deficit_k * dt * snow, snow)
        rain = rain - evap_r
        snow = snow - evap_s
        out = (
            evap_r * dt / dm_k,  # vapor added by rain evaporation
            evap_s * dt / dm_k,  # vapor added by snow sublimation
            (melt - frz) * dt / dm_k,  # net melted mass per layer mass
        )
        return (rain, snow), out

    xs = tuple(
        jnp.moveaxis(v, -1, 0)
        for v in (d_rain, d_snow, deficit, dm, melt_frac, frz_frac)
    )
    zero = jnp.zeros(T.shape[:-1], T.dtype)
    (rain_sfc, snow_sfc), (dq_evap, dq_sub, dmelt) = lax.scan(
        body, (zero, zero), xs
    )
    dq_evap = jnp.moveaxis(dq_evap, 0, -1)
    dq_sub = jnp.moveaxis(dq_sub, 0, -1)
    dmelt = jnp.moveaxis(dmelt, 0, -1)

    q = q + dq_evap + dq_sub
    T = (
        T
        - (lv / CP_AIR) * dq_evap
        - (ls / CP_AIR) * dq_sub
        - (LATENT_HEAT_FUSION / CP_AIR) * dmelt
    )
    return T, q, qc, rain_sfc + snow_sfc, snow_sfc


def microphysics_step(
    T, q, qc, p, delp, dt: float,
    params: MicrophysicsParams = MicrophysicsParams(),
) -> Tuple[jnp.ndarray, ...]:
    """Full Zhao-Carr step: gscond then precpd.

    Returns (T, q, qc, surface_precipitation_rate, snow_rate).
    """
    T, q, qc = gscond(T, q, qc, p, dt, params)
    return precpd(T, q, qc, p, delp, dt, params)
