"""Column thermodynamics, pure jnp.

TPU-first re-design of the reference's thermodynamics kernel library
(reference: external/vcm/vcm/calc/thermo/local.py:21-340,
vertically_dependent.py:18-335, non_negative_sphum.py:6-39).  Differences
from the reference by design:

- raw ``jnp`` arrays instead of xarray; the vertical axis is a positional
  axis (default: last) so every function is trivially batchable/vmappable
  and fuses under jit,
- interface quantities are returned as arrays one longer along the z axis,
- no dask/chunk handling: XLA owns scheduling.

All formulas and constants match the reference so float64 parity tests
agree bit-for-bit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from fv3net_tpu.ops import zscan

from fv3net_tpu.core.constants import (
    CP_AIR,
    CV_AIR,
    EARTH_RADIUS,
    FREEZING_TEMPERATURE,
    DEFAULT_SURFACE_TEMPERATURE,
    GRAVITY,
    KG_M2_TO_MM,
    KG_M2S_TO_MM_DAY,
    LATENT_HEAT_FUSION,
    LATENT_HEAT_VAPORIZATION_0_C,
    POISSON_CONST,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE,
    RVGAS,
    SEC_PER_DAY,
    SPECIFIC_ENTHALPY_LIQUID,
    SPECIFIC_ENTHALPY_VAPOR,
    TOA_PRESSURE,
)

# ---------------------------------------------------------------------------
# pointwise (local) thermodynamics — reference local.py
# ---------------------------------------------------------------------------


def potential_temperature(pressure, temperature):
    """theta = T * (p0 / p)^kappa (reference local.py:21)."""
    return temperature * (REFERENCE_SURFACE_PRESSURE / pressure) ** POISSON_CONST


def temperature_from_potential_temperature(pressure, theta):
    return theta * (pressure / REFERENCE_SURFACE_PRESSURE) ** POISSON_CONST


def latent_heat_vaporization(temperature):
    """Temperature-dependent Lv (reference local.py:25)."""
    return LATENT_HEAT_VAPORIZATION_0_C + (
        SPECIFIC_ENTHALPY_LIQUID - SPECIFIC_ENTHALPY_VAPOR
    ) * (temperature - FREEZING_TEMPERATURE)


def saturation_pressure(temperature):
    """August-Roche-Magnus saturation vapor pressure (reference local.py:211)."""
    tc = temperature - 273.15
    return 610.94 * jnp.exp(17.625 * tc / (tc + 243.04))


def relative_humidity(temperature, specific_humidity, density):
    """RH from T, q, rho (reference local.py:230)."""
    partial_pressure = RVGAS * specific_humidity * density * temperature
    return partial_pressure / saturation_pressure(temperature)


def relative_humidity_from_pressure(temperature, specific_humidity, pressure):
    """RH from T, q, p — Wallace & Hobbs Eq 3.59 (reference local.py:246)."""
    mixing_ratio = specific_humidity / (1 - specific_humidity)
    partial_pressure = pressure * mixing_ratio / (mixing_ratio + RDGAS / RVGAS)
    return partial_pressure / saturation_pressure(temperature)


def specific_humidity_from_rh(temperature, rh, density):
    """q from T, RH, rho (reference local.py:266)."""
    partial_pressure = rh * saturation_pressure(temperature)
    return partial_pressure / RVGAS / density / temperature


def density(delp, delz):
    """rho = |delp / delz / g| (reference local.py:284)."""
    return jnp.abs(delp / delz / GRAVITY)


def pressure_thickness(rho, delz):
    """delp = |rho * delz * g| (reference local.py:298)."""
    return jnp.abs(rho * delz * GRAVITY)


def layer_mass(delp):
    """kg/m^2 per layer (reference local.py:312)."""
    return delp / GRAVITY


def internal_energy(temperature):
    """c_v * T (reference local.py:195)."""
    return CV_AIR * temperature


def moist_static_energy_tendency(
    dT_dt, dq_dt, temperature=FREEZING_TEMPERATURE
):
    """c_v*dT/dt + Lv(T)*dq/dt, W/kg (reference local.py:317)."""
    return CV_AIR * dT_dt + latent_heat_vaporization(temperature) * dq_dt


def temperature_tendency(mse_tendency, dq_dt, temperature=FREEZING_TEMPERATURE):
    """Invert moist_static_energy_tendency for dT/dt (reference local.py:340)."""
    return (mse_tendency - latent_heat_vaporization(temperature) * dq_dt) / CV_AIR


def net_heating(
    dlw_sfc,
    dsw_sfc,
    ulw_sfc,
    ulw_toa,
    usw_sfc,
    usw_toa,
    dsw_toa,
    shf,
    surface_rain_rate,
    surface_temperature=FREEZING_TEMPERATURE + 10,
):
    """Net column heating from physics, W/m^2 (reference local.py:31)."""
    lv = latent_heat_vaporization(surface_temperature)
    return (
        -dlw_sfc
        - dsw_sfc
        + ulw_sfc
        - ulw_toa
        + usw_sfc
        - usw_toa
        + dsw_toa
        + shf
        + surface_rain_rate * lv
    )


def latent_heat_flux_to_evaporation(
    lhf, surface_temperature=DEFAULT_SURFACE_TEMPERATURE
):
    """Evaporation kg/m^2/s from latent heat flux (reference local.py:69)."""
    return lhf / latent_heat_vaporization(surface_temperature)


def surface_evaporation_mm_day_from_latent_heat_flux(latent_heat_flux):
    """Surface evaporation in mm/day (reference local.py:85)."""
    return KG_M2S_TO_MM_DAY * latent_heat_flux_to_evaporation(latent_heat_flux)


def net_precipitation(lhf, prate):
    """(P - E) in mm/day (reference local.py:107)."""
    return (prate - latent_heat_flux_to_evaporation(lhf)) * SEC_PER_DAY


def total_water(sphum, ice_water, liquid_water, rain_water, snow_water, graupel_water):
    """Total water species mixing ratio (reference local.py:113)."""
    return sphum + ice_water + liquid_water + rain_water + snow_water + graupel_water


def liquid_ice_temperature(
    temperature, ice_water, liquid_water, rain_water, snow_water, graupel_water
):
    """T_LI = T - Lv/cp (ql+qr) - (Lv+Lf)/cp (qi+qs+qg) (reference local.py:150)."""
    lv = latent_heat_vaporization(temperature)
    liquid_adjustment = (lv / CP_AIR) * (rain_water + liquid_water)
    ice_adjustment = ((lv + LATENT_HEAT_FUSION) / CP_AIR) * (
        ice_water + snow_water + graupel_water
    )
    return temperature - liquid_adjustment - ice_adjustment


# ---------------------------------------------------------------------------
# vertically dependent — reference vertically_dependent.py
# The vertical axis is `axis` (default -1, i.e. columns innermost).
# Level 0 is the model top, level nz-1 the surface, matching FV3.
# ---------------------------------------------------------------------------


def mass_integrate(field, delp, axis: int = -1):
    """Mass-weighted vertical integral, sum(f * delp / g) (reference v.d.py:18)."""
    return jnp.sum(field * delp / GRAVITY, axis=axis)


def mass_cumsum(field, delp, axis: int = -1):
    """Mass-weighted cumulative sum (reference v.d.py:25)."""
    return jnp.cumsum(field * delp / GRAVITY, axis=axis)


def mass_divergence(field_interface, delp, axis: int = -1):
    """g * d(field)/dp from an interface array (reference v.d.py:30)."""
    return GRAVITY * jnp.diff(field_interface, axis=axis) / delp


def pressure_at_interface(delp, toa_pressure: float = TOA_PRESSURE, axis: int = -1):
    """Interface pressures: [p_toa, p_toa+cumsum(delp)] (reference v.d.py:41).

    Returns an array one longer than ``delp`` along ``axis``.
    """
    ptop_shape = list(delp.shape)
    ax = axis % delp.ndim
    ptop_shape[ax] = 1
    top = jnp.full(ptop_shape, toa_pressure, dtype=delp.dtype)
    return zscan.cumsum(jnp.concatenate([top, delp], axis=ax), axis=ax)


def pressure_at_midpoint(delp, toa_pressure: float = TOA_PRESSURE, axis: int = -1):
    """Midpoint pressure by linear interpolation of interfaces (v.d.py:111)."""
    pi = pressure_at_interface(delp, toa_pressure, axis)
    return _interface_to_midpoint(pi, axis)


def pressure_at_midpoint_log(delp, toa_pressure: float = TOA_PRESSURE, axis: int = -1):
    """Simmons & Burridge (1981) Eq 3.17: delp / dlog(p) (reference v.d.py:153)."""
    pi = pressure_at_interface(delp, toa_pressure, axis)
    dlogp = jnp.diff(jnp.log(pi), axis=axis)
    return delp / dlogp


def _interface_to_midpoint(field_interface, axis: int = -1):
    ax = axis % field_interface.ndim
    lo = jnp.take(
        field_interface, jnp.arange(field_interface.shape[ax] - 1), axis=ax
    )
    hi = jnp.take(
        field_interface, jnp.arange(1, field_interface.shape[ax]), axis=ax
    )
    return (lo + hi) / 2


def height_at_interface(dz, phis, axis: int = -1):
    """Interface heights from (negative) layer thicknesses + sfc geopotential.

    (reference v.d.py:69 — dz is negative in the model; bottom interface is
    phis / g; cumulative sum upward.)  Returns array one longer along axis.
    """
    ax = axis % dz.ndim
    bottom = jnp.expand_dims(phis / GRAVITY, ax)
    bottom = jnp.broadcast_to(
        bottom, tuple(1 if i == ax else s for i, s in enumerate(dz.shape))
    )
    dzv = -jnp.flip(dz, axis=ax)
    stacked = jnp.concatenate([jnp.asarray(bottom, dz.dtype), dzv], axis=ax)
    return jnp.flip(jnp.cumsum(stacked, axis=ax), axis=ax)


def height_at_midpoint(dz, phis, axis: int = -1):
    """Midpoint heights (reference v.d.py:129)."""
    return _interface_to_midpoint(height_at_interface(dz, phis, axis), axis)


def dz_and_top_to_phis(top_height, dz, axis: int = -1):
    """phis = g * (top_height + sum dz) (reference v.d.py:182)."""
    return GRAVITY * (top_height + jnp.sum(dz, axis=axis))


def surface_pressure_from_delp(delp, p_toa: float = 300.0, axis: int = -1):
    """ps = sum(delp) + p_toa (reference v.d.py:189)."""
    return jnp.sum(delp, axis=axis) + p_toa


def virtual_temperature(temperature, specific_humidity):
    """Tv = T (1 + (Rv/Rd - 1) q)."""
    return temperature * (1 + (RVGAS / RDGAS - 1) * specific_humidity)


def hydrostatic_dz(T, q, delp, toa_pressure: float = TOA_PRESSURE, axis: int = -1):
    """dz = -dlog(p) Rd Tv / g (reference v.d.py:211); negative like FV3."""
    pi = pressure_at_interface(delp, toa_pressure, axis)
    dlogp = jnp.diff(jnp.log(pi), axis=axis)
    tv = virtual_temperature(T, q)
    return -dlogp * RDGAS * tv / GRAVITY


def column_integrated_liquid_water_equivalent(sphum, delp, axis: int = -1):
    """Precipitable water in mm (reference v.d.py:238)."""
    return KG_M2_TO_MM * mass_integrate(sphum, delp, axis)


def column_integrated_heating_from_isobaric_transition(dT_dt, delp, axis: int = -1):
    """cp-weighted column heating, W/m^2 (reference v.d.py:262)."""
    return CP_AIR * mass_integrate(dT_dt, delp, axis)


def column_integrated_heating_from_isochoric_transition(dT_dt, delp, axis: int = -1):
    """cv-weighted column heating, W/m^2 (reference v.d.py:286)."""
    return CV_AIR * mass_integrate(dT_dt, delp, axis)


def minus_column_integrated_moistening(dq_dt, delp, axis: int = -1):
    """-<dq/dt> in mm/day (reference v.d.py:310)."""
    return -KG_M2S_TO_MM_DAY * mass_integrate(dq_dt, delp, axis)


def mass_streamfunction(v_zonal_mean, pressure, lat_deg, axis: int = -1):
    """Meridional mass streamfunction psi(lat, p) in 1e9 kg/s
    (reference v.d.py:335): psi = 2 pi a cos(lat)/g * int_0^p v dp',
    integrating from the model top.

    Args:
        v_zonal_mean: zonal-mean northward wind with the pressure axis at
            ``axis``.
        pressure: 1-D pressure coordinate [Pa] along that axis.
        lat_deg: latitudes broadcastable against the non-pressure axes.
    """
    pressure = jnp.asarray(pressure)
    dp = jnp.gradient(pressure)
    shape = [1] * v_zonal_mean.ndim
    ax = axis % v_zonal_mean.ndim
    shape[ax] = len(dp)
    integrand = v_zonal_mean * dp.reshape(shape)
    psi = jnp.cumsum(integrand, axis=ax) * (
        2 * jnp.pi * EARTH_RADIUS / GRAVITY
    )
    lat = jnp.deg2rad(jnp.asarray(lat_deg))
    return psi * jnp.cos(lat) / 1e9


# ---------------------------------------------------------------------------
# humidity limiters — reference non_negative_sphum.py
# ---------------------------------------------------------------------------


def non_negative_sphum(sphum, dQ1, dQ2, dt: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale (dQ1, dQ2) where the moistening would drive q negative
    (reference non_negative_sphum.py:6)."""
    delta = dQ2 * dt
    reduction_ratio = (-sphum) / (dt * dQ2)
    ok = sphum + delta >= 0
    return jnp.where(ok, dQ1, reduction_ratio * dQ1), jnp.where(
        ok, dQ2, reduction_ratio * dQ2
    )


def update_moisture_tendency_to_ensure_non_negative_humidity(sphum, q2, dt: float):
    """(reference non_negative_sphum.py:16)"""
    return jnp.where(sphum + q2 * dt >= 0, q2, -sphum / dt)


def update_temperature_tendency_to_conserve_mse(q1, q2_old, q2_new):
    """(reference non_negative_sphum.py:22)"""
    mse = moist_static_energy_tendency(q1, q2_old)
    return temperature_tendency(mse, q2_new)


def non_negative_sphum_mse_conserving(
    sphum, q2, dt: float, q1: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """MSE-conserving humidity limiter used by PureMLStepper
    (reference non_negative_sphum.py:30)."""
    q2_new = update_moisture_tendency_to_ensure_non_negative_humidity(sphum, q2, dt)
    q1_new = (
        update_temperature_tendency_to_conserve_mse(q1, q2, q2_new)
        if q1 is not None
        else None
    )
    return q2_new, q1_new
