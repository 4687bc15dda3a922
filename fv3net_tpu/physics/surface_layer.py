"""Monin-Obukhov surface layer: stability-dependent exchange coefficients.

The GFS-fidelity replacement for the constant-coefficient bulk scheme in
``physics/surface.py`` (reference: the Fortran model's ``sfc_diff``/
``sfc_ocean`` stage behind ``wrapper.apply_physics``; its outputs feed
the same LHTFLsfc/SHTFLsfc diagnostic names, reference
workflows/prognostic_c48_run/runtime/diagnostics/compute.py:183-290).

Design (TPU): everything is batched elementwise algebra over all
6*ny*nx columns — no iteration-to-convergence per point; the Obukhov
similarity system is solved with a FIXED unrolled iteration count (3),
which XLA fully fuses.  Businger-Dyer stability functions, bulk
Richardson initial guess, and Charnock ocean roughness closed against
u*.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from fv3net_tpu.core.constants import CP_AIR, GRAVITY, RDGAS, RVGAS
from fv3net_tpu.ops import thermo
from fv3net_tpu.physics.microphysics import saturation_specific_humidity

VONKARMAN = 0.4
ZVIR = RVGAS / RDGAS - 1.0  # ~0.608


@dataclasses.dataclass(frozen=True)
class SurfaceLayerParams:
    charnock: float = 0.014  # Charnock constant for ocean z0
    z0_land: float = 0.1  # m, roughness over land (vegetated default)
    z0_min: float = 1e-5  # m, smooth-ocean floor
    z0_max: float = 1.0  # m
    gustiness: float = 1.0  # m/s floor on wind speed
    n_iter: int = 3  # unrolled M-O fixed-point iterations
    zeta_min: float = -10.0  # unstable clamp on z/L
    zeta_max: float = 2.0  # stable clamp on z/L
    ocean_evaporation_factor: float = 1.0


def _psi_functions(zeta):
    """Integrated Businger-Dyer profile corrections psi_m, psi_h.

    Unstable (zeta<0): x = (1-16 zeta)^(1/4),
      psi_m = 2 ln((1+x)/2) + ln((1+x^2)/2) - 2 atan(x) + pi/2
      psi_h = 2 ln((1+x^2)/2)
    Stable: psi_m = psi_h = -5 zeta.
    """
    x = (1.0 - 16.0 * jnp.minimum(zeta, 0.0)) ** 0.25
    psi_m_un = (
        2.0 * jnp.log((1.0 + x) / 2.0)
        + jnp.log((1.0 + x * x) / 2.0)
        - 2.0 * jnp.arctan(x)
        + jnp.pi / 2.0
    )
    psi_h_un = 2.0 * jnp.log((1.0 + x * x) / 2.0)
    psi_st = -5.0 * jnp.maximum(zeta, 0.0)
    unstable = zeta < 0.0
    psi_m = jnp.where(unstable, psi_m_un, psi_st)
    psi_h = jnp.where(unstable, psi_h_un, psi_st)
    return psi_m, psi_h


def monin_obukhov_fluxes(
    t_air, q_air, p_sfc, delp_sfc, wind_speed, t_surface,
    params: SurfaceLayerParams = SurfaceLayerParams(),
    land_frac=None,
    evap_factor=None,
) -> Dict[str, jnp.ndarray]:
    """Surface fluxes with Monin-Obukhov similarity.

    Returns the ``bulk_surface_fluxes`` dict plus similarity outputs the
    K-profile PBL needs: ``ustar`` [m/s], ``obukhov_inv`` [1/m] (1/L,
    signed), ``hpbl_flux`` = kinematic virtual heat flux w'thv' [K m/s].
    """
    k = VONKARMAN
    rho = p_sfc / (RDGAS * t_air)
    v = jnp.maximum(wind_speed, params.gustiness)
    # lowest-midpoint height above the surface from the hypsometric layer
    # half-thickness
    tv_air = t_air * (1.0 + ZVIR * q_air)
    z1 = 0.5 * RDGAS * tv_air * delp_sfc / (p_sfc * GRAVITY)
    z1 = jnp.maximum(z1, 2.0)

    qsat_s = saturation_specific_humidity(t_surface, p_sfc)
    tv_sfc = t_surface * (1.0 + ZVIR * qsat_s)
    dthv = tv_air - tv_sfc  # >0 stable, <0 unstable (theta ~ T near sfc)

    # bulk Richardson number initial stability guess
    rib = GRAVITY * z1 * dthv / (0.5 * (tv_air + tv_sfc) * v * v)
    rib = jnp.clip(rib, -10.0, 0.2)

    land = jnp.zeros_like(v) if land_frac is None else land_frac
    # neutral first guess for u* with a smooth-ocean roughness
    z0 = jnp.full_like(v, 1e-4) * (1.0 - land) + params.z0_land * land
    # zeta first guess from Rib (Grachev-Fairall style linearization)
    zeta = jnp.where(rib < 0.0, rib * 2.0, rib / (1.0 - 5.0 * rib + 1e-6))
    zeta = jnp.clip(zeta, params.zeta_min, params.zeta_max)

    for _ in range(params.n_iter):
        psi_m, psi_h = _psi_functions(zeta)
        ln_m = jnp.log(z1 / z0)
        # scalar roughness: over ocean z0h << z0m (viscous sublayer);
        # take z0h = z0m/10 everywhere (GFS uses a u*-dependent law)
        ln_h = jnp.log(z1 / (0.1 * z0))
        cm_sqrt = k / jnp.maximum(ln_m - psi_m, 0.1)
        ustar = cm_sqrt * v
        ch = k * cm_sqrt / jnp.maximum(ln_h - psi_h, 0.1)
        # virtual heat flux and Obukhov length
        wthv = -ch * v * dthv  # [K m/s], >0 when surface heats the air
        lmo_inv = -k * GRAVITY * wthv / (
            jnp.maximum(ustar, 0.05) ** 3 * tv_air
        )
        zeta = jnp.clip(z1 * lmo_inv, params.zeta_min, params.zeta_max)
        # Charnock closure over ocean
        z0_oc = jnp.clip(
            params.charnock * ustar * ustar / GRAVITY + 1.1e-5,
            params.z0_min, params.z0_max,
        )
        z0 = z0_oc * (1.0 - land) + params.z0_land * land

    psi_m, psi_h = _psi_functions(zeta)
    ln_m = jnp.log(z1 / z0)
    ln_h = jnp.log(z1 / (0.1 * z0))
    cm = (k / jnp.maximum(ln_m - psi_m, 0.1)) ** 2
    ch = k * k / (
        jnp.maximum(ln_m - psi_m, 0.1) * jnp.maximum(ln_h - psi_h, 0.1)
    )
    ustar = jnp.sqrt(cm) * v

    shf = rho * CP_AIR * ch * v * (t_surface - t_air)
    evap = (
        params.ocean_evaporation_factor
        * rho * ch * v * jnp.maximum(qsat_s - q_air, 0.0)
    )
    if evap_factor is not None:
        evap = evap * evap_factor
    lv = thermo.latent_heat_vaporization(t_surface)
    mass_sfc = delp_sfc / GRAVITY
    wthv = ch * v * (-dthv) + ZVIR * 0.5 * (tv_air + tv_sfc) * (
        evap / rho
    )
    lmo_inv = -VONKARMAN * GRAVITY * wthv / (
        jnp.maximum(ustar, 0.05) ** 3 * tv_air
    )
    return {
        "SHTFLsfc": shf,
        "LHTFLsfc": lv * evap,
        "evaporation": evap,
        "drag_factor": rho * cm * v / mass_sfc,
        "ustar": ustar,
        "obukhov_inv": lmo_inv,
        "hpbl_flux": wthv,
        "z1": z1,
    }
