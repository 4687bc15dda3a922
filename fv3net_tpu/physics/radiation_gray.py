"""Gray-gas radiation (Frierson et al. 2006 style), pure jnp.

Stand-in for the full RRTMG port (the reference's pure-Python RRTMG at
external/radiation/radiation/radiation_driver.py:17-380 is being ported
band-by-band into fv3net_tpu.physics.radiation in later rounds; this gray
scheme provides a physically reasonable radiative drive for the
end-to-end prognostic loop now, with the same call signature).

LW: two-stream gray gas with latitude-dependent optical depth
    tau = tau0(lat) * (f_l * sigma + (1 - f_l) * sigma^4).
SW: insolation with diurnal cycle via cos-zenith; optional uniform
    shortwave atmospheric absorption; the rest reaches the surface.

All arrays are (..., nz) columns, level 0 = top.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import (
    CP_AIR,
    GRAVITY,
    SOLAR_CONSTANT,
    STEFAN_BOLTZMANN,
)


@dataclasses.dataclass(frozen=True)
class GrayRadiationParams:
    tau_equator: float = 6.0
    tau_pole: float = 1.5
    linear_frac: float = 0.1  # f_l: linear-in-sigma fraction of tau
    sw_absorption: float = 0.1  # fraction of TOA SW absorbed uniformly (by mass)
    albedo: float = 0.27


def _lw_optical_depth(sigma_interface, lat, params):
    """tau at interfaces, (..., nz+1)."""
    tau0 = params.tau_equator + (params.tau_pole - params.tau_equator) * (
        jnp.sin(lat) ** 2
    )
    s = sigma_interface
    return tau0[..., None] * (
        params.linear_frac * s + (1.0 - params.linear_frac) * s ** 4
    )


def gray_radiation(
    T, delp, t_surface, cos_zenith, lat,
    params: GrayRadiationParams = GrayRadiationParams(),
    albedo=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Radiative heating rate [K/s] + flux diagnostics.

    Args:
        T: (..., nz) layer temperatures
        delp: (..., nz) layer thicknesses
        t_surface: (...) surface temperature
        cos_zenith: (...) cosine solar zenith angle (negative = night)
        lat: (...) latitude in radians
        albedo: optional (...) per-point surface albedo overriding the
            scalar parameter (the sea-ice albedo feedback)

    Returns:
        (heating_rate, diags) where diags holds the standard flux names
        used by the reference's derived variables (reference:
        external/vcm/vcm/derived_mapping.py:198-383):
        DSWRFtoa/DSWRFsfc/USWRFtoa/USWRFsfc/DLWRFsfc/ULWRFsfc/ULWRFtoa.
    """
    ps = delp.sum(axis=-1, keepdims=True)
    pe_frac = jnp.concatenate(
        [jnp.zeros_like(delp[..., :1]), jnp.cumsum(delp, axis=-1)], axis=-1
    )
    sigma_if = pe_frac / ps
    tau = _lw_optical_depth(sigma_if, lat, params)
    dtau = tau[..., 1:] - tau[..., :-1]
    trans = jnp.exp(-dtau)
    B = STEFAN_BOLTZMANN * T ** 4
    Bs = STEFAN_BOLTZMANN * t_surface ** 4

    # downward beam: D_0 = 0 at TOA; D_{k+1} = D_k * e^-dtau + B_k (1-e^-dtau)
    def down_body(D, xs):
        tr, b = xs
        D = D * tr + b * (1.0 - tr)
        return D, D

    zl = lambda x: jnp.moveaxis(x, -1, 0)
    D0 = jnp.zeros(T.shape[:-1], T.dtype)
    D_sfc, D_below = lax.scan(down_body, D0, (zl(trans), zl(B)))
    # downward flux at interfaces: [0, D_below...]
    D_if = jnp.concatenate(
        [D0[None], D_below], axis=0
    )  # (nz+1, ...) interface fluxes

    # upward: U at surface = sigma T_s^4; integrate upward
    def up_body(U, xs):
        tr, b = xs
        U = U * tr + b * (1.0 - tr)
        return U, U

    U_sfc = Bs
    _, U_above = lax.scan(up_body, U_sfc, (zl(trans), zl(B)), reverse=True)
    U_if = jnp.concatenate([U_above, U_sfc[None]], axis=0)

    # shortwave
    sw_toa = SOLAR_CONSTANT * jnp.maximum(cos_zenith, 0.0)
    absorbed = params.sw_absorption * sw_toa
    sw_sfc_down = (sw_toa - absorbed)
    alb = params.albedo if albedo is None else albedo
    sw_sfc_net = sw_sfc_down * (1.0 - alb)
    # distribute SW absorption by mass
    sw_heat = (
        absorbed[..., None] * (delp / ps) * GRAVITY / (CP_AIR * delp)
    )

    # LW heating: dT/dt = g/cp * d(U - D)/dp
    Fnet = jnp.moveaxis(U_if - D_if, 0, -1)  # (..., nz+1), top..surface
    lw_heat = (GRAVITY / CP_AIR) * (Fnet[..., 1:] - Fnet[..., :-1]) / delp

    heating = lw_heat + sw_heat
    diags = {
        "DSWRFtoa": sw_toa,
        "DSWRFsfc": sw_sfc_down,
        "USWRFtoa": (sw_toa - absorbed) * alb,
        "USWRFsfc": sw_sfc_down * alb,
        "DLWRFsfc": jnp.moveaxis(D_if, 0, -1)[..., -1],
        "ULWRFsfc": Bs,
        "ULWRFtoa": jnp.moveaxis(U_if, 0, -1)[..., 0],
        "net_surface_shortwave": sw_sfc_net,
    }
    return heating, diags
