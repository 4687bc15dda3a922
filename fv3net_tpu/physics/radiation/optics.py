"""Optical-property builders for the RRTMG-structured solvers.

Covers the reference's taumol (radlw_main.py:1492+ / radsw_main.py band
loops), cldprop (radlw_main.py cloud properties; radiation_clouds.py
prep), aerosol optics (radiation_aerosols.py) and surface albedo
(radiation_sfc.py) — re-designed TPU-first:

- gas optical depth is ONE [ncol*nlay, ngas] x [ngas, ngpt] matmul
  (closed-form pressure/temperature scaling; no table gathers),
- McICA cloud subcolumns use a `lax.scan` maximum-random overlap
  generator over layers with jax PRNG deviates,
- everything is batched over columns and g-points; no Python loops.

Shapes: columns [ncol, nlay] in, [ncol, ngpt, nlay] out; level 0 = top.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import GRAVITY
from fv3net_tpu.physics.radiation import params as P
from fv3net_tpu.physics.radiation import spectra


class GasOptics(NamedTuple):
    """Device-resident spectral data (built once from spectra.KDist)."""

    weight: jnp.ndarray      # [ngas, ngpt] combined major+minor k map
    k_self_gpt: jnp.ndarray  # [ngpt] h2o e-type continuum
    p_exp: jnp.ndarray       # [ngas]
    t_coef: jnp.ndarray      # [ngas]
    gwt: jnp.ndarray         # [ngpt]
    band_of_gpt: jnp.ndarray  # [ngpt] int32
    nbands: int


def build_gas_optics(kd: spectra.KDist, nbands: int) -> GasOptics:
    ngpt = kd.kmaj.shape[0]
    weight = np.zeros((P.NGAS, ngpt))
    for g in range(ngpt):
        b = kd.band_of_gpt[g]
        weight[:, g] = kd.kminor[b]
        weight[kd.major_gas[g], g] += kd.kmaj[g]
    return GasOptics(
        weight=jnp.asarray(weight, jnp.float32),
        k_self_gpt=jnp.asarray(kd.k_self[kd.band_of_gpt], jnp.float32),
        p_exp=jnp.asarray(kd.p_exp, jnp.float32),
        t_coef=jnp.asarray(kd.t_coef, jnp.float32),
        gwt=jnp.asarray(kd.gwt, jnp.float32),
        band_of_gpt=jnp.asarray(kd.band_of_gpt, jnp.int32),
        nbands=nbands,
    )


def gas_optical_depth(go: GasOptics, play, tlay, dp, mmr: dict) -> jnp.ndarray:
    """tau [ncol, ngpt, nlay] from layer state + gas mass mixing ratios.

    mmr must hold every gas in params.GASES ("h2o" is specific humidity).
    """
    u = jnp.stack([mmr[g] for g in P.GASES], axis=-1) * (
        dp[..., None] / GRAVITY
    )  # [ncol, nlay, ngas] column mass paths
    scale = (play[..., None] / spectra.P_REF) ** go.p_exp * jnp.exp(
        go.t_coef * (tlay[..., None] - spectra.T_REF)
    )
    tau = jnp.einsum("lzn,ng->lgz", u * scale, go.weight)
    # h2o e-type self continuum: scaled by vapor pressure
    q = mmr["h2o"]
    e = q * play / (0.622 + 0.378 * q)  # Pa
    tau_self = (u[..., 0] * e / 1000.0)[:, None, :] * go.k_self_gpt[None, :, None]
    return tau + tau_self


def rayleigh_tau(dp) -> jnp.ndarray:
    """SW Rayleigh scattering tau [ncol, nbands_sw, nlay] (per-band
    Hansen-Travis column fit scaled by the layer mass fraction)."""
    coeff = jnp.asarray(spectra.rayleigh_band_coeff(), jnp.float32)
    return coeff[None, :, None] * (dp[:, None, :] / 101325.0)


# ---------------------------------------------------------------- clouds
class CloudOptics(NamedTuple):
    tau_lw: jnp.ndarray   # [ncol, nbands_lw, nlay] in-cloud absorption
    tau_sw: jnp.ndarray   # [ncol, nbands_sw, nlay] in-cloud extinction
    ssa_sw: jnp.ndarray   # [ncol, nbands_sw, nlay]
    asy_sw: jnp.ndarray   # [ncol, nbands_sw, nlay]
    cldfrac: jnp.ndarray  # [ncol, nlay]


# single-scattering co-albedo per SW band (NIR bands absorb, visible ~none)
_SW_LAM_UM = 1.0e4 / np.sqrt(P.WVN1_SW * P.WVN2_SW)
_LIQ_COALB = np.where(_SW_LAM_UM > 1.0, 6.0e-3, 1.0e-6)
_ICE_COALB = np.where(_SW_LAM_UM > 1.0, 1.2e-2, 2.0e-6)


def cloud_optics(lwp, iwp, re_liq, re_ice, cldfrac) -> CloudOptics:
    """In-cloud optical properties from water paths [g/m^2] and effective
    radii [um] (liquid: geometric-optics tau=3/2 * LWP/re after Hu &
    Stamnes 1993; ice after Ebert & Curry 1992 / Fu 1996 coefficient
    forms; reference: radiation_clouds.py + radlw/radsw cldprop)."""
    tau_liq_sw = lwp * (0.02 + 1.5 / re_liq)
    tau_ice_sw = iwp * (0.003448 + 2.431 / re_ice)
    tau_liq_lw = lwp * 0.09
    tau_ice_lw = iwp * (0.002 + 1.2 / re_ice)
    nb_lw, nb_sw = P.NBANDS_LW, P.NBANDS_SW
    ncol, nlay = lwp.shape
    tau_lw = jnp.broadcast_to(
        (tau_liq_lw + tau_ice_lw)[:, None, :], (ncol, nb_lw, nlay)
    )
    tau_sw = jnp.broadcast_to(
        (tau_liq_sw + tau_ice_sw)[:, None, :], (ncol, nb_sw, nlay)
    )
    coalb = (
        tau_liq_sw[:, None, :] * jnp.asarray(_LIQ_COALB, jnp.float32)[None, :, None]
        + tau_ice_sw[:, None, :] * jnp.asarray(_ICE_COALB, jnp.float32)[None, :, None]
    )
    ssa_sw = 1.0 - coalb / jnp.maximum(tau_sw, 1e-12)
    asy = (tau_liq_sw[:, None, :] * 0.85 + tau_ice_sw[:, None, :] * 0.80) / (
        jnp.maximum(tau_sw, 1e-12)
    )
    return CloudOptics(tau_lw, tau_sw, jnp.clip(ssa_sw, 0.0, 1.0),
                       jnp.clip(asy, 0.0, 1.0), cldfrac)


def mcica_subcolumns(cldfrac, ngpt: int, key, iovr: int = 1) -> jnp.ndarray:
    """Binary cloud mask [ncol, ngpt, nlay].

    ``iovr=1``: maximum-random overlap (the reference's default) —
    adjacent cloudy layers share a deviate, layers separated by clear air
    re-draw.  ``iovr=0``: pure random overlap (independent deviates per
    layer).  The reference threads `rand2d_data` into radlw/radsw for
    McICA (radlw_main.py lwrad rand2d_data arg); here the deviates come
    from the jax PRNG and the overlap recursion is a `lax.scan` down the
    column.
    """
    ncol, nlay = cldfrac.shape
    u = jax.random.uniform(key, (nlay, ncol, ngpt), jnp.float32)
    cf = jnp.moveaxis(cldfrac, -1, 0)[:, :, None]  # [nlay, ncol, 1]

    if iovr == 0:  # random overlap: independent per layer
        return jnp.moveaxis(u < cf, 0, -1)

    def body(x_prev, inp):
        u_k, cf_prev, cf_k = inp
        x = jnp.where(x_prev > (1.0 - cf_prev), x_prev, u_k * (1.0 - cf_prev))
        return x, x > (1.0 - cf_k)

    cf_prev = jnp.concatenate([jnp.zeros_like(cf[:1]), cf[:-1]], axis=0)
    _, cloudy = jax.lax.scan(body, u[0] * 0.0, (u, cf_prev, cf))
    return jnp.moveaxis(cloudy, 0, -1)  # [ncol, ngpt, nlay] bool


# --------------------------------------------------------------- aerosols
def aerosol_optics(play, dp, land_frac):
    """Boundary-layer aerosol climatology (reference:
    radiation_aerosols.py, 2480 LoC of climatological maps — collapsed to
    a land/ocean AOD with an Angstrom-law spectral slope).

    Returns (tau, ssa, asy) per SW band: [ncol, nbands_sw, nlay].
    """
    aod550 = 0.12 * land_frac + 0.06 * (1.0 - land_frac)  # [ncol]
    w = dp * (play > 7.0e4)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1.0)  # [ncol, nlay]
    spectral = jnp.asarray((_SW_LAM_UM / 0.55) ** -1.3, jnp.float32)
    tau = aod550[:, None, None] * spectral[None, :, None] * w[:, None, :]
    return tau, jnp.full_like(tau, 0.95), jnp.full_like(tau, 0.70)


# ---------------------------------------------------------------- surface
_SW_IS_VIS = jnp.asarray(_SW_LAM_UM < 0.7, jnp.float32)  # [nbands_sw]


def surface_albedo(cosz, land_frac, ice_frac=None):
    """Per-band direct/diffuse albedo [ncol, nbands_sw] (reference:
    radiation_sfc.py setalb; ocean direct albedo after Briegleb 1992,
    bare sea-ice albedos on the icy part of the ocean fraction)."""
    mu = jnp.maximum(cosz, 0.01)
    ocean_dir = 0.026 / (mu ** 1.7 + 0.065) + 0.15 * (mu - 0.1) * (
        mu - 0.5
    ) * (mu - 1.0)
    ocean_dif = jnp.full_like(cosz, 0.06)
    land_vis, land_nir = 0.18, 0.30
    land_alb = land_vis * _SW_IS_VIS + land_nir * (1.0 - _SW_IS_VIS)  # [nb]
    if ice_frac is not None:
        ice_vis, ice_nir = 0.73, 0.33  # GFS-like bare sea ice
        ice_alb = ice_vis * _SW_IS_VIS + ice_nir * (1.0 - _SW_IS_VIS)
        fi = ice_frac[:, None]
        sea_dir = fi * ice_alb[None, :] + (1.0 - fi) * ocean_dir[:, None]
        sea_dif = fi * ice_alb[None, :] + (1.0 - fi) * ocean_dif[:, None]
    else:
        sea_dir = ocean_dir[:, None]
        sea_dif = ocean_dif[:, None]
    dir_alb = (
        land_frac[:, None] * land_alb[None, :]
        + (1.0 - land_frac)[:, None] * sea_dir
    )
    dif_alb = (
        land_frac[:, None] * land_alb[None, :]
        + (1.0 - land_frac)[:, None] * sea_dif
    )
    return jnp.clip(dir_alb, 0.0, 1.0), jnp.clip(dif_alb, 0.0, 1.0)


def surface_emissivity(land_frac):
    """Broadband LW emissivity (radiation_sfc.py setemis)."""
    return 0.97 * land_frac + 0.984 * (1.0 - land_frac)
