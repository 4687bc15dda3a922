"""RRTMG-structured shortwave solver (reference:
external/radiation/radiation/radsw/radsw_main.py swrad + spcvrtm —
delta-scaled two-stream with PIFM/Meador-Weaver coefficients and an
adding method over layers, McICA cloud overlap).

TPU design: per-g-point layer reflectance/transmittance are elementwise
transcendentals on [nlay, ncol, ngpt] tensors; the direct beam is one
cumsum+exp; the adding method is two `lax.scan`s (bottom-up albedo/source
accumulation, top-down flux resolution). No data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import CP_AIR, GRAVITY


class SWFluxes(NamedTuple):
    up: jnp.ndarray       # [ncol, nlev]
    dn: jnp.ndarray       # [ncol, nlev] total (direct + diffuse)
    dn_dir: jnp.ndarray   # [ncol, nlev] direct beam
    htr: jnp.ndarray      # [ncol, nlay] K/s


def delta_scale(tau, ssa, g):
    """Delta-Eddington scaling of the forward peak (f = g^2)."""
    f = g * g
    wf = ssa * f
    tau_s = (1.0 - wf) * tau
    ssa_s = (ssa - wf) / jnp.maximum(1.0 - wf, 1e-12)
    g_s = (g - f) / jnp.maximum(1.0 - f, 1e-12)
    return tau_s, ssa_s, g_s


def two_stream(tau, ssa, g, mu0):
    """PIFM two-stream layer coefficients (Zdunkowski 1980 gammas in the
    Meador & Weaver 1980 solution, the radsw_main.py spcvrtm scheme).

    All inputs [..., broadcastable]; mu0 > 0 assumed (masked by caller).
    Returns (rdif, tdif, rdir, tdir, t0): diffuse reflectance and
    transmittance, direct-to-diffuse upward/downward conversion, and the
    surviving direct-beam transmittance.
    """
    w = jnp.clip(ssa, 0.0, 1.0 - 1e-6)
    g1 = (8.0 - w * (5.0 + 3.0 * g)) * 0.25
    g2 = 3.0 * (w * (1.0 - g)) * 0.25
    g3 = (2.0 - 3.0 * mu0 * g) * 0.25
    g4 = 1.0 - g3

    k = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), 1e-12))
    e1 = jnp.exp(-jnp.minimum(k * tau, 80.0))
    e2 = e1 * e1
    rt = 1.0 / (k * (1.0 + e2) + g1 * (1.0 - e2))
    rdif = rt * g2 * (1.0 - e2)
    tdif = rt * 2.0 * k * e1

    t0 = jnp.exp(-jnp.minimum(tau / mu0, 80.0))
    k_mu = k * mu0
    # resonance guard at k*mu0 -> 1
    d = 1.0 - k_mu * k_mu
    d = jnp.where(jnp.abs(d) < 1e-4, jnp.where(d < 0, -1e-4, 1e-4), d)
    rt_dir = w * rt / d
    a1 = g1 * g4 + g2 * g3
    a2 = g1 * g3 + g2 * g4
    rdir = rt_dir * (
        (1.0 - k_mu) * (a2 + k * g3)
        - (1.0 + k_mu) * (a2 - k * g3) * e2
        - 2.0 * (k * g3 - a2 * k_mu) * e1 * t0
    )
    tdir = -rt_dir * (
        (1.0 + k_mu) * (a1 + k * g4) * t0
        - (1.0 - k_mu) * (a1 - k * g4) * e2 * t0
        - 2.0 * (k * g4 + a1 * k_mu) * e1
    )
    # energy guards (absorbed direct fraction must stay non-negative)
    rdir = jnp.clip(rdir, 0.0, 1.0 - t0)
    tdir = jnp.clip(tdir, 0.0, 1.0 - t0 - rdir)
    return rdif, tdif, rdir, tdir, t0


def sw_transfer(tau, ssa, g, mu0, src_gpt, alb_dir, alb_dif, dp):
    """Shortwave fluxes for one sky condition.

    tau/ssa/g: [ncol, ngpt, nlay]; mu0: [ncol]; src_gpt: [ncol, ngpt]
    TOA spectral irradiance (already includes mu0 factor? NO — raw beam
    irradiance per g-point, W/m^2 normal to the beam);
    alb_dir/alb_dif: [ncol, ngpt]; dp: [ncol, nlay].
    """
    daylit = mu0 > 1e-3
    mu = jnp.where(daylit, mu0, 1.0)[:, None, None]

    tau_l = jnp.moveaxis(tau, -1, 0)
    ssa_l = jnp.moveaxis(ssa, -1, 0)
    g_l = jnp.moveaxis(g, -1, 0)
    tau_s, ssa_s, g_s = delta_scale(tau_l, ssa_l, g_l)
    mu_l = mu[None, :, 0, 0][..., None]  # [1, ncol, 1]
    rdif, tdif, rdir, tdir, t0 = two_stream(tau_s, ssa_s, g_s, mu_l)

    # direct beam at levels [nlev, ncol, ngpt]
    path = jnp.cumsum(tau_s / mu_l, axis=0)
    toa = (mu0[:, None] * src_gpt)  # flux on a horizontal surface
    dir_lev = jnp.concatenate(
        [jnp.ones_like(path[:1]), jnp.exp(-jnp.minimum(path, 80.0))], axis=0
    ) * toa[None]
    dir_top = dir_lev[:-1]  # at top of each layer

    src_up = rdir * dir_top
    src_dn = tdir * dir_top
    sfc_src = alb_dir * dir_lev[-1]

    # ---- bottom-up: accumulated albedo & upward source below each level
    def up_pass(carry, inp):
        albedo_below, src_below = carry
        rdif_k, tdif_k, sup_k, sdn_k = inp
        denom = 1.0 / (1.0 - rdif_k * albedo_below)
        albedo = rdif_k + tdif_k * tdif_k * albedo_below * denom
        src = sup_k + tdif_k * denom * (src_below + albedo_below * sdn_k)
        return (albedo, src), (albedo_below, src_below, denom)

    alb_dif_g = jnp.broadcast_to(alb_dif, src_gpt.shape)
    (alb_top, src_top), (alb_below, src_below, denom) = lax.scan(
        up_pass, (alb_dif_g, sfc_src), (rdif, tdif, src_up, src_dn),
        reverse=True,
    )

    # ---- top-down: resolve diffuse fluxes
    def dn_pass(fdn_dif, inp):
        tdif_k, rdif_k, sdn_k, alb_b, src_b, den_k = inp
        fdn_next = (tdif_k * fdn_dif + rdif_k * src_b + sdn_k) * den_k
        fup_next = alb_b * fdn_next + src_b
        return fdn_next, (fdn_next, fup_next)

    fdn0 = jnp.zeros_like(src_top)
    _, (fdn_below, fup_below) = lax.scan(
        dn_pass, fdn0, (tdif, rdif, src_dn, alb_below, src_below, denom)
    )
    fup = jnp.concatenate([src_top[None], fup_below], axis=0)
    fdn_dif = jnp.concatenate([fdn0[None], fdn_below], axis=0)

    day = daylit[:, None].astype(tau.dtype)
    up_tot = jnp.moveaxis(fup.sum(-1), 0, -1) * day
    dn_dir = jnp.moveaxis(dir_lev.sum(-1), 0, -1) * day
    dn_tot = jnp.moveaxis((fdn_dif + dir_lev).sum(-1), 0, -1) * day
    net_dn = dn_tot - up_tot
    htr = (net_dn[..., :-1] - net_dn[..., 1:]) * GRAVITY / (CP_AIR * dp)
    return SWFluxes(up_tot, dn_tot, dn_dir, htr)
