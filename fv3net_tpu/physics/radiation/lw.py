"""RRTMG-structured longwave solver (reference:
external/radiation/radiation/radlw/radlw_main.py lwrad:1459 + rtrn/rtrnmr
— no-scattering absorption/emission with a linear-in-tau Planck source and
the 1.66 diffusivity angle, McICA cloud overlap).

TPU design: g-points ride a vectorized axis [ncol, ngpt, nlay]; the
up/down transfers are two `lax.scan`s over layers whose step is pure
elementwise math on [ncol, ngpt] slabs; the spectral reduction is one
weighted sum. Clear-sky and total-sky are computed in the same jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from fv3net_tpu.core.constants import CP_AIR, GRAVITY
from fv3net_tpu.physics.radiation import params as P


class LWFluxes(NamedTuple):
    up: jnp.ndarray   # [ncol, nlev] spectrally integrated upward flux
    dn: jnp.ndarray   # [ncol, nlev]
    htr: jnp.ndarray  # [ncol, nlay] heating rate K/s


def _source_terms(e_near, e_far, x):
    """Exact flux source for Planck emission linear in optical path:
    integrating dF/dx = E(x) - F from the near to the far boundary gives
    F_far = F_near*exp(-x) + E_far - E_near*exp(-x) - dE*w, w=(1-e^-x)/x."""
    tr = jnp.exp(-x)
    w = jnp.where(x > 1e-5, (1.0 - tr) / jnp.maximum(x, 1e-12), 1.0 - 0.5 * x)
    return tr, e_far - e_near * tr - (e_far - e_near) * w


def lw_transfer(tau, e_lev, e_lay, e_sfc, emis, dp):
    """Longwave fluxes for one sky condition.

    tau:   [ncol, ngpt, nlay] optical depth (gas [+ cloud*mask])
    e_lev: [ncol, ngpt, nlev] per-g-point Planck emissive power at levels
    e_lay: [ncol, ngpt, nlay] at layer midpoints (unused in the two-point
           linear source but kept for parity with lwrad's taut inputs)
    e_sfc: [ncol, ngpt] surface emission, emis: [ncol] broadband emissivity
    dp:    [ncol, nlay]
    """
    del e_lay
    x = jnp.moveaxis(P.DIFFUSIVITY * tau, -1, 0)          # [nlay, ncol, ngpt]
    e_top = jnp.moveaxis(e_lev[..., :-1], -1, 0)
    e_bot = jnp.moveaxis(e_lev[..., 1:], -1, 0)

    def down(fdn, inp):
        x_k, et, eb = inp
        tr, src = _source_terms(et, eb, x_k)
        f = fdn * tr + src
        return f, f

    f0 = jnp.zeros(x.shape[1:], x.dtype)
    fdn_sfc, fdn_below = lax.scan(down, f0, (x, e_top, e_bot))
    fdn = jnp.concatenate([f0[None], fdn_below], axis=0)   # [nlev, ncol, ngpt]

    fup_sfc = emis[:, None] * e_sfc + (1.0 - emis[:, None]) * fdn_sfc

    def up(fup, inp):
        # xs are (x, e_bot, e_top); upward propagation has near = BOTTOM
        # and far = TOP (in the opaque limit the upward flux must equal
        # the Planck emission of the layer's top boundary)
        x_k, eb, et = inp
        tr, src = _source_terms(eb, et, x_k)
        f = fup * tr + src
        return f, f

    _, fup_above = lax.scan(up, fup_sfc, (x, e_bot, e_top), reverse=True)
    fup = jnp.concatenate([fup_above, fup_sfc[None]], axis=0)

    up_tot = jnp.moveaxis(fup.sum(-1), 0, -1)              # [ncol, nlev]
    dn_tot = jnp.moveaxis(fdn.sum(-1), 0, -1)
    net_dn = dn_tot - up_tot
    htr = (net_dn[..., :-1] - net_dn[..., 1:]) * GRAVITY / (CP_AIR * dp)
    return LWFluxes(up_tot, dn_tot, htr)
