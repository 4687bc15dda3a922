"""Integrated ablation: where do the RRTMG milliseconds go at head?

Measures the FULL flagship 8-step chunk (hourly RRTMG, 2 calls/chunk)
with individual radiation stages replaced by shape-correct cheap stubs
that keep the data dependencies alive.  Differences between variants
attribute cost to the stage WITHIN the integrated graph — per
CLAUDE.md, standalone-jitted subgraphs compile to different code and
their timings are not trusted; only integrated comparisons are.

Variants:
  full          baseline (head)
  cheap-taumol  taumol_lw/_sfluxzen-included taumol_sw -> broadcast
                constants (removes gas optics; keeps cloud + solver)
  cheap-solver  rtrnmc_lw / spcvrtm_sw -> g-mean surrogates (removes
                the radiative-transfer scans; keeps taumol + cloud)
  cheap-cloud   cldprop_lw / cldprop_sw -> clear-sky stubs (removes
                McICA subcolumn generation + cloud optics)

Run on the TPU.  One JSON line per variant.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
from fv3net_tpu.physics.radiation.rrtmg import sw as rsw
from fv3net_tpu.physics.radiation.rrtmg import params as P


def _cheap_taumol_lw(c, colamt, coldry, colbrd, wx, tauaer, T):
    st = rlw._sdt(colamt.dtype)
    C, L = coldry.shape
    base = (colamt.sum(-1) / jnp.maximum(coldry, 1.0))[..., None]
    tautot = (base * 0.1).astype(st) * jnp.ones((1, 1, P.NGPT_LW), st)
    fracs = jnp.full((C, L, P.NGPT_LW), 1.0 / P.NGPT_LW, st)
    return fracs, tautot


def _cheap_taumol_sw(c, colamt, colmol, T):
    st = rlw._sdt(colamt.dtype)
    C, L = colmol.shape
    base = (colamt.sum(-1) / jnp.maximum(colmol, 1.0))[..., None]
    taug = (base * 0.05).astype(st) * jnp.ones((1, 1, P.NGPT_SW), st)
    taur = (base * 0.01).astype(st) * jnp.ones((1, 1, P.NGPT_SW), st)
    sfluxzen = jnp.full((C, P.NGPT_SW), 1360.0 / P.NGPT_SW, colamt.dtype)
    return sfluxzen, taug, taur


def _cheap_rtrnmc_lw(semiss, delp, cldfmc, taucld, tautot, pklay, pklev,
                     fracs, secdif, fast_exp=False):
    dtype = rlw._acc(tautot.dtype)
    C, L, G = tautot.shape
    # consume every input once so taumol/cloud stay live
    m = (tautot.astype(dtype).mean(-1) + fracs.astype(dtype).mean(-1)
         + cldfmc.astype(dtype).mean(-1) + taucld.mean(-1))
    lev = jnp.concatenate([m, m[:, -1:]], axis=1)  # [C, L+1]
    s = semiss.mean(-1, keepdims=True) + secdif.mean(-1, keepdims=True)
    up = lev * s + pklay.mean(1)[:, :1]
    dn = lev * 0.5 + pklev.mean(1)[:, :1]
    htr = (up[:, :-1] - up[:, 1:]) * (P.HEATFAC / delp)
    return up, dn, htr, up * 0.9, dn * 0.9, htr * 0.9


def _cheap_spcvrtm_sw(ssolar, cosz, albbm, albdf, sfluxzen, cldfmc, taug,
                      taur, tauae, ssaae, asyae, taucw, ssacw, asycw,
                      exp_tbl, iswmode=2, fast_exp=False):
    dtype = rlw._acc(taug.dtype)
    C, L, G = taug.shape
    m = (taug.astype(dtype).mean(-1) + taur.astype(dtype).mean(-1)
         + cldfmc.astype(dtype).mean(-1) + taucw.mean(-1) + ssacw.mean(-1)
         + asycw.mean(-1) + tauae.mean(-1) + ssaae.mean(-1)
         + asyae.mean(-1))
    f = sfluxzen.sum(-1)[:, None] * (ssolar * cosz)[:, None]
    lev = f * jnp.concatenate([m, m[:, -1:]], axis=1)
    zero = jnp.zeros_like(lev)
    alb = (albbm.mean(-1) + albdf.mean(-1))[:, None]
    lev = lev * alb
    # real keys/shapes probed from a tiny run of the genuine solver
    return {
        k: (lev if v == "lev" else f[:, 0]) for k, v in _SW_KEYS.items()
    }


_SW_KEYS = {}


def _probe_sw_keys():
    """Find spcvrtm_sw's return keys/ranks via eval_shape (no execution)."""
    C, L = 4, 3
    dt = jnp.float32
    sds = jax.ShapeDtypeStruct
    out = jax.eval_shape(
        rsw.spcvrtm_sw,
        sds((C,), dt), sds((C,), dt),
        sds((C, 2), dt), sds((C, 2), dt),
        sds((C, P.NGPT_SW), dt),
        sds((C, L, P.NGPT_SW), dt),
        sds((C, L, P.NGPT_SW), dt),
        sds((C, L, P.NGPT_SW), dt),
        sds((C, L, P.NBANDS_SW), dt), sds((C, L, P.NBANDS_SW), dt),
        sds((C, L, P.NBANDS_SW), dt), sds((C, L, P.NBANDS_SW), dt),
        sds((C, L, P.NBANDS_SW), dt), sds((C, L, P.NBANDS_SW), dt),
        rsw._exp_tbl(dt),
    )
    return {k: ("lev" if v.ndim == 2 else "col") for k, v in out.items()}


def _cheap_cldprop_lw(cfrac, clwp, relw, ciwp, reiw, cda1, cda2, cda3,
                      cda4, rand, T, iovrlw=1, ilwcliq=1, ilwcice=3,
                      dtype=None):
    st = rlw._sdt(cfrac.dtype)
    C, L = cfrac.shape
    live = (cfrac + clwp + ciwp + cda1 + rand.reshape(C, -1)[:, :L]) * 0.0
    cldfmc = jnp.zeros((C, L, P.NGPT_LW), st) + live[..., None].astype(st)
    taucld = jnp.zeros((C, L, P.NBANDS_LW), cfrac.dtype) + live[..., None]
    return cldfmc, taucld


def _cheap_cldprop_sw(cfrac, cliqp, reliq, cicep, reice, cdat1, cdat2,
                      cdat3, cdat4, rand, T, iovrsw=1, iswcliq=1,
                      iswcice=3, dtype=None):
    st = rlw._sdt(cfrac.dtype)
    C, L = cfrac.shape
    live = (cfrac + cliqp + cicep + cdat1 + rand.reshape(C, -1)[:, :L]) * 0.0
    cldfmc = jnp.zeros((C, L, P.NGPT_SW), st) + live[..., None].astype(st)
    z = jnp.zeros((C, L, P.NBANDS_SW), cfrac.dtype) + live[..., None]
    return cldfmc, z, z, z


def _cheap_planck(totplnk, t):
    delwave = jnp.asarray(P.DELWAVE_LW, totplnk.dtype)
    base = totplnk.mean(0)
    return (t[..., None] * 0.0 + 1.0) * (delwave * base)


def _cheap_setaer(plyr, delz_km, rh, land, lat, Taer, nb, month=6.0):
    C, L = plyr.shape
    dt = plyr.dtype
    live = (plyr.mean() + delz_km.mean() + rh.mean() + land.mean()
            + lat.mean()) * 0.0
    aer_sw = jnp.zeros((C, L, P.NBANDS_SW, 3), dt) + live
    aer_lw = jnp.zeros((C, L, P.NBANDS_LW, 3), dt) + live
    from fv3net_tpu.physics.radiation import aerosols as am
    aerodp = jnp.zeros((C, len(am.SPECIES) + 1), dt) + live
    return aer_sw, aer_lw, aerodp


def main():
    from __graft_entry__ import _flagship
    from fv3net_tpu.physics.radiation import aerosols as aer_mod

    global _SW_KEYS
    names = sys.argv[1:] or ["full", "cheap-taumol", "cheap-solver",
                             "cheap-cloud"]

    def sync(st):
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    results = {}
    for name in names:
        saved = {}

        def patch(mod, attr, fn):
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)

        if name == "cheap-taumol":
            patch(rlw, "taumol_lw", _cheap_taumol_lw)
            patch(rsw, "taumol_sw", _cheap_taumol_sw)
        elif name == "cheap-solver":
            _SW_KEYS = _probe_sw_keys()
            patch(rlw, "rtrnmc_lw", _cheap_rtrnmc_lw)
            patch(rsw, "spcvrtm_sw", _cheap_spcvrtm_sw)
        elif name == "cheap-solver-lw":
            patch(rlw, "rtrnmc_lw", _cheap_rtrnmc_lw)
        elif name == "cheap-solver-sw":
            _SW_KEYS = _probe_sw_keys()
            patch(rsw, "spcvrtm_sw", _cheap_spcvrtm_sw)
        elif name == "cheap-cloud":
            patch(rlw, "cldprop_lw", _cheap_cldprop_lw)
            patch(rsw, "cldprop_sw", _cheap_cldprop_sw)
        elif name == "cheap-planck":
            patch(rlw, "_planck_interp", _cheap_planck)
        elif name == "cheap-aerosol":
            patch(aer_mod, "setaer", _cheap_setaer)
        elif name == "cheap-rand":
            real_uniform = jax.random.uniform

            def fixed_uniform(key, shape, dtype=jnp.float32, **kw):
                ramp = (jnp.arange(int(np.prod(shape)), dtype=dtype)
                        % 997.0) / 997.0
                return ramp.reshape(shape)

            patch(jax.random, "uniform", fixed_uniform)
            saved[(jax.random, "uniform")] = real_uniform

        try:
            multi_step, args = _flagship(
                npx=48, npz=32, chunk=8, radiation_interval=4
            )
            state, ml_params, sst, cosz = args
            t0 = time.perf_counter()
            out = multi_step(state, ml_params, sst, cosz)
            sync(out)
            compile_s = time.perf_counter() - t0
            n = 4
            t0 = time.perf_counter()
            s = state
            for _ in range(n):
                s = multi_step(s, ml_params, sst, cosz)
            sync(s)
            per_chunk_ms = (time.perf_counter() - t0) / n * 1e3
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, fn)
        results[name] = per_chunk_ms
        print(json.dumps({
            "variant": name, "ms_per_chunk": round(per_chunk_ms, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"# {k}: stage cost ≈ {base - v:.1f} ms/chunk "
                      f"({(base - v) / 2:.1f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
