"""RRTMG-SW: batched JAX re-derivation of the RRTM shortwave scheme.

Algorithm: RRTMG-SW v5.1 per the reference's in-tree Python port
(external/radiation/radiation/radsw/radsw_main.py:86-2850,
radsw_bands.py) — correlated-k gas optics over 112 g-points in 14 bands
(16-29), Rayleigh scattering, cloud/aerosol optical properties, McICA
overlap, delta-scaled PIFM two-stream with vertical quadrature (vrtqdr).

Same TPU-first design as lw.py: fully batched [ncol, nlay], troposphere
mask instead of laytrop slicing, table gathers, and the three vrtqdr
recurrences as ``lax.scan``s with all layer-local two-stream quantities
precomputed vectorized.  Tables are the reference's ``swdict`` layout
(tables.make_sw_tables) enabling oracle validation.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fv3net_tpu.physics.radiation.rrtmg import params as P
from fv3net_tpu.physics.radiation.rrtmg import lw as rlw

_STPFAC = 296.0 / 1013.0
_NTBMX = 10000
_OD_LO = 0.06
_EPS1 = 1.0e-8
_ZCRIT = 0.9999995


def prep_sw_tables(swdict: Dict, dtype=jnp.float32) -> Dict:
    """Device copy of a reference-layout swdict (already rows-leading)."""
    out: Dict = {}
    for key, val in swdict.items():
        if isinstance(val, dict):
            out[key] = {
                k: jnp.asarray(np.asarray(v, np.float64), dtype)
                for k, v in val.items()
            }
        elif key in ("layreffr", "ix1", "ix2", "ibx"):
            out[key] = np.asarray(val, np.int64)  # static index data
        elif np.ndim(val) == 0:
            out[key] = float(val)
        else:
            out[key] = jnp.asarray(np.asarray(val, np.float64), dtype)
    return out


def _trunc(x):
    return jnp.trunc(x)


def _exp_tbl(dtype):
    i = np.arange(_NTBMX + 1, dtype=np.float64)
    tfn = np.where(i < _NTBMX, i / np.maximum(_NTBMX - i, 1), 0.0)
    tbl = np.exp(-P.BPADE * tfn)
    tbl[_NTBMX] = 1.0e-20
    return jnp.asarray(tbl, dtype)


# ------------------------------------------------------------------ setcoef
def setcoef_sw(pavel, tavel, h2ovmr, T):
    """Vectorized SW interpolation coefficients (reference
    radsw_main.py:2692-2845; note: fp/ft are NOT clipped here, unlike
    the LW setcoef)."""
    preflog, tref = T["preflog"], T["tref"]
    forfac = pavel * _STPFAC / (tavel * (1.0 + h2ovmr))
    plog = jnp.log(pavel)
    jp = (
        jnp.clip(_trunc(36.0 - 5.0 * (plog + 0.04)), 1.0, 58.0).astype(
            jnp.int32
        )
        - 1
    )
    fp = 5.0 * (jnp.take(preflog, jp) - plog)
    tem1 = (tavel - jnp.take(tref, jp)) / 15.0
    tem2 = (tavel - jnp.take(tref, jp + 1)) / 15.0
    jt = jnp.clip(_trunc(3.0 + tem1), 1.0, 4.0).astype(jnp.int32) - 1
    jt1 = jnp.clip(_trunc(3.0 + tem2), 1.0, 4.0).astype(jnp.int32) - 1
    ft = tem1 - (jt - 2).astype(tavel.dtype)
    ft1 = tem2 - (jt1 - 2).astype(tavel.dtype)
    fp1 = 1.0 - fp
    fac10 = fp1 * ft
    fac00 = fp1 * (1.0 - ft)
    fac11 = fp * ft1
    fac01 = fp * (1.0 - ft1)

    tropo = plog > 4.56
    temf = (332.0 - tavel) / 36.0
    indfor_lo = jnp.clip(_trunc(temf), 1.0, 2.0).astype(jnp.int32)
    forfrac_lo = temf - indfor_lo.astype(tavel.dtype)
    tems = (tavel - 188.0) / 7.2
    indself_lo = jnp.clip(_trunc(tems) - 7.0, 1.0, 9.0).astype(jnp.int32)
    selffrac_lo = tems - (indself_lo + 7).astype(tavel.dtype)
    temf_hi = (tavel - 188.0) / 36.0
    indfor = jnp.where(tropo, indfor_lo, 3)
    forfrac = jnp.where(tropo, forfrac_lo, temf_hi - 1.0)
    indself = jnp.where(tropo, indself_lo, 0)
    selffrac = jnp.where(tropo, selffrac_lo, 0.0)
    selffac = jnp.where(tropo, h2ovmr * forfac, 0.0)

    return {
        "jp": jp + 1, "jt": jt + 1, "jt1": jt1 + 1,  # 1-based
        "fac00": fac00, "fac01": fac01, "fac10": fac10, "fac11": fac11,
        "selffac": selffac, "selffrac": selffrac, "indself": indself,
        "forfac": forfac, "forfrac": forfrac, "indfor": indfor,
        "tropo": tropo,
    }


# ------------------------------------------------------------------ taumol
def _take(tab, ids):
    """Bounds-clamped row fetch; small tables use a bit-exact one-hot
    contraction instead of a TPU gather (see lw._take)."""
    rows = tab.shape[0]
    ids = jnp.clip(ids, 0, rows - 1)
    if rows <= 64:
        oh = (ids[..., None] == jnp.arange(rows, dtype=ids.dtype)).astype(
            tab.dtype
        )
        return jnp.einsum(
            "...r,rg->...g", oh, tab,
            precision=rlw._MATMUL_PRECISION,
        )
    return jnp.take(tab, ids, axis=0)


def _self_for_sw(bt, c, with_self=True):
    """Water-vapor self/foreign continuum terms, INCLUDING the h2o
    column-amount factor (the SW taugb's multiply colamt[:,0] into the
    continuum explicitly — radsw_bands.py:121-135 — unlike the LW where
    setcoef pre-scales selffac/forfac)."""
    h2o = c["colh2o"][..., None]
    inds = c["indself"] - 1
    indf = c["indfor"] - 1
    s = 0.0
    if with_self and "selfref" in bt:
        s0 = _take(bt["selfref"], inds)
        s1 = _take(bt["selfref"], inds + 1)
        s = h2o * c["selffac"][..., None] * (
            s0 + c["selffrac"][..., None] * (s1 - s0)
        )
    f0 = _take(bt["forref"], indf)
    f1 = _take(bt["forref"], indf + 1)
    f = h2o * c["forfac"][..., None] * (
        f0 + c["forfrac"][..., None] * (f1 - f0)
    )
    return s, f


def _spec_ids(c, colA, colB, strrat, nspa, nspb):
    """2-species interpolation factors + 8 stencil indices, lower and
    upper (mult 8 / 4)."""
    jp, jt, jt1 = c["jp"], c["jt"], c["jt1"]
    id0_lo = ((jp - 1) * 5 + (jt - 1)) * nspa - 1
    id1_lo = (jp * 5 + (jt1 - 1)) * nspa - 1
    id0_hi = jnp.maximum(((jp - 13) * 5 + (jt - 1)) * nspb - 1, -1)
    id1_hi = jnp.maximum(((jp - 12) * 5 + (jt1 - 1)) * nspb - 1, -1)
    speccomb = colA + strrat * colB
    ratio = jnp.minimum(P.ONEMINUS, colA / speccomb)

    def factors(mult, id0, id1):
        specmult = mult * ratio
        js = 1 + specmult.astype(jnp.int32)
        fs = specmult % 1.0
        return js, fs, id0 + js, id1 + js

    return speccomb, factors(8.0, id0_lo, id1_lo), factors(
        4.0, id0_hi, id1_hi
    )


def _weighted_rows(tab, terms):
    """Σ_k w_k * tab[id_k] as one weighted-selection matmul (see
    lw._weighted_rows — replaces slow TPU row-gathers)."""
    rows = tab.shape[0]
    iota = jnp.arange(rows, dtype=jnp.int32)
    W = None
    for ids, w in terms:
        oh = (
            jnp.clip(ids, 0, rows - 1)[..., None] == iota
        ).astype(tab.dtype)
        contrib = oh if w is None else oh * w[..., None]
        W = contrib if W is None else W + contrib
    return jnp.einsum(
        "clr,rg->clg", W, tab, precision=rlw._MATMUL_PRECISION
    )


def _tau_spec(tab, ind01, ind11, fs, c, off):
    """8-point 2-species stencil: offsets (+0,+1,+off,+off+1) at two
    pressure rows — one weighted-selection matmul."""
    fs1 = 1.0 - fs
    return _weighted_rows(
        tab,
        [
            (ind01, fs1 * c["fac00"]),
            (ind01 + 1, fs * c["fac00"]),
            (ind01 + off, fs1 * c["fac10"]),
            (ind01 + off + 1, fs * c["fac10"]),
            (ind11, fs1 * c["fac01"]),
            (ind11 + 1, fs * c["fac01"]),
            (ind11 + off, fs1 * c["fac11"]),
            (ind11 + off + 1, fs * c["fac11"]),
        ],
    )


def _tau_single_sw(tab, col, c, id0, id1):
    return _weighted_rows(
        tab,
        [
            (id0 + 1, col * c["fac00"]),
            (id0 + 2, col * c["fac10"]),
            (id1 + 1, col * c["fac01"]),
            (id1 + 2, col * c["fac11"]),
        ],
    )


def _ids_single(c, nspa, nspb):
    jp, jt, jt1 = c["jp"], c["jt"], c["jt1"]
    id0_lo = ((jp - 1) * 5 + (jt - 1)) * nspa - 1
    id1_lo = (jp * 5 + (jt1 - 1)) * nspa - 1
    id0_hi = jnp.maximum(((jp - 13) * 5 + (jt - 1)) * max(nspb, 1) - 1, -1)
    id1_hi = jnp.maximum(((jp - 12) * 5 + (jt1 - 1)) * max(nspb, 1) - 1, -1)
    return id0_lo, id1_lo, id0_hi, id1_hi


def _sfluxzen(c, colamt, T):
    """Spectral solar source per g-point [C, ngptsw] (reference
    radsw_main.py:1398-1444)."""
    C, L = c["jp"].shape
    jp = c["jp"]  # 1-based
    tropo = c["tropo"]
    laytrop = tropo.sum(axis=1)  # [C]
    ks_lower_default = laytrop - 1
    dtype = colamt.dtype
    pieces = []
    for b in range(P.NBANDS_SW):
        jb = 15 + b
        ng = P.NG_SW[b]
        ibd = int(T["ibx"][b]) - 1
        if jb in (15, 19, 22, 24, 25, 28):
            flux = jnp.broadcast_to(
                T["sfluxref01"][:ng, 0, ibd], (C, ng)
            )
        elif jb == 26:
            flux = jnp.broadcast_to(
                T["scalekur"] * T["sfluxref01"][:ng, 0, ibd], (C, ng)
            )
        else:
            layreffr = int(T["layreffr"][b])
            cond = (jp[:, :-1] < layreffr) & (jp[:, 1:] >= layreffr)
            if jb in (16, 27):  # search the upper atmosphere
                karange = jnp.arange(L - 1)
                valid = cond & (karange[None] >= (laytrop[:, None] - 1))
                found = valid.any(axis=1)
                kfirst = jnp.argmax(valid, axis=1) + 1
                ks = jnp.where(found, kfirst, L - 1)
            else:  # search below laytrop: k in [0, laytrop-2]
                karange = jnp.arange(L - 1)
                valid = cond & (karange[None] <= (laytrop[:, None] - 2))
                found = valid.any(axis=1)
                kfirst = jnp.argmax(valid, axis=1) + 1
                ks = jnp.where(found, kfirst, ks_lower_default)
            colm1 = jnp.take_along_axis(
                colamt[..., int(T["ix1"][b]) - 1], ks[:, None], axis=1
            )[:, 0]
            colm2 = jnp.take_along_axis(
                colamt[..., int(T["ix2"][b]) - 1], ks[:, None], axis=1
            )[:, 0]
            speccomb = colm1 + T["strrat"][b] * colm2
            specmult = T["specwt"][b] * jnp.minimum(
                P.ONEMINUS, colm1 / speccomb
            )
            js = specmult.astype(jnp.int32)  # 0-based row
            fs = specmult % 1.0
            tab = T["sfluxref02"] if jb in (16, 27) else T["sfluxref03"]
            lo = tab[:ng, :, ibd].T[js]  # [C, ng] via row gather
            hi = tab[:ng, :, ibd].T[jnp.clip(js + 1, 0, tab.shape[1] - 1)]
            flux = lo + fs[:, None] * (hi - lo)
        pieces.append(flux.astype(dtype))
    return jnp.concatenate(pieces, axis=1)


def taumol_sw(c, colamt, colmol, T):
    """Gas + Rayleigh optical depths for all 112 g-points.  Returns
    (sfluxzen [C, G], taug [C, L, G], taur [C, L, G])."""
    B = [T[f"radsw_kgb{16 + b}"] for b in range(P.NBANDS_SW)]
    strrat = np.asarray(T["strrat"])
    tropo = c["tropo"][..., None]
    h2o, co2, o3 = colamt[..., 0], colamt[..., 1], colamt[..., 2]
    ch4, o2 = colamt[..., 4], colamt[..., 5]
    taus, raylt = [], []

    def ray_const(val, ng):
        return colmol[..., None] * val * jnp.ones(ng, colmol.dtype)

    def ray_vec(vec):
        return colmol[..., None] * vec

    # band 16: h2o+ch4 lower / ch4 upper
    bt = B[0]
    sc, (js, fs, i01, i11), _ = _spec_ids(
        c, h2o, ch4, strrat[0], P.NSPA_SW[0], P.NSPB_SW[0]
    )
    s, f = _self_for_sw(bt, c)
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9) + s + f
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[0], P.NSPB_SW[0]
    )
    upper = _tau_single_sw(bt["absb"], ch4, c, id0_hi, id1_hi)
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[0]))

    # band 17: h2o+co2 both
    bt = B[1]
    sc, (js, fs, i01, i11), (jsU, fsU, i01U, i11U) = _spec_ids(
        c, h2o, co2, strrat[1], P.NSPA_SW[1], P.NSPB_SW[1]
    )
    s, f = _self_for_sw(bt, c)
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9) + s + f
    _, fU = _self_for_sw(bt, c, with_self=False)
    upper = (
        sc[..., None] * _tau_spec(bt["absb"], i01U, i11U, fsU, c, 5) + fU
    )
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[1]))

    # band 18: h2o+ch4 lower / ch4 upper
    bt = B[2]
    sc, (js, fs, i01, i11), _ = _spec_ids(
        c, h2o, ch4, strrat[2], P.NSPA_SW[2], P.NSPB_SW[2]
    )
    s, f = _self_for_sw(bt, c)
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9) + s + f
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[2], P.NSPB_SW[2]
    )
    upper = _tau_single_sw(bt["absb"], ch4, c, id0_hi, id1_hi)
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[2]))

    # band 19: h2o+co2 lower / co2 upper
    bt = B[3]
    sc, (js, fs, i01, i11), _ = _spec_ids(
        c, h2o, co2, strrat[3], P.NSPA_SW[3], P.NSPB_SW[3]
    )
    s, f = _self_for_sw(bt, c)
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9) + s + f
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[3], P.NSPB_SW[3]
    )
    upper = _tau_single_sw(bt["absb"], co2, c, id0_hi, id1_hi)
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[3]))

    # band 20: h2o both + ch4 cross section
    bt = B[4]
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[4], P.NSPB_SW[4]
    )
    s, f = _self_for_sw(bt, c)
    ch4x = ch4[..., None] * bt["absch4"]
    lower = _tau_single_sw(bt["absa"], h2o, c, id0_lo, id1_lo) + s + f + ch4x
    _, fU = _self_for_sw(bt, c, with_self=False)
    upper = _tau_single_sw(bt["absb"], h2o, c, id0_hi, id1_hi) + fU + ch4x
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[4]))

    # band 21: h2o+co2 both
    bt = B[5]
    sc, (js, fs, i01, i11), (jsU, fsU, i01U, i11U) = _spec_ids(
        c, h2o, co2, strrat[5], P.NSPA_SW[5], P.NSPB_SW[5]
    )
    s, f = _self_for_sw(bt, c)
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9) + s + f
    _, fU = _self_for_sw(bt, c, with_self=False)
    upper = (
        sc[..., None] * _tau_spec(bt["absb"], i01U, i11U, fsU, c, 5) + fU
    )
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[5]))

    # band 22: h2o+o2 lower / o2 upper
    bt = B[6]
    o2adj = 1.6
    o2tem = 4.35e-4 / (350.0 * 2.0)
    o2cont = (o2tem * o2)[..., None]
    sc, (js, fs, i01, i11), _ = _spec_ids(
        c, h2o, o2, strrat[6], P.NSPA_SW[6], P.NSPB_SW[6]
    )
    s, f = _self_for_sw(bt, c)
    lower = (
        sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9)
        + s + f + o2cont
    )
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[6], P.NSPB_SW[6]
    )
    upper = (
        o2adj * _tau_single_sw(bt["absb"], o2, c, id0_hi, id1_hi) + o2cont
    )
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[6]))

    # band 23: h2o lower / nothing upper
    bt = B[7]
    id0_lo, id1_lo, _, _ = _ids_single(c, P.NSPA_SW[7], P.NSPB_SW[7])
    s, f = _self_for_sw(bt, c)
    lower = (
        bt["givfac"] * _tau_single_sw(bt["absa"], h2o, c, id0_lo, id1_lo)
        + s + f
    )
    taus.append(jnp.where(tropo, lower, jnp.zeros_like(lower)))
    raylt.append(ray_vec(bt["rayl"]))

    # band 24: h2o+o2 lower / o2 upper (+o3 cross sections, specie rayleigh)
    bt = B[8]
    sc, (js, fs, i01, i11), _ = _spec_ids(
        c, h2o, o2, strrat[8], P.NSPA_SW[8], P.NSPB_SW[8]
    )
    s, f = _self_for_sw(bt, c)
    lower = (
        sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9)
        + o3[..., None] * bt["abso3a"]
        + s + f
    )
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[8], P.NSPB_SW[8]
    )
    upper = (
        _tau_single_sw(bt["absb"], o2, c, id0_hi, id1_hi)
        + o3[..., None] * bt["abso3b"]
    )
    taus.append(jnp.where(tropo, lower, upper))
    # rayleigh: lower interpolates over the species parameter
    ra = bt["rayla"]  # [ng, 9]
    js0 = jnp.clip(js - 1, 0, ra.shape[1] - 2)
    ray_lo = colmol[..., None] * (
        ra.T[js0] + fs[..., None] * (ra.T[js0 + 1] - ra.T[js0])
    )
    ray_hi = ray_vec(bt["raylb"])
    raylt.append(jnp.where(tropo, ray_lo, ray_hi))

    # band 25: h2o lower / nothing; o3 both
    bt = B[9]
    id0_lo, id1_lo, _, _ = _ids_single(c, P.NSPA_SW[9], P.NSPB_SW[9])
    lower = (
        _tau_single_sw(bt["absa"], h2o, c, id0_lo, id1_lo)
        + o3[..., None] * bt["abso3a"]
    )
    upper = o3[..., None] * bt["abso3b"]
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_vec(bt["rayl"]))

    # band 26: rayleigh only
    bt = B[10]
    taus.append(
        jnp.zeros(colmol.shape + (P.NG_SW[10],), colmol.dtype)
    )
    raylt.append(ray_vec(bt["rayl"]))

    # band 27: o3 both
    bt = B[11]
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[11], P.NSPB_SW[11]
    )
    lower = _tau_single_sw(bt["absa"], o3, c, id0_lo, id1_lo)
    upper = _tau_single_sw(bt["absb"], o3, c, id0_hi, id1_hi)
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_vec(bt["rayl"]))

    # band 28: o3+o2 both
    bt = B[12]
    sc, (js, fs, i01, i11), (jsU, fsU, i01U, i11U) = _spec_ids(
        c, o3, o2, strrat[12], P.NSPA_SW[12], P.NSPB_SW[12]
    )
    lower = sc[..., None] * _tau_spec(bt["absa"], i01, i11, fs, c, 9)
    upper = sc[..., None] * _tau_spec(bt["absb"], i01U, i11U, fsU, c, 5)
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[12]))

    # band 29: h2o lower (+co2 x-sec) / co2 upper (+h2o x-sec)
    bt = B[13]
    id0_lo, id1_lo, id0_hi, id1_hi = _ids_single(
        c, P.NSPA_SW[13], P.NSPB_SW[13]
    )
    s, f = _self_for_sw(bt, c)
    lower = (
        _tau_single_sw(bt["absa"], h2o, c, id0_lo, id1_lo)
        + s + f + co2[..., None] * bt["absco2"]
    )
    upper = (
        _tau_single_sw(bt["absb"], co2, c, id0_hi, id1_hi)
        + h2o[..., None] * bt["absh2o"]
    )
    taus.append(jnp.where(tropo, lower, upper))
    raylt.append(ray_const(bt["rayl"], P.NG_SW[13]))

    taug = jnp.concatenate(taus, axis=-1)
    taur = jnp.concatenate(raylt, axis=-1)
    sfluxzen = _sfluxzen(c, colamt, T)
    return sfluxzen, taug, taur


# ------------------------------------------------------------------ clouds
def cldprop_sw(
    cfrac, cliqp, reliq, cicep, reice, cdat1, cdat2, cdat3, cdat4,
    rand, T, iovrsw: int = 1, iswcliq: int = 1, iswcice: int = 3,
):
    """Band cloud optical properties + McICA masks (reference
    radsw_main.py:842-1180; iswcliq=2/iswcice=3 are the radphysparam
    defaults... reference uses iswcliq=1: both supported).

    Returns (cldfmc [C, L, ngpt], taucw, ssacw, asycw [C, L, nbdsw])."""
    dtype = cfrac.dtype
    cloudy = cfrac > P.FTINY

    cldran = cdat1
    cldsnw = cdat3
    refsnw = cdat4
    dgesnw = 1.0315 * refsnw
    tauran = cldran * T["a0r"]
    tausnw = jnp.where(
        (cldsnw > 0.0) & (refsnw > 10.0),
        cldsnw * 1.09087 * (T["a0s"] + T["a1s"] / jnp.maximum(dgesnw, 1e-12)),
        0.0,
    )
    ssaran = tauran[..., None] * (1.0 - T["b0r"])
    ssasnw = tausnw[..., None] * (
        1.0 - (T["b0s"] + T["b1s"] * dgesnw[..., None])
    )
    asyran = ssaran * T["c0r"]
    asysnw = ssasnw * T["c0s"]

    # liquid
    factor = reliq - 1.5
    index = jnp.clip(_trunc(factor), 1.0, 57.0).astype(jnp.int32) - 1
    fint = (factor - (index + 1).astype(dtype))[..., None]
    extl = T["extliq2"] if iswcliq == 2 else T["extliq1"]
    ssal = T["ssaliq2"] if iswcliq == 2 else T["ssaliq1"]
    asyl = T["asyliq2"] if iswcliq == 2 else T["asyliq1"]
    e0, e1 = _take(extl, index), _take(extl, index + 1)
    s0, s1 = _take(ssal, index), _take(ssal, index + 1)
    a0, a1 = _take(asyl, index), _take(asyl, index + 1)
    extcoliq = jnp.maximum(0.0, e0 + fint * (e1 - e0))
    ssacoliq = jnp.clip(s0 + fint * (s1 - s0), 0.0, 1.0)
    asycoliq = jnp.clip(a0 + fint * (a1 - a0), 0.0, 1.0)
    tauliq = cliqp[..., None] * extcoliq
    ssaliq = tauliq * ssacoliq
    asyliq = ssaliq * asycoliq
    has_liq = (cliqp > 0.0)[..., None]
    tauliq = jnp.where(has_liq, tauliq, 0.0)
    ssaliq = jnp.where(has_liq, ssaliq, 0.0)
    asyliq = jnp.where(has_liq, asyliq, 0.0)

    # ice (fu 1998, iswcice=3)
    dgeice = jnp.clip(1.0315 * reice, 5.0, 140.0)
    factor = (dgeice - 2.0) / 3.0
    index = jnp.clip(_trunc(factor), 1.0, 45.0).astype(jnp.int32) - 1
    fint = (factor - (index + 1).astype(dtype))[..., None]
    e0 = _take(T["extice3"], index)
    e1 = _take(T["extice3"], index + 1)
    s0 = _take(T["ssaice3"], index)
    s1 = _take(T["ssaice3"], index + 1)
    a0 = _take(T["asyice3"], index)
    a1 = _take(T["asyice3"], index + 1)
    extcoice = jnp.maximum(0.0, e0 + fint * (e1 - e0))
    ssacoice = jnp.clip(s0 + fint * (s1 - s0), 0.0, 1.0)
    asycoice = jnp.clip(a0 + fint * (a1 - a0), 0.0, 1.0)
    tauice = cicep[..., None] * extcoice
    ssaice = tauice * ssacoice
    asyice = ssaice * asycoice
    has_ice = (cicep > 0.0)[..., None]
    tauice = jnp.where(has_ice, tauice, 0.0)
    ssaice = jnp.where(has_ice, ssaice, 0.0)
    asyice = jnp.where(has_ice, asyice, 0.0)

    mask = cloudy[..., None]
    taucw = jnp.where(
        mask, tauliq + tauice + (tauran + tausnw)[..., None], 0.0
    )
    ssacw = jnp.where(mask, ssaliq + ssaice + ssaran + ssasnw, 0.0)
    asycw = jnp.where(mask, asyliq + asyice + asyran + asysnw, 0.0)

    # McICA subcolumns (same generator as LW, ngptsw columns)
    C, L = cfrac.shape
    cldf = jnp.where(cfrac < P.FTINY, 0.0, cfrac)
    cdfunc = rand.reshape(C, P.NGPT_SW, L)
    if iovrsw == 1:
        def body(carry, xs):
            cdf_prev, cldf_prev = carry
            cdf_k, cldf_k = xs
            tem1 = 1.0 - cldf_prev
            cdf_k = jnp.where(
                cdf_prev > tem1[:, None], cdf_prev, cdf_k * tem1[:, None]
            )
            return (cdf_k, cldf_k), cdf_k

        (_, _), rest = lax.scan(
            body,
            (cdfunc[:, :, 0], cldf[:, 0]),
            (cdfunc[:, :, 1:].transpose(2, 0, 1), cldf[:, 1:].T),
        )
        cdfunc = jnp.concatenate(
            [cdfunc[:, :, :1], rest.transpose(1, 2, 0)], axis=2
        )
    cldfmc = (cdfunc >= (1.0 - cldf)[:, None, :]).astype(dtype)
    return cldfmc.transpose(0, 2, 1), taucw, ssacw, asycw


# ------------------------------------------------------------------ spcvrtm
def _twostream(ztau0, zssa0, zasy0, cosz, sntz, exp_tbl, iswmode=2,
                fast_exp=False):
    """Delta-scaled two-stream layer reflectance/transmittance, fully
    vectorized (reference radsw_main.py:279-424).  All inputs
    [C, L, G] (cosz/sntz broadcastable).  Returns (zrefb, zrefd, ztrab,
    ztrad, zexp3 scaled-beam-T, zexp4 unscaled-beam-T)."""
    dtype = ztau0.dtype
    ztau0 = jnp.maximum(P.FTINY, ztau0)
    zssaw = jnp.minimum(P.ONEMINUS, zssa0 / ztau0)
    zasyw = zasy0 / jnp.maximum(P.FTINY, zssa0)

    za1 = zasyw * zasyw
    za2 = zssaw * za1
    ztau1 = (1.0 - za2) * ztau0
    zssa1 = (zssaw - za2) / (1.0 - za2)
    zasy1 = zasyw / (1.0 + zasyw)
    zasy3 = 0.75 * zasy1

    if iswmode == 1:
        zgam1 = 1.75 - zssa1 * (1.0 + zasy3)
        zgam2 = -0.25 + zssa1 * (1.0 - zasy3)
        zgam3 = 0.5 - zasy3 * cosz
    elif iswmode == 2:  # pifm
        zgam1 = 2.0 - zssa1 * (1.25 + zasy3)
        zgam2 = 0.75 * zssa1 * (1.0 - zasy1)
        zgam3 = 0.5 - zasy3 * cosz
    else:  # discrete ordinates
        zsr3 = np.sqrt(3.0)
        zgam1 = zsr3 * (2.0 - zssa1 * (1.0 + zasy1)) * 0.5
        zgam2 = zsr3 * zssa1 * (1.0 - zasy1) * 0.5
        zgam3 = (1.0 - zsr3 * zasy1 * cosz) * 0.5
    zgam4 = 1.0 - zgam3

    def lut(x):
        """exp(-x) via the reference's lookup/series hybrid (or the
        direct exponential under fast_exp: same function the table
        quantizes, minus the 62M-index gathers)."""
        x = jnp.minimum(x, 500.0)
        small = x <= _OD_LO
        if fast_exp:
            big = jnp.exp(-x)
        else:
            ftind = x / (P.BPADE + x)
            itind = jnp.clip(
                _trunc(ftind * _NTBMX + 0.5), 0, _NTBMX
            ).astype(jnp.int32)
            big = jnp.take(exp_tbl, itind)
        return jnp.where(small, 1.0 - x + 0.5 * x * x, big)

    # conservative-scattering branch
    za1c = zgam1 * cosz - zgam3
    za2c = zgam1 * ztau1
    zb2 = lut(ztau1 * sntz)
    zrefb_c = jnp.clip((za2c - za1c * (1.0 - zb2)) / (1.0 + za2c), 0.0, 1.0)
    ztrab_c = jnp.clip(1.0 - zrefb_c, 0.0, 1.0)
    zrefd_c = jnp.clip(za2c / (1.0 + za2c), 0.0, 1.0)
    ztrad_c = jnp.clip(1.0 - zrefd_c, 0.0, 1.0)

    # non-conservative branch
    za1n = zgam1 * zgam4 + zgam2 * zgam3
    za2n = zgam1 * zgam3 + zgam2 * zgam4
    zrk = jnp.sqrt(jnp.maximum((zgam1 - zgam2) * (zgam1 + zgam2), 1e-30))
    zrk2 = 2.0 * zrk
    zrp = zrk * cosz
    zrp1 = 1.0 + zrp
    zrm1 = 1.0 - zrp
    zrpp1 = 1.0 - zrp * zrp
    zrpp = jnp.copysign(jnp.maximum(P.FLIMIT, jnp.abs(zrpp1)), zrpp1)
    zrkg1 = zrk + zgam1
    zrkg3 = zrk * zgam3
    zrkg4 = zrk * zgam4
    zr1 = zrm1 * (za2n + zrkg3)
    zr2 = zrp1 * (za2n - zrkg3)
    zr3 = zrk2 * (zgam3 - za2n * cosz)
    zr4 = zrpp * zrkg1
    zr5 = zrpp * (zrk - zgam1)
    zt1 = zrp1 * (za1n + zrkg4)
    zt2 = zrm1 * (za1n - zrkg4)
    zt3 = zrk2 * (zgam4 + za1n * cosz)

    def nonzero(x):
        # f32 only: exp(-500) underflows to 0 and 1/0 would NaN the
        # unused-but-computed branch; exact-zero never occurs in f64
        # (min table value ~7e-218), so the oracle path is untouched
        return jnp.where(x == 0.0, jnp.asarray(1e-30, x.dtype), x)

    zexm1 = nonzero(lut(zrk * ztau1))
    zexp1 = 1.0 / zexm1
    zexm2 = nonzero(lut(ztau1 * sntz))
    zexp2 = 1.0 / zexm2
    ze1r45 = zr4 * zexp1 + zr5 * zexm1
    degenerate = (ze1r45 >= -_EPS1) & (ze1r45 <= _EPS1)
    zden1 = zssa1 / jnp.where(degenerate, 1.0, ze1r45)
    zrefb_n = jnp.where(
        degenerate,
        _EPS1,
        jnp.clip((zr1 * zexp1 - zr2 * zexm1 - zr3 * zexm2) * zden1, 0.0, 1.0),
    )
    ztrab_n = jnp.where(
        degenerate,
        zexm2,
        jnp.clip(
            zexm2 * (1.0 - (zt1 * zexp1 - zt2 * zexm1 - zt3 * zexp2) * zden1),
            0.0, 1.0,
        ),
    )
    zdend = zr4 / (jnp.where(degenerate, 1.0, ze1r45) * zrkg1)
    zrefd_n = jnp.clip(zgam2 * (zexp1 - zexm1) * zdend, 0.0, 1.0)
    ztrad_n = jnp.clip(zrk2 * zdend, 0.0, 1.0)

    conserv = zssaw >= _ZCRIT
    zrefb = jnp.where(conserv, zrefb_c, zrefb_n).astype(dtype)
    zrefd = jnp.where(conserv, zrefd_c, zrefd_n).astype(dtype)
    ztrab = jnp.where(conserv, ztrab_c, ztrab_n).astype(dtype)
    ztrad = jnp.where(conserv, ztrad_c, ztrad_n).astype(dtype)

    zexp3 = lut(ztau1 * sntz)  # scaled direct-beam transmittance
    zexp4 = lut(ztau0 * sntz)  # unscaled
    return zrefb, zrefd, ztrab, ztrad, zexp3, zexp4


def _vrtqdr(zrefb, zrefd, ztrab, ztrad, zldbt, ztdbt):
    """Vertical quadrature (reference radsw_main.py:30-85), batched over
    [C, G]; level arrays [C, L+1, G], level 0 = surface."""
    C, Lp1, G = zrefb.shape
    L = Lp1 - 1

    def recip(d):
        # f32 only: totally-reflective layer stacks can round
        # 1 - r*r' to exactly 0; never exact in the f64 oracle path
        return 1.0 / jnp.where(d == 0.0, jnp.asarray(1e-30, d.dtype), d)

    def up_body(carry, xs):
        zrupb_k, zrupd_k = carry
        refb_kp, refd_kp, trab_kp, trad_kp, ldbt_kp = xs
        zden1 = recip(1.0 - zrupd_k * refd_kp)
        zrupb_kp = refb_kp + (
            trad_kp
            * ((trab_kp - ldbt_kp) * zrupd_k + ldbt_kp * zrupb_k)
        ) * zden1
        zrupd_kp = refd_kp + trad_kp * trad_kp * zrupd_k * zden1
        return (zrupb_kp, zrupd_kp), (zrupb_kp, zrupd_kp)

    xs_up = tuple(
        a[:, 1:].transpose(1, 0, 2)
        for a in (zrefb, zrefd, ztrab, ztrad, zldbt)
    )
    _, (rupb_rest, rupd_rest) = lax.scan(
        up_body, (zrefb[:, 0], zrefd[:, 0]), xs_up
    )
    zrupb = jnp.concatenate(
        [zrefb[:, :1], rupb_rest.transpose(1, 0, 2)], axis=1
    )
    zrupd = jnp.concatenate(
        [zrefd[:, :1], rupd_rest.transpose(1, 0, 2)], axis=1
    )

    # downward pass: k = L-1 .. 1 producing ztdn/zrdnd at k-1
    def dn_body(carry, xs):
        ztdn_k, zrdnd_k = carry
        refb_k, refd_k, trab_k, trad_k, tdbt_k = xs
        zden1 = recip(1.0 - refd_k * zrdnd_k)
        ztdn_km1 = tdbt_k * trab_k + (
            trad_k * ((ztdn_k - tdbt_k) + tdbt_k * refb_k * zrdnd_k)
        ) * zden1
        zrdnd_km1 = refd_k + trad_k * trad_k * zrdnd_k * zden1
        return (ztdn_km1, zrdnd_km1), (ztdn_km1, zrdnd_km1)

    ztdn_top = ztrab[:, L]
    zrdnd_top = zrefd[:, L]
    ks = np.arange(L - 1, 0, -1)
    xs_dn = tuple(
        a[:, ks].transpose(1, 0, 2)
        for a in (zrefb, zrefd, ztrab, ztrad, ztdbt)
    )
    _, (tdn_rest, rdnd_rest) = lax.scan(
        dn_body, (ztdn_top, zrdnd_top), xs_dn
    )
    # assemble level arrays: index L -> 1/0 boundary, L-1 -> top vals
    ones = jnp.ones_like(ztdn_top)
    zeros = jnp.zeros_like(ztdn_top)
    ztdn = jnp.concatenate(
        [
            tdn_rest[::-1].transpose(1, 0, 2),  # levels 0..L-2
            ztdn_top[:, None],
            ones[:, None],
        ],
        axis=1,
    )
    zrdnd = jnp.concatenate(
        [
            rdnd_rest[::-1].transpose(1, 0, 2),
            zrdnd_top[:, None],
            zeros[:, None],
        ],
        axis=1,
    )

    zden1 = recip(1.0 - zrdnd * zrupd)
    zfu = (ztdbt * zrupb + (ztdn - ztdbt) * zrupd) * zden1
    zfd = ztdbt + (ztdn - ztdbt + ztdbt * zrupb * zrdnd) * zden1
    return zfu, zfd


def spcvrtm_sw(
    ssolar, cosz, albbm, albdf, sfluxzen, cldfmc, taug, taur,
    tauae, ssaae, asyae, taucw, ssacw, asycw, exp_tbl, iswmode=2,
    fast_exp=False,
):
    """McICA two-stream solver over all g-points (reference
    radsw_main.py:86-753), batched [C, L, G].

    ssolar/cosz [C]; albbm/albdf [C, 2]; sfluxzen [C, G]; aerosol and
    cloud properties [C, L, nbdsw].  Returns a dict of fluxes."""
    dtype = taug.dtype
    C, L, G = taug.shape
    ngb = jnp.asarray(np.asarray(P.NGB_SW), jnp.int32)
    idxsfc = np.asarray(P.IDXSFC_SW)  # per band
    sntz = (1.0 / cosz)[:, None, None]
    coszb = cosz[:, None, None]

    taua_g = jnp.take(tauae, ngb, axis=2)
    ssaa_g = jnp.take(ssaae, ngb, axis=2)
    asya_g = jnp.take(asyae, ngb, axis=2)
    taucw_g = jnp.take(taucw, ngb, axis=2)
    ssacw_g = jnp.take(ssacw, ngb, axis=2)
    asycw_g = jnp.take(asycw, ngb, axis=2)

    # clear-sky layer properties
    ztau0 = jnp.maximum(P.FTINY, taur + taug + taua_g)
    zssa0 = taur + taua_g * ssaa_g
    zasy0 = asya_g * ssaa_g * taua_g
    clr = _twostream(ztau0, zssa0, zasy0, coszb, sntz, exp_tbl,
                     iswmode, fast_exp)
    zrefb_c, zrefd_c, ztrab_c, ztrad_c, zexp3_c, zexp4_c = clr

    # total-sky: cloudy layers add cloud properties
    cloudy = cldfmc > P.FTINY
    tot = _twostream(
        ztau0 + taucw_g, zssa0 + ssacw_g, zasy0 + asycw_g,
        coszb, sntz, exp_tbl, iswmode, fast_exp,
    )
    zrefb_t = jnp.where(cloudy, tot[0], zrefb_c)
    zrefd_t = jnp.where(cloudy, tot[1], zrefd_c)
    ztrab_t = jnp.where(cloudy, tot[2], ztrab_c)
    ztrad_t = jnp.where(cloudy, tot[3], ztrad_c)
    zexp3_t = jnp.where(cloudy, tot[4], zexp3_c)
    zexp4_t = jnp.where(cloudy, tot[5], zexp4_c)

    # surface albedo per g (idxsfc: 1 nir, 2 uv/vis, 0 half-half)
    bm = []
    df = []
    for b in range(P.NBANDS_SW):
        i = idxsfc[b] - 1
        if i >= 0:
            bm.append(albbm[:, i])
            df.append(albdf[:, i])
        else:
            bm.append(0.5 * (albbm[:, 0] + albbm[:, 1]))
            df.append(0.5 * (albdf[:, 0] + albdf[:, 1]))
    alb_bm_g = jnp.take(jnp.stack(bm, 1), ngb, axis=1)  # [C, G]
    alb_df_g = jnp.take(jnp.stack(df, 1), ngb, axis=1)

    def assemble_levels(zrefb_l, zrefd_l, ztrab_l, ztrad_l, zexp3_l):
        """Layer arrays [C, L, G] -> level arrays [C, L+1, G] with the
        surface row (albedo) at level 0 and layer k at level k+1."""
        zeros = jnp.zeros((C, 1, G), dtype)
        zrefb = jnp.concatenate([alb_bm_g[:, None], zrefb_l], axis=1)
        zrefd = jnp.concatenate([alb_df_g[:, None], zrefd_l], axis=1)
        ztrab = jnp.concatenate([zeros, ztrab_l], axis=1)
        ztrad = jnp.concatenate([zeros, ztrad_l], axis=1)
        zldbt = jnp.concatenate([zeros, zexp3_l], axis=1)
        # total beam transmittance per level (product downward from TOA)
        ztdbt = jnp.concatenate(
            [
                jnp.cumprod(zexp3_l[:, ::-1], axis=1)[:, ::-1],
                jnp.ones((C, 1, G), dtype),
            ],
            axis=1,
        )
        return zrefb, zrefd, ztrab, ztrad, zldbt, ztdbt

    lev_c = assemble_levels(zrefb_c, zrefd_c, ztrab_c, ztrad_c, zexp3_c)
    zfu0, zfd0 = _vrtqdr(*lev_c)
    lev_t = assemble_levels(zrefb_t, zrefd_t, ztrab_t, ztrad_t, zexp3_t)
    zfuc, zfdc = _vrtqdr(*lev_t)

    zsolar = (ssolar[:, None] * sfluxzen)  # [C, G]
    ztdbt0_c = jnp.prod(zexp4_c, axis=1)  # [C, G] unscaled surface beam
    ztdbt0_t = jnp.prod(zexp4_t, axis=1)

    def flux_sum(z):  # [C, L+1, G] -> [C, L+1]
        return (z * zsolar[:, None, :]).sum(axis=-1)

    flxu0 = flux_sum(zfu0)
    flxd0 = flux_sum(zfd0)
    flxuc = flux_sum(zfuc)
    flxdc = flux_sum(zfdc)

    # spectral surface decompositions
    sfc_group = idxsfc[np.asarray(P.NGB_SW)]  # per g: 1, 2, or 0
    w_nir = jnp.asarray(
        np.where(sfc_group == 1, 1.0, np.where(sfc_group == 0, 0.5, 0.0)),
        dtype,
    )
    w_vis = jnp.asarray(
        np.where(sfc_group == 2, 1.0, np.where(sfc_group == 0, 0.5, 0.0)),
        dtype,
    )
    beam_c = zsolar * ztdbt0_t
    diff_c = zsolar * (zfdc[:, 0] - ztdbt0_t)
    beam_0 = zsolar * ztdbt0_c
    diff_0 = zsolar * (zfd0[:, 0] - ztdbt0_c)
    sfbmc = jnp.stack(
        [(beam_c * w_nir).sum(-1), (beam_c * w_vis).sum(-1)], axis=-1
    )
    sfdfc = jnp.stack(
        [(diff_c * w_nir).sum(-1), (diff_c * w_vis).sum(-1)], axis=-1
    )
    sfbm0 = jnp.stack(
        [(beam_0 * w_nir).sum(-1), (beam_0 * w_vis).sum(-1)], axis=-1
    )
    sfdf0 = jnp.stack(
        [(diff_0 * w_nir).sum(-1), (diff_0 * w_vis).sum(-1)], axis=-1
    )

    uvb_mask = jnp.asarray(
        (np.asarray(P.NGB_SW) == (P.NUVB_SW - P.NBLOW)).astype(np.float64),
        dtype,
    )
    suvbf0 = (zfd0[:, 0] * zsolar * uvb_mask).sum(-1)
    suvbfc = (zfdc[:, 0] * zsolar * uvb_mask).sum(-1)

    return {
        "flxuc": flxuc, "flxdc": flxdc, "flxu0": flxu0, "flxd0": flxd0,
        "ftoauc": flxuc[:, -1], "ftoau0": flxu0[:, -1],
        "ftoadc": flxd0[:, -1],
        "fsfcuc": flxuc[:, 0], "fsfcu0": flxu0[:, 0],
        "fsfcdc": flxdc[:, 0], "fsfcd0": flxd0[:, 0],
        "sfbmc": sfbmc, "sfdfc": sfdfc, "sfbm0": sfbm0, "sfdf0": sfdf0,
        "suvbfc": suvbfc, "suvbf0": suvbf0,
    }


# ------------------------------------------------------------------ swrad
def swrad(
    plyr, plvl, tlyr, tlvl, qlyr, olyr, gasvmr, clouds, aerosols,
    sfcalb, delpin, cosz, solcon, rand2d, T,
    iovrsw: int = 1, iswrgas: int = 1, iswcliq: int = 1,
    iswmode: int = 2, fast_exp: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched SW driver (reference radsw_main.py:1981-2690 semantics).

    Layer arrays [C, L], k=0 at the surface; sfcalb [C, 4] =
    (nir-beam, nir-diff, uvvis-beam, uvvis-diff); gasvmr [C, L, 10];
    clouds [C, L, 9]; aerosols [C, L, nbdsw, 3]; cosz [C] (columns with
    cosz<=0 get zero fluxes); rand2d [C, ngptsw*nlay]."""
    dtype = plyr.dtype
    day = cosz > 0.0001
    cosz_safe = jnp.where(day, cosz, 1.0)
    s0fac = solcon / P.S0_SW
    ssolar = jnp.where(day, s0fac * cosz_safe, 0.0)

    tem1 = 100.0 * P.CON_G
    tem2 = 1.0e-20 * 1.0e3 * P.CON_AVGD
    h2ovmr = jnp.maximum(0.0, qlyr * P.AMDW / (1.0 - qlyr))
    o3vmr = jnp.maximum(0.0, olyr * P.AMDO3)
    tem0 = (1.0 - h2ovmr) * P.CON_AMD + h2ovmr * P.CON_AMW
    coldry = tem2 * delpin / (tem1 * tem0 * (1.0 + h2ovmr))
    temcol = 1.0e-12 * coldry
    cols = [
        jnp.maximum(0.0, coldry * h2ovmr),
        jnp.maximum(temcol, coldry * gasvmr[..., 0]),
        jnp.maximum(0.0, coldry * o3vmr),
    ]
    if iswrgas > 0:
        cols += [jnp.maximum(temcol, coldry * gasvmr[..., 1]),
                 jnp.maximum(temcol, coldry * gasvmr[..., 2]),
                 jnp.maximum(temcol, coldry * gasvmr[..., 3])]
    else:
        cols += [temcol, temcol, temcol]
    colamt = jnp.stack(cols + [jnp.zeros_like(coldry)], axis=-1)
    colmol = coldry + colamt[..., 0]

    c = setcoef_sw(plyr, tlyr, h2ovmr, T)
    c["colh2o"] = colamt[..., 0]
    sfluxzen, taug, taur = taumol_sw(c, colamt, colmol, T)
    cldfmc, taucw, ssacw, asycw = cldprop_sw(
        clouds[..., 0], clouds[..., 1], clouds[..., 2], clouds[..., 3],
        clouds[..., 4], clouds[..., 5], clouds[..., 6], clouds[..., 7],
        clouds[..., 8], rand2d, T, iovrsw=iovrsw, iswcliq=iswcliq,
    )
    out = spcvrtm_sw(
        ssolar, cosz_safe, sfcalb[:, 0::2], sfcalb[:, 1::2], sfluxzen,
        cldfmc, taug, taur,
        aerosols[..., 0], aerosols[..., 1], aerosols[..., 2],
        taucw, ssacw, asycw, _exp_tbl(dtype), iswmode=iswmode,
        fast_exp=fast_exp,
    )

    rfdelp = P.HEATFAC / delpin
    fnetc = out["flxdc"] - out["flxuc"]
    hswc = (fnetc[:, 1:] - fnetc[:, :-1]) * rfdelp
    fnet0 = out["flxd0"] - out["flxu0"]
    hsw0 = (fnet0[:, 1:] - fnet0[:, :-1]) * rfdelp

    def mask(v):
        return jnp.where(
            jnp.reshape(day, day.shape + (1,) * (v.ndim - 1)), v, 0.0
        )

    result = {k: mask(v) for k, v in out.items()}
    result["hswc"] = mask(hswc)
    result["hsw0"] = mask(hsw0)
    result["cldtau"] = taucw[..., 9]  # band 10 ~ 0.55 um
    return result
