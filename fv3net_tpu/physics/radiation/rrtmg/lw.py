"""RRTMG-LW: batched JAX re-derivation of the RRTM longwave scheme.

Algorithm: RRTMG-LW v4.82 as specified by the reference's in-tree
Python port (external/radiation/radiation/radlw/radlw_main.py:1459-3717,
radlw_bands.py) — correlated-k gas optics over 140 g-points in 16 bands,
water-vapor self/foreign continua, per-band minor gases and halocarbon
cross-sections, Hu&Stamnes/Fu cloud optics, McICA stochastic cloud
overlap, and a secant-diffusivity-angle two-level recurrence RT with
linear-in-tau Planck sources (rtrnmc).

TPU-first design departures from the reference port (no code shared):
 - fully batched over [ncol, nlay]: no per-column Python loop, no
   dynamic ``laytrop`` slicing — the troposphere split is a mask, so the
   whole computation jits with static shapes;
 - k-table fetches are FACTORED weighted-selection matmuls: four shared
   band-independent pressure/temperature base-row weight matrices are
   contracted once against merged per-atmosphere band tables, and the
   small data-dependent species stencils are applied to the
   [C, L, nspa, g] result (see the machinery note above taumol_lw) —
   no per-fetch [C, L, rows] one-hot and no TPU gathers;
 - the radiative-transfer recurrence is two ``lax.scan``s over layers
   with ALL per-layer math inside the scan bodies, so no [C, L, ngpt]
   intermediate beyond tautot/cldfmc/fracs is ever materialized.

Tables are a plain dict (see tables.py) — identical layout to the
reference's ``lwdict``, which enables the quantitative oracle test
(tests/test_rrtmg_oracle.py) running both implementations on the SAME
synthetic tables.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fv3net_tpu.ops import pallas_ktable
from fv3net_tpu.physics.radiation.rrtmg import params as P

_STPFAC = 296.0 / 1013.0
_F = None  # dtype resolved per call

# Unroll of the per-layer solver scans (rtrnmc / vrtqdr / McICA walk).
# -1 (default) = AUTO: full unroll on accelerators, keep the loop on CPU.
# The per-layer bodies run at only ~3% of HBM bandwidth as loop
# iterations (v5e trace), and fully inlining them lets XLA fuse across
# layers — measured 325 -> 315 ms on the integrated C48 hourly-RRTMG
# chunk (benchmarks/unroll_sweep.py; PARTIAL unroll 4/8 is SLOWER than
# 1, so the only useful values are 1 and full).  On CPU, full unroll
# multiplies LLVM compile time many-fold for zero benefit (tests), hence
# auto.  Numerics are BIT-IDENTICAL across settings (same ops, same
# order — the sweep asserts max |Δpt| = 0).  Read at trace time;
# override via FV3NET_RRTMG_SCAN_UNROLL or RRTMGConfig.scan_unroll
# (0 = force full, >=1 = explicit factor).
import os as _os

SCAN_UNROLL = int(_os.environ.get("FV3NET_RRTMG_SCAN_UNROLL", "-1"))


def set_scan_unroll(n: int) -> None:
    """Set the solver-scan unroll factor (-1 auto, 0 full, >=1 explicit;
    read at trace time — rebuild jitted programs after changing it)."""
    global SCAN_UNROLL
    SCAN_UNROLL = int(n)


def _unroll():
    """lax.scan unroll argument for the current setting."""
    if SCAN_UNROLL > 0:
        return SCAN_UNROLL
    if SCAN_UNROLL == 0:
        return True
    return True if jax.default_backend() != "cpu" else 1


# Pallas k-table contraction route (ops/pallas_ktable.py): computes the
# major-species taus as weighted-selection dots with the [.., nspa, ng]
# interpolation block kept in VMEM instead of HBM.  MEASURED SLOWER than
# the XLA factored path on the integrated v5e flagship (62.1 -> 34.5
# SYPD; a flat-selection v1 was 31.4): at per-band granularity the
# opaque kernels defeat XLA's surrounding fusion (which already runs at
# ~77% of HBM bandwidth) and the term planes materialize as kernel
# inputs — docs/performance.md "Pallas k-table route".  Kept OPT-IN
# ("off" everywhere by default) as infrastructure for a future
# whole-taumol megakernel; "interpret" runs the kernel in interpreter
# mode (CPU equivalence tests, tests/test_pallas_ktable.py).
PALLAS_KTABLE = _os.environ.get("FV3NET_RRTMG_PALLAS", "off")


def set_pallas_ktable(mode: str) -> None:
    """'auto' | 'on' | 'off' | 'interpret' (read at trace time)."""
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"bad pallas ktable mode {mode!r}")
    global PALLAS_KTABLE
    PALLAS_KTABLE = mode


def _pallas_ktable_mode() -> str:
    if PALLAS_KTABLE == "auto":
        return "on" if jax.default_backend() == "tpu" else "off"
    return PALLAS_KTABLE

# MXU precision of the k-table selection/interpolation contractions.
# HIGHEST (6-pass bf16 = full f32) keeps single-row selections bit-exact
# vs the reference; HIGH (3-pass) halves the MXU work at ~1e-6 relative
# table error — set process-wide via set_matmul_precision (read at trace
# time, so rebuild jitted programs after changing it).
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# Storage dtype of the LARGE g-point-space planes (k-table contraction
# outputs and their one-hot weight operands, the per-band taus, and the
# solver-scan inputs tautot/fracs/cldfmc/taur).  The RRTMG call is
# HBM-bandwidth bound on exactly these [C, L, G]-class intermediates
# (device trace: ~40 GB accessed/call at C48), so storing them in
# bfloat16 halves the dominant traffic while ALL index math,
# interpolation-weight computation, per-layer transmittance math, and
# flux accumulations stay in the compute dtype (f32): bf16 planes
# promote back to f32 at their first consumer.  The resulting ~0.2%
# random per-g tau quantization is far below the McICA subcolumn noise
# the scheme already accepts per call (measured: max flux deviation
# 0.13 W/m2, heating rates <=0.1 K/day vs the f32 path on a 64-profile
# battery; docs/performance.md).  Default AUTO = bfloat16 on
# accelerators (measured 63.3 -> 70.7 SYPD on the v5e C48 hourly-RRTMG
# flagship), float32 on CPU (tests stay exact; CPU bf16 matmuls are
# slow fallbacks anyway).  f64 runs — the oracle battery — are NEVER
# degraded regardless of the setting.  Set via
# RRTMGConfig.storage_dtype or env FV3NET_RRTMG_STORAGE
# (auto|float32|bfloat16).  Read at trace time.
_STORAGE_NAMES = {
    "auto": "auto", "": "auto",
    "float32": None, "f32": None, "none": None,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
}
_STORAGE_DTYPE = _STORAGE_NAMES[
    _os.environ.get("FV3NET_RRTMG_STORAGE", "").lower()
]


def set_storage_dtype(name) -> None:
    """'auto' (default: bf16 on accelerators, f32 on CPU), 'float32'
    (exact) or 'bfloat16' (half HBM traffic on the big g-space planes);
    read at trace time."""
    global _STORAGE_DTYPE
    key = (name or "").lower() if isinstance(name, str) else name
    if isinstance(key, str):
        if key not in _STORAGE_NAMES:
            raise ValueError(
                "storage_dtype must be auto, float32 or bfloat16, "
                f"got {name!r}"
            )
        _STORAGE_DTYPE = _STORAGE_NAMES[key]
    else:
        _STORAGE_DTYPE = name


def _sdt(compute_dtype):
    """Storage dtype for big planes: bf16 when enabled AND computing in
    f32 (f64 runs — the oracle battery — are never degraded)."""
    st = _STORAGE_DTYPE
    if st == "auto":
        st = (
            jnp.bfloat16 if jax.default_backend() != "cpu" else None
        )
    if st is not None and compute_dtype == jnp.float32:
        return st
    return compute_dtype


def _acc(dtype):
    """Accumulation/compute dtype for a (possibly bf16-stored) input."""
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


def _mm_precision(dtype):
    """Contraction precision: the tier knob is meaningless for bf16
    operands (one MXU pass is all there is) — avoid the HIGHEST-tier
    upconvert."""
    if dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return _MATMUL_PRECISION


def set_matmul_precision(name: str) -> None:
    tiers = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }
    if name not in tiers:
        raise ValueError(
            f"matmul_precision must be one of {sorted(tiers)}, got {name!r}"
        )
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = tiers[name]


# ------------------------------------------------------------------ tables
def prep_lw_tables(lwdict: Dict, dtype=jnp.float64,
                   nbase_hi: int = None) -> Dict:
    """Convert a reference-layout lwdict into the gather-friendly device
    layout: every [ng, rows...] table transposed to rows-leading.

    ``nbase_hi``: optional reachable upper-atmosphere row bound
    (``nbase_hi_for``); shrinks the merged upper tables and, via the
    stored ``nbase_hi`` key, the taumol weight planes."""
    out: Dict = {
        "totplnk": jnp.asarray(lwdict["totplnk"], dtype),
        "preflog": jnp.asarray(lwdict["preflog"], dtype),
        "tref": jnp.asarray(lwdict["tref"], dtype),
        "chi_mls": jnp.asarray(lwdict["chi_mls"], dtype),
        "absliq1": jnp.asarray(lwdict["absliq1"], dtype),
        "absice0": jnp.asarray(lwdict["absice0"], dtype),
        "absice1": jnp.asarray(lwdict["absice1"], dtype),
        "absice2": jnp.asarray(lwdict["absice2"], dtype),
        "absice3": jnp.asarray(lwdict["absice3"], dtype),
    }
    bands = []
    for b in range(P.NBANDS_LW):
        src = lwdict[f"radlw_kgb{b + 1:02d}"]
        bt: Dict = {}
        for name, arr in src.items():
            a = np.asarray(arr)
            if a.ndim == 1:  # cfc cross-sections / 1-species fracref
                bt[name] = jnp.asarray(a, dtype)
            else:
                # [ng, ...] -> [..., ng] rows-leading for take(axis=0)
                bt[name] = jnp.asarray(np.moveaxis(a, 0, -1), dtype)
        bands.append(bt)
    # stratospheric co2 cooling-rate adjustment g-point weights for
    # bands 4 and 7 (reference radlw_main taugb4/taugb7 literals) —
    # carried in the table dict so the Pallas taumol megakernel sees
    # them as inputs, not captured constants
    adj4 = np.ones(P.NG_LW[3])
    adj4[7:14] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.88, 0.943]
    adj7 = np.ones(P.NG_LW[6])
    adj7[5:11] = [0.92, 0.88, 1.07, 1.1, 0.99, 0.855]
    bands[3]["co2adj"] = jnp.asarray(adj4, dtype)
    bands[6]["co2adj"] = jnp.asarray(adj7, dtype)
    out["bands"] = bands
    # pre-merged group tables (pure functions of the k-tables): the
    # Pallas taumol megakernel consumes these flat 2-D forms — table
    # reshapes/concats do not lower inside Mosaic kernels — and they
    # also save per-trace work on the XLA path
    def _flat_group(key, idx, nspa, nbase):
        parts = [_reshape_base(bands[i][key], nspa, nbase) for i in idx]
        merged = jnp.concatenate(parts, axis=-1)  # [nbase, nspa, Gsum]
        return merged.reshape(nbase, -1)

    nb_hi = int(nbase_hi) if nbase_hi else NBASE_HI
    out["nbase_hi"] = nb_hi
    out["mtab_lo9"] = _flat_group("absa", _SPEC_LO, 9, NBASE_LO)
    out["mtab_hi5"] = _flat_group("absb", _SPEC_HI, 5, nb_hi)
    out["mtab_lo1"] = _flat_group("absa", _SINGLE_LO, 1, NBASE_LO)
    out["mtab_hi1"] = _flat_group("absb", _SINGLE_HI, 1, nb_hi)
    out["selfref_all"] = jnp.concatenate(
        [bands[i]["selfref"] for i in range(16)], axis=-1
    )
    out["forref_all"] = jnp.concatenate(
        [bands[i]["forref"] for i in range(16)], axis=-1
    )
    out["minor1_all"] = jnp.concatenate(
        [bands[i][k] for i, k in _MINOR1_KEYS], axis=-1
    )
    return out


# ------------------------------------------------------------------ setcoef
def _trunc(x):
    return jnp.trunc(x)


def _planck_interp(totplnk, t):
    """delwave-weighted Planck table interpolation at temperature t
    [...]; returns [..., nbands].

    Lowered as ONE weighted-selection contraction instead of two row
    gathers: the 1-K lerp weights (1-tfr, tfr) are folded into a
    two-hot row-weight matrix and contracted with the [181, nbands]
    table on the MXU ((1-f)*lo + f*hi vs lo + f*(hi-lo): reassociation
    roundoff only; in the bf16 storage mode the weight quantization is
    ~2^-9 of a 1-K Planck increment, far below the ledgered storage-
    dtype error)."""
    rows = totplnk.shape[0]
    ind = jnp.clip(_trunc(t - 159.0), 1.0, 180.0).astype(jnp.int32)
    tfr = t - _trunc(t)
    delwave = jnp.asarray(P.DELWAVE_LW, totplnk.dtype)
    st = _sdt(totplnk.dtype)
    iota = jnp.arange(rows, dtype=jnp.int32)
    lo = ((ind - 1)[..., None] == iota).astype(st)
    hi = (ind[..., None] == iota).astype(st)
    f = tfr[..., None].astype(st)
    W = lo * (1 - f) + hi * f
    return jnp.einsum(
        "...r,rb->...b", W, (delwave * totplnk).astype(st),
        precision=_mm_precision(st),
    ).astype(_acc(st))


def setcoef_lw(pavel, tavel, tz, stemp, h2ovmr, colamt, coldry, colbrd, T):
    """Vectorized interpolation indices/factors (reference
    radlw_main.py:2268-2530).  All inputs [C, L] (tz [C, L+1], stemp
    [C]); returns a dict of [C, L] coefficient arrays plus the Planck
    sources pklay/pklev [C, nbands, L+1] and the troposphere mask."""
    totplnk, preflog, tref, chi = (
        T["totplnk"], T["preflog"], T["tref"], T["chi_mls"]
    )
    # one batched contraction for all four temperature sets (surface,
    # layers, every level): rows [stemp | tavel | tz] so pklay/pklev
    # slice out with no per-set concats
    L = tavel.shape[1]
    t_all = jnp.concatenate([stemp[:, None], tavel, tz], axis=1)
    pk = _planck_interp(totplnk, t_all)  # [C, 2L+2, nbands]
    pklay = pk[:, : L + 1].swapaxes(1, 2)  # [C, nbands, L+1]
    pklev = pk[:, L + 1 :].swapaxes(1, 2)

    plog = jnp.log(pavel)
    jp = (
        jnp.clip(_trunc(36.0 - 5.0 * (plog + 0.04)), 1.0, 58.0).astype(
            jnp.int32
        )
        - 1
    )
    fp = jnp.clip(5.0 * (jnp.take(preflog, jp) - plog), 0.0, 1.0)
    tem1 = (tavel - jnp.take(tref, jp)) / 15.0
    tem2 = (tavel - jnp.take(tref, jp + 1)) / 15.0
    jt = jnp.clip(_trunc(3.0 + tem1), 1.0, 4.0).astype(jnp.int32) - 1
    jt1 = jnp.clip(_trunc(3.0 + tem2), 1.0, 4.0).astype(jnp.int32) - 1
    ft = jnp.clip(tem1 - (jt - 2).astype(tavel.dtype), -0.5, 1.5)
    ft1 = jnp.clip(tem2 - (jt1 - 2).astype(tavel.dtype), -0.5, 1.5)

    tem1f = 1.0 - fp
    fac10 = tem1f * ft
    fac00 = tem1f * (1.0 - ft)
    fac11 = fp * ft1
    fac01 = fp * (1.0 - ft1)

    forfac = pavel * _STPFAC / (tavel * (1.0 + h2ovmr))
    selffac = h2ovmr * forfac

    scaleminor = pavel / tavel
    scaleminorn2 = scaleminor * (colbrd / (coldry + colamt[..., 0]))
    temm = (tavel - 180.8) / 7.2
    indminor = jnp.clip(_trunc(temm), 1.0, 18.0).astype(jnp.int32)
    minorfrac = temm - indminor.astype(tavel.dtype)

    tropo = plog > 4.56

    # lower-atmosphere continuum indices
    temf_lo = (332.0 - tavel) / 36.0
    indfor_lo = jnp.clip(_trunc(temf_lo), 1.0, 2.0).astype(jnp.int32)
    forfrac_lo = temf_lo - indfor_lo.astype(tavel.dtype)
    tems = (tavel - 188.0) / 7.2
    indself_lo = jnp.clip(_trunc(tems) - 7.0, 1.0, 9.0).astype(jnp.int32)
    selffrac_lo = tems - (indself_lo + 7).astype(tavel.dtype)
    # upper
    temf_hi = (tavel - 188.0) / 36.0
    indfor = jnp.where(tropo, indfor_lo, 3)
    forfrac = jnp.where(tropo, forfrac_lo, temf_hi - 1.0)
    indself = jnp.where(tropo, indself_lo, 0)
    selffrac = jnp.where(tropo, selffrac_lo, 0.0)

    # binary-species reference rates [C, L, nrates, 2]
    def ratio(ia, ib, jpx):
        return jnp.take(chi[ia], jpx) / jnp.take(chi[ib], jpx)

    zeros = jnp.zeros_like(fp)
    rf = [[zeros, zeros] for _ in range(P.NRATES)]
    rf[0] = [ratio(0, 1, jp), ratio(0, 1, jp + 1)]
    rf_lo = {
        1: [ratio(0, 2, jp), ratio(0, 2, jp + 1)],
        2: [ratio(0, 3, jp), ratio(0, 3, jp + 1)],
        3: [ratio(0, 5, jp), ratio(0, 5, jp + 1)],
        4: [ratio(3, 1, jp), ratio(3, 1, jp + 1)],
    }
    rf_hi = {5: [ratio(2, 1, jp), ratio(2, 1, jp + 1)]}
    for m, pair in rf_lo.items():
        rf[m] = [jnp.where(tropo, pair[0], 0.0),
                 jnp.where(tropo, pair[1], 0.0)]
    for m, pair in rf_hi.items():
        rf[m] = [jnp.where(tropo, 0.0, pair[0]),
                 jnp.where(tropo, 0.0, pair[1])]
    rfrate = jnp.stack(
        [jnp.stack(pair, axis=-1) for pair in rf], axis=-2
    )  # [C, L, nrates, 2]

    selffac = colamt[..., 0] * selffac
    forfac = colamt[..., 0] * forfac

    return {
        "pklay": pklay, "pklev": pklev,
        "jp": jp + 1, "jt": jt + 1, "jt1": jt1 + 1,  # 1-based (taumol)
        "fac00": fac00, "fac01": fac01, "fac10": fac10, "fac11": fac11,
        "selffac": selffac, "selffrac": selffrac, "indself": indself,
        "forfac": forfac, "forfrac": forfrac, "indfor": indfor,
        "minorfrac": minorfrac, "scaleminor": scaleminor,
        "scaleminorn2": scaleminorn2, "indminor": indminor,
        "rfrate": rfrate, "tropo": tropo,
    }


# ------------------------------------------------------------------ taumol
def _take(tabT, ids):
    """Row fetch with bounds clamp (out-of-range rows only occur under
    the opposite-atmosphere mask and are discarded).

    Small tables route through a one-hot contraction instead of a
    gather: selecting one row via 0/1 weights at HIGHEST precision is
    bit-exact, and the MXU runs it far faster than TPU gathers (the
    PPM-remap lesson, CLAUDE.md).
    """
    rows = tabT.shape[0]
    ids = jnp.clip(ids, 0, rows - 1)
    if rows <= 64:
        st = _sdt(tabT.dtype)
        oh = (ids[..., None] == jnp.arange(rows, dtype=ids.dtype)).astype(
            st
        )
        return _dot2(oh, tabT.astype(st))
    return jnp.take(tabT, ids, axis=0)


def _chirow(tab1d, ids):
    """chi_mls reference-amount row by [C, L] pressure index, as a
    one-hot selection (gathers do not lower inside the Pallas taumol
    megakernel; the selection is exact in f64 and rounds like the other
    bf16-storage selections on TPU)."""
    return _take(tab1d[:, None], ids)[..., 0]


def _self_for_all(c, selfref_all, forref_all):
    """Water-vapor self/foreign continuum for ALL bands at once: the
    interpolation indices/factors are band-independent, so the per-band
    selfref/forref tables concatenate along g and two weighted-selection
    matmuls replace ~64 per-band fetches.  Lerp weights folded into the
    row weights (reassociation roundoff only)."""
    inds = c["indself"] - 1
    indf = c["indfor"] - 1
    sfac, sfrac = c["selffac"], c["selffrac"]
    ffac, ffrac = c["forfac"], c["forfrac"]
    tauself = _weighted_rows(
        selfref_all,
        [(inds, sfac * (1.0 - sfrac)), (inds + 1, sfac * sfrac)],
    )
    taufor = _weighted_rows(
        forref_all,
        [(indf, ffac * (1.0 - ffrac)), (indf + 1, ffac * ffrac)],
    )
    return tauself, taufor


def _lerp_rows(tab, index, fint):
    """(1-f)*tab[i] + f*tab[i+1] as ONE weighted-selection matmul
    (expands the reference's lerp; matches to reassociation roundoff)."""
    return _weighted_rows(tab, [(index, 1.0 - fint), (index + 1, fint)])


def _minor1(tab, c):
    """1-D minor-gas temperature interpolation -> [C, L, ng]."""
    indm = c["indminor"] - 1
    m0 = _take(tab, indm)
    m1 = _take(tab, indm + 1)
    return m0 + c["minorfrac"][..., None] * (m1 - m0)


def _minor2(tab, jm, fm, c):
    """2-D (species x temperature) minor interpolation; tab is
    [9, 19, ng], jm/fm [C, L].

    The 4-corner bilinear interpolation as ONE weighted selection over
    the flattened [9*19] row axis — the corner weights
    (1-fm)/(fm) x (1-minorfrac)/(minorfrac) expand the reference's
    nested lerps, so the result matches to reassociation roundoff while
    avoiding any [C, L, 9, ng] intermediate."""
    nj, ni = tab.shape[0], tab.shape[1]
    indm = c["indminor"] - 1
    jmc = jnp.clip(jm, 0, nj - 2)
    imc = jnp.clip(indm, 0, ni - 2)
    base = jmc * ni + imc
    fm1 = 1.0 - fm
    mf = c["minorfrac"]
    mf1 = 1.0 - mf
    return _weighted_rows(
        tab.reshape(nj * ni, tab.shape[-1]),
        [
            (base, fm1 * mf1),
            (base + ni, fm * mf1),
            (base + 1, fm1 * mf),
            (base + ni + 1, fm * mf),
        ],
    )


# ---- factored k-table contraction machinery -------------------------
#
# Every absa/absb fetch in taumol selects rows of the form
#   base * nspa + (js - 1) + species_offset
# where base = (jp_off)*5 + (jt-1) indexes the reference-pressure x
# reference-temperature grid and the pressure/temperature interpolation
# weights (fac00/fac10 for the jp path, fac01/fac11 for jp+1) are BAND
# INDEPENDENT.  Instead of one [C, L, rows] weighted one-hot per fetch
# (~1 GB of HBM traffic each at C48), we build four SHARED base-row
# weight matrices once, contract them with every band's table reshaped
# to [nbase, nspa, ng] in a single merged einsum per atmosphere, and
# apply the small data-dependent species stencil to the [C, L, nspa, g]
# result.  Selected rows and weights are identical to the flat form;
# only the summation association differs (f64 oracle rtol 1e-9 holds).
# taumol band groupings (shared by taumol_lw and the table pre-merge in
# prep_lw_tables / the Pallas megakernel)
_SPEC_LO = (2, 3, 4, 6, 8, 11, 12, 14, 15)  # nspa=9 lower bands
_SINGLE_LO = (0, 1, 5, 7, 9, 10, 13)
_SPEC_HI = (2, 3, 4)  # nspb=5 upper bands
_SINGLE_HI = (0, 1, 6, 7, 8, 9, 10, 13)
# 1-D minor-gas (band, table) pairs sharing indminor/minorfrac
_MINOR1_KEYS = [
    (0, "ka_mn2"), (5, "ka_mco2"), (6, "kb_mco2"),
    (7, "ka_mco2"), (7, "ka_mo3"), (7, "ka_mn2o"),
    (7, "kb_mco2"), (7, "kb_mn2o"), (8, "kb_mn2o"),
    (10, "ka_mo2"), (10, "kb_mo2"), (12, "kb_mo3"),
]

NBASE_LO = 70  # 13 ref pressures x 5 temps, + the jp+1 path's rows 65-68
               # and their +1 temperature offset (row 69)
NBASE_HI = 236  # 47 x 5 for absb + the jp-12 path's +1 offset


def nbase_hi_for(min_pressure_mb) -> int:
    """Upper-atmosphere base-row count actually reachable when layer
    pressures are bounded below by ``min_pressure_mb`` (the model-top
    interface pressure): jp is monotone decreasing in pressure, so a
    3 hPa top caps jp at 30 and the one-hot weight planes shrink from
    [C, L, 236] to [C, L, 96] -- a pure-bandwidth saving on the taumol
    contractions.  ``None`` (or a very low top) keeps the full table
    range; unreachable rows were never selected, so results are
    IDENTICAL (the selection weights at rows >= the bound are all
    zero)."""
    import numpy as np

    if min_pressure_mb is None or min_pressure_mb <= 0:
        return NBASE_HI
    jp_max = int(
        np.clip(
            np.floor(36.0 - 5.0 * (np.log(min_pressure_mb) + 0.04)),
            13, 58,
        )
    )
    return int(min(NBASE_HI, (jp_max - 12) * 5 + 6))


def _reshape_base(tab, nspa, nbase):
    """Flat [rows, ng] k-table -> [nbase, nspa, ng] (zero-padded past the
    stencil slack; padded rows are only addressed by opposite-atmosphere
    lanes that the tropo mask discards)."""
    rows = tab.shape[0]
    need = nbase * nspa
    if rows < need:
        tab = jnp.pad(tab, ((0, need - rows), (0, 0)))
    return tab[:need].reshape(nbase, nspa, tab.shape[-1])


def _fac_weights(base, fac_a, fac_b, nbase, dtype):
    """fac_a * onehot(base) + fac_b * onehot(base + 1), [C, L, nbase].
    Built directly in the storage dtype (bf16 mode halves the write)."""
    dtype = _sdt(dtype)
    iota = jnp.arange(nbase, dtype=jnp.int32)
    b0 = jnp.clip(base, 0, nbase - 1)[..., None]
    b1 = jnp.clip(base + 1, 0, nbase - 1)[..., None]
    return (b0 == iota).astype(dtype) * fac_a[..., None].astype(dtype) + (
        (b1 == iota).astype(dtype) * fac_b[..., None].astype(dtype)
    )


def _dot2(W, tab):
    """[..., b] x [b, G] -> [..., G] as a rank-2 MXU dot (the leading
    dims flattened): identical HLO under XLA, and the only dot form the
    Mosaic (Pallas) lowering accepts inside the taumol megakernel.

    Inside a Pallas kernel the contracting dim must be tile-aligned
    (16 sublanes for bf16, 8 for f32); zero-padding it is exact."""
    lead = W.shape[:-1]
    tab = tab.astype(W.dtype)
    if _IN_PALLAS:
        mult = 16 if W.dtype == jnp.bfloat16 else 8
        k = W.shape[-1]
        kp = -(-k // mult) * mult
        if kp != k:
            W = jnp.pad(
                W, ((0, 0),) * (W.ndim - 1) + ((0, kp - k),)
            )
            tab = jnp.pad(tab, ((0, kp - k), (0, 0)))
    if _IN_PALLAS and W.dtype == jnp.bfloat16:
        # Mosaic requires a 32-bit accumulator for bf16 matmuls
        out = jax.lax.dot_general(
            W.reshape((-1, W.shape[-1])), tab,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(W.dtype)
    else:
        out = jax.lax.dot_general(
            W.reshape((-1, W.shape[-1])), tab,
            (((1,), (0,)), ((), ())),
            precision=_mm_precision(W.dtype),
        )
    return out.reshape(lead + (tab.shape[-1],))


# set True while tracing the Pallas taumol megakernel body
# (pallas_taumol.py) so the shared helpers emit tile-aligned dots
_IN_PALLAS = False


def _merged_A(W, tabs, nspa, nbase):
    """[C,L,nbase] x [nbase, nspa, sum_ng] -> [C,L,nspa,sum_ng]: the
    pressure/temperature-interpolated table rows for a group of bands."""
    tab = jnp.concatenate(
        [_reshape_base(t, nspa, nbase) for t in tabs], axis=-1
    )
    flat = _dot2(W, tab.reshape(nbase, -1))
    return flat.reshape(W.shape[:-1] + (nspa, tab.shape[-1]))


def _merged_single(Wsum, tabs, nbase):
    """Single-key-species variant: [C,L,nbase] x [nbase, sum_ng]."""
    tab = jnp.concatenate(
        [_reshape_base(t, 1, nbase)[:, 0] for t in tabs], axis=-1
    )
    return _dot2(Wsum, tab)


def _stencil3_terms(specparm, fs, js, dtype):
    """3-point species stencil as (position, weight) pairs.  Weights
    replicate the reference port's vectorized expression exactly,
    including its where(...==0) selection quirks (radlw_bands.py:439-491);
    the species offsets are (0,1,2) for the low/normal branches and
    (1,0,-1) for specparm>0.875, matching the flat row ids."""
    lo = specparm < 0.125
    hi = specparm > 0.875
    zero = jnp.zeros_like(fs)
    p = jnp.where(lo, fs - 1.0, zero) + jnp.where(hi, -fs, zero)
    p = jnp.where(p == 0, zero, p)
    p4 = jnp.where(lo, p ** 4, zero) + jnp.where(hi, p ** 4, zero)
    p4 = jnp.where(p4 == 0, zero, p4)
    fk0 = jnp.where(lo, p4, zero) + jnp.where(hi, p ** 4, zero)
    fk0 = jnp.where(fk0 == 0, 1.0 - fs, fk0)
    fk1 = jnp.where(lo, 1.0 - p - 2.0 * p4, zero) + jnp.where(
        hi, 1.0 - p - 2.0 * p4, zero
    )
    fk1 = jnp.where(fk1 == 0, fs, fk1)
    fk2 = jnp.where(lo, p + p4, zero) + jnp.where(hi, p + p4, zero)
    fk2 = jnp.where(fk2 == 0, zero, fk2)
    izero = jnp.zeros_like(js)
    ione = jnp.ones_like(js)
    d0 = jnp.where(hi, ione, izero)
    d1 = jnp.where(hi, izero, ione)
    d2 = jnp.where(hi, -ione, 2 * ione)
    j = js - 1
    return [
        (jnp.clip(j + d0, 0, 8), fk0.astype(dtype)),
        (jnp.clip(j + d1, 0, 8), fk1.astype(dtype)),
        (jnp.clip(j + d2, 0, 8), fk2.astype(dtype)),
    ]


def _stencil3(specparm, fs, js, dtype):
    """[C, L, 9] weighted one-hot built from _stencil3_terms."""
    dtype = _sdt(dtype)
    iota = jnp.arange(9, dtype=jnp.int32)
    out = None
    for pos, w in _stencil3_terms(specparm, fs, js, dtype):
        contrib = (pos[..., None] == iota).astype(dtype) * w[..., None]
        out = contrib if out is None else out + contrib
    return out


def _stencil2_terms(fs, js, nspb, dtype):
    """2-point species stencil as (position, weight) pairs."""
    j = js - 1
    return [
        (jnp.clip(j, 0, nspb - 1), (1.0 - fs).astype(dtype)),
        (jnp.clip(j + 1, 0, nspb - 1), fs.astype(dtype)),
    ]


def _stencil2(fs, js, nspb, dtype):
    """2-point species stencil [C, L, nspb] (upper-atmosphere tables)."""
    dtype = _sdt(dtype)
    iota = jnp.arange(nspb, dtype=jnp.int32)
    out = None
    for pos, w in _stencil2_terms(fs, js, nspb, dtype):
        contrib = (pos[..., None] == iota).astype(dtype) * w[..., None]
        out = contrib if out is None else out + contrib
    return out


def _contract(S, A):
    """[C,L,s] species stencil applied to [C,L,s,g] -> [C,L,g]
    (accumulated in f32 even when the operands are stored bf16)."""
    return (S[..., None] * A).sum(axis=2, dtype=_acc(A.dtype))


def _spec(colA, colB, rate):
    speccomb = colA + rate * colB
    specparm = colA / speccomb
    specmult = 8.0 * jnp.minimum(specparm, P.ONEMINUS)
    js = 1 + specmult.astype(jnp.int32)
    fs = specmult % 1.0
    return speccomb, specparm, js, fs


def _spec_upper(colA, colB, rate):
    speccomb = colA + rate * colB
    specparm = colA / speccomb
    specmult = 4.0 * jnp.minimum(specparm, P.ONEMINUS)
    js = 1 + specmult.astype(jnp.int32)
    fs = specmult % 1.0
    return speccomb, specparm, js, fs


def _jpl(colA, colB, refrat, mult=8.0):
    speccomb = colA + refrat * colB
    specparm = colA / speccomb
    specmult = mult * jnp.minimum(specparm, P.ONEMINUS)
    j = specmult.astype(jnp.int32)  # 0-based
    f = specmult % 1.0
    return j, f


def _weighted_rows(tabT, terms):
    """Σ_k w_k * tab[id_k] as ONE weighted-selection matmul.

    Builds the [C, L, rows] weight matrix by summing weighted one-hots
    (XLA fuses the comparisons into a single pass) and contracts it with
    the table on the MXU — replacing k row-gathers, which measured ~23 ms
    EACH on v5e for [442k] indices, with one ~3 ms contraction.  Each
    product w_k*tab[id_k] is formed exactly as in the reference
    expression; only the summation order differs (within the oracle
    tolerances, f64 rtol 1e-9).
    """
    st = _sdt(tabT.dtype)
    rows = tabT.shape[0]
    iota = jnp.arange(rows, dtype=jnp.int32)
    W = None
    for ids, w in terms:
        oh = (
            jnp.clip(ids, 0, rows - 1)[..., None] == iota
        ).astype(st)
        contrib = oh if w is None else oh * w[..., None].astype(st)
        W = contrib if W is None else W + contrib
    return _dot2(W, tabT.astype(st))


def _frac2(fracT, jpl, fpl):
    f0 = _take(fracT, jpl)
    f1 = _take(fracT, jpl + 1)
    return f0 + fpl[..., None] * (f1 - f0)


def g_offsets(idx_list, ng):
    """g-point slice per band within a concatenated per-band table
    (shared by the LW and SW taumol; ``ng`` = P.NG_LW or P.NG_SW)."""
    out, off = {}, 0
    for i in idx_list:
        out[i] = slice(off, off + ng[i])
        off += ng[i]
    return out


def taumol_lw(c, colamt, coldry, colbrd, wx, tauaer, T):
    """Gas optical depth + Planck fractions for all 140 g-points.

    c: setcoef_lw output; colamt [C,L,7], wx [C,L,4], tauaer
    [C,L,nbands].  Returns (fracs, tautot) each [C, L, ngptlw]."""
    chi = T["chi_mls"]
    B = T["bands"]
    # expand in int then compare: Mosaic cannot reshape i1 vectors, and
    # this form is fusion-free under XLA too
    tropo = c["tropo"].astype(jnp.int32)[..., None] != 0
    taus = []
    fracs_all = []
    jp = c["jp"]  # 1-based

    def combine(lower, upper):
        return jnp.where(tropo, lower, upper)

    def bcast1(v):  # [ng] -> [C, L, ng]
        return jnp.broadcast_to(
            v, c["fac00"].shape + (v.shape[0],)
        )

    # shared pressure/temperature base-row weight matrices + merged
    # per-atmosphere table contractions (see the machinery note above)
    dtype = c["fac00"].dtype
    base0 = (jp - 1) * 5 + (c["jt"] - 1)
    base1 = jp * 5 + (c["jt1"] - 1)
    Wlo0 = _fac_weights(base0, c["fac00"], c["fac10"], NBASE_LO, dtype)
    Wlo1 = _fac_weights(base1, c["fac01"], c["fac11"], NBASE_LO, dtype)
    NBH = int(T.get("nbase_hi", NBASE_HI))
    baseU0 = (jp - 13) * 5 + (c["jt"] - 1)
    baseU1 = (jp - 12) * 5 + (c["jt1"] - 1)
    Whi0 = _fac_weights(baseU0, c["fac00"], c["fac10"], NBH, dtype)
    Whi1 = _fac_weights(baseU1, c["fac01"], c["fac11"], NBH, dtype)

    SPEC_LO = _SPEC_LO
    SINGLE_LO = _SINGLE_LO
    SPEC_HI = _SPEC_HI
    SINGLE_HI = _SINGLE_HI
    # band 16's nspb is 0, so the reference's flat upper index collapses
    # to rows 0/1 regardless of jp/jt — handled inline at band 16

    sl9 = g_offsets(SPEC_LO, P.NG_LW)
    sl1 = g_offsets(SINGLE_LO, P.NG_LW)
    sl5 = g_offsets(SPEC_HI, P.NG_LW)
    sh1 = g_offsets(SINGLE_HI, P.NG_LW)

    pallas_mode = _pallas_ktable_mode()
    G9 = sum(P.NG_LW[i] for i in SPEC_LO)
    G5 = sum(P.NG_LW[i] for i in SPEC_HI)
    if _IN_PALLAS:
        # megakernel route: FLAT interpolated-table planes ([.., nspa*G],
        # no >2-D reshapes — Mosaic cannot lower them); consumed by the
        # sliced flat contraction in tau_spec_lo/hi below
        A9f_0 = _dot2(Wlo0, T["mtab_lo9"])
        A9f_1 = _dot2(Wlo1, T["mtab_lo9"])
        A5f_0 = _dot2(Whi0, T["mtab_hi5"])
        A5f_1 = _dot2(Whi1, T["mtab_hi5"])
    elif pallas_mode == "off":
        A9_0 = _merged_A(Wlo0, [B[i]["absa"] for i in SPEC_LO], 9, NBASE_LO)
        A9_1 = _merged_A(Wlo1, [B[i]["absa"] for i in SPEC_LO], 9, NBASE_LO)
        A5_0 = _merged_A(Whi0, [B[i]["absb"] for i in SPEC_HI], 5, NBH)
        A5_1 = _merged_A(Whi1, [B[i]["absb"] for i in SPEC_HI], 5, NBH)
    A1_lo = _dot2(Wlo0 + Wlo1, T["mtab_lo1"].astype(_sdt(dtype)))
    A1_hi = _dot2(Whi0 + Whi1, T["mtab_hi1"].astype(_sdt(dtype)))

    # raw pressure/temperature selection pairs for the Pallas route
    # (same clipping as _fac_weights)
    def _base_pairs(base, fac_a, fac_b, nbase):
        return [
            (jnp.clip(base, 0, nbase - 1), fac_a),
            (jnp.clip(base + 1, 0, nbase - 1), fac_b),
        ]

    PBL0 = _base_pairs(base0, c["fac00"], c["fac10"], NBASE_LO)
    PBL1 = _base_pairs(base1, c["fac01"], c["fac11"], NBASE_LO)
    PBH0 = _base_pairs(baseU0, c["fac00"], c["fac10"], NBH)
    PBH1 = _base_pairs(baseU1, c["fac01"], c["fac11"], NBH)

    def _flat_tab(tab, nspa, nbase):
        t = _reshape_base(tab, nspa, nbase)  # [nbase, nspa, ng]
        return t.reshape(nbase, nspa * t.shape[-1])

    def _tau_spec_pallas(tab_grp, nspa, groups):
        """Σ_p scale·contract(stencil_p, W_p @ tab) with the [.., nspa,
        ng] interpolation block kept in VMEM (ops/pallas_ktable.py) —
        identical selections to the XLA path, no HBM intermediate."""
        w_paths = [pbase for pbase, _, _ in groups]
        s_paths = [
            [(pos, scale * w) for pos, w in stencil]
            for _, stencil, scale in groups
        ]
        return pallas_ktable.spec_band_dot(
            w_paths, s_paths, tab_grp, nspa,
            interpret=(pallas_mode == "interpret"),
        )

    def _contract_flat(S, Af, nspa, Gsum, sl):
        """Sliced flat contraction: Σ_s S[.., s] * Af[.., s*Gsum + sl]
        — the reshape-free (Mosaic-compatible) form of
        ``_contract(S, A[..., sl])``; f32 accumulation, reassociation
        roundoff only."""
        acc_dt = _acc(Af.dtype)
        acc = None
        for s in range(nspa):
            chunk = Af[..., s * Gsum + sl.start : s * Gsum + sl.stop]
            term = (
                S[..., s : s + 1].astype(acc_dt) * chunk.astype(acc_dt)
            )
            acc = term if acc is None else acc + term
        return acc

    tauself_all, taufor_all = _self_for_all(
        c, T["selfref_all"], T["forref_all"]
    )

    def self_for(b):
        sl = slice(P.NS_LW[b], P.NS_LW[b] + P.NG_LW[b])
        return tauself_all[..., sl], taufor_all[..., sl]

    # batched 1-D minor-gas temperature interpolation: every ka_m*/kb_m*
    # table shares the SAME indminor/minorfrac, so ONE pair of row
    # selections over the concatenated tables replaces 12 separate
    # _minor1 fetches (bit-exact: identical per-row selections and the
    # identical m0 + mf*(m1-m0) lerp, just sliced from a wider plane)
    minor1_all = _minor1(T["minor1_all"], c)
    _m1_sl = {}
    off = 0
    for i, k in _MINOR1_KEYS:
        _m1_sl[(i, k)] = slice(off, off + P.NG_LW[i])
        off += P.NG_LW[i]

    def minor1(i, key):
        return minor1_all[..., _m1_sl[(i, key)]]

    def tau_single_lo(i, col):
        return col[..., None] * A1_lo[..., sl1[i]]

    def tau_single_hi(i, col):
        return col[..., None] * A1_hi[..., sh1[i]]

    def tau_spec_lo(i, sc, sp, fs, js, sc1, sp1, fs1, js1):
        if _IN_PALLAS:
            return sc[..., None] * _contract_flat(
                _stencil3(sp, fs, js, dtype), A9f_0, 9, G9, sl9[i]
            ) + sc1[..., None] * _contract_flat(
                _stencil3(sp1, fs1, js1, dtype), A9f_1, 9, G9, sl9[i]
            )
        if pallas_mode != "off":
            return _tau_spec_pallas(
                _flat_tab(B[i]["absa"], 9, NBASE_LO), 9,
                [(PBL0, _stencil3_terms(sp, fs, js, dtype), sc),
                 (PBL1, _stencil3_terms(sp1, fs1, js1, dtype), sc1)],
            )
        return sc[..., None] * _contract(
            _stencil3(sp, fs, js, dtype), A9_0[..., sl9[i]]
        ) + sc1[..., None] * _contract(
            _stencil3(sp1, fs1, js1, dtype), A9_1[..., sl9[i]]
        )

    def tau_spec_hi(i, scU, fsU, jsU, scU1, fsU1, jsU1):
        if _IN_PALLAS:
            return scU[..., None] * _contract_flat(
                _stencil2(fsU, jsU, 5, dtype), A5f_0, 5, G5, sl5[i]
            ) + scU1[..., None] * _contract_flat(
                _stencil2(fsU1, jsU1, 5, dtype), A5f_1, 5, G5, sl5[i]
            )
        if pallas_mode != "off":
            return _tau_spec_pallas(
                _flat_tab(B[i]["absb"], 5, NBH), 5,
                [(PBH0, _stencil2_terms(fsU, jsU, 5, dtype), scU),
                 (PBH1, _stencil2_terms(fsU1, jsU1, 5, dtype), scU1)],
            )
        return scU[..., None] * _contract(
            _stencil2(fsU, jsU, 5, dtype), A5_0[..., sl5[i]]
        ) + scU1[..., None] * _contract(
            _stencil2(fsU1, jsU1, 5, dtype), A5_1[..., sl5[i]]
        )

    # ---- band 1: h2o, minor n2 (both atmospheres) --------------------
    bt = B[0]
    tauself, taufor = self_for(0)
    scalen2 = (colbrd * c["scaleminorn2"])[..., None]
    taun2_lo = scalen2 * minor1(0, "ka_mn2")
    pavel = c["pavel"]
    corradj_lo = jnp.where(
        pavel < 250.0, 1.0 - 0.15 * (250.0 - pavel) / 154.4, 1.0
    )[..., None]
    lower = corradj_lo * (
        tau_single_lo(0, colamt[..., 0])
        + tauself + taufor + taun2_lo
    )
    corradj_hi = (1.0 - 0.15 * (pavel / 95.6))[..., None]
    upper = corradj_hi * (
        tau_single_hi(0, colamt[..., 0])
        + taufor + taun2_lo
    )
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 2: h2o --------------------------------------------------
    bt = B[1]
    tauself, taufor = self_for(1)
    corradj = (1.0 - 0.05 * (pavel - 100.0) / 900.0)[..., None]
    lower = corradj * (
        tau_single_lo(1, colamt[..., 0]) + tauself + taufor
    )
    upper = tau_single_hi(1, colamt[..., 0]) + taufor
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 3: h2o+co2, minor n2o (both) ---------------------------
    bt = B[2]
    refrat_pl_a = chi[0, 8] / chi[1, 8]
    refrat_pl_b = chi[0, 12] / chi[1, 12]
    refrat_m_a = chi[0, 2] / chi[1, 2]
    refrat_m_b = chi[0, 12] / chi[1, 12]
    h2o, co2, n2o = colamt[..., 0], colamt[..., 1], colamt[..., 3]
    sc, sp, js, fs = _spec(h2o, co2, c["rfrate"][..., 0, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, co2, c["rfrate"][..., 0, 1])
    jmn2o, fmn2o = _jpl(h2o, co2, refrat_m_a)
    jpl_, fpl = _jpl(h2o, co2, refrat_pl_a)
    ratn2o = n2o / (coldry * _chirow(chi[3], jp))
    adjcoln2o = jnp.where(
        ratn2o > 1.5,
        (0.5 + (ratn2o - 0.5) ** 0.65)
        * (coldry * _chirow(chi[3], jp)),
        n2o,
    )
    tauself, taufor = self_for(2)
    absn2o = _minor2(bt["ka_mn2o"], jmn2o, fmn2o, c)
    lower = (
        tau_spec_lo(2, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor + adjcoln2o[..., None] * absn2o
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    # upper
    scU, spU, jsU, fsU = _spec_upper(h2o, co2, c["rfrate"][..., 0, 0])
    scU1, spU1, jsU1, fsU1 = _spec_upper(h2o, co2, c["rfrate"][..., 0, 1])
    jmn2oU, fmn2oU = _jpl(h2o, co2, refrat_m_b, mult=4.0)
    jplU, fplU = _jpl(h2o, co2, refrat_pl_b, mult=4.0)
    absn2oU = _minor2(bt["kb_mn2o"], jmn2oU, fmn2oU, c)
    upper = (
        tau_spec_hi(2, scU, fsU, jsU, scU1, fsU1, jsU1)
        + taufor + adjcoln2o[..., None] * absn2oU
    )
    fr_hi = _frac2(bt["fracrefb"], jplU, fplU)
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, fr_hi))

    # ---- band 4: h2o+co2 lower / o3+co2 upper ------------------------
    bt = B[3]
    refrat_pl_a = chi[0, 10] / chi[1, 10]
    refrat_pl_b = chi[2, 12] / chi[1, 12]
    o3 = colamt[..., 2]
    sc, sp, js, fs = _spec(h2o, co2, c["rfrate"][..., 0, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, co2, c["rfrate"][..., 0, 1])
    jpl_, fpl = _jpl(h2o, co2, refrat_pl_a)
    tauself, taufor = self_for(3)
    lower = (
        tau_spec_lo(3, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    scU, spU, jsU, fsU = _spec_upper(o3, co2, c["rfrate"][..., 5, 0])
    scU1, spU1, jsU1, fsU1 = _spec_upper(o3, co2, c["rfrate"][..., 5, 1])
    jplU, fplU = _jpl(o3, co2, refrat_pl_b, mult=4.0)
    upper = tau_spec_hi(3, scU, fsU, jsU, scU1, fsU1, jsU1)
    # stratospheric co2 cooling-rate adjustment (g-point weights)
    upper = upper * bt["co2adj"].astype(upper.dtype)
    fr_hi = _frac2(bt["fracrefb"], jplU, fplU)
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, fr_hi))

    # ---- band 5: h2o+co2 lower (minor o3, ccl4) / o3+co2 upper -------
    bt = B[4]
    refrat_pl_a = chi[0, 4] / chi[1, 4]
    refrat_pl_b = chi[2, 42] / chi[1, 42]
    refrat_m_a = chi[0, 6] / chi[1, 6]
    sc, sp, js, fs = _spec(h2o, co2, c["rfrate"][..., 0, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, co2, c["rfrate"][..., 0, 1])
    jmo3, fmo3 = _jpl(h2o, co2, refrat_m_a)
    jpl_, fpl = _jpl(h2o, co2, refrat_pl_a)
    tauself, taufor = self_for(4)
    abso3 = _minor2(bt["ka_mo3"], jmo3, fmo3, c)
    lower = (
        tau_spec_lo(4, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor
        + abso3 * o3[..., None]
        + wx[..., 0:1] * bt["ccl4"]
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    scU, spU, jsU, fsU = _spec_upper(o3, co2, c["rfrate"][..., 5, 0])
    scU1, spU1, jsU1, fsU1 = _spec_upper(o3, co2, c["rfrate"][..., 5, 1])
    jplU, fplU = _jpl(o3, co2, refrat_pl_b, mult=4.0)
    upper = (
        tau_spec_hi(4, scU, fsU, jsU, scU1, fsU1, jsU1)
        + wx[..., 0:1] * bt["ccl4"]
    )
    fr_hi = _frac2(bt["fracrefb"], jplU, fplU)
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, fr_hi))

    # ---- band 6: h2o lower (minor co2, cfc11/12); cfc-only upper -----
    bt = B[5]
    tauself, taufor = self_for(5)
    ratco2 = co2 / (coldry * _chirow(chi[1], jp + 1))
    adjcolco2 = jnp.where(
        ratco2 > 3.0,
        (2.0 + (ratco2 - 2.0) ** 0.77)
        * (coldry * _chirow(chi[1], jp + 1)),
        co2,
    )
    absco2 = minor1(5, "ka_mco2")
    cfcs = (
        wx[..., 1:2] * bt["cfc11adj"] + wx[..., 2:3] * bt["cfc12"]
    )
    lower = (
        tau_single_lo(5, colamt[..., 0])
        + tauself + taufor + adjcolco2[..., None] * absco2 + cfcs
    )
    upper = cfcs
    taus.append(combine(lower, upper))
    fracs_all.append(bcast1(bt["fracrefa"]))

    # ---- band 7: h2o+o3 lower (minor co2) / o3 upper (minor co2) -----
    bt = B[6]
    refrat_pl_a = chi[0, 2] / chi[2, 2]
    refrat_m_a = chi[0, 2] / chi[2, 2]
    sc, sp, js, fs = _spec(h2o, o3, c["rfrate"][..., 1, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, o3, c["rfrate"][..., 1, 1])
    jmco2, fmco2 = _jpl(h2o, o3, refrat_m_a)
    jpl_, fpl = _jpl(h2o, o3, refrat_pl_a)
    ratco2_lo = co2 / (coldry * _chirow(chi[1], jp))
    adjco2_lo = jnp.where(
        ratco2_lo > 3.0,
        (3.0 + (ratco2_lo - 3.0) ** 0.79)
        * (coldry * _chirow(chi[1], jp)),
        co2,
    )
    tauself, taufor = self_for(6)
    absco2_lo = _minor2(bt["ka_mco2"], jmco2, fmco2, c)
    lower = (
        tau_spec_lo(6, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor + adjco2_lo[..., None] * absco2_lo
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    adjco2_hi = jnp.where(
        ratco2_lo > 3.0,
        (2.0 + (ratco2_lo - 2.0) ** 0.79)
        * (coldry * _chirow(chi[1], jp)),
        co2,
    )
    absco2_hi = minor1(6, "kb_mco2")
    upper = (
        tau_single_hi(6, o3)
        + adjco2_hi[..., None] * absco2_hi
    )
    upper = upper * bt["co2adj"].astype(upper.dtype)
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, bcast1(bt["fracrefb"])))

    # ---- band 8: h2o lower (minors co2,o3,n2o,cfc) / o3 upper --------
    bt = B[7]
    tauself, taufor = self_for(7)
    ratco2 = co2 / (coldry * _chirow(chi[1], jp))
    adjcolco2 = jnp.where(
        ratco2 > 3.0,
        (2.0 + (ratco2 - 2.0) ** 0.65)
        * (coldry * _chirow(chi[1], jp)),
        co2,
    )
    cfc = wx[..., 2:3] * bt["cfc12"] + wx[..., 3:4] * bt["cfc22adj"]
    lower = (
        tau_single_lo(7, colamt[..., 0])
        + tauself + taufor
        + adjcolco2[..., None] * minor1(7, "ka_mco2")
        + o3[..., None] * minor1(7, "ka_mo3")
        + n2o[..., None] * minor1(7, "ka_mn2o")
        + cfc
    )
    upper = (
        tau_single_hi(7, o3)
        + adjcolco2[..., None] * minor1(7, "kb_mco2")
        + n2o[..., None] * minor1(7, "kb_mn2o")
        + cfc
    )
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 9: h2o+ch4 lower (minor n2o) / ch4 upper (minor n2o) ---
    bt = B[8]
    ch4 = colamt[..., 4]
    refrat_pl_a = chi[0, 8] / chi[5, 8]
    refrat_m_a = chi[0, 2] / chi[5, 2]
    sc, sp, js, fs = _spec(h2o, ch4, c["rfrate"][..., 3, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, ch4, c["rfrate"][..., 3, 1])
    jmn2o, fmn2o = _jpl(h2o, ch4, refrat_m_a)
    jpl_, fpl = _jpl(h2o, ch4, refrat_pl_a)
    ratn2o = n2o / (coldry * _chirow(chi[3], jp))
    adjcoln2o = jnp.where(
        ratn2o > 1.5,
        (0.5 + (ratn2o - 0.5) ** 0.65)
        * (coldry * _chirow(chi[3], jp)),
        n2o,
    )
    tauself, taufor = self_for(8)
    absn2o = _minor2(bt["ka_mn2o"], jmn2o, fmn2o, c)
    lower = (
        tau_spec_lo(8, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor + adjcoln2o[..., None] * absn2o
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    upper = (
        tau_single_hi(8, ch4)
        + adjcoln2o[..., None] * minor1(8, "kb_mn2o")
    )
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, bcast1(bt["fracrefb"])))

    # ---- band 10: h2o both ------------------------------------------
    bt = B[9]
    tauself, taufor = self_for(9)
    lower = tau_single_lo(9, colamt[..., 0]) + tauself + taufor
    upper = tau_single_hi(9, colamt[..., 0]) + taufor
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 11: h2o both (minor o2) --------------------------------
    bt = B[10]
    tauself, taufor = self_for(10)
    scaleo2 = (colamt[..., 5] * c["scaleminor"])[..., None]
    lower = (
        tau_single_lo(10, colamt[..., 0])
        + tauself + taufor + scaleo2 * minor1(10, "ka_mo2")
    )
    upper = (
        tau_single_hi(10, colamt[..., 0])
        + taufor + scaleo2 * minor1(10, "kb_mo2")
    )
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 12: h2o+co2 lower / nothing upper ----------------------
    bt = B[11]
    refrat_pl_a = chi[0, 9] / chi[1, 9]
    sc, sp, js, fs = _spec(h2o, co2, c["rfrate"][..., 0, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, co2, c["rfrate"][..., 0, 1])
    # planck: clamp specparm to oneminus BEFORE mult (reference quirk,
    # radlw_bands.py:2584-2588)
    spk = h2o / (h2o + refrat_pl_a * co2)
    spk = jnp.where(spk >= P.ONEMINUS, P.ONEMINUS, spk)
    smk = 8.0 * spk
    jpl_ = smk.astype(jnp.int32)
    fpl = smk % 1.0
    tauself, taufor = self_for(11)
    lower = (
        tau_spec_lo(11, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    taus.append(combine(lower, jnp.zeros_like(lower)))
    fracs_all.append(combine(fr_lo, jnp.zeros_like(fr_lo)))

    # ---- band 13: h2o+n2o lower (minors co2,co) / o3-minor upper -----
    bt = B[12]
    refrat_pl_a = chi[0, 4] / chi[3, 4]
    refrat_m_a = chi[0, 0] / chi[3, 0]
    refrat_m_a3 = chi[0, 2] / chi[3, 2]
    sc, sp, js, fs = _spec(h2o, n2o, c["rfrate"][..., 2, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, n2o, c["rfrate"][..., 2, 1])
    jmco2, fmco2 = _jpl(h2o, n2o, refrat_m_a)
    jmco, fmco = _jpl(h2o, n2o, refrat_m_a3)
    jpl_, fpl = _jpl(h2o, n2o, refrat_pl_a)
    ratco2 = co2 / (coldry * 3.55e-4)
    adjcolco2 = jnp.where(
        ratco2 > 3.0,
        (2.0 + (ratco2 - 2.0) ** 0.68) * (coldry * 3.55e-4),
        co2,
    )
    tauself, taufor = self_for(12)
    absco2 = _minor2(bt["ka_mco2"], jmco2, fmco2, c)
    absco = _minor2(bt["ka_mco"], jmco, fmco, c)
    lower = (
        tau_spec_lo(12, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor
        + adjcolco2[..., None] * absco2
        + colamt[..., 6:7] * absco
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    upper = o3[..., None] * minor1(12, "kb_mo3")
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, bcast1(bt["fracrefb"])))

    # ---- band 14: co2 both -------------------------------------------
    bt = B[13]
    tauself, taufor = self_for(13)
    lower = tau_single_lo(13, co2) + tauself + taufor
    upper = tau_single_hi(13, co2)
    taus.append(combine(lower, upper))
    fracs_all.append(
        combine(bcast1(bt["fracrefa"]), bcast1(bt["fracrefb"]))
    )

    # ---- band 15: n2o+co2 lower (minor n2) / nothing upper -----------
    bt = B[14]
    refrat_pl_a = chi[3, 0] / chi[1, 0]
    refrat_m_a = chi[3, 0] / chi[1, 0]
    sc, sp, js, fs = _spec(n2o, co2, c["rfrate"][..., 4, 0])
    sc1, sp1, js1, fs1 = _spec(n2o, co2, c["rfrate"][..., 4, 1])
    jmn2, fmn2 = _jpl(n2o, co2, refrat_m_a)
    jpl_, fpl = _jpl(n2o, co2, refrat_pl_a)
    scalen2 = (colbrd * c["scaleminor"])[..., None]
    tauself, taufor = self_for(14)
    taun2 = scalen2 * _minor2(bt["ka_mn2"], jmn2, fmn2, c)
    lower = (
        tau_spec_lo(14, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor + taun2
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    taus.append(combine(lower, jnp.zeros_like(lower)))
    fracs_all.append(combine(fr_lo, jnp.zeros_like(fr_lo)))

    # ---- band 16: h2o+ch4 lower / ch4 upper --------------------------
    bt = B[15]
    refrat_pl_a = chi[0, 5] / chi[5, 5]
    sc, sp, js, fs = _spec(h2o, ch4, c["rfrate"][..., 3, 0])
    sc1, sp1, js1, fs1 = _spec(h2o, ch4, c["rfrate"][..., 3, 1])
    jpl_, fpl = _jpl(h2o, ch4, refrat_pl_a)
    tauself, taufor = self_for(15)
    lower = (
        tau_spec_lo(15, sc, sp, fs, js, sc1, sp1, fs1, js1)
        + tauself + taufor
    )
    fr_lo = _frac2(bt["fracrefa"], jpl_, fpl)
    # nspb=0 quirk: flat upper rows collapse to 0 (fac00/fac01) and 1
    # (fac10/fac11) for every layer
    upper = ch4[..., None] * (
        (c["fac00"] + c["fac01"])[..., None] * bt["absb"][0]
        + (c["fac10"] + c["fac11"])[..., None] * bt["absb"][1]
    )
    taus.append(combine(lower, upper))
    fracs_all.append(combine(fr_lo, bcast1(bt["fracrefb"])))

    # the two [C, L, ngptlw] solver inputs are written in the storage
    # dtype (per-band converts fuse into each band's producer chain).
    # The per-band aerosol tau is folded into each band's producer
    # BEFORE the concat: taug itself is never materialized (previously
    # tautot = taug + take(tauaer, ngb) cost an extra full-plane
    # write+read pair), and the add runs in the compute dtype.
    st = _sdt(dtype)
    tautot = jnp.concatenate(
        [
            (t + tauaer[..., i : i + 1]).astype(st)
            for i, t in enumerate(taus)
        ],
        axis=-1,
    )  # [C, L, ngptlw]
    fracs = jnp.concatenate(
        [f.astype(st) for f in fracs_all], axis=-1
    )
    return fracs, tautot


# ------------------------------------------------------------------ clouds
def cldprop_lw(
    cfrac, clwp, relw, ciwp, reiw, cda1, cda2, cda3, cda4, rand, T,
    iovrlw: int = 1, ilwcliq: int = 1, ilwcice: int = 3,
):
    """Cloud optical depth per band + McICA per-g binary cloud masks.

    cfrac..cda4: [C, L] (layer quantities, k=0 at the surface); rand:
    [C, ngptlw*L] uniform randoms ordered g-major like the reference's
    rand2d (radlw_main.py:66-72).  Returns (cldfmc [C, L, ngpt],
    taucld [C, L, nbands])."""
    absliq1, absice3 = T["absliq1"], T["absice3"]
    dtype = cfrac.dtype
    cloudy_lay = cfrac > P.CLDMIN

    tauran = P.ABSRAIN * cda1
    tausnw = jnp.where(
        (cda3 > 0.0) & (cda4 > 10.0),
        P.ABSSNOW0 * 1.05756 * cda3 / jnp.maximum(cda4, 1e-12),
        0.0,
    )

    if ilwcliq == 1:
        factor = relw - 1.5
        index = jnp.clip(_trunc(factor), 1.0, 57.0).astype(jnp.int32) - 1
        fint = factor - (index + 1).astype(dtype)
        tauliq = jnp.maximum(
            0.0, clwp[..., None] * _lerp_rows(absliq1, index, fint)
        )
        tauliq = jnp.where((clwp > 0.0)[..., None], tauliq, 0.0)
    else:
        tauliq = jnp.zeros(cfrac.shape + (P.NBANDS_LW,), dtype)

    if ilwcice == 3:
        dgeice = jnp.maximum(5.0, 1.0315 * reiw)
        factor = (dgeice - 2.0) / 3.0
        index = jnp.clip(_trunc(factor), 1.0, 45.0).astype(jnp.int32) - 1
        fint = factor - (index + 1).astype(dtype)
        tauice = jnp.maximum(
            0.0, ciwp[..., None] * _lerp_rows(absice3, index, fint)
        )
        tauice = jnp.where((ciwp > 0.0)[..., None], tauice, 0.0)
    else:
        tauice = jnp.zeros(cfrac.shape + (P.NBANDS_LW,), dtype)

    taucld = tauice + tauliq + (tauran + tausnw)[..., None]
    taucld = jnp.where(cloudy_lay[..., None], taucld, 0.0)

    # McICA subcolumns
    C, L = cfrac.shape
    cldf = jnp.where(cloudy_lay, cfrac, 0.0)
    # rand may arrive in the bf16 storage dtype; run the overlap walk in
    # the compute dtype (the upcast fuses into the unrolled walk — the
    # HBM-resident plane stays bf16) so both storage modes walk
    # identically
    cdfunc = rand.reshape(C, P.NGPT_LW, L).astype(dtype)
    if iovrlw == 1:  # maximum-random overlap, bottom-up walk
        def body(carry, xs):
            cdf_prev, cldf_prev = carry
            cdf_k, cldf_k = xs
            tem1 = 1.0 - cldf_prev
            cdf_k = jnp.where(cdf_prev > tem1[:, None],
                              cdf_prev, cdf_k * tem1[:, None])
            return (cdf_k, cldf_k), cdf_k

        (_, _), rest = lax.scan(
            body,
            (cdfunc[:, :, 0], cldf[:, 0]),
            (cdfunc[:, :, 1:].transpose(2, 0, 1), cldf[:, 1:].T),
            unroll=_unroll(),
        )
        cdfunc = jnp.concatenate(
            [cdfunc[:, :, :1], rest.transpose(1, 2, 0)], axis=2
        )
    lcloudy = cdfunc >= (1.0 - cldf)[:, None, :]
    # binary mask stored as int8: one byte/element (half the bf16
    # plane's HBM traffic); {0, 1} upcasts exactly in the solver body
    cldfmc = lcloudy.astype(jnp.int8).transpose(0, 2, 1)  # [C, L, ngpt]
    return cldfmc, taucld


# ------------------------------------------------------------------ rtrnmc
def _make_rt_tables(dtype):
    """Transmittance / tau-transition lookup tables (reference
    radlw_main.py:1373-1400)."""
    ntbl = P.NTBL
    i = np.arange(1, ntbl)
    tfn = i / (ntbl - i)
    tau = P.BPADE * tfn
    explimit = int(np.floor(-np.log(np.finfo(float).tiny)))
    exp_t = np.where(
        tau >= explimit, 1e-20, np.exp(-np.minimum(tau, explimit))
    )
    tfn_t = np.where(
        tau < 0.06, tau / 6.0,
        1.0 - 2.0 * ((1.0 / tau) - (exp_t / (1.0 - exp_t))),
    )
    tau_tbl = np.concatenate([[0.0], tau, [1.0e10]])
    exp_tbl = np.concatenate([[1.0], exp_t, [1e-20]])
    tfn_tbl = np.concatenate([[0.0], tfn_t, [1.0]])
    return (
        jnp.asarray(tau_tbl, dtype),
        jnp.asarray(exp_tbl, dtype),
        jnp.asarray(tfn_tbl, dtype),
    )


def rtrnmc_lw(semiss, delp, cldfmc, taucld, tautot, pklay, pklev, fracs,
              secdif, fast_exp: bool = False):
    """McICA radiative transfer (reference radlw_main.py:3381-3717).

    semiss/secdif [C, nbands]; delp [C, L] (mb); cldfmc/tautot/fracs
    [C, L, ngpt]; taucld [C, L, nbands]; pklay/pklev [C, nbands, L+1]
    (index 0 = surface).  Returns (totuflux, totdflux, htr, totuclfl,
    totdclfl, htrcl) with fluxes [C, L+1] and heating [C, L] in K/s.

    ``fast_exp``: compute exp/tau-transition directly instead of the
    reference's 10001-entry lookup tables.  The tables are a quantized
    approximation of exactly these expressions, so the deviation is the
    table quantization (~1e-4) — but the direct form avoids six 62M-index
    gathers per call, which dominate on TPU.  The oracle tests keep the
    exact table path (default).

    TPU design: ALL per-layer elementwise math lives INSIDE the two
    layer scans, so no [C, L, G] intermediate beyond the three inputs is
    ever materialized (the old fully-vectorized form wrote ~20 of them —
    5 GB of HBM traffic at C48).  The downward and upward passes
    recompute the shared layer quantities from the same input slices;
    the extra VPU flops are free next to the saved bandwidth."""
    # inputs may arrive in the bf16 storage dtype; all per-layer math
    # and the radiance recurrences run/accumulate in the compute dtype
    dtype = _acc(tautot.dtype)
    C, L, G = tautot.shape
    ngb = np.asarray(P.NGB_LW)
    rec_6 = 0.166667
    eps = P.EPS

    # static band->g expansion as a bit-exact one-hot contraction
    # (constant-index gathers lower poorly on TPU)
    expand = jnp.asarray(
        np.eye(P.NBANDS_LW)[:, ngb], dtype
    )  # [nbands, G]

    def bexp(x):  # [..., nbands] -> [..., G]
        return jnp.einsum(
            "...b,bg->...g", x, expand, precision=_MATMUL_PRECISION
        )

    secdif_g = bexp(secdif)  # [C, G]
    semiss_g = bexp(semiss)
    if not fast_exp:
        tau_tbl, exp_tbl, tfn_tbl = _make_rt_tables(dtype)

    def layer_quants(xs):
        """Per-layer [C, G] transmittances and Planck sources (the
        reference's k-loop body, batched over columns and g-points)."""
        tau_k, cldf_k, frac_k, taucld_k, blay_k, plevlo_k, plevhi_k = xs
        # cldfmc arrives as an int8 {0, 1} mask: upcast is exact, so the
        # blend formulas below are bit-identical to a float-stored mask
        cldf_k = cldf_k.astype(dtype)
        odepth_raw = jnp.maximum(0.0, secdif_g * tau_k)
        small = odepth_raw <= 0.06
        if fast_exp:
            trng_big = jnp.exp(-jnp.minimum(odepth_raw, 500.0))
            tfn_big = 1.0 - 2.0 * (
                1.0 / jnp.maximum(odepth_raw, 0.06)
                - trng_big / jnp.maximum(1.0 - trng_big, 1e-30)
            )
            atrgas = jnp.where(
                small, odepth_raw - 0.5 * odepth_raw * odepth_raw,
                1.0 - trng_big,
            )
            trng = jnp.where(small, 1.0 - atrgas, trng_big)
            gasfac = jnp.where(small, rec_6 * odepth_raw, tfn_big)
            odepth = odepth_raw
        else:
            tblind = odepth_raw / (P.BPADE + odepth_raw)
            itgas = jnp.clip(
                _trunc(P.NTBL * tblind + 0.5), 0, P.NTBL
            ).astype(jnp.int32)
            trng_tab = jnp.take(exp_tbl, itgas)
            atrgas = jnp.where(
                small, odepth_raw - 0.5 * odepth_raw * odepth_raw,
                1.0 - trng_tab,
            )
            trng = jnp.where(small, 1.0 - atrgas, trng_tab)
            gasfac = jnp.where(
                small, rec_6 * odepth_raw, jnp.take(tfn_tbl, itgas)
            )
            odepth = jnp.where(
                small, odepth_raw, jnp.take(tau_tbl, itgas)
            )

        blay = bexp(blay_k)
        dplnku = bexp(plevhi_k) - blay
        dplnkd = bexp(plevlo_k) - blay
        bbdgas = frac_k * (blay + dplnkd * gasfac)
        bbugas = frac_k * (blay + dplnku * gasfac)
        gassrcd = bbdgas * atrgas
        gassrcu = bbugas * atrgas

        cloudy = cldf_k >= eps
        odcld = secdif_g * bexp(taucld_k)
        efclrfr = 1.0 - (1.0 - jnp.exp(-odcld)) * cldf_k
        odtot = odepth + odcld
        small_t = odtot < 0.06
        if fast_exp:
            exp_t = jnp.exp(-jnp.minimum(odtot, 500.0))
            tfn_t = 1.0 - 2.0 * (
                1.0 / jnp.maximum(odtot, 0.06)
                - exp_t / jnp.maximum(1.0 - exp_t, 1e-30)
            )
            totfac = jnp.where(small_t, rec_6 * odtot, tfn_t)
            atrtot = jnp.where(
                small_t, odtot - 0.5 * odtot * odtot, 1.0 - exp_t
            )
        else:
            tblind_t = odtot / (P.BPADE + odtot)
            ittot = jnp.clip(
                _trunc(P.NTBL * tblind_t + 0.5), 0, P.NTBL
            ).astype(jnp.int32)
            totfac = jnp.where(
                small_t, rec_6 * odtot, jnp.take(tfn_tbl, ittot)
            )
            atrtot = jnp.where(
                small_t, odtot - 0.5 * odtot * odtot,
                1.0 - jnp.take(exp_tbl, ittot),
            )
        bbdtot = frac_k * (blay + dplnkd * totfac)
        bbutot = frac_k * (blay + dplnku * totfac)
        totsrcd = bbdtot * atrtot
        totsrcu = bbutot * atrtot

        trans_tot = jnp.where(cloudy, trng * efclrfr, trng)
        srcd_tot = jnp.where(
            cloudy, gassrcd + cldf_k * (totsrcd - gassrcd), gassrcd
        )
        srcu_tot = jnp.where(
            cloudy, gassrcu + cldf_k * (totsrcu - gassrcu), gassrcu
        )
        return trans_tot, srcd_tot, srcu_tot, trng, gassrcd, gassrcu

    # scan inputs: the three [C, L, G] arrays layer-major, plus the
    # band-resolution cloud/Planck slices (tiny)
    xs = (
        jnp.moveaxis(tautot, 1, 0),
        jnp.moveaxis(cldfmc, 1, 0),
        jnp.moveaxis(fracs, 1, 0),
        jnp.moveaxis(taucld, 1, 0),
        jnp.moveaxis(pklay[:, :, 1:], 2, 0),
        jnp.moveaxis(pklev[:, :, :-1], 2, 0),
        jnp.moveaxis(pklev[:, :, 1:], 2, 0),
    )

    # ---- downward recurrence (TOA -> surface), k = L-1 .. 0 ----------
    def down_body(carry, xs_k):
        radtotd, radclrd = carry
        t_tot, s_tot, _, t_clr, s_clr, _ = layer_quants(xs_k)
        radtotd = radtotd * t_tot + s_tot
        radclrd = radclrd * t_clr + s_clr
        return (radtotd, radclrd), (radtotd.sum(-1), radclrd.sum(-1))

    # reverse=True iterates layers L-1..0 WITHOUT materializing flipped
    # [L, C, G] copies (the flips showed up as rev/copy kernels in the
    # device trace); ys stay indexed by layer, so down_tot[k] is the
    # G-summed radiance at level k directly.
    zero = jnp.zeros((C, G), dtype)
    (radtotd_sfc, radclrd_sfc), (down_tot, down_clr) = lax.scan(
        down_body, (zero, zero), xs, reverse=True, unroll=_unroll()
    )
    zerosum = jnp.zeros((1, C), dtype)
    totdrad = jnp.concatenate([down_tot, zerosum], axis=0)
    clrdrad = jnp.concatenate([down_clr, zerosum], axis=0)

    # ---- surface reflection + upward recurrence ----------------------
    reflct = 1.0 - semiss_g
    rad0 = semiss_g * fracs[:, 0, :] * bexp(pklay[:, :, 0])
    radtotu0 = rad0 + reflct * radtotd_sfc
    radclru0 = rad0 + reflct * radclrd_sfc

    def up_body(carry, xs_k):
        radtotu, radclru = carry
        t_tot, _, s_tot, t_clr, _, s_clr = layer_quants(xs_k)
        radtotu = radtotu * t_tot + s_tot
        radclru = radclru * t_clr + s_clr
        return (radtotu, radclru), (radtotu.sum(-1), radclru.sum(-1))

    _, (up_tot, up_clr) = lax.scan(
        up_body, (radtotu0, radclru0), xs, unroll=_unroll()
    )
    toturad = jnp.concatenate([radtotu0.sum(-1)[None], up_tot], axis=0)
    clrurad = jnp.concatenate([radclru0.sum(-1)[None], up_clr], axis=0)

    flxfac = P.WTDIFF * P.FLUXFAC
    totuflux = toturad.T * flxfac  # [C, L+1]
    totdflux = totdrad.T * flxfac
    totuclfl = clrurad.T * flxfac
    totdclfl = clrdrad.T * flxfac

    rfdelp = P.HEATFAC / delp
    fnet = totuflux - totdflux
    htr = (fnet[:, :-1] - fnet[:, 1:]) * rfdelp
    fnetc = totuclfl - totdclfl
    htrcl = (fnetc[:, :-1] - fnetc[:, 1:]) * rfdelp
    return totuflux, totdflux, htr, totuclfl, totdclfl, htrcl


# ------------------------------------------------------------------ lwrad
def lwrad(
    plyr, plvl, tlyr, tlvl, qlyr, olyr, gasvmr, clouds, aerosols,
    sfemis, sfgtmp, delpin, rand2d, T,
    iovrlw: int = 1, ilwrgas: int = 1, ilwcliq: int = 1,
    fast_exp: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched LW driver (reference radlw_main.py:1459-2268 semantics).

    Inputs [C, L] layer / [C, L+1] level, k=0 at the SURFACE (the
    reference's bottom-up convention); gasvmr [C, L, 10], clouds
    [C, L, 9], aerosols [C, L, nbands, 3], rand2d [C, ngptlw*nlay].
    T: prep_lw_tables output.  Pressures in mb."""
    dtype = plyr.dtype
    C, L = plyr.shape
    tem1 = 100.0 * P.CON_G
    tem2 = 1.0e-20 * 1.0e3 * P.CON_AVGD

    h2ovmr = jnp.maximum(0.0, qlyr * P.AMDW / (1.0 - qlyr))
    o3vmr = jnp.maximum(0.0, olyr * P.AMDO3)
    tem0 = (1.0 - h2ovmr) * P.CON_AMD + h2ovmr * P.CON_AMW
    coldry = tem2 * delpin / (tem1 * tem0 * (1.0 + h2ovmr))
    temcol = 1.0e-12 * coldry

    cols = [jnp.maximum(0.0, coldry * h2ovmr),
            jnp.maximum(temcol, coldry * gasvmr[..., 0]),
            jnp.maximum(temcol, coldry * o3vmr)]
    if ilwrgas > 0:
        cols += [jnp.maximum(temcol, coldry * gasvmr[..., 1]),
                 jnp.maximum(temcol, coldry * gasvmr[..., 2]),
                 jnp.maximum(0.0, coldry * gasvmr[..., 3]),
                 jnp.maximum(0.0, coldry * gasvmr[..., 4])]
        wx = jnp.stack(
            [jnp.maximum(0.0, coldry * gasvmr[..., 8]),
             jnp.maximum(0.0, coldry * gasvmr[..., 5]),
             jnp.maximum(0.0, coldry * gasvmr[..., 6]),
             jnp.maximum(0.0, coldry * gasvmr[..., 7])],
            axis=-1,
        )
    else:
        cols += [jnp.zeros_like(coldry)] * 4
        wx = jnp.zeros(coldry.shape + (P.MAXXSEC,), dtype)
    colamt = jnp.stack(cols, axis=-1)  # [C, L, maxgas]

    tauaer = aerosols[..., 0] * (1.0 - aerosols[..., 1])  # [C, L, nbands]

    cldfrc = clouds[..., 0]
    clwp, relw = clouds[..., 1], clouds[..., 2]
    ciwp, reiw = clouds[..., 3], clouds[..., 4]
    cda1, cda2, cda3, cda4 = (clouds[..., 5], clouds[..., 6],
                              clouds[..., 7], clouds[..., 8])

    # precipitable water -> secdif
    tem11 = (coldry + colamt[..., 0]).sum(axis=1)
    tem22 = colamt[..., 0].sum(axis=1)
    pwvcm = (10.0 * tem22 / (P.AMDW * tem11 * P.CON_G)) * plvl[:, 0]
    a0 = jnp.asarray(P.A0_LW, dtype)
    a1 = jnp.asarray(P.A1_LW, dtype)
    a2 = jnp.asarray(P.A2_LW, dtype)
    secdif = jnp.clip(
        a0 + a1 * jnp.exp(a2 * pwvcm[:, None]), 1.5, 1.8
    )
    fixed = jnp.asarray(
        [b in (0, 3, 9) for b in range(P.NBANDS_LW)]
    )
    secdif = jnp.where(fixed, 1.66, secdif)

    colbrd = coldry - colamt[..., 1:].sum(axis=-1)
    semiss = jnp.where(
        ((sfemis > P.EPS) & (sfemis <= 1.0))[:, None],
        sfemis[:, None],
        1.0,
    ) * jnp.ones((1, P.NBANDS_LW), dtype)

    c = setcoef_lw(
        plyr, tlyr, tlvl, sfgtmp, h2ovmr, colamt, coldry, colbrd, T
    )
    c["pavel"] = plyr

    cldfmc, taucld = cldprop_lw(
        cldfrc, clwp, relw, ciwp, reiw, cda1, cda2, cda3, cda4,
        rand2d, T, iovrlw=iovrlw, ilwcliq=ilwcliq,
    )
    import os as _os

    _mega = int(_os.environ.get("FV3NET_RRTMG_TAUMOL_MEGA", "0") or 0)
    if _mega:
        from fv3net_tpu.physics.radiation.rrtmg import pallas_taumol

        fracs, tautot = pallas_taumol.taumol_lw_megakernel(
            c, colamt, coldry, colbrd, wx, tauaer, T, block=_mega,
        )
    else:
        fracs, tautot = taumol_lw(
            c, colamt, coldry, colbrd, wx, tauaer, T
        )
    totuflux, totdflux, htr, totuclfl, totdclfl, htrcl = rtrnmc_lw(
        semiss, delpin, cldfmc, taucld, tautot,
        c["pklay"], c["pklev"], fracs, secdif, fast_exp=fast_exp,
    )
    return {
        "hlwc": htr,  # total-sky heating rate K/s [C, L]
        "hlw0": htrcl,  # clear-sky heating rate
        "upfxc_t": totuflux[:, -1],
        "upfx0_t": totuclfl[:, -1],
        "upfxc_s": totuflux[:, 0],
        "upfx0_s": totuclfl[:, 0],
        "dnfxc_s": totdflux[:, 0],
        "dnfx0_s": totdclfl[:, 0],
        "cldtau": taucld[..., 6],  # band-7 cloud tau diagnostic
        "totuflux": totuflux,
        "totdflux": totdflux,
        "totuclfl": totuclfl,
        "totdclfl": totdclfl,
    }
