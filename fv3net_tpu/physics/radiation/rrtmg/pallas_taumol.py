"""Whole-taumol Pallas megakernel (r2 verdict #3 attempt).

The LW gas-optics stage (taumol_lw) is the largest single radiation
stage left (~24 ms of the ~35 ms LW+SW call at C48, integrated ablation
benchmarks/rrtmg_ablation.py) and is HBM-traffic-bound: the XLA path
materializes the merged interpolated-table planes (A9/A5, [C,L,9,~90])
and the per-band stencil/term planes in HBM between MXU contractions.

This module runs the ENTIRE taumol_lw body — all 16 bands, unchanged
Python (lw.taumol_lw is reused verbatim) — as ONE `pallas_call` over
column blocks: every intermediate lives in VMEM for its block, and only
the final (fracs, tautot) [C, L, 140] planes are written to HBM.  The
k-tables (tens of KB) are VMEM-resident per program.

Requirements met by lw.py's helper design: all table selections are
one-hot rank-2 MXU dots (`_dot2`; gathers do not lower in Mosaic), and
the few chi_mls row lookups were converted to the same form
(`_chirow`).

Opt-in: env ``FV3NET_RRTMG_TAUMOL_MEGA=<block>`` (e.g. 16) routes
lwrad's taumol through the kernel.  See docs/performance.md for the
measured verdict.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fv3net_tpu.physics.radiation.rrtmg import params as P

# c-dict planes taumol_lw and its helpers read (lw.py:656-1240)
_C_FLOAT = (
    "fac00", "fac01", "fac10", "fac11", "pavel", "rfrate",
    "scaleminor", "scaleminorn2", "selffac", "selffrac", "forfac",
    "forfrac", "minorfrac",
)
_C_INT = ("jp", "jt", "jt1", "indself", "indfor", "indminor")


_TOP_TABLES = (
    "chi_mls", "mtab_lo9", "mtab_hi5", "mtab_lo1", "mtab_hi1",
    "selfref_all", "forref_all", "minor1_all",
)


def _table_leaves(T) -> Dict[str, jnp.ndarray]:
    """The table subset taumol reads, flattened to name -> array."""
    out = {k: T[k] for k in _TOP_TABLES}
    for i, band in enumerate(T["bands"]):
        for k, v in band.items():
            out[f"b{i}_{k}"] = v
    return out


def _rebuild_tables(flat: Dict[str, jnp.ndarray]):
    bands = [dict() for _ in range(16)]
    out = {}
    for name, v in flat.items():
        if name in _TOP_TABLES:
            out[name] = v
            continue
        i, k = name.split("_", 1)
        bands[int(i[1:])][k] = v
    out["bands"] = bands
    return out


def taumol_lw_megakernel(
    c, colamt, coldry, colbrd, wx, tauaer, T,
    block: int = 16, interpret: bool = False,
):
    """Drop-in for lw.taumol_lw: (fracs, tautot), each [C, L, NGPT_LW]."""
    from fv3net_tpu.physics.radiation.rrtmg import lw as rlw

    C, L = coldry.shape
    nblk = -(-C // block)
    pad = nblk * block - C

    def prep(a):
        if pad:
            a = jnp.pad(
                a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), mode="edge"
            )
        return a

    planes = {k: prep(c[k]) for k in _C_FLOAT}
    planes.update({k: prep(c[k].astype(jnp.int32)) for k in _C_INT})
    planes["tropo_i32"] = prep(c["tropo"].astype(jnp.int32))
    planes["colamt"] = prep(colamt)
    planes["coldry"] = prep(coldry)
    planes["colbrd"] = prep(colbrd)
    planes["wx"] = prep(wx)
    planes["tauaer"] = prep(tauaer)
    plane_names = sorted(planes)

    tabs = _table_leaves(T)
    tab_names = sorted(tabs)

    st = rlw._sdt(coldry.dtype)
    ngpt = sum(P.NG_LW)
    n_p = len(plane_names)
    n_t = len(tab_names)

    def body(*vals):
        pv = dict(zip(plane_names, vals[:n_p]))
        tv = dict(zip(tab_names, vals[n_p:]))
        cb = {k: pv[k] for k in _C_FLOAT}
        cb.update({k: pv[k] for k in _C_INT})
        cb["tropo"] = pv["tropo_i32"] == 1
        Tb = _rebuild_tables(tv)
        fracs, tautot = rlw.taumol_lw(
            cb, pv["colamt"], pv["coldry"], pv["colbrd"], pv["wx"],
            pv["tauaer"], Tb,
        )
        return fracs.astype(st), tautot.astype(st)

    # hoist any jnp constants the taumol body builds (Pallas kernels may
    # not capture constants) into explicit inputs; trace with the
    # tile-aligned-dot flag the kernel will also run under
    block_example = [
        jax.ShapeDtypeStruct((block,) + planes[k].shape[1:],
                             planes[k].dtype)
        for k in plane_names
    ] + [jax.ShapeDtypeStruct(tabs[k].shape, tabs[k].dtype)
         for k in tab_names]
    rlw._IN_PALLAS = True
    try:
        closed_body, consts = jax.closure_convert(body, *block_example)
    finally:
        rlw._IN_PALLAS = False
    consts = list(consts)

    def kernel(*refs):
        vals = [refs[i][...] for i in range(n_p + n_t)]
        cvals = [
            refs[n_p + n_t + i][...] for i in range(len(consts))
        ]
        out_fracs = refs[n_p + n_t + len(consts)]
        out_tau = refs[n_p + n_t + len(consts) + 1]
        fracs, tautot = closed_body(*vals, *cvals)
        out_fracs[...] = fracs
        out_tau[...] = tautot

    def pspec(a):
        nd = a.ndim
        return pl.BlockSpec(
            (block,) + a.shape[1:],
            lambda i, nd=nd: (i,) + (0,) * (nd - 1),
        )

    def tspec(a):
        nd = a.ndim
        return pl.BlockSpec(
            a.shape,
            lambda i, nd=nd: (0,) * nd,
        )

    out_spec = pl.BlockSpec((block, L, ngpt), lambda i: (i, 0, 0))
    fn = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pspec(planes[k]) for k in plane_names]
        + [tspec(tabs[k]) for k in tab_names]
        + [tspec(cv) for cv in consts],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nblk * block, L, ngpt), st),
            jax.ShapeDtypeStruct((nblk * block, L, ngpt), st),
        ],
        compiler_params=pltpu.CompilerParams(
            # the whole-band working set (~4.2 MB/column-row at C48
            # nz32) exceeds the default 16 MB scoped-vmem budget;
            # v5e VMEM is 128 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    fracs, tautot = fn(
        *[planes[k] for k in plane_names],
        *[tabs[k] for k in tab_names],
        *consts,
    )
    return fracs[:C], tautot[:C]
