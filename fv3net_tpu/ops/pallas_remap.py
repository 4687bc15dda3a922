"""Fused Pallas kernel for the banded PPM remap application.

The XLA lowering of ``ops.remap.remap_apply`` (cumulative mass + 5-offset
banded table application + finalize) runs ~3 GB/s effective on TPU — it
is a chain of ~30 small elementwise ops whose intermediates round-trip
HBM.  This kernel fuses the whole post-profile pipeline into one VMEM
pass per column block.

Layout: the kernel operates TRANSPOSED, z in sublanes and columns in
lanes (``[z, C]`` blocks, C in 512-lane tiles), so every vector op runs
at full 128-lane width — the natural z-last layout would leave the VPU
at 25% lane occupancy for km=32 (measured slower than XLA).  The
transposes in/out are bandwidth-cheap and XLA handles them.  All z
shifts are static sublane slices/concatenations; the cumulative mass is
a log-shift prefix sum.

Used by ``ops.remap.remap_apply`` on TPU backends (f32, forward only —
the XLA path remains the differentiable/CPU fallback).  Equivalence is
tested in interpret mode on CPU and on the real chip.

reference: external/mappm/mappm/mappm.f90:11 (the per-column Fortran
original this whole pipeline replaces).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COL_BLOCK = 512


def _shift_clip_rows(x, o: int, kn1: int, km: int):
    """x[L, :] with L = clip(clip(arange(kn1)-1,0,km-1)+o, 0, km-1):
    edge-padded static sublane slices + a patched first row (see
    ops.remap.banded_search for the index derivation)."""
    s = o - 1  # pure-shift part for rows k >= 1
    lead = max(0, -s)
    tail = max(0, (kn1 - 1 + s) - (km - 1))
    core = kn1 - lead - tail
    parts = []
    if lead:
        parts.append(jnp.repeat(x[:1], lead, axis=0))
    start = max(0, s)
    parts.append(x[start : start + core])
    if tail:
        parts.append(jnp.repeat(x[-1:], tail, axis=0))
    y = jnp.concatenate(parts, axis=0)
    i0 = min(max(o, 0), km - 1)
    return jnp.concatenate([x[i0 : i0 + 1], y[1:]], axis=0)


def _kernel(
    window: int,
    km: int,
    dp1_ref,  # [km, CB]
    w_ref,  # [4*(2w+1), kn1, CB] stacked (use, wA, wB, wC) per offset
    below_ref,  # [kn1, CB] 1.0 where target edge is below the old surface
    ext_slope_ref,  # [kn1, CB] (p - pe1_surface)
    sel_ref,  # [3, km, CB] degenerate masks (top, zero, bottom)
    inv_dp2_ref,  # [km, CB]
    q_ref,  # [1, km, CB]
    al_ref,
    ar_ref,
    a6_ref,
    out_ref,
):
    kn1 = km + 1
    q = q_ref[0]
    mass = q * dp1_ref[:]
    # inclusive prefix sum down the rows by log-shifts
    acc = mass
    s = 1
    while s < km:
        shifted = jnp.concatenate(
            [jnp.zeros_like(acc[:s]), acc[:-s]], axis=0
        )
        acc = acc + shifted
        s *= 2
    m_lay = acc - mass  # exclusive cumsum: mass above each layer
    m_total = acc[km - 1 : km]

    al = al_ref[0]
    ar = ar_ref[0]
    a6 = a6_ref[0]
    m_at = None
    n_off = 2 * window + 1
    for i in range(n_off):
        o = i - window
        use = w_ref[4 * i]
        wA = w_ref[4 * i + 1]
        wB = w_ref[4 * i + 2]
        wC = w_ref[4 * i + 3]
        term = (
            use * _shift_clip_rows(m_lay, o, kn1, km)
            + wA * _shift_clip_rows(al, o, kn1, km)
            + wB * _shift_clip_rows(ar, o, kn1, km)
            + wC * _shift_clip_rows(a6, o, kn1, km)
        )
        m_at = term if m_at is None else m_at + term

    m_ext = m_total + ext_slope_ref[:] * q[km - 1 : km]
    below = below_ref[:]
    m_at = below * m_ext + (1.0 - below) * m_at

    dm = m_at[1:] - m_at[:-1]
    q2 = dm * inv_dp2_ref[:]
    q_first = q[:1]
    q_last = q[km - 1 : km]
    top = sel_ref[0]
    zero = sel_ref[1]
    bot = sel_ref[2]
    q2 = top * q_first + (1.0 - top) * q2
    q2 = zero * q_first + (1.0 - zero) * q2
    q2 = bot * q_last + (1.0 - bot) * q2
    out_ref[0] = q2


def pack_search(search: Dict) -> Dict:
    """Flatten a ``banded_search`` result into the kernel's shared planes
    (z-first [n, C] layout; computed once per step, shared by every
    remapped field)."""
    p = search["p"]
    pe1 = search["pe1"]
    pe2 = search["pe2"]
    kn1 = p.shape[-1]
    km = kn1 - 1
    lead = p.shape[:-1]
    C = int(np.prod(lead))

    def flat(x, n):
        return jnp.moveaxis(x.reshape((C, n)), -1, 0)  # [n, C]

    offsets = search["offsets"]
    w = jnp.stack(
        [
            flat(off[key], kn1)
            for off in offsets
            for key in ("use", "wA", "wB", "wC")
        ]
    )  # [4*(2w+1), kn1, C]
    below = flat(search["below"].astype(p.dtype), kn1)
    ext_slope = flat(p - pe1[..., -1:], kn1)
    dp2 = p[..., 1:] - p[..., :-1]
    inv_dp2 = flat(1.0 / jnp.where(dp2 == 0.0, 1.0, dp2), km)
    sel = jnp.stack(
        [
            flat((pe2[..., 1:] <= pe1[..., :1]).astype(p.dtype), km),
            flat((dp2 == 0.0).astype(p.dtype), km),
            flat((pe2[..., :-1] >= pe1[..., -1:]).astype(p.dtype), km),
        ]
    )
    return {
        "w": w,
        "below": below,
        "ext_slope": ext_slope,
        "sel": sel,
        "inv_dp2": inv_dp2,
        "dp1": flat(search["dp1"], km),
        "lead": lead,
        "km": km,
        "window": (len(offsets) - 1) // 2,
    }


def apply_packed(packed: Dict, q, al, ar, a6, interpret: bool = False):
    """Run the fused kernel on profile tables.

    q/al/ar/a6: [..., km] or [F, ..., km] with the same leading shape as
    the search; returns q2 with q's shape.  Call under jit (the packed
    dict carries static ints that must not be traced).
    """
    km = packed["km"]
    window = packed["window"]
    kn1 = km + 1
    lead = packed["lead"]
    C = packed["dp1"].shape[-1]
    squeeze = q.ndim == len(lead) + 1
    F = 1 if squeeze else q.shape[0]

    def flat_f(x):
        # [F, ..., km] -> [F, km, C]
        return jnp.moveaxis(x.reshape((F, C, km)), -1, 1)

    qf, alf, arf, a6f = map(flat_f, (q, al, ar, a6))

    CB = _COL_BLOCK if C % _COL_BLOCK == 0 else C
    grid = (F, C // CB)

    def shared2(n):
        return pl.BlockSpec(
            (n, CB), lambda f, c: (0, c), memory_space=pltpu.VMEM
        )

    field = pl.BlockSpec(
        (1, km, CB), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, window, km),
        out_shape=jax.ShapeDtypeStruct((F, km, C), q.dtype),
        grid=grid,
        in_specs=[
            shared2(km),  # dp1
            pl.BlockSpec(
                (4 * (2 * window + 1), kn1, CB),
                lambda f, c: (0, 0, c),
                memory_space=pltpu.VMEM,
            ),  # w
            shared2(kn1),  # below
            shared2(kn1),  # ext_slope
            pl.BlockSpec(
                (3, km, CB), lambda f, c: (0, 0, c),
                memory_space=pltpu.VMEM,
            ),  # sel
            shared2(km),  # inv_dp2
            field,  # q
            field,  # al
            field,  # ar
            field,  # a6
        ],
        out_specs=field,
        interpret=interpret,
    )(
        packed["dp1"],
        packed["w"],
        packed["below"],
        packed["ext_slope"],
        packed["sel"],
        packed["inv_dp2"],
        qf,
        alf,
        arf,
        a6f,
    )
    out = jnp.moveaxis(out, 1, -1).reshape((F,) + lead + (km,))
    return out[0] if squeeze else out
