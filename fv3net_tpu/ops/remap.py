"""Mass-conserving PPM vertical remap, fully vectorized for TPU.

TPU-native replacement for the reference's Fortran ``mappm`` extension
(reference: external/mappm/mappm/mappm.f90:11 ``mappm`` and its helpers
``ppm_profile``/``ppm_limiters``/``cs_profile``/``cs_limiters``, plus
interpolate_2d.f90:1), which vcm drives column-by-column through f2py
(reference: external/vcm/vcm/cubedsphere/regridz.py:304-341).

Re-design, not a translation:

- The Fortran remap walks each column with data-dependent ``goto`` loops.
  Here the remap is formulated through the *cumulative mass function*
  M(p) = integral of q dp from model top, evaluated exactly from the
  piecewise-parabolic reconstruction.  Then
  ``q2[k] = (M(pe2[k+1]) - M(pe2[k])) / (pe2[k+1] - pe2[k])`` — identical
  in exact arithmetic, but expressed as batched gathers + elementwise math
  that XLA fuses across every column at once (no scalar control flow).
- The PPM reconstruction (edge values + limiters) is computed for all
  columns with shifted-array arithmetic; the single sequential piece
  (the cs_profile tridiagonal solve) is a ``lax.scan`` over the (short)
  vertical axis, batched over all columns.

Conventions: vertical axis last; level 0 = model top (as in FV3);
``pe1``/``pe2`` are layer-edge pressures, one longer than the field.

Supported options (matching reference usage, regridz.py:227-245):
``iv`` in {-2, -1, 0, 1, 2} (-2 = vertical velocity, bottom edge pinned
to a prescribed surface value ``qs``); ``kord`` in {1..7} ->
ppm_profile path,
``kord`` > 7 -> cs_profile path (with |kord|>16 = unlimited linear and
kord=9 Huynh-constrained variants).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.ops import zscan
from jax import lax

R3 = 1.0 / 3.0
R23 = 2.0 / 3.0


def _a6(q, al, ar):
    return 3.0 * (2.0 * q - (al + ar))


def _sign(mag, s):
    """Fortran sign(): |mag| with the sign of s (s==0 -> +)."""
    return jnp.where(s >= 0, jnp.abs(mag), -jnp.abs(mag))


# ---------------------------------------------------------------------------
# ppm_limiters (reference mappm.f90:668 ppm_limiters)
# ---------------------------------------------------------------------------


def _ppm_limiters(dm, q, al, ar, a6, lmt: int):
    """Vectorized PPM limiters; lmt 0=standard monotonic, 1=full monotonic,
    2=positive definite, 3=none."""
    if lmt == 3:
        return al, ar, a6
    if lmt == 0:
        flat = dm == 0.0
        da1 = ar - al
        da2 = da1 * da1
        a6da = a6 * da1
        low = a6da < -da2
        high = a6da > da2
        a6_low = 3.0 * (al - q)
        ar_low = al - a6_low
        a6_high = 3.0 * (ar - q)
        al_high = ar - a6_high
        al_n = jnp.where(flat, q, jnp.where(high, al_high, al))
        ar_n = jnp.where(flat, q, jnp.where(low, ar_low, ar))
        a6_n = jnp.where(
            flat, 0.0, jnp.where(low, a6_low, jnp.where(high, a6_high, a6))
        )
        return al_n, ar_n, a6_n
    if lmt == 1:
        qmp = 2.0 * dm
        al_n = q - _sign(jnp.minimum(jnp.abs(qmp), jnp.abs(al - q)), qmp)
        ar_n = q + _sign(jnp.minimum(jnp.abs(qmp), jnp.abs(ar - q)), qmp)
        return al_n, ar_n, _a6(q, al_n, ar_n)
    if lmt == 2:
        cond = jnp.abs(ar - al) < -a6
        fmin = q + 0.25 * (ar - al) ** 2 / jnp.where(a6 == 0, 1.0, a6) + a6 / 12.0
        neg = cond & (fmin < 0.0)
        case_flat = neg & (q < ar) & (q < al)
        case_r = neg & ~case_flat & (ar > al)
        case_l = neg & ~case_flat & ~(ar > al)
        a6_n = jnp.where(
            case_flat,
            0.0,
            jnp.where(
                case_r,
                3.0 * (al - q),
                jnp.where(case_l, 3.0 * (ar - q), a6),
            ),
        )
        al_n = jnp.where(case_flat, q, jnp.where(case_l, ar - a6_n, al))
        ar_n = jnp.where(case_flat, q, jnp.where(case_r, al - a6_n, ar))
        return al_n, ar_n, a6_n
    raise ValueError(f"unknown ppm limiter lmt={lmt}")


# ---------------------------------------------------------------------------
# ppm_profile (reference mappm.f90:614) — kord <= 7 path
# ---------------------------------------------------------------------------


def ppm_profile(q, delp, iv: int, kord: int):
    """Piecewise-parabolic reconstruction; returns (al, ar, a6) per layer.

    q, delp: (..., km). All indexing below is 0-based with level 0 at the
    model top (Fortran k=1).
    """
    km = q.shape[-1]
    if km < 5:
        raise ValueError("ppm_profile requires km >= 5")

    # delq[k] = q[k+1] - q[k], defined for k in [0, km-2]
    delq = q[..., 1:] - q[..., :-1]
    # d4[k] = delp[k-1] + delp[k], defined for k in [1, km-1]; store full-km
    # array with d4[0] unused.
    d4 = jnp.concatenate(
        [jnp.zeros_like(delp[..., :1]), delp[..., :-1] + delp[..., 1:]], axis=-1
    )

    # interior mismatched slope df2 / monotonized dc for k in [1, km-2]
    dpk = delp[..., 1:-1]
    c1 = (delp[..., :-2] + 0.5 * dpk) / d4[..., 2:]
    c2 = (delp[..., 2:] + 0.5 * dpk) / d4[..., 1:-1]
    df2_int = (
        dpk * (c1 * delq[..., 1:] + c2 * delq[..., :-1])
        / (d4[..., 1:-1] + delp[..., 2:])
    )
    qmax3 = jnp.maximum(jnp.maximum(q[..., :-2], q[..., 1:-1]), q[..., 2:])
    qmin3 = jnp.minimum(jnp.minimum(q[..., :-2], q[..., 1:-1]), q[..., 2:])
    dc_int = _sign(
        jnp.minimum(
            jnp.abs(df2_int),
            jnp.minimum(qmax3 - q[..., 1:-1], q[..., 1:-1] - qmin3),
        ),
        df2_int,
    )
    zero = jnp.zeros_like(q[..., :1])
    dc = jnp.concatenate([zero, dc_int, zero], axis=-1)

    # 4th-order interior edge values al[k] for k in [2, km-2]
    # (Fortran a4(2,i,k), k=3..km-1); slices:
    #   delq[k-1] -> delq[1:km-2], delp[k-1] -> delp[1:km-2], d4[k] -> d4[2:km-1]
    c1e = delq[..., 1 : km - 2] * delp[..., 1 : km - 2] / d4[..., 2 : km - 1]
    a1 = d4[..., 1 : km - 2] / (d4[..., 2 : km - 1] + delp[..., 1 : km - 2])
    a2 = d4[..., 3:km] / (d4[..., 2 : km - 1] + delp[..., 2 : km - 1])
    al_int = q[..., 1 : km - 2] + c1e + 2.0 / (
        d4[..., 1 : km - 2] + d4[..., 3:km]
    ) * (
        delp[..., 2 : km - 1] * (c1e * (a1 - a2) + a2 * dc[..., 1 : km - 2])
        - delp[..., 1 : km - 2] * a1 * dc[..., 2 : km - 1]
    )

    # Top boundary: area-preserving cubic with 2nd deriv = 0 at the boundary
    d1 = delp[..., 0]
    d2 = delp[..., 1]
    qm = (d2 * q[..., 0] + d1 * q[..., 1]) / (d1 + d2)
    dq = 2.0 * (q[..., 1] - q[..., 0]) / (d1 + d2)
    c1t = 4.0 * (al_int[..., 0] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3t = dq - 0.5 * c1t * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al1 = qm - 0.25 * c1t * d1 * d2 * (d2 + 3.0 * d1)
    al0 = d1 * (2.0 * c1t * d1 * d1 - c3t) + al1
    al1 = jnp.clip(
        al1, jnp.minimum(q[..., 0], q[..., 1]), jnp.maximum(q[..., 0], q[..., 1])
    )
    dc0 = 0.5 * (al1 - q[..., 0])

    # top-layer monotonicity by iv
    if iv == 0:
        al0 = jnp.maximum(al0, 0.0)
        al1 = jnp.maximum(al1, 0.0)
    elif iv == -1:
        al0 = jnp.where(al0 * q[..., 0] <= 0.0, 0.0, al0)

    # Bottom boundary
    d1 = delp[..., km - 1]
    d2 = delp[..., km - 2]
    qm = (d2 * q[..., km - 1] + d1 * q[..., km - 2]) / (d1 + d2)
    dq = 2.0 * (q[..., km - 2] - q[..., km - 1]) / (d1 + d2)
    c1b = (al_int[..., -1] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3b = dq - 2.0 * c1b * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al_km1 = qm - c1b * d1 * d2 * (d2 + 3.0 * d1)
    ar_km1 = d1 * (8.0 * c1b * d1 * d1 - c3b) + al_km1
    al_km1 = jnp.clip(
        al_km1,
        jnp.minimum(q[..., km - 1], q[..., km - 2]),
        jnp.maximum(q[..., km - 1], q[..., km - 2]),
    )
    dc_km1 = 0.5 * (q[..., km - 1] - al_km1)

    if iv == 0:
        al_km1 = jnp.maximum(al_km1, 0.0)
        ar_km1 = jnp.maximum(ar_km1, 0.0)
    elif iv < 0:
        ar_km1 = jnp.where(q[..., km - 1] * ar_km1 <= 0.0, 0.0, ar_km1)

    # assemble al over all layers: al[0]=al0, al[1]=al1, al[2:km-1]=al_int,
    # al[km-1]=al_km1
    al = jnp.concatenate(
        [al0[..., None], al1[..., None], al_int, al_km1[..., None]], axis=-1
    )
    # ar[k] = al[k+1] except ar[km-1]
    ar = jnp.concatenate([al[..., 1:], ar_km1[..., None]], axis=-1)
    dc = dc.at[..., 0].set(dc0).at[..., km - 1].set(dc_km1)

    if abs(iv) == 2:
        # iv==2 (temperature): flat top-layer left edge (reference
        # mappm.f90:724-729; the a4(3,1) write there is later overwritten
        # by the edge-chaining loop, so only al survives)
        al = al.at[..., 0].set(q[..., 0])

    a6 = _a6(q, al, ar)

    # Top 2 / bottom 2 layers: standard monotonic limiter
    edge_mask = jnp.zeros(km, dtype=bool).at[:2].set(True).at[-2:].set(True)
    al_m, ar_m, a6_m = _ppm_limiters(dc, q, al, ar, a6, lmt=0)

    # interior layers [2, km-3]
    if kord >= 7:
        # Huynh's 2nd constraint (reference mappm.f90:784-826)
        h2_int = (
            2.0
            * (dc[..., 2:] / delp[..., 2:] - dc[..., :-2] / delp[..., :-2])
            / (delp[..., 1:-1] + 0.5 * (delp[..., :-2] + delp[..., 2:]))
            * delp[..., 1:-1] ** 2
        )
        h2 = jnp.concatenate([zero, h2_int, zero], axis=-1)
        fac = 1.5
        pmp = 2.0 * dc
        qmp_r = q + pmp
        lac_r = q + fac * _shift(h2, 1) + dc
        ar_h = jnp.clip(
            ar,
            jnp.minimum(jnp.minimum(q, qmp_r), lac_r),
            jnp.maximum(jnp.maximum(q, qmp_r), lac_r),
        )
        qmp_l = q - pmp
        lac_l = q + fac * _shift(h2, -1) - dc
        al_h = jnp.clip(
            al,
            jnp.minimum(jnp.minimum(q, qmp_l), lac_l),
            jnp.maximum(jnp.maximum(q, qmp_l), lac_l),
        )
        a6_h = _a6(q, al_h, ar_h)
        if iv == 0 and kord >= 6:
            al_h, ar_h, a6_h = _ppm_limiters(dc, q, al_h, ar_h, a6_h, lmt=2)
        al_i, ar_i, a6_i = al_h, ar_h, a6_h
    else:
        lmt = max(0, kord - 3)
        if iv == 0:
            lmt = min(2, lmt)
        a6_i = _a6(q, al, ar) if kord != 4 else a6
        if kord != 6:
            al_i, ar_i, a6_i = _ppm_limiters(dc, q, al, ar, a6_i, lmt=lmt)
        else:
            al_i, ar_i = al, ar

    al_f = jnp.where(edge_mask, al_m, al_i)
    ar_f = jnp.where(edge_mask, ar_m, ar_i)
    a6_f = jnp.where(edge_mask, a6_m, a6_i)
    return al_f, ar_f, a6_f


def _shift(arr, offset: int):
    """Shift along last axis filling with zeros: offset=+1 -> arr[k-1]."""
    if offset == 0:
        return arr
    pad = jnp.zeros_like(arr[..., :abs(offset)])
    if offset > 0:
        return jnp.concatenate([pad, arr[..., :-offset]], axis=-1)
    return jnp.concatenate([arr[..., -offset:], pad], axis=-1)


# ---------------------------------------------------------------------------
# cs_profile (reference mappm.f90:131) — kord > 7 path
# ---------------------------------------------------------------------------


def cs_profile(q, delp, iv: int, kord: int, qs=None):
    """Cubic-spline edge reconstruction (S.-J. Lin 2008); (al, ar, a6).

    ``iv == -2`` is the vertical-velocity variant (reference
    mappm.f90:153-176): the bottom edge is pinned to the prescribed
    surface value ``qs`` (lower-boundary w; broadcastable against
    ``q[..., 0]``; default 0 = rigid surface) and the tridiagonal edge
    solve uses the symmetric ``3*(q[k-1]+q[k])`` right-hand side.
    """
    km = q.shape[-1]

    if iv == -2:
        if qs is None:
            qs = jnp.zeros_like(q[..., 0])
        else:
            qs = jnp.broadcast_to(qs, q[..., 0].shape).astype(q.dtype)
        # forward sweep (reference mappm.f90:153-165): edges j=1..km-2
        qe0 = 1.5 * q[..., 0]
        gam1 = jnp.full_like(qe0, 0.5)

        def fwd_w(carry, xs):
            qe_prev, gam_j = carry
            qsum, grat = xs
            bet = 2.0 + grat + grat - gam_j
            qe = (3.0 * qsum - qe_prev) / bet
            gam_next = grat / bet
            return (qe, gam_next), (qe, gam_next)

        # grat for edge j is delp[j-1]/delp[j], j = 1..km-1
        grat_seq = jnp.moveaxis(delp[..., :-1] / delp[..., 1:], -1, 0)
        qsum_seq = jnp.moveaxis(q[..., :-1] + q[..., 1:], -1, 0)
        (qe_last, gam_last), (qe_scan, gam_scan) = lax.scan(
            fwd_w, (qe0, gam1), (qsum_seq[:-1], grat_seq[:-1]), unroll=8
        )
        # bottom interior edge j=km-1 closes on the surface value
        # (reference mappm.f90:166-171)
        grat_b = grat_seq[-1]
        qe_bot_in = (3.0 * qsum_seq[-1] - grat_b * qs - qe_last) / (
            2.0 + grat_b + grat_b - gam_last
        )
        # gam_all[j-1] = gam[j] for j = 1..km-1
        gam_all = jnp.concatenate([gam1[None], gam_scan], axis=0)
        qe_raw = jnp.concatenate([qe0[None], qe_scan], axis=0)

        def bwd_w(q_next, xs):
            qe_j, gam_jp1 = xs
            qj = qe_j - gam_jp1 * q_next
            return qj, qj

        # back-substitution j = km-2..0: qe[j] -= gam[j+1]*qe[j+1]
        _, qe_rev = lax.scan(
            bwd_w, qe_bot_in, (qe_raw, gam_all), reverse=True, unroll=8
        )
        edges = jnp.concatenate(
            [qe_rev, qe_bot_in[None], qs[None]], axis=0
        )
        edges = jnp.moveaxis(edges, 0, -1)  # (..., km+1)
    else:
        # tridiagonal forward sweep (reference mappm.f90:180-205), batched scan
        grat0 = delp[..., 1] / delp[..., 0]
        bet0 = grat0 * (grat0 + 0.5)
        qe0 = ((grat0 + grat0) * (grat0 + 1.0) * q[..., 0] + q[..., 1]) / bet0
        gam0 = (1.0 + grat0 * (grat0 + 1.5)) / bet0

        def fwd(carry, xs):
            q_prev, gam_prev = carry
            qk, qkm1, d4k = xs
            bet = 2.0 + d4k + d4k - gam_prev
            qe = (3.0 * (qkm1 + d4k * qk) - q_prev) / bet
            gam = d4k / bet
            return (qe, gam), (qe, gam, d4k)

        d4_seq = jnp.moveaxis(delp[..., :-1] / delp[..., 1:], -1, 0)
        q_seq = jnp.moveaxis(q[..., 1:], -1, 0)
        qm1_seq = jnp.moveaxis(q[..., :-1], -1, 0)
        (_, _), (qe_scan, gam_scan, _) = lax.scan(
            fwd, (qe0, gam0), (q_seq, qm1_seq, d4_seq), unroll=8
        )
        # edge estimates qe[k] for k=0..km-1 (Fortran q(i,1..km))
        qe = jnp.concatenate(
            [qe0[None], qe_scan], axis=0
        )  # (km, ...) leading z axis
        gam = jnp.concatenate([gam0[None], gam_scan], axis=0)

        d4_last = d4_seq[-1]
        a_bot = 1.0 + d4_last * (d4_last + 1.5)
        qe_bot = (
            2.0 * d4_last * (d4_last + 1.0) * q[..., km - 1]
            + q[..., km - 2]
            - a_bot * qe[km - 1]
        ) / (d4_last * (d4_last + 0.5) - a_bot * gam[km - 1])

        def bwd(q_next, xs):
            qe_k, gam_k = xs
            qk = qe_k - gam_k * q_next
            return qk, qk

        _, qe_rev = lax.scan(bwd, qe_bot, (qe, gam), reverse=True, unroll=8)
        # full edge array, (km+1, ...) then move axis back
        edges = jnp.concatenate([qe_rev, qe_bot[None]], axis=0)
        edges = jnp.moveaxis(edges, 0, -1)  # (..., km+1)

    if abs(kord) > 16:
        al = edges[..., :-1]
        ar = edges[..., 1:]
        return al, ar, _a6(q, al, ar)

    # large-scale constraints (reference mappm.f90:224-262)
    e = edges
    e = e.at[..., 1].set(
        jnp.clip(
            e[..., 1],
            jnp.minimum(q[..., 0], q[..., 1]),
            jnp.maximum(q[..., 0], q[..., 1]),
        )
    )
    # gam2[k] = q[k] - q[k-1], k in [1, km-1]
    gam2 = q[..., 1:] - q[..., :-1]

    # interior edges k in [2, km-2] (Fortran q(i,k), k=3..km-1)
    ek = e[..., 2 : km - 1]
    gkm1 = gam2[..., 0 : km - 3]  # gam(k-1) 1-based -> q[k-2..k-1] diff
    gkp1 = gam2[..., 2 : km - 1]
    qk = q[..., 2 : km - 1]
    qkm1 = q[..., 1 : km - 2]
    not_extremum = gkm1 * gkp1 > 0.0
    clipped = jnp.clip(ek, jnp.minimum(qkm1, qk), jnp.maximum(qkm1, qk))
    local_max = gkm1 > 0.0
    e_max = jnp.maximum(ek, jnp.minimum(qkm1, qk))
    e_min = jnp.minimum(ek, jnp.maximum(qkm1, qk))
    if iv == 0:
        e_min = jnp.maximum(e_min, 0.0)
    ek_new = jnp.where(not_extremum, clipped, jnp.where(local_max, e_max, e_min))
    e = e.at[..., 2 : km - 1].set(ek_new)

    e = e.at[..., km - 1].set(
        jnp.clip(
            e[..., km - 1],
            jnp.minimum(q[..., km - 2], q[..., km - 1]),
            jnp.maximum(q[..., km - 2], q[..., km - 1]),
        )
    )

    al = e[..., :-1]
    ar = e[..., 1:]

    # extremum detection: first/last layers from edge overshoot, interior
    # layers from sign change of gam (reference mappm.f90:272-279)
    gam_full = jnp.concatenate(
        [jnp.zeros_like(q[..., :1]), gam2], axis=-1
    )  # gam_full[k] = q[k]-q[k-1], k>=1
    extm_edge = (al - q) * (ar - q) > 0.0
    interior = gam2[..., :-1] * gam2[..., 1:] < 0.0
    mask = jnp.zeros(km, dtype=bool).at[1 : km - 1].set(True)
    extm = jnp.where(
        mask,
        jnp.concatenate(
            [extm_edge[..., :1], interior, extm_edge[..., -1:]], axis=-1
        ),
        extm_edge,
    )

    x0 = 2.0 * q - (al + ar)
    x1 = jnp.abs(al - ar)
    a6 = 3.0 * x0
    ext5 = jnp.abs(x0) > x1
    ext6 = jnp.abs(a6) > x1

    # boundary treatment by iv (reference mappm.f90:297-325)
    if iv == 0:
        al = al.at[..., 0].set(jnp.maximum(0.0, al[..., 0]))
    elif iv == -1:
        al = al.at[..., 0].set(
            jnp.where(al[..., 0] * q[..., 0] <= 0.0, 0.0, al[..., 0])
        )
    elif iv == 2:
        al = al.at[..., 0].set(q[..., 0])
        ar = ar.at[..., 0].set(q[..., 0])
        a6 = a6.at[..., 0].set(0.0)

    if iv != 2:
        a60 = _a6(q[..., 0], al[..., 0], ar[..., 0])
        al0, ar0, a60 = _cs_limiters_single(
            extm[..., 0], q[..., 0], al[..., 0], ar[..., 0], a60, 1
        )
        al = al.at[..., 0].set(al0)
        ar = ar.at[..., 0].set(ar0)
        a6 = a6.at[..., 0].set(a60)

    a61 = _a6(q[..., 1], al[..., 1], ar[..., 1])
    al1, ar1, a61 = _cs_limiters_single(
        extm[..., 1], q[..., 1], al[..., 1], ar[..., 1], a61, 2
    )
    al = al.at[..., 1].set(al1)
    ar = ar.at[..., 1].set(ar1)
    a6 = a6.at[..., 1].set(a61)

    # interior k in [2, km-3] by kord
    if km >= 6:
        # interior layers kk in [2, km-3]; with gam_full[j] = q[j]-q[j-1]:
        #   gam(k+1) -> gam_full[kk+1] -> [3, km-2]
        #   gam(k+2) -> gam_full[kk+2] -> [4, km-1]
        #   gam(k)   -> gam_full[kk]   -> [2, km-3]
        #   gam(k-1) -> gam_full[kk-1] -> [1, km-4]
        sl_i = slice(2, km - 2)
        qk = q[..., sl_i]
        alk = al[..., sl_i]
        ark = ar[..., sl_i]
        pmp_1 = qk - 2.0 * gam_full[..., 3 : km - 1]
        lac_1 = pmp_1 + 1.5 * gam_full[..., 4:km]
        pmp_2 = qk + 2.0 * gam_full[..., 2 : km - 2]
        lac_2 = pmp_2 - 1.5 * gam_full[..., 1 : km - 3]

        al_h = jnp.clip(
            alk,
            jnp.minimum(jnp.minimum(qk, pmp_1), lac_1),
            jnp.maximum(jnp.maximum(qk, pmp_1), lac_1),
        )
        ar_h = jnp.clip(
            ark,
            jnp.minimum(jnp.minimum(qk, pmp_2), lac_2),
            jnp.maximum(jnp.maximum(qk, pmp_2), lac_2),
        )

        if abs(kord) == 9:
            extm_k = extm[..., sl_i]
            extm_km1 = extm[..., 1 : km - 3]
            extm_kp1 = extm[..., 3 : km - 1]
            wave = extm_k & (extm_km1 | extm_kp1)
            a6_try = 6.0 * qk - 3.0 * (alk + ark)
            nonmono = jnp.abs(a6_try) > jnp.abs(alk - ark)
            al_k = jnp.where(wave, qk, jnp.where(nonmono, al_h, alk))
            ar_k = jnp.where(wave, qk, jnp.where(nonmono, ar_h, ark))
            a6_k = jnp.where(
                wave, 0.0, 6.0 * qk - 3.0 * (al_k + ar_k)
            )
        else:
            # default: recompute a6 from (possibly constrained) edges,
            # Huynh-constraining everywhere (kord 10/16-family simplified)
            al_k, ar_k = al_h, ar_h
            a6_k = _a6(qk, al_k, ar_k)

        if iv == 0:
            al_k, ar_k, a6_k = _cs_limiters_single(
                extm[..., sl_i], qk, al_k, ar_k, a6_k, 0
            )

        al = al.at[..., sl_i].set(al_k)
        ar = ar.at[..., sl_i].set(ar_k)
        a6 = a6.at[..., sl_i].set(a6_k)

    # bottom two layers (reference mappm.f90:511-531)
    if iv == 0:
        ar = ar.at[..., km - 1].set(jnp.maximum(0.0, ar[..., km - 1]))
    elif iv == -1:
        ar = ar.at[..., km - 1].set(
            jnp.where(ar[..., km - 1] * q[..., km - 1] <= 0.0, 0.0,
                      ar[..., km - 1])
        )
    for kk, lmt in ((km - 2, 2), (km - 1, 1)):
        a6k = _a6(q[..., kk], al[..., kk], ar[..., kk])
        alk, ark, a6k = _cs_limiters_single(
            extm[..., kk], q[..., kk], al[..., kk], ar[..., kk], a6k, lmt
        )
        al = al.at[..., kk].set(alk)
        ar = ar.at[..., kk].set(ark)
        a6 = a6.at[..., kk].set(a6k)

    return al, ar, a6


def _cs_limiters_single(extm, q, al, ar, a6, iv: int):
    """cs_limiters (reference mappm.f90:535) on a single layer, vectorized."""
    if iv == 0:
        nonpos = q <= 0.0
        cond = jnp.abs(ar - al) < -a6
        fmin = q + 0.25 * (ar - al) ** 2 / jnp.where(a6 == 0, 1.0, a6) + a6 / 12.0
        neg = cond & (fmin < 0.0)
        case_flat = neg & (q < ar) & (q < al)
        case_r = neg & ~case_flat & (ar > al)
        case_l = neg & ~case_flat & ~(ar > al)
        a6_n = jnp.where(
            case_flat | nonpos,
            0.0,
            jnp.where(case_r, 3.0 * (al - q),
                      jnp.where(case_l, 3.0 * (ar - q), a6)),
        )
        al_n = jnp.where(nonpos | case_flat, q, jnp.where(case_l, ar - a6_n, al))
        ar_n = jnp.where(nonpos | case_flat, q, jnp.where(case_r, al - a6_n, ar))
        return al_n, ar_n, a6_n
    if iv == 1:
        mono = (q - al) * (q - ar) >= 0.0
    else:
        mono = extm
    da1 = ar - al
    da2 = da1 * da1
    a6da = a6 * da1
    low = a6da < -da2
    high = a6da > da2
    a6_low = 3.0 * (al - q)
    a6_high = 3.0 * (ar - q)
    a6_n = jnp.where(mono, 0.0, jnp.where(low, a6_low, jnp.where(high, a6_high, a6)))
    al_n = jnp.where(mono, q, jnp.where(high, ar - a6_high, al))
    ar_n = jnp.where(mono, q, jnp.where(low, al - a6_low, ar))
    return al_n, ar_n, a6_n


# ---------------------------------------------------------------------------
# the remap itself
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iv", "kord", "window"))
def remap_ppm(pe1, q1, pe2, iv: int = 1, kord: int = 1,
              window: int = None, qs=None):
    """Mass-flux-preserving remap q1 on edges pe1 -> q2 on edges pe2.

    Equivalent of Fortran ``mappm`` (reference mappm.f90:11) via the
    cumulative-mass formulation.  Shapes: pe1 (..., km+1), q1 (..., km),
    pe2 (..., kn+1) -> (..., kn).

    ``window``: if set (and kn == km), restrict the source-layer search
    for target edge k to layers [k-window, k+window] — valid whenever the
    two grids are within ``window`` layers of each other (the
    vertically-Lagrangian dycore's per-step remap moves edges by a tiny
    fraction of a layer).  This replaces the general one-hot contraction
    with a handful of shifted slices: ~5x faster on TPU.
    """
    km = q1.shape[-1]
    # broadcast edge arrays against the field's leading (batch) dims so
    # same-iv fields can share one call with pe1[None]/pe2[None]
    lead = jnp.broadcast_shapes(pe1.shape[:-1], q1.shape[:-1])
    pe1 = jnp.broadcast_to(pe1, lead + pe1.shape[-1:])
    pe2 = jnp.broadcast_to(pe2, lead + pe2.shape[-1:])
    q1 = jnp.broadcast_to(q1, lead + q1.shape[-1:])
    dp1 = pe1[..., 1:] - pe1[..., :-1]

    if kord > 7:
        al, ar, a6 = cs_profile(q1, dp1, iv, kord, qs=qs)
    else:
        al, ar, a6 = ppm_profile(q1, dp1, iv, kord)

    # cumulative mass at source edges: M1[L] = sum_{l<L} q1_l dp1_l
    m_edges = jnp.concatenate(
        [jnp.zeros_like(q1[..., :1]), zscan.cumsum(q1 * dp1, axis=-1)], axis=-1
    )

    tables = jnp.stack(
        [pe1[..., :-1], dp1, al, ar, a6, m_edges[..., :-1]], axis=-1
    )  # [..., km, 6]

    def _integral(picked, p):
        pe_L = picked[..., 0]
        dp_L = picked[..., 1]
        alL = picked[..., 2]
        arL = picked[..., 3]
        a6L = picked[..., 4]
        mL = picked[..., 5]
        s = jnp.clip((p - pe_L) / dp_L, 0.0, 1.0)
        integral = (
            alL * s + (arL - alL + a6L) * 0.5 * s * s - a6L * s ** 3 / 3.0
        )
        m = mL + dp_L * integral
        m_ext = m_edges[..., -1:] + (p - pe1[..., -1:]) * q1[..., -1:]
        return jnp.where(p > pe1[..., -1:], m_ext, m)

    def mass_at_banded(p, w: int):
        """Banded layer search: for target edge k, candidates are layers
        clip(k-1+o) for o in [-w, w] — static shifted slices, no one-hot
        tensor, no gathers."""
        kn1 = p.shape[-1]
        base = np.clip(np.arange(kn1) - 1, 0, km - 1)
        result = None
        chosen = None
        for o in range(-w, w + 1):
            L = np.clip(base + o, 0, km - 1)
            pick = jnp.take(tables, jnp.asarray(L), axis=-2)
            peL = pick[..., 0]
            dpL = pick[..., 1]
            inside = (peL <= p) & (p <= peL + dpL)
            m_o = _integral(pick, p)
            if result is None:
                result = m_o
                chosen = inside
            else:
                result = jnp.where(inside & ~chosen, m_o, result)
                chosen = chosen | inside
        # outside the band: clamp to the band edge evaluation (documented
        # precondition: grids within `window` layers)
        return result

    # TPU note: general take_along_axis gathers dominate runtime (95% of a
    # C48 model step profiled on v5e); with km ~ O(100) levels the layer
    # lookup is instead expressed as a one-hot contraction over z — pure
    # compare + (batched) matmul, which the MXU/VPU eat for free.
    def mass_at(p):
        """M(p) for p clamped into [pe1_top, +inf); exact PPM integral."""
        # locate source layer: count of edges <= p, minus 1
        idx = jnp.sum(
            (pe1[..., None, :] <= p[..., :, None]).astype(jnp.int32), axis=-1
        ) - 1
        L = jnp.clip(idx, 0, km - 1)
        onehot = (
            L[..., :, None] == jnp.arange(km, dtype=jnp.int32)
        ).astype(p.dtype)  # [..., kn+1, km]
        # bundle all per-layer tables into one contraction
        tables = jnp.stack(
            [pe1[..., :-1], dp1, al, ar, a6, m_edges[..., :-1]], axis=-1
        )  # [..., km, 6]
        picked = onehot @ tables  # [..., kn+1, 6]
        pe_L = picked[..., 0]
        dp_L = picked[..., 1]
        alL = picked[..., 2]
        arL = picked[..., 3]
        a6L = picked[..., 4]
        mL = picked[..., 5]
        s = (p - pe_L) / dp_L
        below = p > pe1[..., -1:]
        s = jnp.clip(s, 0.0, 1.0)
        # integral of f(s') = al + s'*(ar-al+a6) - a6*s'^2 from 0 to s
        integral = alL * s + (arL - alL + a6L) * 0.5 * s * s - a6L * s ** 3 / 3.0
        m = mL + dp_L * integral
        # extension below the old surface: constant q1[km-1]
        m_ext = m_edges[..., -1:] + (p - pe1[..., -1:]) * q1[..., -1:]
        return jnp.where(below, m_ext, m)

    # evaluate M once on all kn+1 target edges (p_lo/p_hi are adjacent
    # slices of the same array — halves the contraction work)
    p_edges = jnp.maximum(pe2, pe1[..., :1])
    if window is not None and pe2.shape[-1] == pe1.shape[-1]:
        m_at_edges = mass_at_banded(p_edges, window)
    else:
        m_at_edges = mass_at(p_edges)
    p_lo = p_edges[..., :-1]
    p_hi = p_edges[..., 1:]
    dm = m_at_edges[..., 1:] - m_at_edges[..., :-1]
    dp2_eff = p_hi - p_lo
    q2 = dm / jnp.where(dp2_eff == 0.0, 1.0, dp2_eff)
    # degenerate cases, matching Fortran branch structure (mappm.f90:62-67):
    # whole target layer above old top -> q1[0]; top edge below old
    # surface -> q1[km-1]; zero-thickness effective layer -> point value
    q2 = jnp.where(pe2[..., 1:] <= pe1[..., :1], q1[..., :1], q2)
    q2 = jnp.where(dp2_eff == 0.0, q1[..., :1], q2)
    q2 = jnp.where(pe2[..., :-1] >= pe1[..., -1:], q1[..., -1:], q2)
    return q2


def banded_search(pe1, pe2, window: int = 2):
    """Precompute the banded layer-search coefficients shared by every
    field remapped between the same edge sets.

    The layer choice and sub-layer position for each target edge depend
    only on (pe1, pe2) — not on the field — and the PPM mass integral is
    LINEAR in the per-layer profile coefficients::

        M(p) = m_L + dp_L * (al*A(s) + ar*B(s) + a6*C(s)),
        A = s - s^2/2,  B = s^2/2,  C = s^2/2 - s^3/3

    so the whole search collapses to banded weights (one set of 4 weight
    planes per offset) applied to each field's (m, al, ar, a6) tables by
    static shifted reads.  One call per dynamics step feeds all remapped
    fields: this is what makes the per-step vertical remap cheap (the
    one-shot ``remap_ppm`` re-broadcasts its edge tables per batched
    field, which profiles ~3x slower per field on TPU).

    Returns an opaque dict for :func:`remap_apply`.
    """
    km = pe1.shape[-1] - 1
    p = jnp.maximum(pe2, pe1[..., :1])
    kn1 = p.shape[-1]
    base = np.clip(np.arange(kn1) - 1, 0, km - 1)
    raw = []
    chosen = None
    for o in range(-window, window + 1):
        L = np.clip(base + o, 0, km - 1)
        peL = jnp.take(pe1, jnp.asarray(L), axis=-1)
        dpL = jnp.take(pe1, jnp.asarray(L + 1), axis=-1) - peL
        inside = (peL <= p) & (p <= peL + dpL)
        use = inside if chosen is None else (inside & ~chosen)
        chosen = inside if chosen is None else (chosen | inside)
        raw.append((L, peL, dpL, use))
    offsets = []
    for i, (L, peL, dpL, use) in enumerate(raw):
        if i == 0:
            # out-of-band fallback: evaluate at the first offset, matching
            # the one-shot banded path (documented precondition: grids
            # within `window` layers, so this is exercised only at clamps)
            use = use | ~chosen
        s = jnp.clip((p - peL) / dpL, 0.0, 1.0)
        s2 = 0.5 * s * s
        uf = use.astype(p.dtype)
        offsets.append(
            {
                "L": L,
                "use": uf,
                "wA": uf * dpL * (s - s2),
                "wB": uf * dpL * s2,
                "wC": uf * dpL * (s2 - s * s * s / 3.0),
            }
        )
    return {
        "offsets": offsets,
        "p": p,
        "pe1": pe1,
        "pe2": pe2,
        "below": p > pe1[..., -1:],
        "dp1": pe1[..., 1:] - pe1[..., :-1],
    }


def _pallas_remap_eligible(search, q1) -> bool:
    """The fused TPU kernel path: f32 on a TPU backend with a
    block-divisible column count (ops/pallas_remap.py)."""
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if q1.dtype != jnp.float32:
        return False
    lead = search["p"].shape[:-1]
    C = int(np.prod(lead))
    from fv3net_tpu.ops import pallas_remap

    return C % pallas_remap._COL_BLOCK == 0


def remap_apply(search, q1, iv: int = 1, kord: int = 9,
                use_pallas: Optional[bool] = None, qs=None):
    """Remap one field (or a leading-axis stack of same-``iv`` fields)
    using coefficients from :func:`banded_search`.

    ``q1``: (..., km) or (F, ..., km).  The per-field work is the PPM
    profile + one cumsum + 4 banded multiply-adds per offset — no edge
    tables are rebuilt or broadcast.  ``use_pallas=True`` runs the
    post-profile pipeline as one fused Pallas VMEM pass
    (ops/pallas_remap.py) — 1.5x faster than XLA when called standalone
    on large field stacks, but a wash inside the fully-fused dynamics
    step where XLA already fuses the chain (measured on v5e), so the
    default stays on the XLA path, which is also the differentiable and
    CPU-compatible one.
    """
    dp1 = search["dp1"]
    if kord > 7:
        al, ar, a6 = cs_profile(q1, dp1, iv, kord, qs=qs)
    else:
        al, ar, a6 = ppm_profile(q1, dp1, iv, kord)

    if use_pallas is None:
        use_pallas = False
    if use_pallas and _pallas_remap_eligible(search, q1):
        from fv3net_tpu.ops import pallas_remap

        # pack per call, never cached on the caller's search dict: inside
        # a trace XLA CSEs the repeated pack ops across fields, and the
        # eager path is not perf-relevant — caching was a leaked-tracer
        # hazard on retrace (advisor r1)
        packed = pallas_remap.pack_search(search)
        return pallas_remap.apply_packed(packed, q1, al, ar, a6)
    m_edges = jnp.concatenate(
        [jnp.zeros_like(q1[..., :1]), zscan.cumsum(q1 * dp1, axis=-1)], axis=-1
    )
    m_lay = m_edges[..., :-1]

    m_at = None
    for off in search["offsets"]:
        Lj = jnp.asarray(off["L"])
        term = (
            off["use"] * jnp.take(m_lay, Lj, axis=-1)
            + off["wA"] * jnp.take(al, Lj, axis=-1)
            + off["wB"] * jnp.take(ar, Lj, axis=-1)
            + off["wC"] * jnp.take(a6, Lj, axis=-1)
        )
        m_at = term if m_at is None else m_at + term

    p = search["p"]
    pe1 = search["pe1"]
    pe2 = search["pe2"]
    m_ext = m_edges[..., -1:] + (p - pe1[..., -1:]) * q1[..., -1:]
    m_at = jnp.where(search["below"], m_ext, m_at)

    dm = m_at[..., 1:] - m_at[..., :-1]
    dp2_eff = p[..., 1:] - p[..., :-1]
    q2 = dm / jnp.where(dp2_eff == 0.0, 1.0, dp2_eff)
    q2 = jnp.where(pe2[..., 1:] <= pe1[..., :1], q1[..., :1], q2)
    q2 = jnp.where(dp2_eff == 0.0, q1[..., :1], q2)
    q2 = jnp.where(pe2[..., :-1] >= pe1[..., -1:], q1[..., -1:], q2)
    return q2


def interpolate_1d(xp, x, y, fill_value=jnp.nan):
    """Per-column linear interpolation, the ``interpolate_2d`` equivalent
    (reference external/mappm/mappm/interpolate_2d.f90:1, wrapped by
    vcm.interpolate_1d, external/vcm/vcm/interpolate.py:105).

    Args:
        xp: target coordinates (..., n_out)
        x: source coordinates, ascending along last axis (..., n_in)
        y: source values (..., n_in)
        fill_value: value outside [x[0], x[-1]]
    """
    n_in = x.shape[-1]
    idx = jnp.sum(
        (x[..., None, :] <= xp[..., :, None]).astype(jnp.int32), axis=-1
    ) - 1
    lo = jnp.clip(idx, 0, n_in - 2)
    # one-hot contraction instead of take_along_axis (TPU gather cost)
    onehot = (
        lo[..., :, None] == jnp.arange(n_in, dtype=jnp.int32)
    ).astype(y.dtype)
    tables = jnp.stack(
        [x[..., :-1], x[..., 1:], y[..., :-1], y[..., 1:]], axis=-1
    )  # [..., n_in-1, 4]
    picked = onehot[..., :-1] @ tables
    x0, x1, y0, y1 = (picked[..., i] for i in range(4))
    w = (xp - x0) / (x1 - x0)
    out = y0 * (1.0 - w) + y1 * w
    inside = (xp >= x[..., :1]) & (xp <= x[..., -1:])
    return jnp.where(inside, out, fill_value)
