"""Hybrid sigma-pressure vertical coordinate + Lagrangian-to-Eulerian remap.

The reference model's vertical coordinate comes from the Fortran dycore's
ak/bk tables; its vertical remap is the Fortran ``mappm``/fv_mapz PPM
machinery (reference: external/mappm/mappm/mappm.f90:1-11).  Here the
coordinate is generated analytically and the remap is the batched PPM
kernel from fv3net_tpu.ops.remap.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import TOA_PRESSURE
from fv3net_tpu.ops import remap as _remap


def hybrid_coordinate(
    nz: int, ptop: float = TOA_PRESSURE, ps0: float = 1.0e5,
    sigma_exp: float = 1.6, pure_pressure_frac: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate ak/bk interface coefficients: pe(k) = ak(k) + bk(k) * ps.

    Pure-pressure levels in the top ``pure_pressure_frac`` of interfaces,
    transitioning to terrain-following sigma at the surface — the standard
    hybrid structure of FV3GFS's 79-level coordinate.
    """
    k = np.arange(nz + 1) / nz
    # reference interface pressures for ps = ps0: stretched to resolve
    # the boundary layer and upper levels
    pe_ref = ptop + (ps0 - ptop) * k ** sigma_exp
    kt = pure_pressure_frac
    bk = np.where(k <= kt, 0.0, (np.maximum(k - kt, 0.0) / (1.0 - kt)) ** 1.5)
    bk[-1] = 1.0
    ak = pe_ref - bk * ps0
    ak[0] = ptop
    ak[-1] = 0.0
    # enforce monotone interfaces for any ps in [500 hPa, 1100 hPa]
    for ps in (5.0e4, 1.1e5):
        pe = ak + bk * ps
        if not (np.diff(pe) > 0).all():
            raise ValueError("generated hybrid coordinate is not monotone")
    return ak, bk


def target_interfaces(ak, bk, ps):
    """pe2[..., k] = ak[k] + bk[k] * ps[...]."""
    return ak + bk * ps[..., None]


def remap_column_fields(
    pe1, pe2, pt, wind_xyz, tracers, kord: int = 9, window: int = None,
    search=None,
):
    """Remap θ_v, Cartesian winds and tracers from Lagrangian interfaces
    ``pe1`` to target interfaces ``pe2`` (both (..., nz+1), z last).

    Wind components use iv=-1 (winds), θ uses iv=2 (temperature-like),
    tracers iv=0 (positive definite), matching fv_mapz conventions noted
    at reference external/vcm/vcm/cubedsphere/regridz.py:240-245.

    ``search``: optional precomputed :func:`ops.remap.banded_search`
    coefficients (the layer search depends only on the edge sets, so ONE
    search feeds every field — the fast path used by the dycore).
    """
    if search is None and window is not None and pe2.shape[-1] == pe1.shape[-1]:
        search = _remap.banded_search(pe1, pe2, window)
    if search is not None:
        # pt=None skips the theta remap (callers recomputing theta from
        # the total-energy remap would discard it)
        pt2 = (
            None if pt is None
            else _remap.remap_apply(search, pt, iv=2, kord=kord)
        )
        wind2_stack = _remap.remap_apply(
            search, jnp.stack(wind_xyz), iv=-1, kord=kord
        )
        names = list(tracers)
        tr2_stack = _remap.remap_apply(
            search, jnp.stack([tracers[n] for n in names]), iv=0, kord=kord
        )
    else:
        pt2 = (
            None if pt is None
            else _remap.remap_ppm(pe1, pt, pe2, iv=2, kord=kord,
                                  window=window)
        )
        wind2_stack = _remap.remap_ppm(
            pe1[None], jnp.stack(wind_xyz), pe2[None], iv=-1, kord=kord,
            window=window,
        )
        names = list(tracers)
        tr2_stack = _remap.remap_ppm(
            pe1[None], jnp.stack([tracers[n] for n in names]), pe2[None],
            iv=0, kord=kord, window=window,
        )
    wind2 = tuple(wind2_stack[c] for c in range(len(wind_xyz)))
    tracers2 = {n: tr2_stack[i] for i, n in enumerate(names)}
    return pt2, wind2, tracers2
