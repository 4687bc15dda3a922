"""Orographic gravity-wave drag.

The GFS physics suite applies subgrid mountain-wave momentum deposition
(the ``gwdps`` scheme inside the reference's Fortran physics; invoked
through ``wrapper.apply_physics()``, SURVEY §2.1 L0).  This is a
column-batched linear-theory scheme in the McFarlane (1987) / Palmer et
al. (1986) family:

1. a reference-level wave stress launched by flow over subgrid orography
   (standard deviation ``sgh``)::

       tau_0 = kappa_gwd * rho_ref * N_ref * U_ref * sgh_eff^2

   with ``sgh_eff`` capped so the low-level Froude number N·h/U ≤ Fc
   (blocked flow launches no more wave stress);
2. upward propagation with Lindzen-style saturation: the stress carried
   at each level cannot exceed the local saturation stress
   ``tau_sat = kappa_gwd * rho * N * U^3 / N^2 * ...`` reduced to the
   standard ``rho * kappa * U^3 / N`` form; excess stress deposits as
   drag ``du/dt = -g * d(tau)/dp`` opposing the reference-level wind;
3. the projection is onto the reference-level wind direction, so the
   drag never accelerates the flow or rotates it.

Everything is a short ``lax.scan`` up the column, batched over all
cube columns (z-last layout like the rest of the physics).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fv3net_tpu.core.constants import GRAVITY, KAPPA, RDGAS


@dataclasses.dataclass(frozen=True)
class GWDParams:
    kappa_gwd: float = 2.0e-5  # efficiency x inverse horizontal wavelength, 1/m
    froude_crit: float = 1.0  # cap on N sgh / U (blocked-flow limit)
    u_min: float = 1.0  # m/s floor on the reference wind
    n_min: float = 1.0e-4  # 1/s floor on buoyancy frequency
    # reference level: lowest model layers averaged over this sigma depth
    sigma_ref: float = 0.9


def _buoyancy_frequency(T, pmid, dz):
    """N^2 = (g/theta) dtheta/dz at layer midpoints (z-last, level 0 =
    top), one-sided at the bottom."""
    theta = T * (1.0e5 / pmid) ** KAPPA
    # d(theta)/dz between adjacent layers (distance ~ half thicknesses)
    dth = theta[..., :-1] - theta[..., 1:]  # upper minus lower (z up)
    dzm = 0.5 * (dz[..., :-1] + dz[..., 1:])
    n2_int = GRAVITY / theta[..., 1:] * dth / jnp.maximum(dzm, 1.0)
    # pad back to layer count (copy edges)
    return jnp.concatenate([n2_int[..., :1], n2_int], axis=-1)


def orographic_gwd(
    wind, T, delp, pmid, sgh, dt: float, params: GWDParams = GWDParams()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wind tendencies from subgrid mountain waves.

    Args (z-last, level 0 = model top): wind [ncomp, ..., nz] in any
    fixed basis (the dycore's 3-D Cartesian tangent components work
    directly); T, delp, pmid [..., nz]; sgh [...] subgrid orography
    standard deviation (m).
    Returns (dwind_dt [ncomp, ..., nz], tau_sfc).
    """
    rho = pmid / (RDGAS * T)
    dz = delp / (rho * GRAVITY)
    n2 = jnp.maximum(_buoyancy_frequency(T, pmid, dz), params.n_min ** 2)
    N = jnp.sqrt(n2)

    # reference level: mass-weighted average over the lowest layers
    ps = pmid[..., -1:]
    w_ref = jnp.where(pmid > params.sigma_ref * ps, delp, 0.0)
    wsum = jnp.maximum(w_ref.sum(axis=-1, keepdims=True), 1.0)

    def refavg(x):
        return (x * w_ref).sum(axis=-1) / wsum[..., 0]

    wind_ref = jnp.stack([refavg(wind[c]) for c in range(wind.shape[0])])
    U_ref = jnp.maximum(
        jnp.sqrt((wind_ref ** 2).sum(axis=0)), params.u_min
    )
    N_ref = refavg(N)
    rho_ref = refavg(rho)

    # effective mountain height capped by the blocked-flow Froude limit
    h_eff = jnp.minimum(sgh, params.froude_crit * U_ref / N_ref)
    tau0 = params.kappa_gwd * rho_ref * N_ref * U_ref * h_eff ** 2

    # wind component along the reference direction at every level
    e_ref = wind_ref / U_ref  # [ncomp, ...]
    u_par = (wind * e_ref[..., None]).sum(axis=0)

    # saturation stress per layer (linear-theory amplitude limit)
    u_pos = jnp.maximum(u_par, 0.0)  # critical level where u_par <= 0
    tau_sat = params.kappa_gwd * rho * u_pos ** 3 / N

    # sweep from the surface upward: tau[k] = min(tau[k+1], tau_sat[k]);
    # the deposited stress difference becomes drag in that layer
    def up(tau_below, inp):
        sat_k = inp
        tau_k = jnp.minimum(tau_below, sat_k)
        dep = tau_below - tau_k
        return tau_k, dep

    sat_rev = jnp.moveaxis(tau_sat, -1, 0)  # [nz, ...], 0 = top
    tau_top, dep_scan = jax.lax.scan(up, tau0, sat_rev, reverse=True)
    dep = jnp.moveaxis(dep_scan, 0, -1)  # stress deposited per layer

    # stress carried through the model top deposits in the top layer
    dep = dep.at[..., 0].add(tau_top)

    accel = GRAVITY * dep / delp  # m/s^2 along -e_ref
    # limit so the parallel wind cannot reverse within one step; NOTE the
    # clamp sheds stress at weak-wind critical levels, so the column
    # momentum change can be smaller than tau0 (taugwd diagnoses the
    # LAUNCHED stress, not the applied one)
    accel = jnp.minimum(accel, jnp.maximum(u_par, 0.0) / dt)
    return -accel[None] * e_ref[..., None], tau0
