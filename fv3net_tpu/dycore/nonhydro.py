"""Nonhydrostatic extension: prognostic vertical velocity ``w`` and
geometric layer thickness ``delz`` with a semi-implicit vertical acoustic
solver.

The reference dycore's nonhydrostatic option lives in the out-of-tree
Fortran submodule (SURVEY.md §2.1: `fv3gfs-fortran`, .gitmodules:1-3); its
algorithmic shape is Lin's vertically-Lagrangian nonhydrostatic solver:
within a Lagrangian layer stack sound waves propagate only vertically, so
the stiff part of the system is per-column and is solved implicitly
(fv3gfs-fortran ``fv_dynamics`` -> ``Riemann_Solver``/``SIM1_solver`` in
``nh_utils.F90``).  That per-column structure is ideal for TPU: the
implicit solve is a batched tridiagonal system over [tile, ny, nx]
columns, evaluated with XLA's native tridiagonal solve along the short,
static z axis (everything else stays vectorized over the full cube).

Formulation (z index 0 = model top; ``delz`` > 0 here, unlike FV3's
negative-``delz`` convention; ``pi`` = hydrostatic pressure):

- equation of state on a Lagrangian layer whose virtual potential
  temperature theta_v is materially conserved during the acoustic step::

      p = p00 * (rho * Rd * theta_v / p00) ** gamma,   gamma = cp / cv
      rho = delp / (g * delz)

- vertical momentum at layer interfaces::

      dw/dt = g * dp'/dpi,        p' = p - pi_mid

- layer thickness::

      d(delz_k)/dt = w_if[k] - w_if[k+1]

Backward Euler in (w_if, delz) with p' linearized around the current
state (dp'/d(delz) = -gamma p / delz) yields a diagonally-dominant
tridiagonal system for the interface velocities; ``delz`` and the
layer-centered prognostic ``w`` are then updated from the implicit
increments (only the *increment* is interface-averaged back to centers,
so the prognostic w is not smoothed by the staggering).  Boundary
conditions: p' = 0 above the model top (constant-pressure free surface)
and the material condition w_if = w_surf at the ground (0 over flat
terrain).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fv3net_tpu.ops import zscan

from fv3net_tpu.core.constants import (
    CP_AIR,
    CV_AIR,
    GRAVITY,
    KAPPA,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE,
)

GAMMA = CP_AIR / CV_AIR  # cp/cv = 1/(1-kappa)


def hydrostatic_delz(delp, pt, ptop: float):
    """Geometric thickness in hydrostatic balance: dz = R Tv dlnp / g.

    Args are z-mid layout [6, nz, ny, nx]; ``pt`` is theta_v.
    """
    pe = jnp.concatenate(
        [
            jnp.full_like(delp[:, :1], ptop),
            ptop + zscan.cumsum(delp, axis=1),
        ],
        axis=1,
    )
    dlnp = jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1])
    pmid = delp / dlnp
    tv = pt * (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    return RDGAS * tv * dlnp / GRAVITY


def full_pressure(delp, pt, delz):
    """Layer full pressure from the equation of state (any layout; the
    three fields must be shape-aligned).  ``pt`` is theta_v."""
    rho = delp / (GRAVITY * delz)
    return REFERENCE_SURFACE_PRESSURE * (
        rho * RDGAS * pt / REFERENCE_SURFACE_PRESSURE
    ) ** GAMMA


def _tridiag_solve(a, b, c, r):
    """Solve ``a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = r[i]`` along the
    FIRST axis, batched over the rest (a[0] and c[-1] ignored).

    Uses XLA's native tridiagonal solve with the system on the minor
    axis: 3x faster on TPU than two hand-written Thomas ``lax.scan``s
    (0.80 vs 2.47 ms for 6x48x48 columns, nz=32 — the scans pay 2*nz
    tiny sequential kernels; the native op runs one fused loop).  The
    system is diagonally dominant (b = 1 + |a| + |c|), so the
    non-pivoting algorithm is stable.
    """
    mv = lambda x: jnp.moveaxis(x, 0, -1)
    x = jax.lax.linalg.tridiagonal_solve(
        mv(a), mv(b), mv(c), mv(r)[..., None]
    )
    return jnp.moveaxis(x[..., 0], -1, 0)


def vertical_solver(w, delz, delp, pt, dt: float, ptop: float, w_surf=None):
    """One backward-Euler vertical acoustic step.

    Args (z-mid layout [6, nz, ny, nx]): ``w`` layer-centered vertical
    velocity (m/s, positive up), ``delz`` geometric thickness (m, > 0),
    ``delp`` pressure thickness (Pa), ``pt`` theta_v (K).  ``w_surf``:
    optional [6, ny, nx] surface interface velocity (material BC over
    terrain); defaults to zero.  Returns (w, delz) updated.
    """
    # z-first for the scans: [nz, 6, ny, nx]
    zf = lambda x: jnp.moveaxis(x, 1, 0)
    w_z, dz_z, dp_z, pt_z = zf(w), zf(delz), zf(delp), zf(pt)
    nz = w_z.shape[0]

    pe = jnp.concatenate(
        [jnp.full_like(dp_z[:1], ptop), ptop + jnp.cumsum(dp_z, axis=0)],
        axis=0,
    )
    dlnp = jnp.log(pe[1:]) - jnp.log(pe[:-1])
    pi_mid = dp_z / dlnp
    p = full_pressure(dp_z, pt_z, dz_z)
    pp = p - pi_mid  # nonhydrostatic perturbation p'

    B = GAMMA * p * dt / dz_z  # [nz, ...]
    # interface pressure increments pi_mid[i] - pi_mid[i-1]; the top
    # half-layer uses pi_mid[0] - ptop
    dpi_if = jnp.concatenate(
        [pi_mid[:1] - ptop, pi_mid[1:] - pi_mid[:-1]], axis=0
    )
    alpha = GRAVITY * dt / dpi_if  # [nz, ...] for interfaces 0..nz-1

    # interface velocity estimate from the centered prognostic w
    # (dz-weighted linear interpolation; copy at the top, BC at the bottom)
    if w_surf is None:
        w_bot = jnp.zeros_like(w_z[0])
    else:
        w_bot = w_surf
    w_if_int = (dz_z[1:] * w_z[:-1] + dz_z[:-1] * w_z[1:]) / (
        dz_z[:-1] + dz_z[1:]
    )
    w_if = jnp.concatenate([w_z[:1], w_if_int, w_bot[None]], axis=0)

    # tridiagonal system for interfaces 0..nz-1 (interface nz is the
    # Dirichlet surface BC)
    B_above = jnp.concatenate([jnp.zeros_like(B[:1]), B[:-1]], axis=0)
    a = -alpha * B_above  # coefficient of x[i-1]; a[0] unused
    b = 1.0 + alpha * (B + B_above)
    c = -alpha * B  # coefficient of x[i+1]; row nz-1's moves to the RHS
    pp_above = jnp.concatenate([jnp.zeros_like(pp[:1]), pp[:-1]], axis=0)
    r = w_if[:-1] + alpha * (pp - pp_above)
    r = r.at[-1].add(alpha[-1] * B[-1] * w_bot)

    x = _tridiag_solve(a, b, c, r)
    w_if_new = jnp.concatenate([x, w_bot[None]], axis=0)

    dz_new = dz_z + dt * (w_if_new[:-1] - w_if_new[1:])
    dwd = w_if_new - w_if  # implicit interface increments
    w_new = w_z + 0.5 * (dwd[:-1] + dwd[1:])

    zl = lambda x: jnp.moveaxis(x, 0, 1)
    return zl(w_new), zl(dz_new)
