"""Boundary-layer vertical diffusion: implicit column solve, pure jnp.

Stand-in for the GFS PBL scheme.  Backward-Euler diffusion of any column
quantity with a prescribed eddy-diffusivity profile; the tridiagonal
Thomas solve is a ``lax.scan`` over the (short) z axis batched over all
columns — the TPU-idiomatic replacement for per-column Fortran loops.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax



@dataclasses.dataclass(frozen=True)
class PBLParams:
    k_max: float = 15.0  # m^2/s eddy diffusivity in the boundary layer
    sigma_pbl: float = 0.8  # diffusion active below this sigma level


def diffusivity_profile(sigma_interface, params: PBLParams = PBLParams()):
    """K at interior interfaces (..., nz-1): smooth ramp from 0 above the
    PBL top to k_max at the surface."""
    s = sigma_interface
    x = jnp.clip((s - params.sigma_pbl) / (1.0 - params.sigma_pbl), 0.0, 1.0)
    return params.k_max * x * x * (3.0 - 2.0 * x)


def implicit_diffusion(X, K_if, dz_if, dm, dt: float):
    """Backward-Euler vertical diffusion of X (..., nz).

    Flux between layers k and k+1: F = rho K (X_k - X_{k+1}) / dz
    expressed in mass coordinates: dX_k/dt = (F_{k-1/2} - F_{k+1/2}) / dm_k
    with coupling coefficients c_k = rho K / dz / dm.

    Args:
        X: (..., nz) field
        K_if: (..., nz-1) diffusivity at interior interfaces [m^2/s]
        dz_if: (..., nz-1) distance between adjacent layer midpoints [m]
        dm: (..., nz) layer masses [kg/m^2]
        dt: timestep

    Returns:
        X after implicit diffusion.
    """
    # interface density approximated from adjacent layer masses over the
    # midpoint distance (adequate for a first-order PBL closure)
    rho_if = 0.5 * (dm[..., :-1] + dm[..., 1:]) / jnp.maximum(dz_if, 1e-3)
    g_if = K_if * rho_if / jnp.maximum(dz_if, 1e-3)  # [kg/m^2/s]

    # tridiagonal system: -a_k X_{k-1} + b_k X_k - c_k X_{k+1} = X_old
    a = jnp.concatenate(
        [jnp.zeros_like(X[..., :1]), dt * g_if / dm[..., 1:]], axis=-1
    )
    c = jnp.concatenate(
        [dt * g_if / dm[..., :-1], jnp.zeros_like(X[..., :1])], axis=-1
    )
    b = 1.0 + a + c

    # Thomas algorithm via scan over z
    def fwd(carry, xs):
        cp_prev, dp_prev = carry
        a_k, b_k, c_k, d_k = xs
        denom = b_k - a_k * cp_prev
        cp = c_k / denom
        dp = (d_k + a_k * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zl = lambda v: jnp.moveaxis(v, -1, 0)
    zeros = jnp.zeros(X.shape[:-1], X.dtype)
    (_, _), (cp, dp) = lax.scan(
        fwd, (zeros, zeros), (zl(a), zl(b), zl(c), zl(X))
    )

    def bwd(X_next, xs):
        cp_k, dp_k = xs
        X_k = dp_k + cp_k * X_next
        return X_k, X_k

    _, Xs = lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return jnp.moveaxis(Xs, 0, -1)
