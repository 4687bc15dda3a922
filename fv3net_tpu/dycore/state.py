"""Dycore model state: a pytree of arrays, the pure-function replacement
for the Fortran wrapper's side-effectful get_state/set_state
(reference: workflows/prognostic_c48_run/runtime/loop.py:376-426,
runtime/derived_state.py:83-160).

Layout: [tile=6, nz, ny, nx] for 3-D fields (x innermost for halo
stencils; column ops transpose to z-last at the physics boundary).
Horizontal wind is a 3-D Cartesian tangent vector stored as a leading
component axis [3, 6, nz, ny, nx] — no D-grid staggering, no component
rotation at tile edges.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import (
    KAPPA,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE,
    RVGAS,
    TOA_PRESSURE,
)
from fv3net_tpu.grid.geometry import Grid
from fv3net_tpu.dycore import vertical


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DycoreState:
    """Prognostic state of the hydrostatic core.

    Attributes:
        delp: layer pressure thickness [6, nz, ny, nx], Pa
        pt: virtual potential temperature theta_v [6, nz, ny, nx], K
        wind: Cartesian tangent wind [3, 6, nz, ny, nx], m/s
        tracers: name -> [6, nz, ny, nx] mixing ratios (kg/kg); always
            includes "sphum"
        phis: surface geopotential [6, ny, nx], m^2/s^2
        w: layer-centered vertical velocity [6, nz, ny, nx], m/s (positive
            up); None in hydrostatic runs
        delz: geometric layer thickness [6, nz, ny, nx], m (positive,
            unlike FV3's negative-delz convention); None in hydrostatic
            runs.  Present together with ``w`` iff the core is
            nonhydrostatic (dycore/nonhydro.py)
    """

    delp: jnp.ndarray
    pt: jnp.ndarray
    wind: jnp.ndarray
    tracers: Dict[str, jnp.ndarray]
    phis: jnp.ndarray
    w: Optional[jnp.ndarray] = None
    delz: Optional[jnp.ndarray] = None

    @property
    def nz(self) -> int:
        return self.delp.shape[1]

    @property
    def n(self) -> int:
        return self.delp.shape[-1]

    def surface_pressure(self, ptop: float = TOA_PRESSURE) -> jnp.ndarray:
        return self.delp.sum(axis=1) + ptop


def add_nonhydrostatic_fields(
    state: DycoreState, ptop: float = TOA_PRESSURE
) -> DycoreState:
    """Attach the nonhydrostatic prognostics (w = 0, hydrostatically
    balanced delz) to a hydrostatic state."""
    from fv3net_tpu.dycore import nonhydro

    return dataclasses.replace(
        state,
        w=jnp.zeros_like(state.delp),
        delz=nonhydro.hydrostatic_delz(state.delp, state.pt, ptop),
    )


def temperature_from_theta_v(pt, pmid, sphum):
    """T from theta_v and midlayer pressure."""
    tv = pt * (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    return tv / (1.0 + (RVGAS / RDGAS - 1.0) * sphum)


def theta_v_from_temperature(T, pmid, sphum):
    tv = T * (1.0 + (RVGAS / RDGAS - 1.0) * sphum)
    return tv * (REFERENCE_SURFACE_PRESSURE / pmid) ** KAPPA


def init_state(
    grid: Grid,
    nz: int,
    ptop: float = TOA_PRESSURE,
    t0: float = 280.0,
    dtype=jnp.float32,
    perturbation: float = 0.0,
    seed: int = 0,
) -> Tuple[DycoreState, np.ndarray, np.ndarray]:
    """Isothermal resting atmosphere over flat topography, optionally with
    a localized theta perturbation (gravity-wave test).

    Returns (state, ak, bk).
    """
    ak, bk = vertical.hybrid_coordinate(nz, ptop=ptop)
    shape3 = (6, nz, grid.n, grid.n)
    ps = np.full((6, grid.n, grid.n), 1.0e5)
    pe = ak[:, None, None] + bk[:, None, None] * ps[:, None]  # [6, nz+1, n, n]
    delp = np.diff(pe, axis=1)
    pmid = delp / np.diff(np.log(pe), axis=1)
    # isothermal T -> theta_v profile (dry)
    theta = t0 * (REFERENCE_SURFACE_PRESSURE / pmid) ** KAPPA
    if perturbation:
        lon = grid.lon[:, None, :, :]
        lat = grid.lat[:, None, :, :]
        bump = perturbation * np.exp(
            -((lon - 1.0) ** 2 + (lat - 0.3) ** 2) / 0.05
        )
        kz = np.exp(-(((np.arange(nz) - nz * 0.6) / (0.15 * nz)) ** 2))
        theta = theta + bump * kz[None, :, None, None]
    # moist initial state: 50% relative humidity near the surface,
    # decaying aloft (Magnus saturation, consistent with ops.thermo)
    es = 610.94 * np.exp(17.625 * (t0 - 273.15) / (t0 - 273.15 + 243.04))
    qsat = 0.622 * es / (pmid - 0.378 * es)
    q0 = 0.5 * qsat * (pmid / 1.0e5) ** 2
    state = DycoreState(
        delp=jnp.asarray(delp, dtype),
        pt=jnp.asarray(theta, dtype),
        wind=jnp.zeros((3,) + shape3, dtype),
        tracers={
            "sphum": jnp.asarray(np.broadcast_to(q0, shape3), dtype),
            "cloud_water": jnp.zeros(shape3, dtype),
        },
        phis=jnp.zeros((6, grid.n, grid.n), dtype),
    )
    return state, ak, bk
