"""Vertical flux <-> tendency reconstruction utilities.

Reference semantics: external/vcm/vcm/calc/vertical_flux.py
(convergence_cell_center:20, fit_field_as_flux:40,
convergence_cell_interface:112).  The reference solves a per-dataset
least-squares problem column-by-column with ``np.linalg.lstsq``; here the
difference operator ``M`` is static for a given ``nz``, so its
pseudoinverse is computed once on the host and the whole reconstruction
becomes ONE batched matmul — the MXU-native formulation.

Layout convention: column ops take z LAST (``[..., nz]``), matching the
rest of ``fv3net_tpu.ops``.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "convergence_cell_center",
    "convergence_cell_interface",
    "fit_field_as_flux",
]


def _center_to_interface(f):
    """Linear interp of cell-center values to the nz+1 interfaces, with
    linear extrapolation at both boundaries (constant index spacing)."""
    f_low = 2.0 * f[..., :1] - f[..., 1:2]
    f_high = 2.0 * f[..., -1:] - f[..., -2:-1]
    pad = jnp.concatenate([f_low, f, f_high], axis=-1)
    return 0.5 * (pad[..., :-1] + pad[..., 1:])


def convergence_cell_center(eddy, delp):
    """Vertical convergence ``-d(eddy)/dp`` of a CELL-CENTERED flux.

    The flux is first interpolated to interfaces (with boundary
    extrapolation), then differenced; reference
    vertical_flux.py:14-37 (``_convergence`` + ``convergence_cell_center``).
    """
    eddy = jnp.asarray(eddy)
    delp = jnp.asarray(delp)
    interface = _center_to_interface(eddy)
    return -jnp.diff(interface, axis=-1) / delp


def convergence_cell_interface(flux, delp):
    """Vertical convergence ``-dF/dp`` of an INTERFACE flux.

    ``flux`` has nz+1 interface levels on its last axis, ``delp`` nz cell
    thicknesses; reference vertical_flux.py:112-151.
    """
    flux = jnp.asarray(flux)
    delp = jnp.asarray(delp)
    return (flux[..., :-1] - flux[..., 1:]) / delp


@lru_cache(maxsize=8)
def _interior_flux_pinv(nz: int, dtype_name: str) -> np.ndarray:
    """Pseudoinverse of the (nz, nz-1) interface-difference operator M with
    M[0,0]=-1, M[-1,-1]=1, M[i,i]=-1, M[i,i-1]=1 (reference
    vertical_flux.py:95-100).  Host-side, cached per nz."""
    M = np.zeros((nz, nz - 1))
    M[0, 0] = -1.0
    M[-1, -1] = 1.0
    for i in range(1, nz - 1):
        M[i, i] = -1.0
        M[i, i - 1] = 1.0
    return np.linalg.pinv(M).T.astype(dtype_name)  # (nz-1, nz) transposed -> (nz, nz-1)


def fit_field_as_flux(field, delp, first_level_flux, last_level_flux):
    """Least-squares interface flux F with ``-dF/dp ~= field`` subject to
    fixed first/last interface fluxes (reference vertical_flux.py:40-109).

    Args:
        field: ``[..., nz]`` mass-normalized field (e.g. kg/kg/s).
        delp: ``[..., nz]`` layer thickness in Pa.
        first_level_flux, last_level_flux: ``[...]`` boundary fluxes at the
            top (z=0) and bottom (z=-1) interfaces, positive in the
            +index direction.

    Returns:
        ``[..., nz+1]`` interface flux, in ``field * delp``-integrated
        units with g folded in, whose first/last interface values equal
        the supplied boundary fluxes (reference docstring, :46-68).
    """
    field = jnp.asarray(field)
    delp = jnp.asarray(delp)
    first = jnp.asarray(first_level_flux)
    last = jnp.asarray(last_level_flux)
    nz = field.shape[-1]
    rhs = field * delp
    rhs = rhs.at[..., 0].add(-first)
    rhs = rhs.at[..., -1].add(last)
    pinv_t = jnp.asarray(
        _interior_flux_pinv(nz, np.dtype(np.result_type(field)).name)
    )
    # lstsq solution for every column at once: [..., nz] @ [nz, nz-1]
    middle = rhs @ pinv_t
    return jnp.concatenate([first[..., None], middle, last[..., None]], axis=-1)
