"""Wind staggering / rotation helpers for ingesting reference data.

reference: external/vcm/vcm/cubedsphere/rotate.py —
``center_and_rotate_xy_winds`` converts D-grid (edge-staggered) x/y wind
components to cell-centered eastward/northward winds using precomputed
rotation coefficients (the wind_rotation/c48 catalog entry consumed by
loaders at external/loaders/loaders/batches/_batch.py:69-71).

This framework's native state needs none of this (winds are Cartesian,
A-grid); these helpers exist to ingest reference-produced training data.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def center_d_grid_winds(x_wind, y_wind) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Average D-grid edge winds to cell centers.

    x_wind lives on south/north cell edges [..., ny+1, nx]; y_wind on
    west/east edges [..., ny, nx+1].  Returns centered ([..., ny, nx]) x.
    """
    xc = 0.5 * (x_wind[..., :-1, :] + x_wind[..., 1:, :])
    yc = 0.5 * (y_wind[..., :, :-1] + y_wind[..., :, 1:])
    return xc, yc


def rotate_xy_winds(
    x_wind_center,
    y_wind_center,
    eastward_wind_u_coeff,
    eastward_wind_v_coeff,
    northward_wind_u_coeff,
    northward_wind_v_coeff,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate centered grid-relative winds to eastward/northward using the
    reference's rotation-coefficient convention."""
    east = (
        eastward_wind_u_coeff * x_wind_center
        + eastward_wind_v_coeff * y_wind_center
    )
    north = (
        northward_wind_u_coeff * x_wind_center
        + northward_wind_v_coeff * y_wind_center
    )
    return east, north


def center_and_rotate_xy_winds(
    wind_rotation: dict, x_wind, y_wind
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(reference rotate.py center_and_rotate_xy_winds): staggered x/y
    winds + coefficient dict -> centered eastward/northward winds."""
    xc, yc = center_d_grid_winds(x_wind, y_wind)
    return rotate_xy_winds(
        xc,
        yc,
        wind_rotation["eastward_wind_u_coeff"],
        wind_rotation["eastward_wind_v_coeff"],
        wind_rotation["northward_wind_u_coeff"],
        wind_rotation["northward_wind_v_coeff"],
    )


def cartesian_to_local(wind_xyz, east, north) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project [3, ...] Cartesian tangent winds onto unit east/north bases
    [3, ...] (this framework's native winds -> u/v for output)."""
    u = (wind_xyz * east).sum(axis=0)
    v = (wind_xyz * north).sum(axis=0)
    return u, v


def local_to_cartesian(u, v, east, north) -> jnp.ndarray:
    """Inverse of cartesian_to_local (for ingesting u/v data)."""
    return u[None] * east + v[None] * north
