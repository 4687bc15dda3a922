"""Tendency preparation before application to the dynamical core.

reference: workflows/prognostic_c48_run/runtime/tendency.py —
``fillna_tendencies``/``fillna_tendency`` (ML predictions may contain
NaN, e.g. masked reservoir subdomains; they are zero-filled before
application and the per-column filled fraction is recorded as a
diagnostic), ``tendencies_from_state_updates`` and
``state_updates_from_tendency`` (reservoir bookkeeping).  The
reference's A-grid→D-grid wind transform
(``transform_agrid_wind_tendencies``) is not needed here: this build's
dycore is A-grid native, so dQu/dQv apply directly through
``TENDENCY_TO_STATE_NAME``.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime.names import STATE_NAME_TO_TENDENCY

DIMS_2D = ("tile", "y", "x")


def fillna_tendency(q: Quantity) -> Tuple[Quantity, Quantity]:
    """Zero-fill NaNs in one tendency; also return the per-column
    fraction of levels that were filled (reference tendency.py:77-85)."""
    data = jnp.asarray(q.data)
    isnan = jnp.isnan(data)
    filled = jnp.where(isnan, jnp.zeros_like(data), data)
    if data.ndim == 4:  # [tile, z, y, x]
        frac = isnan.astype(data.dtype).mean(axis=1)
        frac_dims = DIMS_2D
    else:
        frac = isnan.astype(data.dtype)
        frac_dims = q.dims
    return Quantity(filled, q.dims, q.units), Quantity(frac, frac_dims)


def fillna_tendencies(
    tendencies: Mapping[str, Quantity]
) -> Tuple[Dict[str, Quantity], Dict[str, Quantity]]:
    """(filled tendencies, {name}_filled_frac diagnostics) — reference
    tendency.py:108-119."""
    filled: Dict[str, Quantity] = {}
    fracs: Dict[str, Quantity] = {}
    for name, q in tendencies.items():
        filled[name], fracs[f"{name}_filled_frac"] = fillna_tendency(q)
    return filled, fracs


def tendencies_from_state_updates(
    initial_state: Mapping[str, Quantity],
    updated_state: Mapping[str, Quantity],
    dt: float,
) -> Dict[str, Quantity]:
    """(updated - initial) / dt for every updated variable with a
    registered tendency name (reference tendency.py:19-38)."""
    out: Dict[str, Quantity] = {}
    for variable in updated_state:
        tendency_var = STATE_NAME_TO_TENDENCY.get(variable)
        if tendency_var is None:
            continue
        a = jnp.asarray(initial_state[variable].data)
        b = jnp.asarray(updated_state[variable].data)
        out[tendency_var] = Quantity(
            (b - a) / dt, updated_state[variable].dims
        )
    return out


def state_updates_from_tendency(
    tendency_updates: Mapping[str, Quantity]
) -> Dict[str, Quantity]:
    """Rename applied-tendency state results so both the overwritten and
    overwriting values can be stored (reference tendency.py:40-50)."""
    return {
        f"{k}_state_from_postphysics_tendency": v
        for k, v in tendency_updates.items()
    }
