"""Monitor: tendency/storage diagnostics from state differences.

reference: workflows/prognostic_c48_run/runtime/monitor.py:31-122 — wraps
a step, checkpoints selected variables before/after, emits
``tendency_of_{var}_due_to_{name}`` and
``storage_of_{var}_path_due_to_{name}`` (mass-weighted column integral)
plus ``storage_of_mass_due_to_{name}``.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.constants import GRAVITY
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState, DIMS_2D, DIMS_3D

# mass-path unit conversions by variable kind (reference monitor.py naming)
_PATH_VARS = {names.SPHUM, names.CLOUD, names.TEMP}


class Monitor:
    """Compute tendency diagnostics of a named step."""

    def __init__(self, tendency_variables: Sequence[str], timestep: float):
        self.tendency_variables = list(tendency_variables)
        self.timestep = timestep

    def __call__(self, name: str, step: Callable[[], Dict[str, Quantity]],
                 state: DerivedState) -> Dict[str, Quantity]:
        """Run ``step()`` and return its diagnostics merged with
        before/after tendency diagnostics for ``name``."""
        before = {
            v: jnp.asarray(state[v].data) for v in self.tendency_variables
        }
        delp_before = jnp.asarray(state[names.DELP].data)
        diags = step() or {}
        out = dict(diags)
        delp_after = jnp.asarray(state[names.DELP].data)
        for v in self.tendency_variables:
            after = jnp.asarray(state[v].data)
            tend = (after - before[v]) / self.timestep
            out[f"tendency_of_{v}_due_to_{name}"] = Quantity(tend, DIMS_3D)
            if v in _PATH_VARS:
                path = (tend * delp_after / GRAVITY).sum(axis=1)
                out[f"storage_of_{v}_path_due_to_{name}"] = Quantity(
                    path, DIMS_2D
                )
        mass_storage = (delp_after - delp_before).sum(axis=1) / (
            GRAVITY * self.timestep
        )
        out[f"storage_of_mass_due_to_{name}"] = Quantity(mass_storage, DIMS_2D)
        return out
