"""Nudging stepper: relax named variables toward reference states.

reference: workflows/prognostic_c48_run/runtime/steppers/nudging.py +
runtime/nudging.py (per-variable timescales, tendencies named
``{var}_tendency_due_to_nudging``).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState


class PureNudger:
    """Nudge state variables toward a time-interpolated reference.

    Args:
        reference_getter: time -> Dict[str, Quantity] of reference fields
        timescales: variable name -> relaxation timescale in seconds
    """

    label = "nudging"

    def __init__(
        self,
        reference_getter: Callable,
        timescales: Mapping[str, float],
    ):
        self.reference_getter = reference_getter
        self.timescales = dict(timescales)

    def __call__(self, time, state: DerivedState):
        reference = self.reference_getter(time)
        tendencies: Dict[str, Quantity] = {}
        diagnostics: Dict[str, Quantity] = {}
        for var, tau in self.timescales.items():
            ref = jnp.asarray(reference[var].data)
            cur = jnp.asarray(state[var].data)
            tend = (ref - cur) / tau
            tendency_name = names.STATE_NAME_TO_TENDENCY.get(var)
            if tendency_name is None:
                tendency_name = f"{var}_tendency_due_to_nudging"
            tendencies[tendency_name] = Quantity(tend, state[var].dims)
            diagnostics[f"{var}_reference"] = reference[var]
        return tendencies, diagnostics, {}
