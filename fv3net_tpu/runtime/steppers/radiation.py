"""Radiation stepper: run the Python radiation driver in the loop
(reference: workflows/prognostic_c48_run/runtime/steppers/
radiation.py:28-55 — runs the ported radiation and returns its fluxes as
diagnostics; optionally applies the heating as a tendency)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.physics.radiation import Radiation
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState, DIMS_2D, DIMS_3D


class RadiationStepper:
    label = "radiation"

    def __init__(self, radiation: Radiation, apply_heating: bool = False):
        self.radiation = radiation
        self.apply_heating = apply_heating

    def __call__(self, time, state: DerivedState):
        def zlast(q):
            return jnp.moveaxis(jnp.asarray(q.data), 1, -1)

        cols = {
            "air_temperature": zlast(state[names.TEMP]),
            "pressure_thickness_of_atmospheric_layer": zlast(
                state[names.DELP]
            ),
            "surface_temperature": jnp.asarray(
                state[names.TSFC].data
            ),
            "latitude": jnp.asarray(state["latitude"].data),
            "longitude": jnp.asarray(state["longitude"].data),
        }
        # optional fields the band solvers use when available
        for opt, zdim in (
            (names.SPHUM, True),
            (names.CLOUD, True),
            ("ozone_mixing_ratio", True),
            (names.MASK, False),
        ):
            try:
                q = state[opt]
            except KeyError:
                continue
            cols[opt] = zlast(q) if zdim else jnp.asarray(q.data)
        out = self.radiation(time, cols)
        diagnostics: Dict[str, Quantity] = {}
        tendencies: Dict[str, Quantity] = {}
        for key, arr in out.items():
            if arr.ndim == cols["air_temperature"].ndim:  # 3-D column field
                q = Quantity(jnp.moveaxis(arr, -1, 1), DIMS_3D)
            else:
                q = Quantity(arr, DIMS_2D)
            diagnostics[key] = q
        if self.apply_heating:
            tendencies["dQ1"] = diagnostics[
                "tendency_of_air_temperature_due_to_radiation"
            ]
        return tendencies, diagnostics, {}
