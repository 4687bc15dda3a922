"""Online ML stepper.

reference: workflows/prognostic_c48_run/runtime/steppers/
machine_learning.py:114-245 — MultiModelAdapter merging per-model
predictions, PureMLStepper splitting predictions into tendencies
(dQ1/dQ2/dQu/dQv) vs direct state updates and enforcing the
MSE-conserving non-negative-humidity limiter.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.packer import stack_columns, unstack_columns
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState, DIMS_3D, DIMS_2D


class MultiModelAdapter:
    """Merge predictions of several predictors (reference
    machine_learning.py:114-149)."""

    def __init__(self, models: Sequence):
        self.models = list(models)

    @property
    def input_variables(self) -> List[str]:
        out: List[str] = []
        for m in self.models:
            for v in m.input_variables:
                if v not in out:
                    out.append(v)
        return out

    @property
    def output_variables(self) -> List[str]:
        out: List[str] = []
        for m in self.models:
            for v in m.output_variables:
                if v not in out:
                    out.append(v)
        return out

    def predict(self, X: Dataset) -> Dataset:
        merged: Dict[str, Quantity] = {}
        for m in self.models:
            pred = m.predict(X)
            for k in pred:
                merged[k] = pred[k]
        return Dataset(merged)


def predict(model, state: DerivedState) -> Dataset:
    """Pull model inputs from the derived state, stacked to [sample(,z)]
    (reference machine_learning.py:208-224)."""
    data = {}
    for name in model.input_variables:
        q = state[name]
        stacked = stack_columns(jnp.asarray(q.data))
        dims = ("sample", "z") if stacked.ndim == 2 else ("sample",)
        data[name] = Quantity(stacked, dims, q.units)
    return model.predict(Dataset(data))


class PureMLStepper:
    """Apply ML-predicted corrective tendencies / state updates
    (reference machine_learning.py:208-245).

    Returns (tendencies, diagnostics, state_updates) of Quantities on the
    model grid.
    """

    label = "machine_learning"

    def __init__(self, model, timestep: float, hydrostatic: bool = False,
                 mse_conserving_limiter: bool = True,
                 diagnostic_only: bool = False):
        self.model = model
        self.timestep = timestep
        self.hydrostatic = hydrostatic
        self.mse_conserving_limiter = mse_conserving_limiter
        # reference MachineLearningConfig.diagnostic_ml: predictions are
        # recorded as diagnostics but never applied to the state
        self.diagnostic_only = diagnostic_only

    def __call__(self, time, state: DerivedState):
        from fv3net_tpu.runtime.diagnostics.compute import (
            limit_sphum_tendency,
        )

        prediction = predict(self.model, state)
        grid_shape = tuple(state[names.DELP].shape[i] for i in (0, 2, 3))

        tendencies: Dict[str, Quantity] = {}
        state_updates: Dict[str, Quantity] = {}
        for key in prediction:
            arr = unstack_columns(jnp.asarray(prediction[key].data), grid_shape)
            dims = DIMS_3D if arr.ndim == 4 else DIMS_2D
            q = Quantity(arr, dims)
            if names.is_tendency_variable(key):
                tendencies[key] = q
            else:
                state_updates[key] = q

        # the limiter always runs when dQ2 is predicted; the config flag
        # picks the MSE-conserving vs plain-scaling variant (reference
        # diagnostics/compute.py:40-59)
        tendencies, diagnostics = limit_sphum_tendency(
            state[names.SPHUM].data,
            tendencies,
            self.timestep,
            mse_conserving=self.mse_conserving_limiter,
            delp=state[names.DELP].data,
            hydrostatic=self.hydrostatic,
        )
        return tendencies, diagnostics, state_updates


def add_tendency(state: DerivedState, tendencies, dt: float) -> None:
    """state[name] += tendency * dt for each dQ* (reference loop.py:536-554
    add_tendency)."""
    for key, tend in tendencies.items():
        target = names.TENDENCY_TO_STATE_NAME.get(key)
        if target is None and key.endswith("_tendency_due_to_nudging"):
            # nudged variables outside the dQ* conventions (e.g. surface
            # fields) carry their state name in the tendency key;
            # dropping them silently made such nudging a no-op
            candidate = key[: -len("_tendency_due_to_nudging")]
            if candidate in state:
                target = candidate
        if target is None:
            continue
        cur = state[target]
        cur_data = jnp.asarray(cur.data)
        # cast to the state's dtype: model params may be wider (e.g. f64
        # under jax_enable_x64) and must not widen the prognostic state
        tend_data = jnp.asarray(tend.data).astype(cur_data.dtype)
        state[target] = Quantity(
            cur_data + dt * tend_data, cur.dims, cur.units
        )
