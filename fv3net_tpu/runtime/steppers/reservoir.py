"""Reservoir runtime steppers.

reference: workflows/prognostic_c48_run/runtime/steppers/reservoir.py
(507 LoC): ReservoirConfig with per-rank models, _FiniteStateMachine:84
enforcing increment-before-predict sequencing, TimeAverageInputs:123,
ReservoirIncrementOnlyStepper:238 / ReservoirPredictStepper:317.

Here "per-rank models" collapse to one model over all columns (no MPI
ranks); the finite-state machine and the increment/predict split are
preserved because they are scheme semantics, not parallelism artifacts.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.packer import stack_columns, unstack_columns
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState, DIMS_3D


@dataclasses.dataclass
class ReservoirConfig:
    """(reference reservoir.py:35 — minus per-rank path mapping)"""

    model_path: str = ""
    synchronize_steps: int = 1
    reservoir_timestep_seconds: float = 900.0


class _FiniteStateMachine:
    """Tracks increment/predict call ordering
    (reference reservoir.py:84-120)."""

    INCREMENT = "increment"
    PREDICT = "predict"

    def __init__(self):
        self._last_called: Optional[str] = None
        self.completed_increments = 0

    def __call__(self, state: str) -> None:
        if state == self.INCREMENT:
            self._last_called = self.INCREMENT
            self.completed_increments += 1
        elif state == self.PREDICT:
            if self._last_called != self.INCREMENT:
                raise ValueError(
                    "reservoir must be incremented before every predict"
                )
            self._last_called = self.PREDICT
        else:
            raise ValueError(state)


class TimeAverageInputs:
    """Running mean of input fields between reservoir steps
    (reference reservoir.py:123-160)."""

    def __init__(self, variables: Sequence[str]):
        self.variables = list(variables)
        self._sum: Dict[str, jnp.ndarray] = {}
        self._count = 0

    def increment(self, data: Dict[str, jnp.ndarray]) -> None:
        for v in self.variables:
            if v in self._sum:
                self._sum[v] = self._sum[v] + data[v]
            else:
                self._sum[v] = data[v]
        self._count += 1

    def get_averages(self) -> Dict[str, jnp.ndarray]:
        if self._count == 0:
            raise ValueError("no inputs accumulated")
        out = {v: self._sum[v] / self._count for v in self.variables}
        self._sum = {}
        self._count = 0
        return out


class _ReservoirStepper:
    def __init__(self, model, config: ReservoirConfig,
                 input_variables: Optional[Sequence[str]] = None):
        self.model = model
        self.config = config
        self.input_variables = list(
            input_variables or model.input_variables
        )
        self._fsm = getattr(model, "_fsm", None) or _FiniteStateMachine()
        model._fsm = self._fsm
        self.averager = TimeAverageInputs(self.input_variables)

    @property
    def _spatial(self) -> bool:
        """Subdomain (sub-rank) models consume cube-shaped fields with
        halo overlap (reference reservoir.py:19
        append_halos_using_mpi; here the overlap comes from the cube
        halo exchange inside CubeXYDivider)."""
        return hasattr(self.model, "divider")

    def _pull_inputs(self, state: DerivedState) -> jnp.ndarray:
        if self._spatial:
            fields = []
            for v in self.input_variables:
                arr = jnp.asarray(state[v].data)  # [6(,z),y,x]
                if arr.ndim == 3:
                    arr = arr[:, None]
                fields.append(jnp.moveaxis(arr, 1, -1))  # z last as features
            return jnp.concatenate(fields, axis=-1)  # [6, y, x, nf]
        cols = []
        for v in self.input_variables:
            q = state[v]
            stacked = stack_columns(jnp.asarray(q.data))
            if stacked.ndim == 1:
                stacked = stacked[:, None]
            cols.append(stacked)
        return jnp.concatenate(cols, axis=-1)

    @property
    def completed_sync_steps(self) -> int:
        return self._fsm.completed_increments


class ReservoirIncrementOnlyStepper(_ReservoirStepper):
    """Drive the reservoir state with current model state
    (reference reservoir.py:238)."""

    label = "reservoir_incrementer"

    def __call__(self, time, state: DerivedState):
        u = self._pull_inputs(state)
        if not self._spatial and (
            self.model.state.ndim < 2
            or self.model.state.shape[0] != u.shape[0]
        ):
            self.model.reset_state(batch_shape=(u.shape[0],))
        self.model.increment(u)
        self._fsm(self._fsm.INCREMENT)
        return {}, {}, {}


class ReservoirPredictStepper(_ReservoirStepper):
    """Predict updated fields from the reservoir state
    (reference reservoir.py:317)."""

    label = "reservoir_predictor"

    def __call__(self, time, state: DerivedState):
        self._fsm(self._fsm.PREDICT)
        if self._fsm.completed_increments <= self.config.synchronize_steps:
            return {}, {}, {}
        u = self._pull_inputs(state)
        pred = self.model.predict_from_state(u)
        state_updates = {}
        if self._spatial:
            nz = state[names.DELP].shape[1]
            start = 0
            for v in self.model.output_variables:
                chunk = pred[..., start : start + nz]  # [6, y, x, z]
                start += nz
                state_updates[v] = Quantity(
                    jnp.moveaxis(chunk, -1, 1), DIMS_3D
                )
            return {}, {}, state_updates
        grid_shape = tuple(
            state[names.DELP].shape[i] for i in (0, 2, 3)
        )
        start = 0
        for v, nf in zip(self.model.output_variables,
                         getattr(self.model, "output_features", None) or []):
            chunk = pred[:, start : start + nf]
            start += nf
            state_updates[v] = Quantity(
                unstack_columns(chunk, grid_shape), DIMS_3D
            )
        return {}, {}, state_updates
