"""Reservoir runtime steppers.

reference: workflows/prognostic_c48_run/runtime/steppers/reservoir.py
(507 LoC): ReservoirConfig with per-rank models, _FiniteStateMachine:84
enforcing increment-before-predict sequencing, TimeAverageInputs:123
(here folded into the incrementer's reservoir-timestep accumulation),
ReservoirIncrementOnlyStepper:238 / ReservoirPredictStepper:317.

Here "per-rank models" collapse to one model over all columns (no MPI
ranks); the finite-state machine and the increment/predict split are
preserved because they are scheme semantics, not parallelism artifacts.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.packer import stack_columns, unstack_columns
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedState, DIMS_3D


@dataclasses.dataclass
class ReservoirConfig:
    """(reference reservoir.py:35-65 — minus per-rank path mapping)

    ``rename_mapping`` maps model-side variable names to run-side state
    names; ``diagnostic_only`` emits predictions as diagnostics
    (``{name}_reservoir_prediction``) without touching the state;
    ``warm_start`` restores a pre-synchronized reservoir state saved
    next to the model (``reservoir_state.npz``) and skips the
    synchronization gate."""

    model_path: str = ""
    synchronize_steps: int = 1
    reservoir_timestep_seconds: float = 900.0
    rename_mapping: dict = dataclasses.field(default_factory=dict)
    diagnostic_only: bool = False
    warm_start: bool = False


class _FiniteStateMachine:
    """Tracks increment/predict call ordering
    (reference reservoir.py:84-120)."""

    INCREMENT = "increment"
    PREDICT = "predict"

    def __init__(self):
        self._last_called: Optional[str] = None
        self.completed_increments = 0
        # reservoir-timestep bookkeeping (shared by the increment/predict
        # stepper pair through the model)
        self.accum = None
        self.accum_n = 0
        self.last_fire = None
        self.pending_predict = False

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


class _ReservoirStepper:
    def __init__(self, model, config: ReservoirConfig,
                 input_variables: Optional[Sequence[str]] = None):
        self.model = model
        self.config = config
        rename = dict(config.rename_mapping)
        self.input_variables = [
            rename.get(v, v)
            for v in (input_variables or model.input_variables)
        ]
        self.output_renames = rename
        self._fsm = getattr(model, "_fsm", None) or _FiniteStateMachine()
        model._fsm = self._fsm
        if config.warm_start and not getattr(self._fsm, "warm_started", False):
            self._fsm.warm_started = True
            self._load_warm_state()

    def _load_warm_state(self) -> None:
        """Restore a saved reservoir state (reference reservoir.py:49
        warm_start): skip synchronization entirely."""
        import os

        import numpy as np

        path = os.path.join(self.config.model_path, "reservoir_state.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"warm_start=true but {path} does not exist; run "
                "save_reservoir_state after synchronizing, or disable "
                "warm_start"
            )
        with np.load(path) as z:
            self.model.state = jnp.asarray(z["state"])
        # mark synchronization as already complete
        self._fsm.completed_increments = max(
            self._fsm.completed_increments, self.config.synchronize_steps + 1
        )

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
    """Drive the reservoir with TIME-AVERAGED model state at the
    reservoir's own cadence (reference reservoir.py:238 +
    TimeAverageInputs:123 — models are trained on averaged inputs at
    ``reservoir_timestep_seconds``, which may be a multiple of the model
    step)."""

    label = "reservoir_incrementer"

    def __call__(self, time, state: DerivedState):
        u = self._pull_inputs(state)
        f = self._fsm
        f.accum = u if f.accum is None else f.accum + u
        f.accum_n += 1
        rts = self.config.reservoir_timestep_seconds
        due = (
            f.last_fire is None
            or (time - f.last_fire).total_seconds() + 1e-6 >= rts
        )
        if due:
            u_avg = f.accum / f.accum_n
            if not self._spatial and (
                self.model.state.ndim < 2
                or self.model.state.shape[0] != u_avg.shape[0]
            ):
                self.model.reset_state(batch_shape=(u_avg.shape[0],))
            self.model.increment(u_avg)
            f(f.INCREMENT)
            f.accum = None
            f.accum_n = 0
            f.last_fire = time
            f.pending_predict = True
        return {}, {}, {}


class ReservoirPredictStepper(_ReservoirStepper):
    """Predict updated fields from the reservoir state
    (reference reservoir.py:317)."""

    label = "reservoir_predictor"

    def __call__(self, time, state: DerivedState):
        if not self._fsm.pending_predict:
            return {}, {}, {}  # between reservoir timesteps: no-op
        self._fsm.pending_predict = False
        self._fsm(self._fsm.PREDICT)
        if self._fsm.completed_increments <= self.config.synchronize_steps:
            return {}, {}, {}
        u = self._pull_inputs(state)
        pred = self.model.predict_from_state(u)
        state_updates = {}
        if self._spatial:
            nz = state[names.DELP].shape[1]
            n_out = len(self.model.output_variables)
            if pred.shape[-1] != n_out * nz:
                raise ValueError(
                    f"spatial reservoir prediction has {pred.shape[-1]} "
                    f"features but the run expects {n_out} x nz={nz} "
                    "(model trained on a different vertical grid?)"
                )
            start = 0
            for v in self.model.output_variables:
                chunk = pred[..., start : start + nz]  # [6, y, x, z]
                start += nz
                name = self.output_renames.get(v, v)
                state_updates[name] = Quantity(
                    jnp.moveaxis(chunk, -1, 1), DIMS_3D
                )
            return self._route(state_updates)
        grid_shape = tuple(
            state[names.DELP].shape[i] for i in (0, 2, 3)
        )
        feats = getattr(self.model, "output_features", None)
        if not feats:
            if len(self.model.output_variables) == 1:
                feats = [pred.shape[-1]]  # one variable owns the vector
            else:
                raise ValueError(
                    "reservoir model lacks output_features metadata and "
                    "has multiple output variables; cannot split the "
                    "prediction unambiguously"
                )
        start = 0
        for v, nf in zip(self.model.output_variables, feats):
            chunk = pred[:, start : start + nf]
            start += nf
            name = self.output_renames.get(v, v)
            state_updates[name] = Quantity(
                unstack_columns(chunk, grid_shape), DIMS_3D
            )
        return self._route(state_updates)

    def _route(self, state_updates):
        """diagnostic_only mode stores predictions as diagnostics instead
        of overwriting the model state (reference reservoir.py:47-48)."""
        if self.config.diagnostic_only:
            diags = {
                f"{name}_reservoir_prediction": q
                for name, q in state_updates.items()
            }
            return {}, diags, {}
        return {}, {}, state_updates


def save_reservoir_state(model, model_path: str) -> str:
    """Persist the reservoir's current state next to the model so later
    runs can ``warm_start`` (reference reservoir.py:49 semantics; the
    producer side of ``ReservoirConfig.warm_start``)."""
    import os

    import numpy as np

    path = os.path.join(model_path, "reservoir_state.npz")
    np.savez(path, state=np.asarray(model.state))
    return path
