"""Emulation hooks: emulator application with masks + state capture.

reference: external/emulation/emulation/_emulate/microphysics.py:19-81
(MicrophysicsHook, IntervalSchedule, TimeMask), emulation/masks.py:9-66
(RangeMask/LevelMask/compose_masks), emulation/_monitor/monitor.py:26-154
(StorageHook writing zarr/netCDF snapshots).

State here is a flat Dict[str, jnp.ndarray] of (..., nz) column fields —
the analog of the Fortran state dict the reference's hooks receive.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Callable, Dict, Iterable, List, Optional

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core import zarrio

State = Dict[str, jnp.ndarray]
Mask = Callable[[State, State], State]


def always_emulator(state: State, emulator: State) -> State:
    return emulator


def compose_masks(funcs: Iterable[Mask]) -> Mask:
    """Apply masks in order; each sees the original state and the
    (partially masked) emulator output (reference masks.py:9-20)."""
    funcs = list(funcs)

    def composed(state: State, emulator: State) -> State:
        out = emulator
        for f in funcs:
            out = f(state, out)
        return out

    return composed


class RangeMask:
    """Clip an emulated field to [min, max] (reference masks.py:23-39)."""

    def __init__(self, key: str, min: Optional[float] = None,
                 max: Optional[float] = None):
        self.key = key
        self.min = min
        self.max = max

    def __call__(self, state: State, emulator: State) -> State:
        out = dict(emulator)
        if self.key in out:
            out[self.key] = jnp.clip(out[self.key], self.min, self.max)
        return out


class LevelMask:
    """Use the original (non-emulated) values outside [start, stop] along
    the vertical axis (reference masks.py:42-66).  Level 0 = top here;
    ``fill_value`` optionally overrides the non-emulated region."""

    def __init__(self, key: str, start: Optional[int] = None,
                 stop: Optional[int] = None,
                 fill_value: Optional[float] = None):
        self.key = key
        self.start = start
        self.stop = stop
        self.fill_value = fill_value

    def __call__(self, state: State, emulator: State) -> State:
        out = dict(emulator)
        if self.key not in out:
            return out
        emu = out[self.key]
        nz = emu.shape[-1]
        k = jnp.arange(nz)
        sel = jnp.ones(nz, bool)
        if self.start is not None:
            sel = sel & (k >= self.start)
        if self.stop is not None:
            sel = sel & (k < self.stop)
        base = (
            jnp.full_like(emu, self.fill_value)
            if self.fill_value is not None
            else state[self.key]
        )
        out[self.key] = jnp.where(sel, emu, base)
        return out


@dataclasses.dataclass
class IntervalSchedule:
    """1.0 within the first ``period`` fraction offset window, else 0
    (reference _emulate/microphysics.py:24-35): used to alternate between
    emulator and reference scheme in time."""

    period: datetime.timedelta
    initial_time: datetime.datetime

    def __call__(self, time: datetime.datetime) -> float:
        elapsed = (time - self.initial_time).total_seconds()
        half = self.period.total_seconds() / 2
        return 1.0 if (elapsed % self.period.total_seconds()) < half else 0.0


@dataclasses.dataclass
class TimeMask:
    """Blend emulator/state by a time-dependent alpha
    (reference _emulate/microphysics.py:38-47)."""

    schedule: IntervalSchedule
    time: Optional[datetime.datetime] = None

    def set_time(self, time: datetime.datetime) -> None:
        self.time = time

    def __call__(self, state: State, emulator: State) -> State:
        if self.time is None:
            return emulator
        alpha = self.schedule(self.time)
        out = {}
        for key, emu in emulator.items():
            if key in state:
                out[key] = alpha * emu + (1.0 - alpha) * state[key]
            else:
                out[key] = emu
        return out


class MicrophysicsEmulator:
    """Apply a trained model to the physics state dict, gated by masks
    (reference _emulate/microphysics.py:50-81 MicrophysicsHook).

    The model maps Dict[str, (..., nz)] inputs to outputs named by the
    state keys it overrides.
    """

    def __init__(self, model, mask: Mask = always_emulator):
        self.model = model
        self.mask = mask

    def __call__(self, state: State) -> State:
        inputs = {k: state[k] for k in self.model.input_variables}
        lead_shape = next(iter(inputs.values())).shape[:-1]
        flat = {
            k: v.reshape(int(np.prod(lead_shape)), v.shape[-1])
            for k, v in inputs.items()
        }
        pred = self.model.predict_arrays(flat)
        emulator = {
            k: jnp.asarray(v).reshape(lead_shape + (v.shape[-1],))
            for k, v in pred.items()
        }
        updates = self.mask(state, emulator)
        new_state = dict(state)
        new_state.update(updates)
        return new_state


class StorageHook:
    """Capture physics-state snapshots for training-data generation
    (reference _monitor/monitor.py:26-154): every ``output_freq_sec``,
    append the selected variables to a zarr store with a leading time
    dimension."""

    def __init__(
        self,
        output_path: str,
        output_freq_sec: float,
        variables: Optional[List[str]] = None,
        initial_time: Optional[datetime.datetime] = None,
    ):
        self.output_path = output_path
        self.output_freq_sec = output_freq_sec
        self.variables = variables
        self._store: Optional[zarrio.ZarrGroup] = None
        self._n = 0
        self._initial_time = initial_time

    def _should_store(self, time: datetime.datetime) -> bool:
        if self._initial_time is None:
            self._initial_time = time
        elapsed = (time - self._initial_time).total_seconds()
        return abs(elapsed % self.output_freq_sec) < 1e-6

    def __call__(self, state: State, time: datetime.datetime) -> None:
        if not self._should_store(time):
            return
        names = self.variables or sorted(state)
        if self._store is None:
            existing = os.path.exists(
                os.path.join(self.output_path, ".zgroup")
            )
            if existing:
                # resumed segment: append after what previous segments
                # wrote instead of truncating the store
                self._store = zarrio.ZarrGroup(self.output_path)
                have = self._store.array_names()
                if have:
                    self._n = self._store[have[0]].shape[0]
            else:
                self._store = zarrio.ZarrGroup.create(self.output_path)
            for name in names:
                if existing and name in self._store.array_names():
                    continue
                arr = np.asarray(state[name])
                self._store.create_array(
                    name,
                    shape=(self._n,) + arr.shape,
                    chunks=(1,) + arr.shape,
                    dtype="<f4",
                    dims=("time",) + tuple(
                        f"dim_{i}" for i in range(arr.ndim)
                    ),
                )
        for name in names:
            za = self._store[name]
            za.resize_time(self._n + 1)
            za[(self._n,)] = np.asarray(state[name], np.float32)
        self._n += 1


def get_hooks(config=None, config_path: str = "fv3config.yml"):
    """(gscond, microphysics, store) hook triple — the call_py_fort
    module surface (reference emulation/__init__.py:18 +
    config.py:309-324: reads the run's fv3config.yml
    ``zhao_carr_emulation`` key with gscond/model/storage sub-configs).

    Each hook is ``state_dict -> state_dict`` (identity when not
    configured); ``store`` additionally accepts (name, state).
    """
    import os

    if config is None:
        config = {}
        if os.path.exists(config_path):
            import yaml

            with open(config_path) as f:
                loaded = yaml.safe_load(f) or {}
            config = loaded.get("zhao_carr_emulation", {}) or {}

    def _identity(state: State) -> State:
        return state

    def _build(key):
        sub = config.get(key) or {}
        path = sub.get("path") or sub.get("url")
        if not path:
            return _identity
        from fv3net_tpu import fit

        return MicrophysicsEmulator(fit.load(path))

    gscond_hook = _build("gscond")
    model_hook = _build("model")

    storage = config.get("storage") or {}
    if storage.get("output_freq_sec") or storage.get("path"):
        store = StorageHook(
            storage.get("path", "state_output.zarr"),
            output_freq_sec=float(storage.get("output_freq_sec", 900.0)),
        )
    else:
        def store(state, time):  # noqa: ANN001
            return None

    return gscond_hook, model_hook, store
