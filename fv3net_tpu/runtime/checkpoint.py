"""Checkpoint/restart: model state <-> disk.

reference: Fortran restart netCDFs per category/tile + fv3config
enable_restart rewiring (reference: runtime/segmented_run/append.py:17-29,
tests/test_regression.py:78-88, runtime/debugging.py:11-15).  Here a
restart is one .npz of the full state pytree + a JSON sidecar with time
metadata — a single atomic artifact per segment.
"""
from __future__ import annotations

import dataclasses
import datetime
import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.dycore.state import DycoreState
from fv3net_tpu.runtime.derived_state import ModelState

_STATE_FILE = "state.npz"
_META_FILE = "restart.json"


def save_state(state: ModelState, time: datetime.datetime, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    d = state.dycore
    arrays: Dict[str, np.ndarray] = {
        "delp": np.asarray(d.delp),
        "pt": np.asarray(d.pt),
        "wind": np.asarray(d.wind),
        "phis": np.asarray(d.phis),
    }
    if d.w is not None:
        arrays["w"] = np.asarray(d.w)
        arrays["delz"] = np.asarray(d.delz)
    for k, v in d.tracers.items():
        arrays[f"tracer_{k}"] = np.asarray(v)
    for k, v in state.surface.items():
        arrays[f"surface_{k}"] = np.asarray(v)
    np.savez(os.path.join(path, _STATE_FILE), **arrays)
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(
            {
                "time": time.isoformat(),
                "tracers": list(d.tracers),
                "surface": list(state.surface),
            },
            f,
        )


def load_state(path: str) -> Tuple[ModelState, datetime.datetime]:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    z = np.load(os.path.join(path, _STATE_FILE))
    dycore = DycoreState(
        delp=jnp.asarray(z["delp"]),
        pt=jnp.asarray(z["pt"]),
        wind=jnp.asarray(z["wind"]),
        tracers={k: jnp.asarray(z[f"tracer_{k}"]) for k in meta["tracers"]},
        phis=jnp.asarray(z["phis"]),
        w=jnp.asarray(z["w"]) if "w" in z else None,
        delz=jnp.asarray(z["delz"]) if "delz" in z else None,
    )
    surface = {k: jnp.asarray(z[f"surface_{k}"]) for k in meta["surface"]}
    return (
        ModelState(dycore=dycore, surface=surface),
        datetime.datetime.fromisoformat(meta["time"]),
    )
