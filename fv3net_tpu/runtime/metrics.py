"""Global scalar metrics: area-weighted means/sums for JSON step logging.

reference: workflows/prognostic_c48_run/runtime/metrics.py:18-56 — the
per-step "statistics" logger with area-weighted global means (there
MPI-reduced; here a single jnp reduction over the whole cube, or a psum
when sharded).
"""
from __future__ import annotations

import json
import logging
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.quantity import Quantity

logger = logging.getLogger("statistics")


def global_average(field, area) -> float:
    """Area-weighted global mean over (tile, y, x) [+ z broadcast]."""
    f = jnp.asarray(field.data if isinstance(field, Quantity) else field)
    if f.ndim == 4:  # vertical column: average the column-integral? no —
        # reduce horizontal only after vertical mean
        f = f.mean(axis=1)
    w = jnp.asarray(area)
    return float((f * w).sum() / w.sum())


def globally_average_2d_diagnostics(
    diagnostics: Mapping[str, Quantity], area
) -> Dict[str, float]:
    out = {}
    for name, q in diagnostics.items():
        arr = jnp.asarray(q.data if isinstance(q, Quantity) else q)
        if arr.ndim == 3 and arr.shape[-2:] == tuple(np.shape(area))[-2:]:
            out[name] = global_average(arr, area)
    return out


def log_scalar(time, scalars: Dict[str, float]) -> None:
    logger.info(
        json.dumps({"time": str(time), **{k: float(v) for k, v in
                                          scalars.items()}})
    )
