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

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.quantity import Quantity

logger = logging.getLogger("statistics")


def _mean_impl(f, w):
    if f.ndim == 4:  # vertical column: reduce horizontal after a z mean
        f = f.mean(axis=1)
    return (f * w).sum() / w.sum()


@jax.jit
def _batched_means(fields, area):
    return {k: _mean_impl(v, area) for k, v in fields.items()}


def global_average(field, area) -> float:
    """Area-weighted global mean over (tile, y, x) [+ z broadcast]."""
    f = jnp.asarray(field.data if isinstance(field, Quantity) else field)
    return float(_mean_impl(f, jnp.asarray(area)))


def globally_average_2d_diagnostics(
    diagnostics: Mapping[str, Quantity], area
) -> Dict[str, float]:
    """All 2-D means in ONE jitted dispatch + one host pull: eager
    per-field reductions cost ~5 dispatches each, which dominates the
    production segment wall time through the TPU tunnel."""
    fields = {}
    for name, q in diagnostics.items():
        arr = jnp.asarray(q.data if isinstance(q, Quantity) else q)
        if arr.ndim == 3 and arr.shape[-2:] == tuple(np.shape(area))[-2:]:
            fields[name] = arr
    if not fields:
        return {}
    means = _batched_means(fields, jnp.asarray(area))
    vals = np.asarray(jnp.stack(list(means.values())))  # one transfer
    return {k: float(v) for k, v in zip(means, vals)}


def log_scalar(time, scalars: Dict[str, float]) -> None:
    logger.info(
        json.dumps({"time": str(time), **{k: float(v) for k, v in
                                          scalars.items()}})
    )
