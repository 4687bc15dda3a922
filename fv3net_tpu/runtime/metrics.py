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


class GlobalMeans:
    """Precomputed global scalar means riding along a diagnostics dict
    under the reserved ``__global_means__`` key: ``names`` (ordered) and
    ``data`` (device vector, pulled later in batches)."""

    def __init__(self, names, data):
        self.names = list(names)
        self.data = data


def globally_average_2d_diagnostics_async(
    diagnostics: Mapping[str, Quantity], area
):
    """Device-side global means with NO host pull: returns
    ``(names, device_vector)``.  Callers batch the blocking pulls across
    steps/chunks — through the TPU tunnel one synchronous pull per chunk
    costs a full round-trip that can exceed the chunk's compute time.

    When the producer already computed the means inside its own dispatch
    (the fused TimeLoop chunk), they ride along under the reserved
    ``__global_means__`` key (names in ``dims``) and are returned as-is."""
    pre = diagnostics.get("__global_means__")
    if isinstance(pre, GlobalMeans):
        return pre.names, pre.data
    fields = {}
    for name, q in diagnostics.items():
        if name == "__global_means__":
            continue
        arr = jnp.asarray(q.data if isinstance(q, Quantity) else q)
        if arr.ndim == 3 and arr.shape[-2:] == tuple(np.shape(area))[-2:]:
            fields[name] = arr
    if not fields:
        return [], None
    means = _batched_means(fields, jnp.asarray(area))
    return list(means), jnp.stack(list(means.values()))


def flush_scalar_logs(pending) -> None:
    """Pull and log a batch of (time, names, device_vector) entries in
    ONE host transfer (when the name sets match), then clear the list."""
    if not pending:
        return
    vecs = [p[2] for p in pending if p[2] is not None]
    same = all(p[1] == pending[0][1] for p in pending)
    if vecs and same and len(vecs) == len(pending):
        rows = list(np.asarray(jnp.stack(vecs)))  # one transfer
    else:
        rows = [
            np.asarray(p[2]) if p[2] is not None else np.zeros(0)
            for p in pending
        ]
    for (time, keys, _), row in zip(pending, rows):
        log_scalar(time, {k: float(v) for k, v in zip(keys, row)})
    pending.clear()


def globally_average_2d_diagnostics(
    diagnostics: Mapping[str, Quantity], area
) -> Dict[str, float]:
    """All 2-D means in ONE jitted dispatch + one host pull: eager
    per-field reductions cost ~5 dispatches each, which dominates the
    production segment wall time through the TPU tunnel."""
    pre = diagnostics.get("__global_means__")
    if isinstance(pre, GlobalMeans):
        vals = np.asarray(pre.data)
        return {k: float(v) for k, v in zip(pre.names, vals)}
    fields = {}
    for name, q in diagnostics.items():
        if name == "__global_means__":
            continue
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
