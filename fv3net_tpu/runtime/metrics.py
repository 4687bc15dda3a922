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


class ScalarBatcher:
    """Batches per-chunk global-means vectors for the production loop
    with tunnel-friendly scheduling: each vector is appended into a
    fixed [batch, nf] device buffer by ONE jitted dynamic_update_slice
    (enqueued right behind its producing chunk — in-order execution
    makes it effectively free), and a filled buffer is pulled only on a
    LATER iteration, when its last writer is guaranteed finished, so
    the single np.asarray never blocks on in-flight compute.  Replaces
    per-vector pulls (~80 ms RTT each under load) and flush-time device
    stacks (queue behind the current chunk: ~0.6 s/flush measured,
    docs/performance.md r5)."""

    def __init__(self, batch: int = 8):
        self._batch = batch
        self._buf = None
        self._meta = []  # (time, names) per row of current buffer
        self._full = []  # [(buffer, meta), ...] filled, ready to pull
        self._host = []  # (time, names, host_row_or_None) fallbacks

    def append(self, time, names, vec) -> None:
        if vec is None:
            self._host.append((time, [], None))
            return
        if self._buf is None:
            self._buf = jnp.zeros((self._batch, vec.shape[0]), vec.dtype)
            self._meta = []
        self._buf = _dus_jit(self._buf.shape)(
            self._buf, vec, len(self._meta)
        )
        self._meta.append((time, names))
        if len(self._meta) >= self._batch:
            # fresh=True: the final row's producer is the in-flight
            # chunk — pull only on a later flush_ready call
            self._full.append([self._buf, self._meta, True])
            self._buf = None

    def flush_ready(self) -> None:
        """Pull + log every buffer COMPLETED on an earlier iteration."""
        keep = []
        for entry in self._full:
            buf, meta, fresh = entry
            if fresh:
                entry[2] = False
                keep.append(entry)
                continue
            rows = np.asarray(buf)
            for (time, names), row in zip(meta, rows):
                log_scalar(time, dict(zip(names, row)))
        self._full = keep
        for time, names, row in self._host:
            log_scalar(time, {})
        self._host = []

    def close(self) -> None:
        if self._buf is not None:
            self._full.append([self._buf, self._meta, False])
            self._buf = None
        for entry in self._full:
            entry[2] = False
        self.flush_ready()


def _dus_jit(shape):
    fn = _dus_jit._cache.get(shape)
    if fn is None:
        fn = jax.jit(
            lambda buf, vec, i: jax.lax.dynamic_update_slice(
                buf, vec[None], (i, 0)
            )
        )
        _dus_jit._cache[shape] = fn
    return fn


_dus_jit._cache = {}


def flush_scalar_logs(pending) -> None:
    """Pull and log a batch of (time, names, device_vector) entries in
    ONE host transfer (when the name sets match), then clear the list."""
    if not pending:
        return
    # per-vector pulls: each vector is ~100 bytes (one RTT), and a
    # device-side stack enqueued at flush time would queue behind the
    # in-flight chunk (in-order execution) and block on its compute —
    # measured 0.6 s/flush vs ~10 ms/vector (docs/performance.md r5)
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
