"""Vertical prefix/suffix sums as triangular contractions.

``jnp.cumsum`` along a short z axis lowers to a TPU ``reduce-window``
kernel that runs once per step in the dycore hot path (~1 ms/step at
C48 in the device trace — 8 separate families).  A K-level cumulative
sum is a [K, K+?] triangular matrix contraction, which the MXU executes
in a single pass fused with its consumers.  For K = nz (32-64) the
matmul does 32x more multiplies than the scan but is ~8x faster wall —
the classic gather->one-hot-contraction trade of this codebase applied
to scans (CLAUDE.md performance learnings).

Numerics: each output is the same set of f32 addends in a different
association order (tree reduction instead of sequential), so results
differ from ``jnp.cumsum`` at roundoff only.  The helpers use the
matmul form only for float32 on accelerators (``precision=HIGHEST`` so
f32 operands are not bf16-truncated); float64 runs — the oracle/CPU
test surface — keep bit-exact ``jnp.cumsum``.

Used by dycore/core.py (interface pressures, hydrostatic/geometric
geopotential suffix sums), ops/remap.py (cumulative-mass tables) and
physics column helpers.  Reference algorithm context: FV3's fv_mapz
/ dyn_core pressure integrals (SURVEY.md L0); this module is a pure
lowering optimization with no reference counterpart.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# z sizes above this fall back to jnp.cumsum (matmul cost grows
# quadratically; 128 is far above any model's nz here)
_MAX_MATMUL_K = 128


import os as _os

# NEGATIVE RESULT (2026-08-20, v5e flagship bench): replacing the hot
# jnp.cumsum sites with triangular contractions measured SLOWER
# integrated — 111.7 -> 105.8 SYPD with the [6, nz, ny, nx] axis=1
# sites included (XLA transposes the whole field around the matmul) and
# 111.7 -> 106.1 with minor-axis (z-last) sites only (the einsum breaks
# XLA's fusion of the remap cumulative-mass chain; reduce-window was
# ~8 ms/chunk but fused).  Same lesson as the per-band Pallas kernels:
# under a good fusion baseline, op-local speedups that materialize
# operands lose.  Kept opt-in for future layouts (FV3NET_ZSCAN_MATMUL=1).
_ENABLED = _os.environ.get("FV3NET_ZSCAN_MATMUL", "0") == "1"


def _use_matmul(x, axis: int) -> bool:
    return (
        _ENABLED
        and x.dtype == jnp.float32
        and jax.default_backend() != "cpu"
        and x.ndim >= 1
        and (axis == -1 or axis == x.ndim - 1)
    )


@functools.lru_cache(maxsize=None)
def _tri(k: int, kind: str):
    """[K, K] 0/1 matrix T with out[z] = sum_k x[k] * T[k, z].

    Cached as NUMPY (a jnp constant created under a trace would leak the
    tracer through the cache); jnp conversion happens per call site and
    XLA dedupes the constant."""
    import numpy as np

    if kind == "inclusive":  # contribute when k <= z
        return np.triu(np.ones((k, k), np.float32))
    if kind == "suffix_strict":  # contribute when k > z
        return np.tril(np.ones((k, k), np.float32), -1)
    raise ValueError(kind)


def _apply_tri(x, tri, axis: int):
    src = "abcdefgh"[: x.ndim]
    k = src[axis if axis >= 0 else x.ndim + axis]
    out = src.replace(k, "z")
    return jnp.einsum(
        f"{src},{k}z->{out}", x, jnp.asarray(tri, x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


def cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inclusive cumulative sum along ``axis`` (drop-in for
    ``jnp.cumsum``; matmul form on accelerators for f32)."""
    k = x.shape[axis]
    if not _use_matmul(x, axis) or k > _MAX_MATMUL_K:
        return jnp.cumsum(x, axis=axis)
    return _apply_tri(x, _tri(k, "inclusive"), axis)


def suffix_sum_strict(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """out[..., j] = sum_{i > j} x[..., i] — the flip/cumsum/flip/shift
    pattern of the hydrostatic geopotential integrals, as one
    contraction (zero at the last index)."""
    k = x.shape[axis]
    if not _use_matmul(x, axis) or k > _MAX_MATMUL_K:
        # native reverse cumsum: the flip/cumsum/flip chain without the
        # two materialized `rev` copies it cost per call in the
        # acoustic-loop trace at C192 (the lowered scan associates
        # 1-2 ulp differently from the flipped forward scan)
        rev = jax.lax.cumsum(x, axis=axis % x.ndim, reverse=True)
        # strict: drop self, append zero
        sl_tail = [slice(None)] * x.ndim
        sl_tail[axis] = slice(1, None)
        sl_zero = [slice(None)] * x.ndim
        sl_zero[axis] = slice(0, 1)
        return jnp.concatenate(
            [rev[tuple(sl_tail)], jnp.zeros_like(x[tuple(sl_zero)])],
            axis=axis,
        )
    return _apply_tri(x, _tri(k, "suffix_strict"), axis)
