"""Quantile limiting of dataset outliers.

reference: external/vcm/vcm/limit.py DatasetQuantileLimiter — fit
per-variable quantile bounds, clip on transform; used by the tendency
prescriber (reference runtime/factories.py:75-82).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity


class DatasetQuantileLimiter:
    """Clip each variable to fitted [lower, upper] quantiles."""

    def __init__(
        self,
        upper_quantile_limit: float,
        lower_quantile_limit: float,
        limit_only: Optional[Sequence[str]] = None,
    ):
        self._upper_q = upper_quantile_limit
        self._lower_q = lower_quantile_limit
        self._limit_only = limit_only
        self._lower: Optional[Dict[str, jnp.ndarray]] = None
        self._upper: Optional[Dict[str, jnp.ndarray]] = None

    def fit(self, ds: Dataset, feature_dims: Optional[Sequence[str]] = None
            ) -> "DatasetQuantileLimiter":
        """Quantiles computed over all dims not in ``feature_dims``."""
        names = self._limit_only if self._limit_only is not None else list(ds)
        self._lower = {}
        self._upper = {}
        for name in names:
            q = ds[name]
            if feature_dims:
                axes = tuple(
                    i for i, d in enumerate(q.dims) if d not in feature_dims
                )
            else:
                axes = tuple(range(q.ndim))
            arr = jnp.asarray(q.data)
            self._lower[name] = jnp.quantile(arr, self._lower_q, axis=axes)
            self._upper[name] = jnp.quantile(arr, self._upper_q, axis=axes)
        return self

    def transform(self, ds: Dataset, deepcopy: bool = False) -> Dataset:
        if self._lower is None:
            raise ValueError("limiter must be fit before transform")
        out = {}
        for name in ds:
            q = ds[name]
            if name in self._lower:
                arr = jnp.clip(
                    jnp.asarray(q.data), self._lower[name], self._upper[name]
                )
                out[name] = Quantity(arr, q.dims, q.units, dict(q.attrs))
            else:
                out[name] = q
        return Dataset(out)
