"""Tendency prescriber: apply externally-stored tendencies in the loop.

reference: workflows/prognostic_c48_run/runtime/tendency_prescriber.py
(built at runtime/factories.py:75-82 with a DatasetQuantileLimiter and a
time-interpolating dataset getter).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.ops.limit import DatasetQuantileLimiter
from fv3net_tpu.runtime.derived_state import DerivedState


class TendencyPrescriber:
    """Add dataset-provided tendencies (dQ1/dQ2/...) each step, with
    optional quantile limiting of outliers."""

    label = "tendency_prescriber"

    def __init__(
        self,
        data_getter: Callable,  # time -> Dataset of tendency Quantities
        variables: Sequence[str],
        limit_quantiles: Optional[Mapping[str, float]] = None,
    ):
        self.data_getter = data_getter
        self.variables = list(variables)
        self._limiter: Optional[DatasetQuantileLimiter] = None
        self._limit_quantiles = limit_quantiles

    def _maybe_fit_limiter(self, ds: Dataset) -> Dataset:
        if self._limit_quantiles is None:
            return ds
        if self._limiter is None:
            self._limiter = DatasetQuantileLimiter(
                self._limit_quantiles["upper"],
                self._limit_quantiles["lower"],
                limit_only=self.variables,
            ).fit(ds)
        return self._limiter.transform(ds)

    def __call__(self, time, state: DerivedState):
        data = self.data_getter(time)
        ds = Dataset({v: data[v] for v in self.variables})
        ds = self._maybe_fit_limiter(ds)
        tendencies: Dict[str, Quantity] = {v: ds[v] for v in self.variables}
        return tendencies, {}, {}
