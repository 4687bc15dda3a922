"""Scalar metrics from computed diagnostics.

reference: workflows/diagnostics/fv3net/diagnostics/prognostic_run/
metrics.py — reduce computed diagnostics (time series / maps) to scalar
values (time means of RMSEs/biases, drifts) written as JSON.
"""
from __future__ import annotations

import json
from typing import Dict

import numpy as np

from fv3net_tpu.core.quantity import Quantity


def compute_metrics(diags: Dict[str, Quantity]) -> Dict[str, dict]:
    """Scalar metrics: time-mean of every *_rms_global / *_mean_bias_global
    series and 5-day drifts of spatial means."""
    metrics: Dict[str, dict] = {}
    for name, q in diags.items():
        arr = np.asarray(q.data)
        if name.endswith("_rms_global") and arr.ndim == 1:
            var = name[: -len("_rms_global")]
            metrics[f"rmse_of_{var}"] = {
                "value": float(np.nanmean(arr)),
                "units": q.units,
            }
        if name.endswith("_mean_bias_global") and arr.ndim == 1:
            var = name[: -len("_mean_bias_global")]
            metrics[f"mean_bias_of_{var}"] = {
                "value": float(np.nanmean(arr)),
                "units": q.units,
            }
        if name.endswith("_spatial_mean_global") and arr.ndim == 1 and len(arr) > 1:
            var = name[: -len("_spatial_mean_global")]
            metrics[f"drift_of_{var}"] = {
                "value": float(arr[-1] - arr[0]),
                "units": q.units,
            }
    return metrics


def dump_metrics(metrics: Dict[str, dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2)
