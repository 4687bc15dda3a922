"""Derived offline diagnostics.

Reference: offline/_helpers.py:73-150 (compute_r2 / insert_rmse from
the mse+variance families) and offline/derived_diagnostics.py (a
registry of diagnostics computed FROM the diagnostics dataset itself).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics.registry import Registry


def compute_r2(diags: Dict[str, Quantity]) -> Dict[str, Quantity]:
    """R2 = 1 - mse/variance for every mse/variance pair (reference
    _helpers.py:73-81)."""
    out: Dict[str, Quantity] = {}
    for name, q in diags.items():
        if "_mse_" not in name:
            continue
        var_name = name.replace("_mse_", "_variance_")
        if var_name not in diags:
            continue
        denom = np.asarray(diags[var_name].data, np.float64)
        mse = np.asarray(q.data, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            r2 = 1.0 - mse / denom
        out[name.replace("_mse_", "_r2_")] = dataclasses.replace(
            q, data=r2, units=""
        )
    return out


def insert_r2(diags: Dict[str, Quantity]) -> Dict[str, Quantity]:
    merged = dict(diags)
    merged.update(compute_r2(diags))
    return merged


def insert_rmse(diags: Dict[str, Quantity]) -> Dict[str, Quantity]:
    """sqrt of every mse diagnostic (reference _helpers.py:145-150)."""
    merged = dict(diags)
    for name, q in diags.items():
        if "_mse_" in name:
            merged[name.replace("_mse_", "_rmse_")] = dataclasses.replace(
                q,
                data=np.sqrt(np.asarray(q.data, np.float64)),
                units=q.units.replace("(", "").replace(")^2", ""),
            )
    return merged


def merge_derived(outputs):
    out: Dict[str, Quantity] = {}
    for name, q in outputs:
        if q is not None and getattr(q, "ndim", 0) != 0 or (
            q is not None and getattr(q, "ndim", None) == 0
        ):
            if q is not None:
                out[name] = q
    return out


derived_registry = Registry(merge_derived)


@derived_registry.register("r2_score_2d_global")
def overall_r2(diags: Dict[str, Quantity]):
    """Mean 2-D global R2 over all predicted variables — a headline
    scalar for the report (derived from the registry outputs like the
    reference's derived_registry entries)."""
    vals = [
        float(np.asarray(q.data))
        for name, q in insert_r2(diags).items()
        if "_r2_2d_global" in name and q.ndim == 0
    ]
    if not vals:
        return None
    return Quantity(np.asarray(np.mean(vals)), (), "")
