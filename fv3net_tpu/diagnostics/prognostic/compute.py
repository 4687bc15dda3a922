"""Computed diagnostics of a prognostic run vs (optional) verification.

reference: workflows/diagnostics/fv3net/diagnostics/prognostic_run/
compute.py:252-476 — registries of 2-D/3-D diagnostics (global RMS,
zonal+time means, zonal biases, masked spatial means/minima/maxima,
hovmoller slices) merged into one dataset, each diagnostic named
``{variable}_{diag_name}``.

Data model: a run is a Dataset with dims (time, tile, y, x[, z]) plus a
grid dict with lat (deg), lon (deg), area, land_sea_mask arrays of shape
(tile, y, x).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics.registry import Registry
from fv3net_tpu.ops import statistics as stats


@dataclasses.dataclass
class DiagArg:
    """(reference compute.py DiagArg): prognostic run output,
    verification data, grid."""

    prediction: Dataset
    verification: Optional[Dataset]
    grid: Dict[str, np.ndarray]


def merge_diags(outputs: List[Tuple[str, Dict[str, Quantity]]]):
    merged: Dict[str, Quantity] = {}
    for name, diags in outputs:
        for var, q in diags.items():
            merged[f"{var}_{name}"] = q
    return merged


registry_2d = Registry(merge_diags)
registry_3d = Registry(merge_diags)


def _d(q):
    return jnp.asarray(q.data)


def _time_mean(arr, axis=0):
    return jnp.nanmean(arr, axis=axis)


@registry_2d.register("spatial_mean_global")
def spatial_mean_global(arg: DiagArg):
    out = {}
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims:
            continue
        out[var] = Quantity(
            stats.weighted_mean(_d(q), area, axis=tuple(range(1, q.ndim))),
            ("time",),
            q.units,
        )
    return out


def _register_masked(mask_type: str):
    @registry_2d.register(f"spatial_mean_{mask_type}")
    def spatial_mean_masked(arg: DiagArg, _mask=mask_type):
        out = {}
        area = jnp.asarray(arg.grid["area"])
        mask = jnp.asarray(arg.grid["land_sea_mask"])
        for var, q in arg.prediction.items():
            if "z" in q.dims:
                continue
            field = stats.mask_to_surface_type(_d(q), mask, _mask)
            w = jnp.where(jnp.isnan(field), 0.0, area)
            f = jnp.where(jnp.isnan(field), 0.0, field)
            mean = jnp.sum(f * w, axis=tuple(range(1, q.ndim))) / jnp.sum(
                w, axis=tuple(range(1, q.ndim))
            )
            out[var] = Quantity(mean, ("time",), q.units)
        return out


for _mask_type in ("land", "sea"):
    _register_masked(_mask_type)


@registry_2d.register("time_mean_value")
def time_mean_maps(arg: DiagArg):
    out = {}
    for var, q in arg.prediction.items():
        if "z" in q.dims:
            continue
        out[var] = Quantity(_time_mean(_d(q)), q.dims[1:], q.units)
    return out


@registry_2d.register("zonal_and_time_mean")
def zonal_and_time_mean(arg: DiagArg):
    out = {}
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims:
            continue
        zm, centers = stats.zonal_average_approximate(
            _time_mean(_d(q)), lat, area
        )
        out[var] = Quantity(zm, ("latitude",), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_2d.register("zonal_mean_value")
def zonal_mean_hovmoller(arg: DiagArg):
    out = {}
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims:
            continue
        zm, centers = stats.zonal_average_approximate(_d(q), lat, area)
        out[var] = Quantity(zm, ("time", "latitude"), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_2d.register("rms_global")
def rms_global(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims or var not in arg.verification:
            continue
        truth = _d(arg.verification[var])
        rms = stats.root_mean_squared_error(
            truth, _d(q), axis=tuple(range(1, q.ndim)), weights=area
        )
        out[var] = Quantity(rms, ("time",), q.units)
    return out


@registry_2d.register("mean_bias_global")
def mean_bias_global(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims or var not in arg.verification:
            continue
        b = stats.bias(
            _d(arg.verification[var]), _d(q),
            axis=tuple(range(1, q.ndim)), weights=area,
        )
        out[var] = Quantity(b, ("time",), q.units)
    return out


@registry_3d.register("pressure_level_zonal_time_mean")
def zonal_means_3d(arg: DiagArg):
    out = {}
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" not in q.dims:
            continue
        # (time, tile, z, y, x) -> time mean -> (tile, z, y, x); move z
        # in front of the spatial axes for binning
        tm = _time_mean(_d(q))
        zm, centers = stats.zonal_average_approximate(
            jnp.moveaxis(tm, 1, 0), lat, area
        )
        out[var] = Quantity(zm, ("z", "latitude"), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


# percentile-relevant variables get histograms (the reference computes
# precipitation histograms/percentiles, compute.py histogram diagnostics)
_HISTOGRAM_BINS = {
    "PRATEsfc": np.logspace(-10, -2, 51),  # kg/m^2/s
    "surface_precipitation_rate": np.logspace(-10, -2, 51),
    "total_precipitation_rate": np.logspace(-10, -2, 51),
}


@registry_2d.register("histogram")
def histograms(arg: DiagArg):
    out = {}
    for var, q in arg.prediction.items():
        bins = _HISTOGRAM_BINS.get(var)
        if bins is None or "z" in q.dims:
            continue
        counts, edges = stats.histogram(_d(q), jnp.asarray(bins))
        # density normalization (the reference reports frequencies)
        total = jnp.maximum(counts.sum(), 1)
        out[var] = Quantity(
            counts / total,
            ("bins",),
            "fraction",
            attrs={"bin_edges": np.asarray(edges).tolist()},
        )
    return out


@registry_2d.register("time_mean_bias_value")
def time_mean_bias_maps(arg: DiagArg):
    """Time-mean bias maps vs verification (reference's bias map panels)."""
    out = {}
    if arg.verification is None:
        return out
    for var, q in arg.prediction.items():
        if "z" in q.dims or var not in arg.verification:
            continue
        b = _time_mean(_d(q)) - _time_mean(_d(arg.verification[var]))
        out[var] = Quantity(b, q.dims[1:], q.units)
    return out


@registry_2d.register("diurnal_cycle")
def diurnal_cycle(arg: DiagArg):
    """Composite by local solar hour (the reference's diurnal-cycle
    diagnostics of surface fields, diurnal_cycle.py).  Uses the run's
    ``time`` coordinate in hours plus longitude for solar time; 24
    one-hour bins, area-weighted global mean per bin."""
    out = {}
    hours = arg.prediction.coords.get("time")
    if hours is None:
        return out
    hours = np.asarray(hours, np.float64)
    lon_deg = np.asarray(arg.grid["lon"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims:
            continue
        arr = _d(q)  # (time, tile, y, x)
        solar_hour = (
            hours[:, None, None, None] + lon_deg[None] / 15.0
        ) % 24.0
        comp = []
        for hb in range(24):
            in_bin = jnp.asarray(
                (solar_hour >= hb) & (solar_hour < hb + 1), arr.dtype
            )
            w = in_bin * area[None]
            comp.append(jnp.sum(arr * w) / jnp.maximum(jnp.sum(w), 1e-30))
        out[var] = Quantity(
            jnp.stack(comp), ("solar_hour",), q.units,
            attrs={"solar_hour": list(range(24))},
        )
    return out


def compute_all(
    prediction: Dataset,
    grid: Dict[str, np.ndarray],
    verification: Optional[Dataset] = None,
) -> Dict[str, Quantity]:
    """Run both registries over the run output (the
    ``prognostic_run_diags compute`` core)."""
    arg = DiagArg(prediction=prediction, verification=verification, grid=grid)
    out = dict(registry_2d.compute(arg))
    out.update(registry_3d.compute(arg))
    return out
