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
from fv3net_tpu.diagnostics import transform
from fv3net_tpu.diagnostics.registry import Registry
from fv3net_tpu.ops import statistics as stats

# ---------------------------------------------------------------------------
# Transform-chain configuration (reference compute.py:252-481 composes
# every time-series diagnostic from resample_time / daily_mean /
# subset_variables chains; the frequencies here are config-side and
# re-read at call time via transform.Deferred).  Times are HOURS since
# segment start.  ``daily_mean_split_hours``: after this long, the time
# series collapse to daily means (reference timedelta(days=10)).
# ``time_slice``: applied after resampling; the reference drops the
# final time (crashed-segment tolerance) — this runtime only writes
# completed diagnostics windows, so the default keeps all times.
TRANSFORM_CHAIN = {
    "resample_freq_hours": 3.0,
    "daily_mean_split_hours": 240.0,
    "time_slice": slice(None),
}


def set_transform_chain(**kwargs) -> None:
    """Reconfigure the diagnostic input-transform chains (keys of
    TRANSFORM_CHAIN); takes effect on the next compute_all call."""
    for key, val in kwargs.items():
        if key not in TRANSFORM_CHAIN:
            raise KeyError(f"unknown transform-chain key {key!r}")
        TRANSFORM_CHAIN[key] = val


_FREQ = transform.Deferred(lambda: TRANSFORM_CHAIN["resample_freq_hours"])
_SPLIT = transform.Deferred(
    lambda: TRANSFORM_CHAIN["daily_mean_split_hours"]
)
_TSLICE = transform.Deferred(lambda: TRANSFORM_CHAIN["time_slice"])


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


_HORIZ = {"tile", "y", "x"}  # spatial diagnostics need the cube dims


def _d(q):
    return jnp.asarray(q.data)


def _time_mean(arr, axis=0):
    return jnp.nanmean(arr, axis=axis)


@registry_2d.register("spatial_mean_global")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
@transform.apply("daily_mean", _SPLIT)
def spatial_mean_global(arg: DiagArg):
    out = {}
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
            continue
        out[var] = Quantity(
            stats.weighted_mean(_d(q), area, axis=tuple(range(1, q.ndim))),
            ("time",),
            q.units,
        )
    return out


def _register_masked(mask_type: str):
    @registry_2d.register(f"spatial_mean_{mask_type}")
    @transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
    @transform.apply("daily_mean", _SPLIT)
    def spatial_mean_masked(arg: DiagArg, _mask=mask_type):
        out = {}
        area = jnp.asarray(arg.grid["area"])
        mask = jnp.asarray(arg.grid["land_sea_mask"])
        for var, q in arg.prediction.items():
            if "z" in q.dims or not _HORIZ.issubset(q.dims):
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
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
            continue
        out[var] = Quantity(_time_mean(_d(q)), q.dims[1:], q.units)
    return out


@registry_2d.register("zonal_and_time_mean")
def zonal_and_time_mean(arg: DiagArg):
    out = {}
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
            continue
        zm, centers = stats.zonal_average_approximate(
            _time_mean(_d(q)), lat, area
        )
        out[var] = Quantity(zm, ("latitude",), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_2d.register("zonal_mean_value")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
@transform.apply("daily_mean", _SPLIT)
def zonal_mean_hovmoller(arg: DiagArg):
    out = {}
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
            continue
        zm, centers = stats.zonal_average_approximate(_d(q), lat, area)
        out[var] = Quantity(zm, ("time", "latitude"), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_2d.register("rms_global")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE,
                 inner_join=True)
@transform.apply("daily_mean", _SPLIT)
def rms_global(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
            continue
        truth = _d(arg.verification[var])
        rms = stats.root_mean_squared_error(
            truth, _d(q), axis=tuple(range(1, q.ndim)), weights=area
        )
        out[var] = Quantity(rms, ("time",), q.units)
    return out


@registry_2d.register("mean_bias_global")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE,
                 inner_join=True)
@transform.apply("daily_mean", _SPLIT)
def mean_bias_global(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
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
        if "z" not in q.dims or not _HORIZ.issubset(q.dims):
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
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
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
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
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


@registry_2d.register("zonal_and_time_mean_bias")
def zonal_and_time_mean_bias(arg: DiagArg):
    """(reference compute.py zonal_and_time_mean_biases_2d)"""
    out = {}
    if arg.verification is None:
        return out
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
            continue
        diff = _time_mean(_d(q)) - _time_mean(_d(arg.verification[var]))
        zm, centers = stats.zonal_average_approximate(diff, lat, area)
        out[var] = Quantity(zm, ("latitude",), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_2d.register("zonal_mean_bias_value")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE,
                 inner_join=True)
@transform.apply("daily_mean", _SPLIT)
def zonal_mean_bias_hovmoller(arg: DiagArg):
    """(reference compute.py zonal_mean_bias_hovmoller)"""
    out = {}
    if arg.verification is None:
        return out
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
            continue
        diff = _d(q) - _d(arg.verification[var])
        zm, centers = stats.zonal_average_approximate(diff, lat, area)
        out[var] = Quantity(zm, ("time", "latitude"), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


@registry_3d.register("pressure_level_zonal_bias")
def zonal_bias_3d(arg: DiagArg):
    """(reference compute.py zonal_bias_3d)"""
    out = {}
    if arg.verification is None:
        return out
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    for var, q in arg.prediction.items():
        if "z" not in q.dims or var not in arg.verification:
            continue
        diff = _time_mean(_d(q)) - _time_mean(_d(arg.verification[var]))
        zm, centers = stats.zonal_average_approximate(
            jnp.moveaxis(diff, 1, 0), lat, area
        )
        out[var] = Quantity(zm, ("z", "latitude"), q.units,
                            attrs={"latitude": centers.tolist()})
    return out


def _deep_tropical_hovmoller(field, lat_deg, lon_deg, area):
    """Average over |lat|<=10, binned by longitude -> (time, longitude)
    (reference compute.py deep_tropical_mean_hovmoller: the MJO/Kelvin
    wave view)."""
    band = jnp.asarray(np.abs(lat_deg) <= 10.0, field.dtype)
    w = jnp.asarray(area) * band
    bins = np.arange(0.0, 360.1, 5.0)
    lon = np.mod(np.asarray(lon_deg), 360.0)
    comps = []
    for i in range(len(bins) - 1):
        in_bin = jnp.asarray(
            (lon >= bins[i]) & (lon < bins[i + 1]), field.dtype
        )
        wb = w * in_bin
        num = jnp.sum(field * wb[None], axis=(1, 2, 3))
        den = jnp.maximum(jnp.sum(wb), 1e-30)
        comps.append(num / den)
    centers = 0.5 * (bins[:-1] + bins[1:])
    return jnp.stack(comps, axis=-1), centers


@registry_2d.register("deep_tropical_mean_hovmoller_value")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
def deep_tropical_hovmoller_value(arg: DiagArg):
    out = {}
    for var, q in arg.prediction.items():
        if "z" in q.dims or not _HORIZ.issubset(q.dims):
            continue
        hm, centers = _deep_tropical_hovmoller(
            _d(q), arg.grid["lat"], arg.grid["lon"], arg.grid["area"]
        )
        out[var] = Quantity(hm, ("time", "longitude"), q.units,
                            attrs={"longitude": centers.tolist()})
    return out


@registry_2d.register("deep_tropical_mean_hovmoller_bias")
@transform.apply("resample_time", _FREQ, time_slice=_TSLICE,
                 inner_join=True)
def deep_tropical_hovmoller_bias(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    for var, q in arg.prediction.items():
        if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
            continue
        hm, centers = _deep_tropical_hovmoller(
            _d(q) - _d(arg.verification[var]),
            arg.grid["lat"], arg.grid["lon"], arg.grid["area"],
        )
        out[var] = Quantity(hm, ("time", "longitude"), q.units,
                            attrs={"longitude": centers.tolist()})
    return out


def _register_extrema(mask_type: str):
    """(reference compute.py _per_variable_masked spatial_min/max)"""

    def masked(arg, q):
        field = _d(q)
        if mask_type != "global":
            field = stats.mask_to_surface_type(
                field, jnp.asarray(arg.grid["land_sea_mask"]), mask_type
            )
        return field

    @registry_2d.register(f"spatial_min_{mask_type}")
    @transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
    @transform.apply("daily_mean", _SPLIT)
    def spatial_min(arg: DiagArg):
        out = {}
        for var, q in arg.prediction.items():
            if "z" in q.dims or not _HORIZ.issubset(q.dims):
                continue
            out[var] = Quantity(
                jnp.nanmin(masked(arg, q), axis=tuple(range(1, q.ndim))),
                ("time",), q.units,
            )
        return out

    @registry_2d.register(f"spatial_max_{mask_type}")
    @transform.apply("resample_time", _FREQ, time_slice=_TSLICE)
    @transform.apply("daily_mean", _SPLIT)
    def spatial_max(arg: DiagArg):
        out = {}
        for var, q in arg.prediction.items():
            if "z" in q.dims or not _HORIZ.issubset(q.dims):
                continue
            out[var] = Quantity(
                jnp.nanmax(masked(arg, q), axis=tuple(range(1, q.ndim))),
                ("time",), q.units,
            )
        return out


for _mask_type in ("global", "land", "sea"):
    _register_extrema(_mask_type)


def _register_masked_bias(mask_type: str):
    """(reference compute.py global_biases_2d over mask types)"""

    @registry_2d.register(f"mean_bias_{mask_type}")
    @transform.apply("resample_time", _FREQ, time_slice=_TSLICE,
                     inner_join=True)
    @transform.apply("daily_mean", _SPLIT)
    def mean_bias_masked(arg: DiagArg):
        out = {}
        if arg.verification is None:
            return out
        area = jnp.asarray(arg.grid["area"])
        mask = jnp.asarray(arg.grid["land_sea_mask"])
        for var, q in arg.prediction.items():
            if ("z" in q.dims or not _HORIZ.issubset(q.dims)
                or var not in arg.verification):
                continue
            diff = stats.mask_to_surface_type(
                _d(q) - _d(arg.verification[var]), mask, mask_type
            )
            w = jnp.where(jnp.isnan(diff), 0.0, area)
            d = jnp.where(jnp.isnan(diff), 0.0, diff)
            ax = tuple(range(1, q.ndim))
            out[var] = Quantity(
                jnp.sum(d * w, axis=ax) / jnp.maximum(
                    jnp.sum(w, axis=ax), 1e-30
                ),
                ("time",), q.units,
            )
        return out


for _mask_type in ("land", "sea"):
    _register_masked_bias(_mask_type)


@registry_2d.register("histogram_bias")
def histogram_bias(arg: DiagArg):
    """Histogram frequency difference vs verification (reference
    compute.py compute_histogram_bias)."""
    out = {}
    if arg.verification is None:
        return out
    for var, q in arg.prediction.items():
        bins = _HISTOGRAM_BINS.get(var)
        if bins is None or "z" in q.dims or var not in arg.verification:
            continue
        bj = jnp.asarray(bins)
        cp, edges = stats.histogram(_d(q), bj)
        cv, _ = stats.histogram(_d(arg.verification[var]), bj)
        fp = cp / jnp.maximum(cp.sum(), 1)
        fv = cv / jnp.maximum(cv.sum(), 1)
        out[var] = Quantity(
            fp - fv, ("bins",), "fraction",
            attrs={"bin_edges": np.asarray(edges).tolist()},
        )
    return out


# joint 2-D histogram pairs: (x variable, y variable, x bins, y bins) —
# the reference computes water-vapor-path vs column-moistening
# (compute.py _compute_wvp_vs_q2_histogram)
_HIST2D_PAIRS = [
    (
        "water_vapor_path",
        "column_integrated_dQ2",
        np.linspace(0.0, 80.0, 41),
        np.linspace(-2e-3, 2e-3, 41),
    ),
]


@registry_2d.register("hist_2d")
def hist2d(arg: DiagArg):
    out = {}
    for xname, yname, xbins, ybins in _HIST2D_PAIRS:
        if xname not in arg.prediction or yname not in arg.prediction:
            continue
        x = _d(arg.prediction[xname]).ravel()
        y = _d(arg.prediction[yname]).ravel()
        xi = jnp.clip(
            jnp.searchsorted(jnp.asarray(xbins), x) - 1, 0, len(xbins) - 2
        )
        yi = jnp.clip(
            jnp.searchsorted(jnp.asarray(ybins), y) - 1, 0, len(ybins) - 2
        )
        flat = xi * (len(ybins) - 1) + yi
        counts = jnp.zeros(
            (len(xbins) - 1) * (len(ybins) - 1), jnp.float32
        ).at[flat].add(1.0)
        counts = counts.reshape(len(xbins) - 1, len(ybins) - 1)
        out[f"{xname}_vs_{yname}"] = Quantity(
            counts / jnp.maximum(counts.sum(), 1),
            (f"{xname}_bins", f"{yname}_bins"), "fraction",
            attrs={"x_edges": xbins.tolist(), "y_edges": ybins.tolist()},
        )
    return out


@registry_2d.register("hist_2d_bias")
def hist2d_bias(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    pred = hist2d(arg)
    ver = hist2d(
        DiagArg(prediction=arg.verification, verification=None,
                grid=arg.grid)
    )
    for key in pred:
        if key in ver:
            out[key] = Quantity(
                jnp.asarray(pred[key].data) - jnp.asarray(ver[key].data),
                pred[key].dims, "fraction", attrs=pred[key].attrs,
            )
    return out


def _streamfunction(arg: DiagArg, q) -> Optional[Quantity]:
    from fv3net_tpu.ops import thermo as _thermo

    delp_q = (
        arg.prediction["pressure_thickness_of_atmospheric_layer"]
        if "pressure_thickness_of_atmospheric_layer" in arg.prediction
        else None
    )
    lat = jnp.asarray(arg.grid["lat"])
    area = jnp.asarray(arg.grid["area"])
    v = _time_mean(_d(q))  # (tile, z, y, x)
    if delp_q is not None:
        pmid = _time_mean(_d(delp_q))
        pressure = jnp.cumsum(pmid.mean(axis=(0, 2, 3)))  # [z]
    else:
        nz = v.shape[1]
        pressure = jnp.linspace(1e4, 1e5, nz)
    vz, centers = stats.zonal_average_approximate(
        jnp.moveaxis(v, 1, 0), lat, area
    )  # (z, latitude)
    psi = _thermo.mass_streamfunction(
        jnp.moveaxis(vz, 0, -1), pressure, jnp.asarray(centers), axis=-1
    )
    return Quantity(
        jnp.moveaxis(psi, -1, 0), ("z", "latitude"), "Gkg/s",
        attrs={"latitude": centers.tolist()},
    )


@registry_3d.register("mass_streamfunction_value")
def mass_streamfunction_value(arg: DiagArg):
    """(reference compute.py time_dependent_mass_streamfunction)"""
    out = {}
    if "northward_wind" not in arg.prediction:
        return out
    q = arg.prediction["northward_wind"]
    if "z" in q.dims or not _HORIZ.issubset(q.dims):
        out["northward_wind"] = _streamfunction(arg, q)
    return out


@registry_3d.register("mass_streamfunction_bias")
def mass_streamfunction_bias(arg: DiagArg):
    out = {}
    if arg.verification is None:
        return out
    if (
        "northward_wind" not in arg.prediction
        or "northward_wind" not in arg.verification
    ):
        return out
    q = arg.prediction["northward_wind"]
    qv = arg.verification["northward_wind"]
    if "z" not in q.dims or not _HORIZ.issubset(q.dims):
        return out
    a = _streamfunction(arg, q)
    b = _streamfunction(
        DiagArg(prediction=arg.verification, verification=None,
                grid=arg.grid),
        qv,
    )
    out["northward_wind"] = Quantity(
        jnp.asarray(a.data) - jnp.asarray(b.data), a.dims, a.units,
        attrs=a.attrs,
    )
    return out


def _register_masked_diurnal(mask_type: str):
    """(reference diurnal cycles per mask type)"""

    @registry_2d.register(f"diurnal_cycle_{mask_type}")
    def diurnal_masked(arg: DiagArg):
        out = {}
        hours = arg.prediction.coords.get("time")
        if hours is None:
            return out
        hours = np.asarray(hours, np.float64)
        lon_deg = np.asarray(arg.grid["lon"])
        area = jnp.asarray(arg.grid["area"])
        mask = jnp.asarray(arg.grid["land_sea_mask"])
        for var, q in arg.prediction.items():
            if "z" in q.dims or not _HORIZ.issubset(q.dims):
                continue
            arr = stats.mask_to_surface_type(_d(q), mask, mask_type)
            w0 = jnp.where(jnp.isnan(arr), 0.0, area[None])
            arr = jnp.where(jnp.isnan(arr), 0.0, arr)
            solar_hour = (
                hours[:, None, None, None] + lon_deg[None] / 15.0
            ) % 24.0
            comp = []
            for hb in range(24):
                in_bin = jnp.asarray(
                    (solar_hour >= hb) & (solar_hour < hb + 1), arr.dtype
                )
                w = in_bin * w0
                comp.append(
                    jnp.sum(arr * w) / jnp.maximum(jnp.sum(w), 1e-30)
                )
            out[var] = Quantity(
                jnp.stack(comp), ("solar_hour",), q.units,
                attrs={"solar_hour": list(range(24))},
            )
        return out


for _mask_type in ("land", "sea"):
    _register_masked_diurnal(_mask_type)


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
