"""Composable input transforms for diagnostics.

Reference: workflows/diagnostics/fv3net/diagnostics/_shared/transform.py
:35-365 — diagnostics are composed from reusable input transforms
(``@transform.apply("resample_time", "3H")`` etc.) that adjust the
``DiagArg`` (prediction, verification, grid) before the diagnostic body
runs; used throughout prognostic_run/compute.py:252-374.

This build's run datasets carry a numeric ``time`` coordinate in HOURS
since the segment start (see diagnostics/prognostic/compute.py
diurnal_cycle), so the time-frequency transforms take frequencies in
hours instead of pandas offset strings; semantics otherwise mirror the
reference:

- ``resample_time(freq_hours)``: downsample-only resampling onto
  right-labeled ``freq_hours`` windows, method "nearest" (last sample in
  each window) or "mean"; drops the final time by default (crashed-
  segment tolerance, reference ``time_slice=slice(None, -1)``).
- ``daily_mean(split_hours)``: times after ``start + split`` are
  averaged into daily (24 h) means, earlier times kept at full
  frequency (reference transform.py:152-176).
- ``subset_variables(names)``: keep listed variables only, silently
  skipping absent ones.
- ``select_2d_variables`` / ``select_3d_variables``: split by presence
  of the vertical dim.
- ``mask_to_sfc_type(type)``: NaN-mask data variables outside the
  surface type (land / sea / seaice).
- ``mask_area(region)``: zero the grid ``area`` outside the region so
  area-weighted reductions restrict to it (the reference NaN-masks
  ``area`` and relies on skipna means; zero weights are the
  equivalent closed form for weighted sums).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from fv3net_tpu.core.dataset import Dataset

SURFACE_TYPE_CODES = {"sea": (0, 2), "land": (1,), "seaice": (2,)}

_TRANSFORM_FNS: Dict[str, Callable] = {}


def add_to_input_transform_fns(func):
    _TRANSFORM_FNS[func.__name__] = func
    return func


class Deferred:
    """A transform argument resolved at diagnostic-call time (wraps a
    zero-arg callable).  Lets the registration-time transform chains be
    reconfigured afterwards (config-side time-frequency control)."""

    def __init__(self, fn: Callable[[], object]):
        self.fn = fn

    def resolve(self):
        return self.fn()


def _resolve(v):
    return v.resolve() if isinstance(v, Deferred) else v


def apply(transform, *transform_args, **transform_kwargs):
    """Decorator factory prepending an input transform to a diagnostic
    (reference transform.py:35-84 ``apply``).  ``transform`` is a
    registered transform name or the function itself; args may be
    ``Deferred`` to re-read configuration at call time."""
    fn = (
        _TRANSFORM_FNS[transform]
        if isinstance(transform, str)
        else transform
    )

    def _apply_to_diag_func(diag_func):
        def transformed(arg, *a, **kw):
            args = tuple(_resolve(x) for x in transform_args)
            kwargs = {k: _resolve(v) for k, v in transform_kwargs.items()}
            new_arg = fn(*args, arg, **kwargs)
            return diag_func(new_arg, *a, **kw)

        transformed.__name__ = getattr(diag_func, "__name__", "diagnostic")
        return transformed

    return _apply_to_diag_func


# ------------------------------------------------------------------ helpers
def _replace(arg, **changes):
    return dataclasses.replace(arg, **changes)


def _times_of(ds: Optional[Dataset]) -> Optional[np.ndarray]:
    if ds is None:
        return None
    t = ds.coords.get("time")
    return None if t is None else np.asarray(t, np.float64)


def _isel_time(ds: Dataset, idx) -> Dataset:
    """Subset the time axis of every time-bearing variable AND the time
    coordinate (Dataset.isel alone leaves coords untouched)."""
    idx = np.asarray(idx)
    out = ds.isel(time=idx)
    times = _times_of(ds)
    if times is not None:
        out.coords["time"] = times[idx]
    return out


def _resample(ds: Dataset, freq_hours: float, method: str) -> Dataset:
    """Downsample-only right-labeled resampling of the time axis."""
    times = _times_of(ds)
    if times is None or times.size < 2:
        return ds
    dt = times[1] - times[0]
    if dt >= freq_hours:  # already at or below the target frequency
        return ds
    # right-labeled windows aligned to the GLOBAL time origin, like
    # pandas' resample day/hour boundary alignment: window w covers
    # ((w-1)*f, w*f], labeled w*f
    win = np.ceil(times / freq_hours - 1e-9).astype(int)
    uniq = np.unique(win)
    if method == "nearest":
        # last sample in each window (nearest to the right label)
        picks = np.asarray(
            [np.nonzero(win == w)[0][-1] for w in uniq]
        )
        return _isel_time(ds, picks)
    if method == "mean":
        out = {}
        for name, q in ds.items():
            if "time" not in q.dims:
                out[name] = q
                continue
            tax = q.dims.index("time")
            arr = np.asarray(q.data)
            means = np.stack(
                [
                    np.nanmean(
                        np.take(arr, np.nonzero(win == w)[0], axis=tax),
                        axis=tax,
                    )
                    for w in uniq
                ],
                axis=tax,
            )
            out[name] = dataclasses.replace(q, data=means)
        new = Dataset(out, dict(ds.coords), ds.attrs)
        new.coords["time"] = uniq * float(freq_hours)
        return new
    raise ValueError(f"Don't know how to resample with method={method}.")


# ---------------------------------------------------------------- transforms
@add_to_input_transform_fns
def resample_time(
    freq_hours: float,
    arg,
    time_slice=slice(None, -1),
    inner_join: bool = False,
    method: str = "nearest",
):
    """(reference transform.py:87-131)"""
    pred, verif = arg.prediction, arg.verification
    pred = _resample(pred, freq_hours, method)
    if verif is not None:
        verif = _resample(verif, freq_hours, method)
    times = _times_of(pred)
    if times is not None:
        pred = _isel_time(pred, np.arange(times.size)[time_slice])
    if inner_join and verif is not None:
        tp, tv = _times_of(pred), _times_of(verif)
        if tp is not None and tv is not None:
            common = np.intersect1d(tp, tv)
            pred = _isel_time(pred, np.nonzero(np.isin(tp, common))[0])
            verif = _isel_time(verif, np.nonzero(np.isin(tv, common))[0])
    return _replace(arg, prediction=pred, verification=verif)


@add_to_input_transform_fns
def daily_mean(split_hours: float, arg):
    """Daily means for all times after ``start + split_hours``
    (reference transform.py:152-176)."""

    def _split(ds):
        times = _times_of(ds)
        if times is None or times.size == 0:
            return ds
        split_t = times[0] + split_hours
        head_idx = np.nonzero(times <= split_t)[0]
        tail_idx = np.nonzero(times > split_t)[0]
        if tail_idx.size == 0:
            return ds
        head = _isel_time(ds, head_idx)
        tail = _resample(_isel_time(ds, tail_idx), 24.0, "mean")
        out = {}
        for name, q in ds.items():
            if "time" not in q.dims:
                out[name] = q
                continue
            tax = q.dims.index("time")
            out[name] = dataclasses.replace(
                q,
                data=np.concatenate(
                    [np.asarray(head[name].data),
                     np.asarray(tail[name].data)],
                    axis=tax,
                ),
            )
        new = Dataset(out, dict(ds.coords), ds.attrs)
        new.coords["time"] = np.concatenate(
            [np.atleast_1d(_times_of(head)),
             np.atleast_1d(_times_of(tail))]
        )
        return new

    pred = _split(arg.prediction)
    verif = None if arg.verification is None else _split(arg.verification)
    return _replace(arg, prediction=pred, verification=verif)


@add_to_input_transform_fns
def subset_variables(variables: Sequence[str], arg):
    """(reference transform.py:322-334) — keep listed variables,
    skipping absent ones without failing."""

    def _subset(ds):
        if ds is None:
            return None
        keep = {k: ds[k] for k in variables if k in ds}
        return Dataset(keep, dict(ds.coords), ds.attrs)

    return _replace(
        arg,
        prediction=_subset(arg.prediction),
        verification=_subset(arg.verification),
    )


def _is_3d(q) -> bool:
    return "z" in q.dims


@add_to_input_transform_fns
def select_3d_variables(arg):
    keep = [k for k, q in arg.prediction.items() if _is_3d(q)]
    return subset_variables(keep, arg)


@add_to_input_transform_fns
def select_2d_variables(arg):
    keep = [k for k, q in arg.prediction.items() if not _is_3d(q)]
    return subset_variables(keep, arg)


def _surface_mask(grid, surface_type: str) -> np.ndarray:
    if surface_type not in SURFACE_TYPE_CODES:
        raise ValueError(
            f"Masking for surface type {surface_type!r} is not defined."
        )
    lsm = np.asarray(grid["land_sea_mask"])
    codes = SURFACE_TYPE_CODES[surface_type]
    mask = np.zeros(lsm.shape, bool)
    for code in codes:
        mask |= np.round(lsm).astype(int) == code
    return mask


@add_to_input_transform_fns
def mask_to_sfc_type(surface_type: str, arg):
    """NaN-mask data variables outside the surface type (reference
    transform.py:224-244); grid area untouched (use mask_area for
    weighted means)."""
    mask = _surface_mask(arg.grid, surface_type)

    def _mask_ds(ds):
        if ds is None:
            return None
        out = {}
        for name, q in ds.items():
            # spatial variables carry (tile, y, x); a vertical dim may
            # sit between tile and y ([time, tile, z, y, x] cube layout)
            if not {"tile", "y", "x"}.issubset(q.dims):
                out[name] = q
                continue
            arr = np.asarray(q.data, np.float64)
            m = mask
            shape = [1] * arr.ndim
            for dim, msize in zip(("tile", "y", "x"), mask.shape):
                shape[q.dims.index(dim)] = msize
            m = mask.reshape(shape)
            arr = np.where(m, arr, np.nan)
            out[name] = dataclasses.replace(q, data=arr)
        return Dataset(out, dict(ds.coords), ds.attrs)

    return _replace(
        arg,
        prediction=_mask_ds(arg.prediction),
        verification=_mask_ds(arg.verification),
    )


@add_to_input_transform_fns
def regrid_zdim_to_pressure_levels(arg, vertical_dim: str = "z"):
    """Interpolate every 3-D variable onto the standard pressure levels
    using the arg's ``delp`` (reference transform.py:365
    ``regrid_zdim_to_pressure_levels``; fixed levels = vcm PRESSURE_GRID).
    Requires the DiagArg to carry ``delp`` with the cube layout
    [..., z, y, x]; variables without the vertical dim pass through."""
    from fv3net_tpu.ops.regridz import interpolate_to_pressure_levels

    delp = getattr(arg, "delp", None)
    if delp is None:
        raise ValueError(
            "regrid_zdim_to_pressure_levels requires DiagArg.delp"
        )
    delp = np.asarray(delp)

    def _regrid_ds(ds):
        if ds is None:
            return None
        out = {}
        for name, q in ds.items():
            if vertical_dim not in q.dims:
                out[name] = q
                continue
            zax = q.dims.index(vertical_dim)
            arr = np.asarray(q.data, np.float64)
            # z -> last for the column interpolation, then restore
            arr_zl = np.moveaxis(arr, zax, -1)
            dp = delp
            if dp.ndim == arr.ndim:
                dp_zl = np.moveaxis(dp, zax, -1)
            else:
                dp_zl = np.broadcast_to(dp, arr_zl.shape)
            interp = np.asarray(
                interpolate_to_pressure_levels(
                    np.asarray(arr_zl), np.asarray(dp_zl)
                )
            )
            dims = tuple(
                "pressure" if d == vertical_dim else d for d in q.dims
            )
            out[name] = dataclasses.replace(
                q, data=np.moveaxis(interp, -1, zax), dims=dims
            )
        return Dataset(out, dict(ds.coords), ds.attrs)

    return _replace(
        arg,
        prediction=_regrid_ds(arg.prediction),
        verification=_regrid_ds(arg.verification),
    )


@add_to_input_transform_fns
def mask_area(region: str, arg):
    """Zero the grid area outside ``region`` so area-weighted
    reductions restrict to it (reference transform.py:247-276; regions
    global / land / sea / seaice / tropics / tropics15 / tropics20)."""
    grid = dict(arg.grid)
    area = np.asarray(grid["area"], np.float64)
    lat = np.asarray(grid["lat"])
    if region == "global":
        keep = np.ones(area.shape, bool)
    elif region == "tropics":
        keep = np.abs(lat) <= 10.0
    elif region == "tropics15":
        keep = np.abs(lat) <= 15.0
    elif region == "tropics20":
        keep = np.abs(lat) <= 20.0
    elif region in SURFACE_TYPE_CODES:
        keep = _surface_mask(grid, region)
    else:
        raise ValueError(
            f"Masking procedure for region {region!r} is not defined."
        )
    grid["area"] = np.where(keep, area, 0.0)
    return _replace(arg, grid=grid)
