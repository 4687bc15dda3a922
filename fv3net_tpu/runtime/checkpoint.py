"""Checkpoint/restart: model state <-> disk.

reference: Fortran restart netCDFs per category/tile + fv3config
enable_restart rewiring (reference: runtime/segmented_run/append.py:17-29,
tests/test_regression.py:78-88, runtime/debugging.py:11-15).  Here a
restart is one .npz of the full state pytree + a JSON sidecar with time
metadata — a single atomic artifact per segment.
"""
from __future__ import annotations

import dataclasses
import datetime
import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from fv3net_tpu.dycore.state import DycoreState
from fv3net_tpu.runtime.derived_state import ModelState

_STATE_FILE = "state.npz"
_META_FILE = "restart.json"


def save_state(state: ModelState, time: datetime.datetime, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    d = state.dycore
    arrays: Dict[str, np.ndarray] = {
        "delp": np.asarray(d.delp),
        "pt": np.asarray(d.pt),
        "wind": np.asarray(d.wind),
        "phis": np.asarray(d.phis),
    }
    if d.w is not None:
        arrays["w"] = np.asarray(d.w)
        arrays["delz"] = np.asarray(d.delz)
    for k, v in d.tracers.items():
        arrays[f"tracer_{k}"] = np.asarray(v)
    for k, v in state.surface.items():
        arrays[f"surface_{k}"] = np.asarray(v)
    np.savez(os.path.join(path, _STATE_FILE), **arrays)
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(
            {
                "time": time.isoformat(),
                "tracers": list(d.tracers),
                "surface": list(state.surface),
            },
            f,
        )


def load_state(path: str) -> Tuple[ModelState, datetime.datetime]:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    z = np.load(os.path.join(path, _STATE_FILE))
    dycore = DycoreState(
        delp=jnp.asarray(z["delp"]),
        pt=jnp.asarray(z["pt"]),
        wind=jnp.asarray(z["wind"]),
        tracers={k: jnp.asarray(z[f"tracer_{k}"]) for k in meta["tracers"]},
        phis=jnp.asarray(z["phis"]),
        w=jnp.asarray(z["w"]) if "w" in z else None,
        delz=jnp.asarray(z["delz"]) if "delz" in z else None,
    )
    surface = {k: jnp.asarray(z[f"surface_{k}"]) for k in meta["surface"]}
    return (
        ModelState(dycore=dycore, surface=surface),
        datetime.datetime.fromisoformat(meta["time"]),
    )


# ---------------------------------------------------------------------------
# reference-layout Fortran restart files
# ---------------------------------------------------------------------------

# GFS tracer naming in fv_tracer.res files (reference restart categories
# enumerated at tests/test_regression.py:78-88)
_TRACER_NAMES = {"sphum": "sphum", "cloud_water": "liq_wat"}
_TRACER_NAMES_INV = {v: k for k, v in _TRACER_NAMES.items()}


def save_fortran_restarts(
    state: ModelState, time: datetime.datetime, path: str, grid
) -> None:
    """Also write the state in the reference's per-category, per-tile
    classic-NetCDF restart layout (fv_core.res.tileN.nc,
    fv_tracer.res.tileN.nc, fv_srf_wnd.res.tileN.nc, sfc_data.tileN.nc +
    coupler.res), so reference-side tooling (vcm.open_restarts, the
    restart-ingesting pipelines) can read this framework's output
    directly.  Winds are written as A-grid eastward/northward components
    (this core is unstaggered); there is no phy_data category (no Fortran
    physics state exists here).
    """
    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.netcdfio import write_netcdf
    from fv3net_tpu.core.quantity import Quantity

    os.makedirs(path, exist_ok=True)
    d = state.dycore
    east = np.moveaxis(np.asarray(grid.east), -1, 0)  # [3, 6, n, n]
    north = np.moveaxis(np.asarray(grid.north), -1, 0)
    wind = np.asarray(d.wind)  # [3, 6, nz, n, n]
    u = (wind * east[:, :, None]).sum(axis=0)
    v = (wind * north[:, :, None]).sum(axis=0)
    T = _temperature_of(d)

    dims3 = ("Time", "zaxis_1", "yaxis_1", "xaxis_1")
    dims2 = ("Time", "yaxis_1", "xaxis_1")

    def q3(arr_t):
        return Quantity(jnp.asarray(arr_t[None]), dims3)

    def q2(arr_t):
        return Quantity(jnp.asarray(arr_t[None]), dims2)

    for t in range(6):
        core = Dataset(
            {
                "T": q3(T[t]),
                "delp": q3(np.asarray(d.delp)[t]),
                "ua": q3(u[t]),
                "va": q3(v[t]),
                "phis": q2(np.asarray(d.phis)[t]),
                **(
                    {
                        "W": q3(np.asarray(d.w)[t]),
                        "DZ": q3(-np.asarray(d.delz)[t]),  # FV3 sign
                    }
                    if d.w is not None
                    else {}
                ),
            }
        )
        write_netcdf(core, os.path.join(path, f"fv_core.res.tile{t + 1}.nc"))
        tracer = Dataset(
            {
                _TRACER_NAMES.get(k, k): q3(np.asarray(vv)[t])
                for k, vv in d.tracers.items()
            }
        )
        write_netcdf(
            tracer, os.path.join(path, f"fv_tracer.res.tile{t + 1}.nc")
        )
        srf = Dataset(
            {"u_srf": q2(u[t, -1]), "v_srf": q2(v[t, -1])}
        )
        write_netcdf(
            srf, os.path.join(path, f"fv_srf_wnd.res.tile{t + 1}.nc")
        )
        sfc_vars = {}
        for name, arr in state.surface.items():
            out_name = {"surface_temperature": "tsea",
                        "land_sea_mask": "slmsk"}.get(name, name)
            sfc_vars[out_name] = q2(np.asarray(arr)[t])
        if sfc_vars:
            write_netcdf(
                Dataset(sfc_vars),
                os.path.join(path, f"sfc_data.tile{t + 1}.nc"),
            )
    # coupler.res: FMS calendar + current date (the file segmented runs
    # consult for the segment time)
    with open(os.path.join(path, "coupler.res"), "w") as f:
        f.write("     2        (Calendar: no_calendar=0, thirty_day_months=1, julian=2, gregorian=3, noleap=4)\n")
        f.write(f"  {time.year:6d}{time.month:6d}{time.day:6d}{time.hour:6d}{time.minute:6d}{time.second:6d}        Model start time\n")
        f.write(f"  {time.year:6d}{time.month:6d}{time.day:6d}{time.hour:6d}{time.minute:6d}{time.second:6d}        Current model time\n")


def _temperature_of(d: DycoreState) -> np.ndarray:
    """T [6, nz, ny, nx] from theta_v and the hydrostatic midpressure."""
    from fv3net_tpu.dycore.state import temperature_from_theta_v

    delp = jnp.asarray(d.delp)
    pe = jnp.concatenate(
        [jnp.full_like(delp[:, :1], 300.0), 300.0 + jnp.cumsum(delp, axis=1)],
        axis=1,
    )
    pmid = delp / (jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1]))
    return np.asarray(
        temperature_from_theta_v(d.pt, pmid, d.tracers["sphum"])
    )
