"""Checkpoint/restart: model state <-> disk.

reference: Fortran restart netCDFs per category/tile + fv3config
enable_restart rewiring (reference: runtime/segmented_run/append.py:17-29,
tests/test_regression.py:78-88, runtime/debugging.py:11-15).  Here a
restart is one .npz of the full state pytree + a JSON sidecar with time
metadata — a single atomic artifact per segment.
"""
from __future__ import annotations

import datetime
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import TOA_PRESSURE
from fv3net_tpu.dycore.state import DycoreState
from fv3net_tpu.runtime.derived_state import ModelState

_STATE_FILE = "state.npz"
_META_FILE = "restart.json"


def pull_state(state: ModelState) -> ModelState:
    """The whole model state as HOST numpy arrays via ONE batched
    device->host transfer — callers writing multiple restart formats
    (save_state + save_fortran_restarts) share a single pull instead
    of each re-transferring every field through the tunnel."""
    import jax

    from fv3net_tpu.runtime.diagnostics.manager import _pull_batch

    leaves, treedef = jax.tree_util.tree_flatten(
        (state.dycore, state.surface)
    )
    pulled = _pull_batch(leaves)
    dycore, surface = jax.tree_util.tree_unflatten(treedef, pulled)
    return ModelState(dycore=dycore, surface=surface)


def save_state(state: ModelState, time: datetime.datetime, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    d = state.dycore
    arrays: Dict[str, np.ndarray] = {
        "delp": d.delp,
        "pt": d.pt,
        "wind": d.wind,
        "phis": d.phis,
    }
    if d.w is not None:
        arrays["w"] = d.w
        arrays["delz"] = d.delz
    for k, v in d.tracers.items():
        arrays[f"tracer_{k}"] = v
    for k, v in state.surface.items():
        arrays[f"surface_{k}"] = v
    # ONE batched pull for the whole state (per-array np.asarray costs
    # a tunnel round-trip each; NOTE jax.device_get /
    # copy_to_host_async hit a pathologically slow transfer path
    # through the axon tunnel — np.asarray on a device-concat is fast)
    from fv3net_tpu.runtime.diagnostics.manager import _pull_batch

    keys = list(arrays)
    arrays = dict(zip(keys, _pull_batch([arrays[k] for k in keys])))
    from fv3net_tpu.runtime import timing

    timing.add_counter(
        "restart_bytes", float(sum(a.nbytes for a in arrays.values()))
    )
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
    # ONE batched device->host transfer of everything we will write:
    # per-variable-per-tile np.asarray pulls cost ~a round trip each
    # through the TPU tunnel and re-transfer each field 6 times
    pulled = {
        "east": grid.east, "north": grid.north, "wind": d.wind,
        "delp": d.delp, "phis": d.phis, "T": _temperature_of(d),
        "tracers": dict(d.tracers), "surface": dict(state.surface),
    }
    if d.w is not None:
        pulled["w"] = d.w
        pulled["delz"] = d.delz
    if "ice_thickness" in state.surface:
        from fv3net_tpu.physics.sea_ice import ice_fraction

        pulled["fice"] = ice_fraction(state.surface["ice_thickness"])
    h = jax.tree_util.tree_map(np.asarray, pulled)
    east = np.moveaxis(h["east"], -1, 0)  # [3, 6, n, n]
    north = np.moveaxis(h["north"], -1, 0)
    wind = h["wind"]  # [3, 6, nz, n, n]
    u = (wind * east[:, :, None]).sum(axis=0)
    v = (wind * north[:, :, None]).sum(axis=0)
    T = h["T"]

    dims3 = ("Time", "zaxis_1", "yaxis_1", "xaxis_1")
    dims2 = ("Time", "yaxis_1", "xaxis_1")

    def q3(arr_t):
        return Quantity(np.asarray(arr_t)[None], dims3)

    def q2(arr_t):
        return Quantity(np.asarray(arr_t)[None], dims2)

    for t in range(6):
        core = Dataset(
            {
                "T": q3(T[t]),
                "delp": q3(h["delp"][t]),
                "ua": q3(u[t]),
                "va": q3(v[t]),
                "phis": q2(h["phis"][t]),
                **(
                    {
                        "W": q3(h["w"][t]),
                        "DZ": q3(-h["delz"][t]),  # FV3 sign
                    }
                    if d.w is not None
                    else {}
                ),
            }
        )
        write_netcdf(core, os.path.join(path, f"fv_core.res.tile{t + 1}.nc"))
        tracer = Dataset(
            {
                _TRACER_NAMES.get(k, k): q3(vv[t])
                for k, vv in h["tracers"].items()
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
        for name, arr in h["surface"].items():
            # GFS sfc_data names (reference coarsen_restarts.py surface
            # handling): tsea/slmsk/hice; fice is derived from thickness.
            # Noah fields use the GFS soil-layer names/units: stc/smc
            # carry a leading soil-level axis, sheleg is SWE in mm
            if name == "soil_temperature":
                sfc_vars["stc"] = Quantity(
                    arr[:, t][None],
                    ("Time", "zaxis_soil", "yaxis_1", "xaxis_1"),
                )
                continue
            if name == "soil_moisture_layers":
                sfc_vars["smc"] = Quantity(
                    arr[:, t][None],
                    ("Time", "zaxis_soil", "yaxis_1", "xaxis_1"),
                )
                continue
            if name == "snow_water_equivalent":
                sfc_vars["sheleg"] = q2(arr[t] * 1000.0)  # m -> mm
                continue
            out_name = {"surface_temperature": "tsea",
                        "land_sea_mask": "slmsk",
                        "ice_thickness": "hice",
                        "deep_soil_temperature": "tg3"}.get(name, name)
            sfc_vars[out_name] = q2(arr[t])
        if "fice" in h:
            fice = h["fice"]
            sfc_vars["fice"] = q2(fice[t])
            if "slmsk" in sfc_vars:
                # restore the GFS 3-value convention: icy ocean -> 2
                land = np.asarray(sfc_vars["slmsk"].data)[0]
                sfc_vars["slmsk"] = q2(
                    np.where((land < 0.5) & (fice[t] > 0.15), 2.0, land)
                )
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
        [jnp.full_like(delp[:, :1], TOA_PRESSURE),
         TOA_PRESSURE + jnp.cumsum(delp, axis=1)],
        axis=1,
    )
    pmid = delp / (jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1]))
    return np.asarray(
        temperature_from_theta_v(d.pt, pmid, d.tracers["sphum"])
    )


def dgrid_wind_to_cartesian(u_d, v_d, grid, dtype=jnp.float32):
    """Rotate FV3 D-grid restart winds into Cartesian tangent vectors.

    FV3 ``fv_core.res`` u/v (without agrid_vel_rst) are GRID-RELATIVE
    (covariant) components along the local i/j grid lines, NOT
    eastward/northward — the reference rotates them with wind-rotation
    matrices (external/vcm/vcm/cubedsphere/rotate.py).  Here: average the
    staggered components to cell centers, then solve the 2x2 dual-basis
    system V.e1 = u, V.e2 = v with e1/e2 the local grid-direction unit
    vectors (non-orthogonal near tile corners).

    u_d: [6, nz, ny+1, nx] (on x-edges), v_d: [6, nz, ny, nx+1]
    (on y-edges); returns wind [3, 6, nz, ny, nx].
    """
    u_cov = 0.5 * (u_d[..., :-1, :] + u_d[..., 1:, :])  # along e1
    v_cov = 0.5 * (v_d[..., :-1] + v_d[..., 1:])  # along e2
    c = grid.corners_xyz

    def _unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    wmid = _unit(c[:, :-1, :-1] + c[:, 1:, :-1])  # west-face midpoints
    emid = _unit(c[:, :-1, 1:] + c[:, 1:, 1:])
    smid = _unit(c[:, :-1, :-1] + c[:, :-1, 1:])
    nmid = _unit(c[:, 1:, :-1] + c[:, 1:, 1:])
    khat = grid.centers_xyz

    def _tangent_unit(d):
        d = d - np.sum(d * khat, axis=-1, keepdims=True) * khat
        return _unit(d)

    e1 = _tangent_unit(emid - wmid)  # [6, ny, nx, 3] +i direction
    e2 = _tangent_unit(nmid - smid)  # +j direction
    cos12 = np.sum(e1 * e2, axis=-1)  # [6, ny, nx]
    det = 1.0 - cos12 ** 2
    # contravariant expansion coefficients: V = a*e1 + b*e2
    a = (u_cov - cos12[:, None] * v_cov) / det[:, None]
    b = (v_cov - cos12[:, None] * u_cov) / det[:, None]
    e1c = jnp.asarray(np.moveaxis(e1, -1, 0), dtype)
    e2c = jnp.asarray(np.moveaxis(e2, -1, 0), dtype)
    return (
        e1c[:, :, None] * jnp.asarray(a, dtype)[None]
        + e2c[:, :, None] * jnp.asarray(b, dtype)[None]
    )


def load_fortran_restarts(
    path: str, expected_shape=None
) -> Tuple[ModelState, Optional[datetime.datetime]]:
    """Initialize a ModelState from a reference-layout restart directory
    (the migration entry point: point ``initial_conditions`` at an
    existing fv3net/FV3GFS RESTART and this model starts from it).

    Reads fv_core.res (T -> theta_v, A-grid ua/va -> Cartesian wind, W/DZ
    when present), fv_tracer.res (GFS tracer names -> internal), sfc_data
    (tsea/slmsk -> surface fields), and coupler.res for the model time.
    """
    from fv3net_tpu.core import netcdfio
    from fv3net_tpu.dycore.state import theta_v_from_temperature
    from fv3net_tpu.grid.geometry import make_grid

    cats = netcdfio.open_restarts(path)
    core = cats["fv_core.res"]

    def tile3(name, ds):
        # [tile, Time, z, y, x] -> [6, z, y, x]
        return jnp.asarray(np.asarray(ds[name].values)[:, 0])

    delp = tile3("delp", core)
    T = tile3("T", core)
    n = delp.shape[-1]
    nz = delp.shape[1]
    if expected_shape is not None and tuple(delp.shape) != tuple(expected_shape):
        raise ValueError(
            f"restart shape {delp.shape} != model shape {expected_shape}"
        )

    tracers = {}
    if "fv_tracer.res" in cats:
        tr = cats["fv_tracer.res"]
        for name in tr.keys():
            tracers[_TRACER_NAMES_INV.get(name, name)] = tile3(name, tr)
    sphum = tracers.get("sphum", jnp.zeros_like(delp))
    tracers.setdefault("sphum", sphum)
    tracers.setdefault("cloud_water", jnp.zeros_like(delp))

    pe = jnp.concatenate(
        [jnp.full_like(delp[:, :1], TOA_PRESSURE),
         TOA_PRESSURE + jnp.cumsum(delp, axis=1)],
        axis=1,
    )
    pmid = delp / (jnp.log(pe[:, 1:]) - jnp.log(pe[:, :-1]))
    pt = theta_v_from_temperature(T, pmid, sphum)

    grid = make_grid(n)
    east = jnp.asarray(np.moveaxis(grid.east, -1, 0), delp.dtype)
    north = jnp.asarray(np.moveaxis(grid.north, -1, 0), delp.dtype)
    if "ua" in core:
        # A-grid winds (agrid_vel_rst=true) are true eastward/northward
        ua = tile3("ua", core)
        va = tile3("va", core)
        wind = east[:, :, None] * ua[None] + north[:, :, None] * va[None]
    else:
        u_d = np.asarray(core["u"].values)[:, 0]  # [6, z, y+1, x]
        v_d = np.asarray(core["v"].values)[:, 0]  # [6, z, y, x+1]
        wind = dgrid_wind_to_cartesian(u_d, v_d, grid, dtype=delp.dtype)

    phis = (
        jnp.asarray(np.asarray(core["phis"].values)[:, 0])
        if "phis" in core
        else jnp.zeros_like(delp[:, 0])
    )

    w = delz = None
    if "W" in core and "DZ" in core:
        w = tile3("W", core)
        delz = -tile3("DZ", core)  # FV3 stores negative thickness

    dycore = DycoreState(
        delp=delp, pt=pt, wind=wind, tracers=tracers, phis=phis,
        w=w, delz=delz,
    )
    surface: Dict[str, jnp.ndarray] = {}
    if "sfc_data" in cats:
        sfc = cats["sfc_data"]
        renames = {"tsea": "surface_temperature",
                   "slmsk": "land_sea_mask",
                   "hice": "ice_thickness",
                   "tg3": "deep_soil_temperature"}
        for name in sfc.keys():
            if name in ("stc", "smc"):
                # GFS soil-layer fields [tile, Time, lev, y, x] -> the
                # internal layer-leading layout [lev, tile, y, x]
                arr = np.asarray(sfc[name].values)[:, 0]
                key = ("soil_temperature" if name == "stc"
                       else "soil_moisture_layers")
                surface[key] = jnp.asarray(np.moveaxis(arr, 1, 0))
                continue
            if name == "sheleg":  # SWE mm -> m
                surface["snow_water_equivalent"] = jnp.asarray(
                    np.asarray(sfc[name].values)[:, 0] / 1000.0
                )
                continue
            surface[renames.get(name, name)] = jnp.asarray(
                np.asarray(sfc[name].values)[:, 0]
            )
        if "land_sea_mask" in surface:
            # GFS slmsk takes {0 ocean, 1 land, 2 sea ice}; every internal
            # consumer treats mask>0.5 as LAND, so normalize: land iff
            # slmsk==1.  Sea-ice points stay ocean for the mask and carry
            # their ice through ice_thickness (seeded from hice, or a
            # nominal 1 m where the restart lacks hice) so the sea-ice
            # thermodynamics — not bucket land — handles them.
            slmsk = surface["land_sea_mask"]
            is_ice = jnp.abs(slmsk - 2.0) < 0.5
            surface["land_sea_mask"] = (
                jnp.abs(slmsk - 1.0) < 0.5
            ).astype(slmsk.dtype)
            hice = surface.get("ice_thickness")
            if hice is None:
                surface["ice_thickness"] = jnp.where(is_ice, 1.0, 0.0).astype(
                    slmsk.dtype
                )
            else:
                surface["ice_thickness"] = jnp.where(
                    is_ice & (hice <= 0.0), 1.0, jnp.where(is_ice, hice, 0.0)
                ).astype(slmsk.dtype)

    time = _read_coupler_res(os.path.join(path, "coupler.res"))
    return ModelState(dycore=dycore, surface=surface), time


def _read_coupler_res(path: str) -> Optional[datetime.datetime]:
    if not os.path.exists(path):
        return None
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    # last date line = current model time (FMS coupler.res format)
    for ln in reversed(lines):
        parts = ln.split()
        nums = []
        for p in parts:
            try:
                nums.append(int(p))
            except ValueError:
                break
        if len(nums) >= 6:
            return datetime.datetime(*nums[:6])
    return None
