"""Restart / model-state coarsening (C384 -> C48 and friends).

reference: external/vcm/vcm/cubedsphere/coarsen_restarts.py:76
coarsen_restarts_on_sigma, :155 coarsen_restarts_on_pressure, :990
_impose_hydrostatic_balance — the science of the coarsening workflows,
re-designed over this framework's state layout ([tile, z, y, x], A-grid
Cartesian winds) with the jnp block-coarsening + PPM-regrid kernels, so
the whole operation is one fused on-device program per timestep instead
of a Dataflow job.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fv3net_tpu.core.constants import GRAVITY, RDGAS, RVGAS, TOA_PRESSURE
from fv3net_tpu.dycore.state import DycoreState
from fv3net_tpu.ops import coarsen as _c
from fv3net_tpu.ops import regridz as _r
from fv3net_tpu.ops import thermo


def _h(x):
    """[tile, z, y, x] -> [tile, z, y, x] with coarsen ops acting on the
    last two axes (already in place)."""
    return x


@partial(jax.jit, static_argnames=("factor",))
def coarsen_state_on_sigma(
    state: DycoreState, area: jnp.ndarray, factor: int
) -> DycoreState:
    """Coarsen on sigma surfaces: mass (area*delp) weighted block averages
    for thermodynamic fields and winds, area-weighted delp
    (reference coarsen_restarts.py:76-154 semantics)."""
    area4 = area[:, None]  # broadcast over z
    delp_c = _c.weighted_block_average(state.delp, area4, factor)
    mass = state.delp * area4
    pt_c = _c.weighted_block_average(state.pt, mass, factor)
    tracers_c = {
        k: _c.weighted_block_average(v, mass, factor)
        for k, v in state.tracers.items()
    }
    wind_c = jnp.stack(
        [
            _c.weighted_block_average(state.wind[c], mass, factor)
            for c in range(3)
        ]
    )
    phis_c = _c.weighted_block_average(state.phis, area, factor)
    return DycoreState(
        delp=delp_c, pt=pt_c, wind=wind_c, tracers=tracers_c, phis=phis_c
    )


@partial(jax.jit, static_argnames=("factor",))
def coarsen_state_on_pressure(
    state: DycoreState, area: jnp.ndarray, factor: int,
    toa_pressure: float = TOA_PRESSURE,
) -> DycoreState:
    """Coarsen on pressure surfaces: vertically regrid every 3-D field to
    the coarse cell's pressure coordinate (masking below-surface fine
    columns), then area-weighted average
    (reference coarsen_restarts.py:155-242)."""
    # z-last views for the regrid kernels
    zlast = lambda x: jnp.moveaxis(x, 1, -1)
    zmid = lambda x: jnp.moveaxis(x, -1, 1)

    delp = zlast(state.delp)
    fields = {"pt": zlast(state.pt)}
    for k, v in state.tracers.items():
        fields[f"tracer_{k}"] = zlast(v)
    for c in range(3):
        fields[f"wind_{c}"] = zlast(state.wind[c])

    regridded, masked_w = _r.regrid_to_area_weighted_pressure(
        fields, delp, area, factor, toa_pressure=toa_pressure
    )
    # masked area-weighted block average on the coarse pressure coordinate
    w = jnp.moveaxis(masked_w, -1, 1)  # [tile, z, y, x]

    def avg(name):
        return _c.weighted_block_average(
            zmid(regridded[name]), w, factor
        )

    delp_c = _c.weighted_block_average(state.delp, area[:, None], factor)
    pt_c = avg("pt")
    tracers_c = {
        k: avg(f"tracer_{k}") for k in state.tracers
    }
    wind_c = jnp.stack([avg(f"wind_{c}") for c in range(3)])
    phis_c = _c.weighted_block_average(state.phis, area, factor)
    return DycoreState(
        delp=delp_c, pt=pt_c, wind=wind_c, tracers=tracers_c, phis=phis_c
    )


def impose_hydrostatic_balance(T, q, delp, toa_pressure: float = TOA_PRESSURE):
    """Recompute layer thickness dz from T, q, delp hydrostatically
    (reference coarsen_restarts.py:990 _impose_hydrostatic_balance);
    z-last arrays."""
    return thermo.hydrostatic_dz(T, q, delp, toa_pressure=toa_pressure)


def coarsen_surface_simple(fields: Dict[str, jnp.ndarray], area, factor: int):
    """Area-weighted coarsening of continuous surface fields
    (reference coarsen_restarts.py:1020 simple method)."""
    return {
        k: _c.weighted_block_average(v, area, factor) for k, v in fields.items()
    }


def coarsen_surface_complex(
    continuous: Dict[str, jnp.ndarray],
    categorical: Dict[str, jnp.ndarray],
    area,
    factor: int,
):
    """Dominant-surface-type coarsening: categorical fields take the
    blockwise mode; continuous fields an area-weighted mean restricted to
    cells matching the dominant category where a category field named
    'slmsk' exists (reference coarsen_restarts.py:1111-1336 complex
    method, simplified to the dominant-type masking core)."""
    cat_c = {k: _c.block_mode(v, factor) for k, v in categorical.items()}
    if "slmsk" in categorical:
        dominant = _c.block_upsample(cat_c["slmsk"], factor)
        match = (categorical["slmsk"] == dominant).astype(area.dtype)
        w = area * match
        cont_c = {
            k: _c.weighted_block_average(v, w, factor)
            for k, v in continuous.items()
        }
    else:
        cont_c = coarsen_surface_simple(continuous, area, factor)
    return {**cont_c, **cat_c}


def main(argv=None) -> int:
    """python -m fv3net_tpu.pipelines.coarsen_restarts (reference:
    python -m fv3net.pipelines.coarsen_restarts, the Beam job driving
    vcm.cubedsphere.coarsen_restarts_on_* over timesteps): coarsen a
    reference-layout restart directory to a lower resolution and write
    it back in the same layout."""
    import argparse
    import datetime as _dt
    import json

    p = argparse.ArgumentParser(prog="coarsen_restarts")
    p.add_argument("src", help="restart dir (fv_core.res.tileN.nc ...)")
    p.add_argument("dst", help="output restart dir")
    p.add_argument("--factor", type=int, required=True)
    p.add_argument(
        "--method", choices=("sigma", "pressure"), default="sigma"
    )
    args = p.parse_args(argv)

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.runtime.checkpoint import (
        load_fortran_restarts,
        save_fortran_restarts,
    )
    from fv3net_tpu.runtime.derived_state import ModelState
    from fv3net_tpu.ops import coarsen as _co

    state, time = load_fortran_restarts(args.src)
    n = state.dycore.delp.shape[-1]
    grid = make_grid(n)
    area = jnp.asarray(grid.area, state.dycore.delp.dtype)
    fn = (
        coarsen_state_on_sigma
        if args.method == "sigma"
        else coarsen_state_on_pressure
    )
    dycore_c = fn(state.dycore, area, args.factor)
    surface_c = {
        k: _co.weighted_block_average(v, area, args.factor)
        for k, v in state.surface.items()
    }
    grid_c = make_grid(n // args.factor)
    save_fortran_restarts(
        ModelState(dycore=dycore_c, surface=surface_c),
        time or _dt.datetime(2000, 1, 1),
        args.dst,
        grid_c,
    )
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "resolution": n // args.factor}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
