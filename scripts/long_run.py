"""Long-run stability check: N simulated days of the hybrid aquaplanet.

Produces one JSON line per simulated day with conservation and
boundedness statistics — the evidence the reference gets from its
Fortran conservation diagnostics (SURVEY §5.2).

Usage: python scripts/long_run.py [days] [npx] [npz] [hydrostatic(0|1)]
Env: FV3NET_LONGRUN_MICROPHYSICS=gfdl soaks the six-category scheme
(adds the ice_wat/rainwat/snowwat/graupel tracers and reports their
column burdens).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days: int = 10, npx: int = 24, npz: int = 24,
         hydrostatic: int = 1):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import DycoreConfig, init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.physics import PhysicsConfig
    from fv3net_tpu.runtime.fused import build_fused_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(npx)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, npz, perturbation=2.0)
    n_split = 2
    if not hydrostatic:
        from fv3net_tpu.dycore import add_nonhydrostatic_fields

        state = add_nonhydrostatic_fields(state)
        n_split = 4  # explicit horizontal acoustics (validate_acoustic_cfl)
    dyn_cfg = DycoreConfig(
        dt=900.0, n_split=n_split, advection_order=4, diff_coef=0.004,
        divergence_damp_coef=0.06, hydrostatic=bool(hydrostatic),
    )
    micro = os.environ.get("FV3NET_LONGRUN_MICROPHYSICS", "zhao_carr")
    if micro == "gfdl":
        import dataclasses

        from fv3net_tpu.physics.microphysics_gfdl import GFDL_TRACER_NAMES

        tracers = dict(state.tracers)
        for name in GFDL_TRACER_NAMES:
            tracers.setdefault(name, jnp.zeros_like(state.delp))
        state = dataclasses.replace(state, tracers=tracers)
    step = build_fused_step(
        g, jnp.asarray(ak, jnp.float32), jnp.asarray(bk, jnp.float32),
        dyn_cfg, PhysicsConfig(microphysics_scheme=micro),
    )
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.asarray(
        np.maximum(np.cos(grid.lat) * np.cos(grid.lon), 0.0), jnp.float32
    )

    steps_per_day = int(86400 / dyn_cfg.dt)

    @jax.jit
    def one_day(s):
        return lax.fori_loop(
            0, steps_per_day, lambda _, st: step(st, 0, sst, cosz), s
        )

    area = jnp.asarray(grid.area, jnp.float64)
    m0 = float((np.asarray(state.delp, np.float64) * np.asarray(area)[:, None]).sum())

    t_start = time.perf_counter()
    for day in range(1, days + 1):
        state = one_day(state)
        jax.block_until_ready(state.pt)
        delp = np.asarray(state.delp, np.float64)
        pt = np.asarray(state.pt)
        wind = np.asarray(state.wind)
        q = np.asarray(state.tracers["sphum"])
        mass = float((delp * np.asarray(area)[:, None]).sum())
        print(
            json.dumps(
                {
                    "day": day,
                    "mass_drift_rel": (mass - m0) / m0,
                    "theta_min": float(pt.min()),
                    "theta_max": float(pt.max()),
                    "wind_max": float(np.abs(wind).max()),
                    "sphum_min": float(q.min()),
                    "sphum_max": float(q.max()),
                    "finite": bool(
                        np.isfinite(pt).all() and np.isfinite(wind).all()
                    ),
                    **(
                        {"w_max": float(np.abs(np.asarray(state.w)).max())}
                        if state.w is not None
                        else {}
                    ),
                    **(
                        {
                            "condensate_burden_kg_m2": float(
                                sum(
                                    (
                                        np.asarray(state.tracers[k])
                                        * delp
                                        * np.asarray(area)[:, None]
                                    ).sum()
                                    for k in (
                                        "cloud_water", "ice_wat",
                                        "rainwat", "snowwat", "graupel",
                                    )
                                )
                                / 9.80665
                                / float(np.asarray(area).sum())
                            ),
                        }
                        if micro == "gfdl"
                        else {}
                    ),
                    "wall_seconds": round(time.perf_counter() - t_start, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
