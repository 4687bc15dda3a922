"""Multi-day stability soak with the REAL RRTMG band radiation.

Runs N simulated days of the C48 hybrid aquaplanet with hourly RRTMG
LW/SW (radiation_interval=4 against dt=900 s, the GFS cadence) and
prints one JSON line per day with boundedness/conservation statistics —
the same evidence scripts/long_run.py produces for the gray scheme
(reference's Fortran conservation diagnostics role, SURVEY §5.2).

Usage: python scripts/rrtmg_soak.py [days] [npx] [npz]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days: int = 5, npx: int = 48, npz: int = 32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import DycoreConfig, init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.physics import PhysicsConfig
    from fv3net_tpu.runtime.fused import build_fused_multi_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(npx)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, npz, perturbation=2.0)
    dyn_cfg = DycoreConfig(
        dt=900.0, n_split=2, advection_order=4, diff_coef=0.004,
        divergence_damp_coef=0.06,
    )
    phys_cfg = PhysicsConfig(radiation_scheme="rrtmg")
    steps_per_day = int(86400 / dyn_cfg.dt)
    chunk = 24  # 6 h per dispatch; radiation every 4th step (hourly)
    multi = build_fused_multi_step(
        g, jnp.asarray(ak, jnp.float32), jnp.asarray(bk, jnp.float32),
        dyn_cfg, phys_cfg, n_steps=chunk, radiation_interval=4,
    )
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.asarray(
        np.maximum(np.cos(grid.lat) * np.cos(grid.lon), 0.0), jnp.float32
    )
    area = jnp.asarray(grid.area, jnp.float32)

    for day in range(days):
        t0 = time.perf_counter()
        for _ in range(steps_per_day // chunk):
            state = multi(state, None, sst, cosz)
        # host read = sync (block_until_ready can return early via tunnel)
        delp = np.asarray(state.delp)
        T = np.asarray(state.pt)  # theta_v; bounded iff T bounded
        q = np.asarray(state.tracers["sphum"])
        w = np.asarray(state.wind)
        mass = float(
            (np.asarray(delp).sum(axis=1) * np.asarray(area)).sum()
        )
        stats = {
            "day": day + 1,
            "wall_s": round(time.perf_counter() - t0, 1),
            "mass": mass,
            "thetav_min": float(T.min()),
            "thetav_max": float(T.max()),
            "sphum_min": float(q.min()),
            "sphum_max": float(q.max()),
            "max_wind": float(np.abs(w).max()),
            "finite": bool(
                np.isfinite(T).all()
                and np.isfinite(q).all()
                and np.isfinite(w).all()
            ),
        }
        print(json.dumps(stats), flush=True)
        if not stats["finite"]:
            sys.exit(1)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5,
        int(sys.argv[2]) if len(sys.argv) > 2 else 48,
        int(sys.argv[3]) if len(sys.argv) > 3 else 32,
    )
