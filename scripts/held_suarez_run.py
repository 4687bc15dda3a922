"""Held-Suarez benchmark run: dycore + HS94 forcing only.

Prints one JSON line per simulated day with circulation statistics
(jet max, eddy activity) — the classic dycore validation.

Usage: python scripts/held_suarez_run.py [days] [npx] [npz]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days: int = 20, npx: int = 24, npz: int = 20):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import DycoreConfig, dynamics_step, init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.dycore.state import (
        temperature_from_theta_v,
        theta_v_from_temperature,
    )
    from fv3net_tpu.ops import thermo
    from fv3net_tpu.physics.held_suarez import held_suarez_forcing

    grid = make_grid(npx)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, npz, perturbation=1.0)
    cfg = DycoreConfig(
        dt=900.0, n_split=2, advection_order=4, diff_coef=0.004, divergence_damp_coef=0.06
    )
    akj = jnp.asarray(ak, jnp.float32)
    bkj = jnp.asarray(bk, jnp.float32)

    def hs_step(s):
        s = dynamics_step(s, g, akj, bkj, cfg)
        delp = jnp.moveaxis(s.delp, 1, -1)
        pmid = jnp.moveaxis(
            thermo.pressure_at_midpoint_log(delp, toa_pressure=cfg.ptop), -1, 1
        )
        T = temperature_from_theta_v(s.pt, pmid, s.tracers["sphum"])
        Tz = jnp.moveaxis(T, 1, -1)
        wz = jnp.stack([jnp.moveaxis(s.wind[c], 1, -1) for c in range(3)])
        ps = s.delp.sum(axis=1) + cfg.ptop
        T2, w2 = held_suarez_forcing(
            Tz, wz, jnp.moveaxis(pmid, 1, -1), ps, g.lat, cfg.dt
        )
        import dataclasses as dc

        return dc.replace(
            s,
            pt=theta_v_from_temperature(
                jnp.moveaxis(T2, -1, 1), pmid, s.tracers["sphum"]
            ),
            wind=jnp.stack(
                [jnp.moveaxis(w2[c], -1, 1) for c in range(3)]
            ),
        )

    steps_per_day = int(86400 / cfg.dt)

    @jax.jit
    def one_day(s):
        return lax.fori_loop(0, steps_per_day, lambda _, st: hs_step(st), s)

    area = np.asarray(grid.area)
    east = np.moveaxis(grid.east, -1, 0)
    m0 = float((np.asarray(state.delp, np.float64) * area[:, None]).sum())
    t0 = time.perf_counter()
    for day in range(1, days + 1):
        state = one_day(state)
        wind = np.asarray(state.wind)
        u = (wind * east[:, :, None]).sum(axis=0)  # eastward wind
        delp = np.asarray(state.delp, np.float64)
        mass = float((delp * area[:, None]).sum())
        print(
            json.dumps(
                {
                    "day": day,
                    "mass_drift_rel": (mass - m0) / m0,
                    "u_max": float(u.max()),
                    "u_min": float(u.min()),
                    "u_mean_abs": float(np.abs(u).mean()),
                    "finite": bool(np.isfinite(wind).all()),
                    "wall_seconds": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
