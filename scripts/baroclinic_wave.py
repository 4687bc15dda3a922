"""Jablonowski-Williamson (2006) baroclinic wave benchmark.

Usage: python scripts/baroclinic_wave.py [days] [npx] [npz] [perturb]

Balanced case (perturb=0): the zonal jet must stay near-steady — any
drift is numerical error of the core. Perturbed case (default): a 1 m/s
bump at (20E, 40N) grows into the canonical midlatitude wave train.
Prints one JSON line per simulated day.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(days: int = 10, npx: int = 24, npz: int = 20, perturb: int = 1,
         hydrostatic: int = 1):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import DycoreConfig, dynamics_step
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.dycore.testcases import baroclinic_wave_state

    grid = make_grid(npx)
    g = GridArrays.from_grid(grid)
    state, ak, bk = baroclinic_wave_state(grid, npz, perturb=bool(perturb))
    if not hydrostatic:
        from fv3net_tpu.dycore import add_nonhydrostatic_fields

        state = add_nonhydrostatic_fields(state)
    akj, bkj = jnp.asarray(ak, jnp.float32), jnp.asarray(bk, jnp.float32)
    cfg = DycoreConfig(
        dt=900.0, n_split=4, advection_order=4, diff_coef=0.001,
        divergence_damp_coef=0.06, remap_te=True,
        hydrostatic=bool(hydrostatic),
    )
    u0 = np.asarray(state.wind)

    steps_per_day = int(86400 / cfg.dt)

    @jax.jit
    def one_day(s):
        return lax.fori_loop(
            0, steps_per_day,
            lambda _, st: dynamics_step(st, g, akj, bkj, cfg), s,
        )

    area = np.asarray(grid.area)
    m0 = float((np.asarray(state.delp) * area[:, None]).sum())
    t0 = time.perf_counter()
    for day in range(1, days + 1):
        state = one_day(state)
        wind = np.asarray(state.wind)
        m1 = float((np.asarray(state.delp) * area[:, None]).sum())
        # eddy = deviation from the initial zonally-symmetric jet
        print(
            json.dumps(
                {
                    "day": day,
                    "mass_drift_rel": (m1 - m0) / m0,
                    "u_drift_max": float(np.abs(wind - u0).max()),
                    "wind_max": float(np.abs(wind).max()),
                    **({"w_max": round(float(np.abs(np.asarray(state.w)).max()), 3)}
                       if state.w is not None else {}),
                    "finite": bool(np.isfinite(wind).all()),
                    "wall_seconds": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
