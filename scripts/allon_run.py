"""All-features-on stability soak: the flagship physics at full GFS
fidelity in one fused program.

C48 aquaplanet with SAS mass-flux deep convection (+ convective momentum
transport), shalcnv shallow cumulus, Zhao-Carr ice microphysics,
Monin-Obukhov + Hong-Pan PBL, REAL RRTMG band radiation (hourly, OPAC
climatological aerosols), and the Rayleigh upper sponge — the union of
every scheme the framework ships, soaked together (the per-scheme soaks
live in long_run.py / land_run.py).

One JSON line per simulated day: mass drift, bounded fields, finiteness.

Usage: python scripts/allon_run.py [days] [npx] [npz]
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
        divergence_damp_coef=0.06, remap_te=True,
        tau_rayleigh=3.0, rf_cutoff=1500.0,
    )
    phys_cfg = PhysicsConfig(
        radiation_scheme="rrtmg",
        convection_scheme="mass_flux",
        # shallow convection + momentum transport are defaults
    )
    chunk = 8
    step = build_fused_multi_step(
        g, jnp.asarray(ak, jnp.float32), jnp.asarray(bk, jnp.float32),
        dyn_cfg, phys_cfg, None, n_steps=chunk, radiation_interval=4,
    )
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.asarray(
        np.maximum(np.cos(grid.lat) * np.cos(grid.lon), 0.0), jnp.float32
    )
    chunks_per_day = int(86400 / dyn_cfg.dt / chunk)

    def one_day(s):
        # host loop over the compiled 8-step chunk: 12 dispatches/day
        # (inlining 24 RRTMG calls into one day-long XLA program makes
        # the compile explode; the chunk is already the fused unit)
        for _ in range(chunks_per_day):
            s = step(s, 0, sst, cosz)
        return s

    area = jnp.asarray(grid.area)
    mass0 = float((np.asarray(state.delp).sum(axis=1) * area).sum())
    t0 = time.perf_counter()
    for day in range(1, days + 1):
        state = one_day(state)
        delp = np.asarray(state.delp)
        pt = np.asarray(state.pt)
        wind = np.asarray(state.wind)
        q = np.asarray(state.tracers["sphum"])
        qc = np.asarray(state.tracers["cloud_water"])
        mass = float((delp.sum(axis=1) * np.asarray(area)).sum())
        print(
            json.dumps(
                {
                    "day": day,
                    "mass_drift": (mass - mass0) / mass0,
                    "pt_minmax": [round(float(pt.min()), 2),
                                  round(float(pt.max()), 2)],
                    "wind_max": round(float(np.abs(wind).max()), 2),
                    "q_minmax": [float(q.min()), round(float(q.max()), 5)],
                    "qc_max": round(float(qc.max()), 6),
                    "finite": bool(
                        np.isfinite(pt).all() and np.isfinite(wind).all()
                        and np.isfinite(q).all() and np.isfinite(delp).all()
                    ),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
