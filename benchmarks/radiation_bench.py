"""RRTMG standalone column driver throughput, LW+SW batched columns.

BASELINE config 3: the reference's pure-Python RRTMG
(external/radiation/radiation/radiation_driver.py:351-380) loops columns
on CPU; here the full band solve (140 LW + 112 SW g-points, clear+total
sky, McICA) is one jitted graph batched over a C48 cube's worth of
columns.  Prints one JSON line with columns/second.
"""
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fv3net_tpu.physics.radiation import DriverConfig, RadiationDriver

    ncol = 6 * 48 * 48  # one C48 cube
    nz = 63
    rng = np.random.RandomState(0)
    sig_e = np.linspace(0.0, 1.0, nz + 1) ** 1.3
    plev = 100.0 + sig_e * (1.013e5 - 100.0)
    dp = np.diff(plev)
    play = 0.5 * (plev[:-1] + plev[1:])
    T = np.clip(300.0 * (play / plev[-1]) ** 0.19, 200.0, None)
    state = {
        "air_temperature": jnp.asarray(
            T[None] + rng.randn(ncol, nz), jnp.float32
        ),
        "pressure_thickness_of_atmospheric_layer": jnp.asarray(
            np.broadcast_to(dp, (ncol, nz)), jnp.float32
        ),
        "specific_humidity": jnp.asarray(
            0.016 * (play[None] / plev[-1]) ** 3
            * (1.0 + 0.1 * rng.rand(ncol, nz)),
            jnp.float32,
        ),
        "cloud_water_mixing_ratio": jnp.asarray(
            2e-5 * (rng.rand(ncol, nz) > 0.9), jnp.float32
        ),
        "surface_temperature": jnp.full((ncol,), 300.0, jnp.float32),
        "latitude": jnp.asarray(
            np.deg2rad(rng.uniform(-90, 90, ncol)), jnp.float32
        ),
        "longitude": jnp.asarray(
            np.deg2rad(rng.uniform(0, 360, ncol)), jnp.float32
        ),
        "land_sea_mask": jnp.asarray(
            (rng.rand(ncol) > 0.7).astype(np.float32)
        ),
    }
    driver = RadiationDriver(DriverConfig())
    when = datetime.datetime(2016, 7, 1, 12)

    @jax.jit
    def run(s):
        out = driver(when, s)
        return (
            out["tendency_of_air_temperature_due_to_radiation"],
            out["total_sky_upward_longwave_flux_at_top_of_atmosphere_python"],
            out["total_sky_downward_shortwave_flux_at_surface_python"],
        )

    def sync(o):
        return float(np.asarray(o[1][0]))

    states = [
        dict(state, air_temperature=state["air_temperature"] + 0.01 * i)
        for i in range(3)
    ]
    sync(run(states[0]))
    n_calls = 10
    t0 = time.perf_counter()
    out = None
    for i in range(n_calls):
        out = run(states[i % 3])
    sync(out)
    dt = (time.perf_counter() - t0) / n_calls
    print(
        json.dumps(
            {
                "metric": "rrtmg_lw_sw_column_throughput",
                "value": round(ncol / dt, 0),
                "unit": "columns/s",
                "ms_per_c48_cube": round(dt * 1e3, 2),
                "ncol": ncol,
                "nz": nz,
            }
        )
    )


if __name__ == "__main__":
    main()