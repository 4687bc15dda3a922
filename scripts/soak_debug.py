"""Day-by-day extreme tracker for coupled-soak debugging (the r3 NaN
pattern: {T, wind, q, delp} extremes + argmax LOCATION per day identify
the runaway mechanism in one run).  Usage:
    python scripts/soak_debug.py [days] [npx] [npz] [surface_data]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days=30, npx=48, npz=32, surface="topography/c48",
         mode="full"):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime import TimeLoop

    extra = json.loads(os.environ.get("FV3NET_SOAK_NML", "{}"))
    cfg = get_config({
        "namelist": {
            "npx": int(npx), "npz": int(npz), "dt_atmos": 900.0,
            "n_split": 2, "radiation": "rrtmg", "slab_ocean": True,
            "sea_ice": True, "bucket_land": True,
            **({"surface_data": surface} if surface else {}),
            **extra,
        },
        "duration_seconds": float(days) * 86400.0,
        "fused_chunk_steps": 24,
        "radiation_interval_steps": 4,
    })
    loop = TimeLoop(cfg)
    if mode == "nosgh":  # isolate the GWD trigger
        loop.state.surface["sgh"] = jnp.zeros_like(
            loop.state.surface["sgh"]
        )
    elif mode == "flat":  # continents without resolved topography
        import dataclasses as _dc
        loop.state.dycore = _dc.replace(
            loop.state.dycore, phis=jnp.zeros_like(loop.state.dycore.phis)
        )
        loop.state.surface["sgh"] = jnp.zeros_like(
            loop.state.surface["sgh"]
        )

    @jax.jit
    def extremes(state, surface_d):
        d = state
        out = {}
        speed = jnp.sqrt((d.wind ** 2).sum(axis=0))
        for name, arr, red in (
            ("wmax", speed, "max"),
            ("Tmax", d.pt, "max"),
            ("Tmin", d.pt, "min"),
            ("delp_min", d.delp, "min"),
            ("q_max", d.tracers["sphum"], "max"),
        ):
            v = arr.max() if red == "max" else arr.min()
            idx = jnp.argmax(arr) if red == "max" else jnp.argmin(arr)
            loc = jnp.unravel_index(idx, arr.shape)
            out[name] = (v, jnp.stack([x.astype(jnp.int32) for x in loc]))
        out["tsfc"] = (surface_d["surface_temperature"].min(),
                       surface_d["surface_temperature"].max())
        return out

    steps_per_day = 96
    step = 0
    day = 0
    for _, diags in loop:
        import datetime
        step = int(round((loop.time - __import__("datetime").datetime.fromisoformat(cfg.initial_time)).total_seconds() / 900.0))
        if step // steps_per_day > day:
            day = step // steps_per_day
            ex = extremes(loop.state.dycore, loop.state.surface)
            rec = {"day": day}
            for k, v in ex.items():
                if k == "tsfc":
                    rec["tsfc"] = [round(float(v[0]), 1), round(float(v[1]), 1)]
                else:
                    rec[k] = round(float(v[0]), 4)
                    rec[k + "_loc"] = [int(x) for x in np.asarray(v[1])]
            print(json.dumps(rec), flush=True)
            if not np.isfinite(rec["Tmax"]):
                print("NaN reached; stopping", flush=True)
                break


if __name__ == "__main__":
    main(*sys.argv[1:])
