"""Land+ocean+ice stability run: bucket hydrology + slab ocean +
zero-layer sea ice on an idealized continent (land where cos(lon) > 0.3,
~1/3 of the sphere).

One JSON line per simulated day: soil-moisture statistics, SST range,
sea-ice coverage, precipitable-water drift, finiteness — the surface-
model counterpart of scripts/long_run.py.

Usage: python scripts/land_run.py [days] [npx] [npz] [land_model]
  land_model: "bucket" (default) or "noah" (4-layer soil + snowpack)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days: int = 10, npx: int = 24, npz: int = 16,
         land_model: str = "bucket"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from fv3net_tpu.runtime import TimeLoop, names
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig

    cfg = UserConfig(
        namelist=NamelistConfig(
            npx=npx, npz=npz, dt_atmos=900.0, n_split=2,
            slab_ocean=True, sea_ice=True,
            bucket_land=land_model == "bucket",
            land_model=land_model,
        ),
        duration_seconds=days * 86400.0,
    )
    loop = TimeLoop(cfg)
    lon = np.asarray(loop.grid.lon)
    mask = jnp.asarray((np.cos(lon) > 0.3).astype(np.float32))
    loop.state.surface[names.MASK] = mask
    land = np.asarray(mask) > 0.5

    area = np.asarray(loop.grid.area)
    steps_per_day = int(86400 / 900.0)
    t0 = time.perf_counter()
    step = 0
    for _, diags in loop:
        step += 1
        if step % steps_per_day:
            continue
        if land_model == "noah":
            smc = np.asarray(loop.state.surface["soil_moisture_layers"])
            w = smc[:, land].mean(axis=0)  # column-mean theta on land
            swe = np.asarray(
                loop.state.surface["snow_water_equivalent"])[land]
            # soil temperature is only prognostic on land points
            stc = np.asarray(loop.state.surface["soil_temperature"])[:, land]
        else:
            w = np.asarray(loop.state.surface["soil_moisture"])[land]
            swe = stc = None
        ice = np.asarray(loop.state.surface["ice_thickness"])
        tsfc = np.asarray(loop.state.surface[names.TSFC])
        q = np.asarray(loop.state.dycore.tracers["sphum"])
        delp = np.asarray(loop.state.dycore.delp)
        pw = (q * delp).sum(1) / 9.80665  # kg/m^2 per column
        print(
            json.dumps(
                {
                    "day": step // steps_per_day,
                    "soil_w_mean": round(float(w.mean()), 5),
                    "soil_w_minmax": [round(float(w.min()), 5),
                                      round(float(w.max()), 5)],
                    "tsfc_minmax": [round(float(tsfc.min()), 2),
                                    round(float(tsfc.max()), 2)],
                    "ice_h_max": round(float(ice.max()), 4),
                    "ice_area_frac": round(
                        float((area * (ice > 0)).sum() / area.sum()), 4),
                    "pw_mean": round(float((pw * area).sum() / area.sum()), 3),
                    "finite": bool(
                        np.isfinite(tsfc).all() and np.isfinite(w).all()
                        and np.isfinite(q).all() and np.isfinite(ice).all()
                    ),
                    "wall_s": round(time.perf_counter() - t0, 1),
                    **(
                        {
                            "swe_max": round(float(swe.max()), 4),
                            "stc_minmax": [round(float(stc.min()), 2),
                                           round(float(stc.max()), 2)],
                            "stc_finite": bool(np.isfinite(stc).all()),
                        }
                        if swe is not None else {}
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    nums, land_model = [], "bucket"
    for a in sys.argv[1:]:
        if a in ("bucket", "noah"):
            land_model = a
        else:
            nums.append(int(a))
    main(*nums, land_model=land_model)
