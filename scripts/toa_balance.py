"""Global TOA energy balance of the coupled production configuration:
daily-averaged OLR vs absorbed solar through the fused path.  Prints the
measured imbalance and the solar-constant scale that would zero it at
the initial climate (the bulk-calibration knob for the synthetic
k-distributions; the stratosphere-profile calibration is
scripts/calibrate_ktables.py).

Usage: python scripts/toa_balance.py [days]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days=2.0):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from fv3net_tpu.runtime.config import get_config
    from fv3net_tpu.runtime import TimeLoop

    cfg = get_config({
        "namelist": {
            "npx": 48, "npz": 32, "dt_atmos": 900.0, "n_split": 2,
            "radiation": "rrtmg", "slab_ocean": True, "sea_ice": True,
            "bucket_land": True, "surface_data": "topography/c48",
        },
        "duration_seconds": float(days) * 86400.0,
        "fused_chunk_steps": 24,
        "radiation_interval_steps": 4,
    })
    loop = TimeLoop(cfg)
    area = jnp.asarray(loop._g.area)
    asum = float(area.sum())
    solcon = 1368.22

    from fv3net_tpu.ops import zenith as _zen
    import datetime as _dt

    @jax.jit
    def means(ulw, usw):
        return ((ulw * area).sum() / asum, (usw * area).sum() / asum)

    lon_deg = np.rad2deg(loop.grid.lon)
    lat_deg = np.rad2deg(loop.grid.lat)
    area_np = np.asarray(loop._g.area)
    rows = []
    prev_t = loop.time
    for t, diags in loop:
        mid = prev_t + (t - prev_t) / 2
        cz = np.clip(np.asarray(_zen.cos_zenith_angle(
            _zen.days_from_2000(mid), lon_deg, lat_deg)), 0.0, None)
        czbar = float((cz * area_np).sum() / area_np.sum())
        prev_t = t
        m = means(
            jnp.asarray(diags["ULWRFtoa"].data),
            jnp.asarray(diags["USWRFtoa"].data),
        )
        rows.append([float(m[0]), float(m[1]), czbar])
    rows = np.array(rows)
    olr, usw, cosz = rows.mean(axis=0)
    sw_down = solcon * cosz
    sw_abs = sw_down - usw
    print(json.dumps({
        "days": days,
        "olr_w_m2": round(olr, 2),
        "sw_down_toa_w_m2": round(sw_down, 2),
        "sw_up_toa_w_m2": round(usw, 2),
        "sw_absorbed_w_m2": round(sw_abs, 2),
        "net_toa_w_m2": round(sw_abs - olr, 2),
        "solcon_scale_to_balance": round(olr / sw_abs, 4),
    }))


if __name__ == "__main__":
    main(*[float(a) for a in sys.argv[1:]])
