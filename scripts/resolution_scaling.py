"""Single-chip resolution scaling of the flagship hourly-RRTMG workload.

Times the fused 8-step chunk (radiation every 4th step) at C48/C96/C192
nz=32 in ONE process (the tunnel wedges under concurrent clients) and
prints one JSON line per size.  The workload shape is held fixed
(dt=900, n_split=2) so the numbers measure pure grid scaling; C192
production runs would shorten dt for CFL, which rescales SYPD by
dt_new/900 at the same step cost.

Usage: python scripts/resolution_scaling.py [npx ...]   (default 48 96 192)
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from __graft_entry__ import _flagship

    sizes = [int(a) for a in sys.argv[1:]] or [48, 96, 192]
    CHUNK = 8
    dt = 900.0
    for npx in sizes:
        multi_step, args = _flagship(
            npx=npx, npz=32, chunk=CHUNK, radiation_interval=4
        )
        state, ml_params, sst, cosz = args
        out = multi_step(state, ml_params, sst, cosz)
        float(np.asarray(out.pt[0, 0, 0, 0]))  # host read = real sync
        n_calls = 4 if npx <= 96 else 2
        t0 = time.perf_counter()
        s = state
        for _ in range(n_calls):
            s = multi_step(s, ml_params, sst, cosz)
        float(np.asarray(s.pt[0, 0, 0, 0]))
        elapsed = time.perf_counter() - t0
        sypd = dt * n_calls * CHUNK / elapsed / (365.0 * 86400.0) * 86400.0
        print(json.dumps({
            "npx": npx,
            "ms_per_step": round(1000.0 * elapsed / (n_calls * CHUNK), 2),
            "sypd_at_dt900": round(sypd, 2),
        }), flush=True)
        del multi_step, args, state, ml_params, sst, cosz, out, s
        gc.collect()


if __name__ == "__main__":
    main()
