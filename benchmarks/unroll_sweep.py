"""A/B sweep of the RRTMG solver-scan unroll factor on the integrated
flagship chunk (one process, compiles batched; integrated-graph-only per
docs/performance.md).  Also validates numerics: every variant's end state
must match unroll=1 closely (unrolling only reorders fusion).

    python benchmarks/unroll_sweep.py [unrolls, default 1,4,8,32]
"""
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

    from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
    from __graft_entry__ import _flagship

    dt_atmos = 900.0
    npx = int(os.environ.get("FV3NET_BENCH_NPX", "48"))
    npz = int(os.environ.get("FV3NET_BENCH_NPZ", "32"))
    chunk = 8
    unrolls = tuple(
        int(u) for u in (sys.argv[1] if len(sys.argv) > 1 else "1,4,8,32").split(",")
    )

    def sync(st):
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    ref_pt = None
    for u in unrolls:
        rlw.set_scan_unroll(u)
        multi_step, args = _flagship(
            npx=npx, npz=npz, chunk=chunk, radiation_interval=4
        )
        state, ml_params, sst, cosz = args
        t0 = time.perf_counter()
        out = multi_step(state, ml_params, sst, cosz)
        sync(out)
        compile_s = time.perf_counter() - t0
        pt_end = np.asarray(out.pt)
        if ref_pt is None:
            ref_pt = pt_end
            max_dev = 0.0
        else:
            max_dev = float(np.max(np.abs(pt_end - ref_pt)))
        n_calls = max(1, -(-32 // chunk))
        t0 = time.perf_counter()
        s = state
        for _ in range(n_calls):
            s = multi_step(s, ml_params, sst, cosz)
        sync(s)
        elapsed = time.perf_counter() - t0
        sypd = (dt_atmos * n_calls * chunk / elapsed) / 365.0
        print(
            json.dumps(
                {
                    "unroll": u,
                    "sypd": round(sypd, 2),
                    "ms_per_chunk": round(elapsed / n_calls * 1e3, 1),
                    "first_call_s": round(compile_s, 1),
                    "max_pt_dev_vs_first": max_dev,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
