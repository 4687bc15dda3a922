"""Flagship chunk-size sweep: dispatch-amortization measurement.

The fused multi-step is a ``lax.scan`` whose body holds ONE compiled
RRTMG instance behind ``lax.cond`` (runtime/fused.py:224-251), so
compile time is independent of chunk length — only trip count changes.
This sweep measures whether larger chunks (fewer host dispatches through
the tunnel) buy throughput on the reference-shaped hourly-RRTMG C48
workload.  Prints one JSON line per chunk size.

Run on the TPU (single process; compiles land in .jax_cache).
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

    from __graft_entry__ import _flagship

    dt_atmos = 900.0
    # size overrides for CPU smoke runs (default: the C48 flagship)
    npx = int(os.environ.get("FV3NET_BENCH_NPX", "48"))
    npz = int(os.environ.get("FV3NET_BENCH_NPZ", "32"))
    chunks = tuple(
        int(c) for c in os.environ.get("FV3NET_BENCH_CHUNKS", "8,24,96").split(",")
    )

    def sync(st):
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    for chunk in chunks:
        multi_step, args = _flagship(
            npx=npx, npz=npz, chunk=chunk, radiation_interval=4
        )
        state, ml_params, sst, cosz = args
        t0 = time.perf_counter()
        out = multi_step(state, ml_params, sst, cosz)
        sync(out)
        compile_s = time.perf_counter() - t0
        # enough calls to cover >= 32 model steps per variant
        n_calls = max(1, -(-32 // chunk))
        t0 = time.perf_counter()
        s = state
        for _ in range(n_calls):
            s = multi_step(s, ml_params, sst, cosz)
        sync(s)
        elapsed = time.perf_counter() - t0
        sypd = (
            dt_atmos * n_calls * chunk / elapsed * 86400.0
        ) / (365.0 * 86400.0)
        print(
            json.dumps(
                {
                    "chunk": chunk,
                    "sypd": round(sypd, 2),
                    "ms_per_step": round(elapsed / (n_calls * chunk) * 1e3, 2),
                    "first_call_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
