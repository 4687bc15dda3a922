"""Headline benchmark: C48 hybrid prognostic step throughput in SYPD.

Target (BASELINE.md): >= 5 simulated years per day per TPU chip for the
C48 hybrid run (dycore + physics + ML corrective step, dt_atmos = 900 s,
reference workload definition at
workflows/prognostic_c48_run/tests/test_regression.py:40-46).

Prints exactly one JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    # persistent compile cache: the tunnel-attached TPU pays a large
    # per-compile latency; cache XLA executables across bench runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from __graft_entry__ import entry

    import jax.numpy as jnp
    from jax import lax

    fn, args = entry()
    state, ml_params, sst, cosz = args
    dt_atmos = 900.0

    # chain CHUNK steps inside one XLA program: measures true device
    # throughput rather than per-dispatch host/tunnel latency
    CHUNK = 8

    @jax.jit
    def multi_step(s):
        return lax.fori_loop(0, CHUNK, lambda _, st: fn(st, ml_params, sst,
                                                        cosz), s)

    import numpy as np

    def sync(st):
        # force a device->host read: through the tunnel-attached runtime,
        # block_until_ready can return before execution completes, but a
        # host read cannot (execution is in-order, so reading the last
        # output waits for the whole chain)
        return float(np.asarray(st.pt[0, 0, 0, 0]))

    # warmup/compile
    out = multi_step(state)
    sync(out)

    n_calls = 4
    t0 = time.perf_counter()
    s = state
    for _ in range(n_calls):
        s = multi_step(s)
    sync(s)
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_calls * CHUNK / elapsed
    sim_seconds_per_wall_second = dt_atmos * steps_per_sec
    sypd = sim_seconds_per_wall_second * 86400.0 / (365.0 * 86400.0)

    print(
        json.dumps(
            {
                "metric": "c48_hybrid_prognostic_throughput",
                "value": round(sypd, 3),
                "unit": "SYPD",
                "vs_baseline": round(sypd / 5.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
