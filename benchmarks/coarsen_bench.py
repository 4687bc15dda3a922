"""C384 -> C48 coarsening throughput: Pallas kernel vs XLA path.

BASELINE config 1: the reference does this as a dask/xarray CPU batch
job (workflows/coarsen_c384_diagnostics); here it is an on-device
streaming kernel.  Prints one JSON line per variant with effective
HBM-read bandwidth.
"""
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

    from fv3net_tpu.ops import coarsen as xla_c
    from fv3net_tpu.ops.pallas_kernels import weighted_block_average_pallas

    nz = 474  # all 6 tiles x 79 levels: 280 MB per input array
    n_fine = 384
    factor = 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(nz, n_fine, n_fine), jnp.float32)
    w = jnp.asarray(rng.rand(n_fine, n_fine), jnp.float32)
    wb = jnp.broadcast_to(w, x.shape)

    # rotate distinct input buffers and carry a data dependency between
    # calls so the runtime cannot cache or elide repeated executions
    xs = [x * float(1.0 + 0.01 * i) for i in range(4)]
    jax.block_until_ready(xs)

    results = {}
    for name, fn in (
        ("pallas", lambda a: weighted_block_average_pallas(a, wb, factor)),
        ("xla", lambda a: xla_c.weighted_block_average(a, wb, factor)),
    ):
        def sync(o):
            # host read: execution is in-order, so this waits for all
            # queued work (block_until_ready is unreliable through the
            # tunnel runtime)
            return float(np.asarray(o[0, 0, 0]))

        out = fn(xs[0])
        sync(out)
        n_calls = 20
        out = None
        t0 = time.perf_counter()
        for i in range(n_calls):
            out = fn(xs[i % 4])
        sync(out)
        dt = (time.perf_counter() - t0) / n_calls
        read_bytes = 2 * x.size * 4  # x and w, one pass
        results[name] = read_bytes / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "c384_to_c48_coarsen_bandwidth",
                "value": round(max(results.values()), 2),
                "unit": "GB/s",
                "pallas_GBps": round(results["pallas"], 2),
                "xla_GBps": round(results["xla"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
