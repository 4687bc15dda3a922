"""Vertical-remap kernel throughput (BASELINE config 2: the Fortran
``mappm`` PPM pressure remap + ``interpolate_2d`` per-column interp,
reference external/mappm/mappm/mappm.f90:11 driven column-wise from
vcm.cubedsphere.regridz:304-341 under dask).

Measures, on the attached TPU:
- one-shot ``remap_ppm`` (general one-hot search) — the offline
  regrid/coarsening path;
- the dycore's shared ``banded_search`` + ``remap_apply`` over a 7-field
  stack — the per-step hot path;
- ``interpolate_1d`` per-column linear interpolation.

Prints one JSON line per variant with columns/s and effective GB/s.
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fv3net_tpu.ops import remap as rm

    shape = (6, 96, 96)  # C96 cube: 55k columns
    km = 79  # GFS vertical levels
    n_fields = 7
    rng = np.random.RandomState(0)
    ncols = int(np.prod(shape))

    pe1 = np.cumsum(np.abs(rng.rand(*shape, km + 1)) + 1.0, -1) * 120.0
    pe2 = pe1.copy()
    pe2[..., 1:-1] += (
        0.3 * np.diff(pe1, axis=-1)[..., :-1] * rng.randn(*shape, km - 1)
    )
    pe2.sort(-1)
    pe2[..., 0] = pe1[..., 0]
    pe2[..., -1] = pe1[..., -1]
    pe1j = jnp.asarray(pe1, jnp.float32)
    pe2j = jnp.asarray(pe2, jnp.float32)
    qs = jnp.asarray(rng.rand(n_fields, *shape, km), jnp.float32)

    def sync(x):
        return float(np.asarray(x.reshape(-1)[0]))

    N = 16

    def bench(name, fn, cols_per_call, bytes_per_call):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        sync(fn())
        dt = (time.perf_counter() - t0) / N
        print(
            json.dumps(
                {
                    "metric": f"remap_{name}",
                    "value": round(cols_per_call / dt / 1e6, 2),
                    "unit": "Mcols/s",
                    "gb_per_s": round(bytes_per_call / dt / 1e9, 1),
                }
            )
        )

    # general one-hot path, one field
    one = jax.jit(
        lambda: jax.lax.fori_loop(
            0,
            N,
            lambda i, q: rm.remap_ppm(pe1j, q * 1.0000001, pe2j, iv=1, kord=9),
            qs[0],
        )
    )
    bench("onehot_1field", one, ncols, ncols * km * 4 * 2)

    # dycore hot path: shared banded search + 7-field stack
    def shared_call():
        def body(i, q):
            search = rm.banded_search(pe1j, pe2j, window=2)
            return rm.remap_apply(search, q * 1.0000001, iv=1, kord=9)

        return jax.lax.fori_loop(0, N, body, qs)

    shared = jax.jit(shared_call)
    bench(
        "shared_banded_7fields", shared, ncols * n_fields,
        ncols * km * 4 * 2 * n_fields,
    )

    # per-column linear interpolation (interpolate_2d role)
    xmid = jnp.asarray(0.5 * (pe1[..., 1:] + pe1[..., :-1]), jnp.float32)
    xtarg = jnp.asarray(0.5 * (pe2[..., 1:] + pe2[..., :-1]), jnp.float32)
    interp = jax.jit(
        lambda: jax.lax.fori_loop(
            0,
            N,
            lambda i, y: rm.interpolate_1d(xtarg, xmid, y * 1.0000001,
                                           fill_value=0.0),
            qs[0],
        )
    )
    bench("interpolate_1d", interp, ncols, ncols * km * 4 * 2)


if __name__ == "__main__":
    main()
