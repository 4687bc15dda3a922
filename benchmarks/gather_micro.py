"""Microbenchmark: strategies for the RRTMG k-table fetches on TPU.

The rrtmg taumol issues ~150 row-gathers of [rows<=1200, ng<=16] tables
with [ncol, nlay] index arrays, and rtrnmc ~6 gathers of 62M indices
from 10001-entry exp tables.  This measures per-op cost of each
strategy to direct the optimization (the PPM-remap lesson: TPU gathers
can be 30x slower than contractions).
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

C, L = 13824, 32
ROWS, NG = 660, 16


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / n * 1e3:9.3f} ms")


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((ROWS, NG)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, ROWS - 2, (C, L)), jnp.int32)
    ids20 = [
        jnp.asarray(rng.integers(0, ROWS - 2, (C, L)), jnp.int32)
        for _ in range(20)
    ]

    @jax.jit
    def one_gather(i):
        return jnp.take(tab, i, axis=0)

    @jax.jit
    def twenty_gathers(i20):
        return sum(jnp.take(tab, i, axis=0) for i in i20)

    @jax.jit
    def twenty_batched(i20):
        i = jnp.stack(i20, axis=-1)  # [C, L, 20]
        return jnp.take(tab, i, axis=0).sum(axis=-2)

    @jax.jit
    def onehot_hi(i):
        oh = (i[..., None] == jnp.arange(ROWS)).astype(jnp.float32)
        return jnp.einsum(
            "clr,rg->clg", oh, tab, precision=jax.lax.Precision.HIGHEST
        )

    @jax.jit
    def onehot_bf16(i):
        oh = (i[..., None] == jnp.arange(ROWS)).astype(jnp.bfloat16)
        return jnp.einsum("clr,rg->clg", oh, tab.astype(jnp.bfloat16))

    timeit("gather x1 [660,16]", one_gather, ids)
    timeit("gather x20 separate", twenty_gathers, ids20)
    timeit("gather x20 batched-idx", twenty_batched, ids20)
    timeit("one-hot f32-highest x1", onehot_hi, ids)
    timeit("one-hot bf16 x1", onehot_bf16, ids)

    # small-table (19 rows) strategies
    tab19 = jnp.asarray(rng.random((19, NG)), jnp.float32)
    ids19 = jnp.asarray(rng.integers(0, 18, (C, L)), jnp.int32)

    @jax.jit
    def small_gather(i):
        return jnp.take(tab19, i, axis=0)

    @jax.jit
    def small_onehot(i):
        oh = (i[..., None] == jnp.arange(19)).astype(jnp.float32)
        return jnp.einsum(
            "clr,rg->clg", oh, tab19, precision=jax.lax.Precision.HIGHEST
        )

    timeit("small gather [19,16]", small_gather, ids19)
    timeit("small one-hot [19,16]", small_onehot, ids19)

    # exp-table lookup vs direct exp (rtrnmc)
    G = 140
    od = jnp.asarray(rng.random((C, L, G)) * 6.0, jnp.float32)
    exp_tbl = jnp.asarray(np.exp(-np.linspace(0, 700, 10001)), jnp.float32)

    @jax.jit
    def table_exp(x):
        tblind = x / (3.6 + x)
        it = jnp.clip(jnp.trunc(10000 * tblind + 0.5), 0, 10000).astype(
            jnp.int32
        )
        return jnp.take(exp_tbl, it)

    @jax.jit
    def direct_exp(x):
        return jnp.exp(-x)

    timeit("exp table lookup 62M", table_exp, od)
    timeit("exp direct 62M", direct_exp, od)


if __name__ == "__main__":
    main()
