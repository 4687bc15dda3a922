"""Round-2 RRTMG timing: current (one-hot + fast_exp) solvers + gather
micro — ALL experiments in one process (tunnel compiles are ~10-25 min
each; batch them)."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
from fv3net_tpu.physics.radiation.rrtmg import sw as rsw
from fv3net_tpu.physics.radiation.rrtmg import params as P
from fv3net_tpu.physics.radiation.rrtmg.tables import (
    make_lw_tables,
    make_sw_tables,
)

C = 6 * 48 * 48
L = 32


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(name, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    print(f"{name:30s} first(+compile) {time.perf_counter() - t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    print(f"{name:30s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    plvl1 = np.geomspace(1013.0, 3.0, L + 1)
    plvl = jnp.asarray(np.broadcast_to(plvl1, (C, L + 1)), f32)
    plyr = 0.5 * (plvl[:, :-1] + plvl[:, 1:])
    delp = plvl[:, :-1] - plvl[:, 1:]
    tlyr = jnp.asarray(
        288 - 16 * np.log(np.asarray(plyr[:, :1]) / np.asarray(plyr)), f32
    )
    tlvl = jnp.concatenate(
        [tlyr[:, :1], 0.5 * (tlyr[:, :-1] + tlyr[:, 1:]), tlyr[:, -1:]], 1
    )
    qlyr = (0.01 * (plyr / 1013.0) ** 3).astype(f32)
    olyr = jnp.full((C, L), 1e-6, f32)
    gasvmr = jnp.zeros((C, L, 10), f32).at[..., 0].set(3.55e-4).at[
        ..., 3
    ].set(0.209)
    clouds = jnp.zeros((C, L, 9), f32)
    clouds = clouds.at[:, 3:6, 0].set(0.6).at[:, 3:6, 1].set(20.0)
    clouds = clouds.at[:, 3:6, 2].set(10.0).at[:, 3:6, 3].set(8.0)
    clouds = clouds.at[:, 3:6, 4].set(40.0)
    aer_lw = jnp.zeros((C, L, P.NBANDS_LW, 3), f32)
    aer_sw = jnp.zeros((C, L, P.NBANDS_SW, 3), f32)
    sfemis = jnp.full((C,), 0.98, f32)
    sfgtmp = tlyr[:, 0] + 1.0
    cosz = jnp.full((C,), 0.7, f32)
    sfcalb = jnp.full((C, 4), 0.15, f32)
    key = jax.random.PRNGKey(0)
    rand_lw = jax.random.uniform(key, (C, P.NGPT_LW * L), dtype=f32)
    rand_sw = jax.random.uniform(key, (C, P.NGPT_SW * L), dtype=f32)

    Tlw = rlw.prep_lw_tables(make_lw_tables(), f32)
    Tsw = rsw.prep_sw_tables(make_sw_tables(), f32)

    lwrad_fast = jax.jit(
        lambda a, b, c_, d, e, f, g, h, i, j, k, l, m: rlw.lwrad(
            a, b, c_, d, e, f, g, h, i, j, k, l, m, Tlw, fast_exp=True
        )
    )
    timeit("lwrad FAST", lwrad_fast, plyr, plvl, tlyr, tlvl, qlyr, olyr,
           gasvmr, clouds, aer_lw, sfemis, sfgtmp, delp, rand_lw)

    swrad_fast = jax.jit(
        lambda a, b, c_, d, e, f, g, h, i, j, k, m, r: rsw.swrad(
            a, b, c_, d, e, f, g, h, i, j, k, m, 1360.0, r, Tsw,
            fast_exp=True,
        )
    )
    timeit("swrad FAST", swrad_fast, plyr, plvl, tlyr, tlvl, qlyr, olyr,
           gasvmr, clouds, aer_sw, sfcalb, delp, cosz, rand_sw)

    # ---- component: cldprop (the 6 s suspect) with current code ------
    cldprop = jax.jit(
        lambda cl, r: rlw.cldprop_lw(
            cl[..., 0], cl[..., 1], cl[..., 2], cl[..., 3], cl[..., 4],
            cl[..., 5], cl[..., 6], cl[..., 7], cl[..., 8], r, Tlw,
        )
    )
    timeit("lw cldprop+mcica (new)", cldprop, clouds, rand_lw)

    # mcica alone vs cloud-optics alone
    def _mcica_only(cl, r):
        from jax import lax

        cldf = jnp.where(cl[..., 0] < P.CLDMIN, 0.0, cl[..., 0])
        cdfunc = r.reshape(C, P.NGPT_LW, L)

        def body(carry, xs):
            cdf_prev, cldf_prev = carry
            cdf_k, cldf_k = xs
            tem1 = 1.0 - cldf_prev
            cdf_k = jnp.where(cdf_prev > tem1[:, None], cdf_prev,
                              cdf_k * tem1[:, None])
            return (cdf_k, cldf_k), cdf_k

        (_, _), rest = lax.scan(
            body, (cdfunc[:, :, 0], cldf[:, 0]),
            (cdfunc[:, :, 1:].transpose(2, 0, 1), cldf[:, 1:].T),
        )
        cdfunc = jnp.concatenate(
            [cdfunc[:, :, :1], rest.transpose(1, 2, 0)], axis=2
        )
        return (cdfunc >= (1.0 - cldf)[:, None, :]).astype(f32)

    timeit("lw mcica scan only", jax.jit(_mcica_only), clouds, rand_lw)

    # ---- gather micro -------------------------------------------------
    ROWS, NG = 660, 16
    tab = jnp.asarray(rng.random((ROWS, NG)), f32)
    ids = jnp.asarray(rng.integers(0, ROWS - 2, (C, L)), jnp.int32)

    timeit("micro: 1 gather [660,16]",
           jax.jit(lambda i: jnp.take(tab, i, axis=0)), ids)

    ids12 = jnp.asarray(rng.integers(0, ROWS - 2, (C, L, 12)), jnp.int32)
    timeit("micro: 12-idx batched gather",
           jax.jit(lambda i: jnp.take(tab, i, axis=0).sum(-2)), ids12)

    timeit(
        "micro: one-hot660 f32 HIGHEST",
        jax.jit(
            lambda i: jnp.einsum(
                "clr,rg->clg",
                (i[..., None] == jnp.arange(ROWS)).astype(f32), tab,
                precision=jax.lax.Precision.HIGHEST,
            )
        ),
        ids,
    )

    tab19 = jnp.asarray(rng.random((19, NG)), f32)
    ids19 = jnp.asarray(rng.integers(0, 18, (C, L)), jnp.int32)
    timeit("micro: gather [19,16]",
           jax.jit(lambda i: jnp.take(tab19, i, axis=0)), ids19)
    timeit(
        "micro: one-hot19",
        jax.jit(
            lambda i: jnp.einsum(
                "clr,rg->clg",
                (i[..., None] == jnp.arange(19)).astype(f32), tab19,
                precision=jax.lax.Precision.HIGHEST,
            )
        ),
        ids19,
    )


if __name__ == "__main__":
    main()
