"""Per-component timing of the RRTMG solvers on the TPU (C48-shaped).

Identifies the hot stage (taumol gathers vs rtrnmc scans vs cldprop vs
spcvrtm) to direct kernel optimization.
"""
import sys
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

C = 6 * 48 * 48  # C48 column count
L = 32


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return dt


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

    lwrad = jax.jit(lambda *a: rlw.lwrad(*a, Tlw))
    swrad = jax.jit(lambda *a: rsw.swrad(*a, 1360.0, rand_sw, Tsw))
    timeit("lwrad total", lwrad, plyr, plvl, tlyr, tlvl, qlyr, olyr,
           gasvmr, clouds, aer_lw, sfemis, sfgtmp, delp, rand_lw)
    timeit("swrad total", swrad, plyr, plvl, tlyr, tlvl, qlyr, olyr,
           gasvmr, clouds, aer_sw, sfcalb, delp, cosz)

    # pieces (LW)
    h2ovmr = jnp.maximum(0.0, qlyr * P.AMDW / (1.0 - qlyr))
    tem0 = (1.0 - h2ovmr) * P.CON_AMD + h2ovmr * P.CON_AMW
    coldry = (1e-20 * 1e3 * P.CON_AVGD) * delp / (
        100.0 * P.CON_G * tem0 * (1.0 + h2ovmr)
    )
    colamt = jnp.stack(
        [jnp.maximum(0.0, coldry * h2ovmr),
         coldry * 3.55e-4,
         coldry * jnp.maximum(0.0, olyr * P.AMDO3)]
        + [coldry * x for x in (3.2e-7, 1.7e-6, 0.209, 1.5e-7)],
        axis=-1,
    ).astype(f32)
    colbrd = coldry - colamt[..., 1:].sum(-1)
    wx = jnp.zeros((C, L, 4), f32)
    tauaer = jnp.zeros((C, L, P.NBANDS_LW), f32)

    setcoef = jax.jit(
        lambda: rlw.setcoef_lw(
            plyr, tlyr, tlvl, sfgtmp, h2ovmr, colamt, coldry, colbrd, Tlw
        )
    )
    c = setcoef()
    timeit("lw setcoef", setcoef)
    c = dict(c)
    c["pavel"] = plyr

    taumol = jax.jit(
        lambda cc: rlw.taumol_lw(cc, colamt, coldry, colbrd, wx, tauaer, Tlw)
    )
    fracs, tautot = taumol(c)
    timeit("lw taumol", taumol, c)

    cldprop = jax.jit(
        lambda: rlw.cldprop_lw(
            clouds[..., 0], clouds[..., 1], clouds[..., 2], clouds[..., 3],
            clouds[..., 4], clouds[..., 5], clouds[..., 6], clouds[..., 7],
            clouds[..., 8], rand_lw, Tlw,
        )
    )
    cldfmc, taucld = cldprop()
    timeit("lw cldprop+mcica", cldprop)

    semiss = jnp.ones((C, P.NBANDS_LW), f32) * 0.98
    secdif = jnp.full((C, P.NBANDS_LW), 1.66, f32)
    rtrnmc = jax.jit(
        lambda fr, tt: rlw.rtrnmc_lw(
            semiss, delp, cldfmc, taucld, tt, c["pklay"], c["pklev"],
            fr, secdif,
        )
    )
    try:
        out = rtrnmc(fracs, tautot)
        timeit("lw rtrnmc", rtrnmc, fracs, tautot)
    except Exception as e:
        print("lw rtrnmc standalone failed:", str(e)[:100])


if __name__ == "__main__":
    main()
