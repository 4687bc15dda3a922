"""Pallas k-table weighted-selection kernel vs the XLA one-hot form."""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.ops.pallas_ktable import (
    weighted_select_dot,
    weighted_select_dot_xla,
)


@pytest.mark.parametrize("rows,G,K,N", [
    (630, 16, 12, 1000),   # LW lower spec-band shape (base*9 + stencil)
    (70, 12, 4, 512),      # LW lower single-species
    (1180, 10, 8, 777),    # LW upper spec-band
    (10, 140, 2, 300),     # self-continuum row pair
])
def test_kernel_matches_xla(rows, G, K, N):
    rng = np.random.default_rng(rows + G + K)
    tab = jnp.asarray(rng.standard_normal((rows, G)), jnp.float32)
    terms = []
    for k in range(K):
        ids = jnp.asarray(rng.integers(0, rows, N), jnp.int32)
        w = (None if k == 0
             else jnp.asarray(rng.random(N), jnp.float32))
        terms.append((ids, w))
    want = weighted_select_dot_xla(terms, tab)
    got = weighted_select_dot(terms, tab, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_kernel_leading_shape_and_padding():
    """Arbitrary leading shapes; N not a multiple of the block."""
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((37, 5)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 37, (3, 11, 7)), jnp.int32)
    w = jnp.asarray(rng.random((3, 11, 7)), jnp.float32)
    want = weighted_select_dot_xla([(ids, w)], tab)
    got = weighted_select_dot([(ids, w)], tab, interpret=True)
    assert got.shape == (3, 11, 7, 5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_lw_taumol_pallas_route_matches_xla():
    """Full lwrad with the Pallas k-table route (interpret mode) vs the
    XLA factored-contraction path on the oracle profile battery."""
    from fv3net_tpu.physics.radiation.rrtmg import (
        lwrad, make_lw_tables, prep_lw_tables,
    )
    from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
    from test_rrtmg_oracle import _profiles

    pr = _profiles()
    args = [jnp.asarray(pr[k], jnp.float32) for k in
            ("plyr", "plvl", "tlyr", "tlvl", "qlyr", "olyr",
             "gasvmr", "clouds", "aerosols", "sfemis", "sfgtmp",
             "delp", "rand2d")]
    T = prep_lw_tables(make_lw_tables(seed=0), dtype=jnp.float32)
    rlw.set_pallas_ktable("off")
    try:
        base = {k: np.asarray(v) for k, v in lwrad(*args, T).items()}
        rlw.set_pallas_ktable("interpret")
        got = {k: np.asarray(v) for k, v in lwrad(*args, T).items()}
    finally:
        rlw.set_pallas_ktable("auto")
    for key in ("hlwc", "hlw0", "upfxc_t", "upfx0_t", "upfxc_s",
                "upfx0_s", "dnfxc_s", "dnfx0_s"):
        np.testing.assert_allclose(
            got[key], base[key], rtol=3e-5, atol=3e-4, err_msg=key
        )


def test_sw_taumol_pallas_route_matches_xla():
    """Full swrad with the Pallas k-table route (interpret) vs XLA."""
    from fv3net_tpu.physics.radiation.rrtmg import lw as rlw
    from fv3net_tpu.physics.radiation.rrtmg.sw import (
        swrad, prep_sw_tables,
    )
    from fv3net_tpu.physics.radiation.rrtmg.tables import make_sw_tables
    from fv3net_tpu.physics.radiation.rrtmg import params as P
    from test_rrtmg_oracle import _profiles

    pr = _profiles()
    C, L = pr["plyr"].shape
    rng = np.random.default_rng(11)
    rand2d = rng.random((C, P.NGPT_SW * L))
    cosz = np.array([0.82, 0.47, 0.21, 0.0])[:C]
    sfcalb = np.tile(
        np.array([[0.23, 0.21, 0.09, 0.07]]), (C, 1)
    ) * np.array([1.0, 0.6, 1.3, 0.4])[:C, None]
    aer = np.zeros((C, L, P.NBANDS_SW, 3), np.float32)
    aer[..., 0] = 0.015 * (pr["plyr"] / 1013.0)[..., None]
    aer[..., 1] = 0.88
    aer[..., 2] = 0.66
    args = [jnp.asarray(x, jnp.float32) for x in
            (pr["plyr"], pr["plvl"], pr["tlyr"], pr["tlvl"],
             pr["qlyr"], pr["olyr"], pr["gasvmr"], pr["clouds"],
             aer, sfcalb, pr["delp"], cosz)]
    T = prep_sw_tables(make_sw_tables(seed=1), dtype=jnp.float32)
    r2d = jnp.asarray(rand2d, jnp.float32)
    rlw.set_pallas_ktable("off")
    try:
        base = {k: np.asarray(v)
                for k, v in swrad(*args, 1360.8, r2d, T).items()}
        rlw.set_pallas_ktable("interpret")
        got = {k: np.asarray(v)
               for k, v in swrad(*args, 1360.8, r2d, T).items()}
    finally:
        rlw.set_pallas_ktable("auto")
    for key in ("hswc", "hsw0", "ftoauc", "ftoau0", "fsfcdc",
                "fsfcd0", "fsfcuc", "fsfcu0"):
        np.testing.assert_allclose(
            got[key], base[key], rtol=5e-5, atol=5e-4, err_msg=key
        )
