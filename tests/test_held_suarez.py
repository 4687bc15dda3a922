"""Held-Suarez forcing tests."""
import numpy as np
import jax
import jax.numpy as jnp

from fv3net_tpu.physics.held_suarez import (
    HeldSuarezParams,
    equilibrium_temperature,
    held_suarez_forcing,
)

jax.config.update("jax_enable_x64", True)


def test_equilibrium_temperature_structure():
    p = jnp.asarray([1e4, 5e4, 1e5])
    t_eq_eq = np.asarray(equilibrium_temperature(p, 0.0, HeldSuarezParams()))
    t_eq_pole = np.asarray(
        equilibrium_temperature(p, np.pi / 2, HeldSuarezParams())
    )
    # warmer at the equator at the surface by ~delta_T_y
    assert t_eq_eq[-1] - t_eq_pole[-1] > 40.0
    # stratospheric floor
    assert t_eq_pole[0] == 200.0
    # surface equator value is 315 K by construction
    np.testing.assert_allclose(t_eq_eq[-1], 315.0, atol=1e-6)


def test_forcing_relaxes_and_damps():
    nz = 8
    pmid = jnp.linspace(2e4, 9.8e4, nz)[None, :] * jnp.ones((3, 1))
    ps = jnp.full(3, 1e5)
    lat = jnp.asarray([0.0, 0.7, 1.4])
    T = jnp.full((3, nz), 250.0)
    wind = jnp.ones((3, 3, nz))
    dt = 900.0
    T2, w2 = held_suarez_forcing(T, wind, pmid, ps, lat, dt)
    T_eq = np.asarray(
        equilibrium_temperature(pmid, lat[..., None], HeldSuarezParams())
    )
    # temperature moves toward equilibrium everywhere
    moved = np.sign(np.asarray(T2) - np.asarray(T))
    want = np.sign(T_eq - np.asarray(T))
    mask = np.abs(T_eq - np.asarray(T)) > 0.1
    np.testing.assert_array_equal(moved[mask], want[mask])
    # winds damped only in the boundary layer (sigma > 0.7)
    w2 = np.asarray(w2)
    sigma = np.asarray(pmid) / 1e5
    np.testing.assert_allclose(w2[:, :, sigma[0] < 0.7], 1.0)
    assert (w2[:, :, sigma[0] > 0.75] < 1.0).all()
