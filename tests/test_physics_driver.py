"""End-to-end physics_step on a full model state."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.dycore import init_state
from fv3net_tpu.physics import PhysicsConfig, physics_step

jax.config.update("jax_enable_x64", True)


def test_physics_step_runs_and_is_sane():
    grid = make_grid(8)
    state, ak, bk = init_state(grid, nz=14, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    sst = 300.15 - 30.0 * jnp.sin(lat) ** 2
    cosz = jnp.asarray(np.cos(grid.lat) * np.cos(grid.lon))  # crude daylight
    new, diags = physics_step(state, sst, cosz, lat, dt=900.0)

    for name in ("PRATEsfc", "LHTFLsfc", "SHTFLsfc", "ULWRFtoa", "DSWRFtoa"):
        assert name in diags
        assert np.isfinite(np.asarray(diags[name])).all()
    assert np.isfinite(np.asarray(new.pt)).all()
    q = np.asarray(new.tracers["sphum"])
    assert (q >= 0).all()
    # evaporation moistens the boundary layer over warm SST
    dq = q - np.asarray(state.tracers["sphum"])
    assert dq[:, -1].mean() > 0
    # physics leaves mass untouched (delp is dynamics-owned)
    np.testing.assert_array_equal(np.asarray(new.delp), np.asarray(state.delp))
    # temperature tendencies are bounded (no runaway)
    dT = np.asarray(diags["tendency_of_air_temperature_due_to_fv3_physics"])
    assert np.abs(dT).max() < 0.05  # K/s


def test_physics_step_jits_and_is_deterministic():
    grid = make_grid(6)
    state, *_ = init_state(grid, nz=10, dtype=jnp.float64)
    lat = jnp.asarray(grid.lat)
    sst = jnp.full_like(lat, 300.0)
    cosz = jnp.full_like(lat, 0.3)
    cfg = PhysicsConfig()
    step = jax.jit(lambda s: physics_step(s, sst, cosz, lat, 900.0, cfg))
    a1, _ = step(state)
    a2, _ = step(state)
    np.testing.assert_array_equal(np.asarray(a1.pt), np.asarray(a2.pt))
