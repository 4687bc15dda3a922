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


def test_fused_step_with_rrtmg_scheme():
    """The band solvers run inside the fused prognostic step."""
    import dataclasses as _dc

    import jax.numpy as jnp
    import numpy as np

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.dycore import DycoreConfig, init_state
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.physics import PhysicsConfig
    from fv3net_tpu.runtime.fused import build_fused_step
    from fv3net_tpu.runtime.loop import aquaplanet_sst

    grid = make_grid(6)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, 8, perturbation=1.0)
    step = build_fused_step(
        g, jnp.asarray(ak, jnp.float32), jnp.asarray(bk, jnp.float32),
        DycoreConfig(dt=900.0, n_split=1, advection_order=4),
        PhysicsConfig(radiation_scheme="rrtmg"),
    )
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.asarray(
        np.maximum(np.cos(grid.lat) * np.cos(grid.lon), 0.0), jnp.float32
    )
    out = step(state, None, sst, cosz)
    assert np.isfinite(np.asarray(out.pt)).all()
    assert np.isfinite(np.asarray(out.wind)).all()
    # the rrtmg heating actually changed the thermodynamic state
    assert float(jnp.abs(out.pt - state.pt).max()) > 0.0


def test_fused_multi_step_matches_chained_single_steps():
    """interval=1 multi-step scan == repeated single fused steps."""
    from fv3net_tpu.dycore import DycoreConfig
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.runtime.fused import build_fused_multi_step, build_fused_step

    grid = make_grid(6)
    g = GridArrays.from_grid(grid, dtype=jnp.float64)
    state, ak, bk = init_state(grid, nz=10, dtype=jnp.float64,
                               perturbation=2.0)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    dyn_cfg = DycoreConfig(dt=900.0, n_split=2)
    phys_cfg = PhysicsConfig()
    sst = jnp.full_like(g.lat, 300.0)
    cosz = jnp.full_like(g.lat, 0.3)

    single = build_fused_step(g, akj, bkj, dyn_cfg, phys_cfg)
    s = state
    for _ in range(3):
        s = single(s, 0, sst, cosz)

    multi = build_fused_multi_step(
        g, akj, bkj, dyn_cfg, phys_cfg, n_steps=3, radiation_interval=1
    )
    m = multi(state, 0, sst, cosz)
    np.testing.assert_allclose(np.asarray(m.pt), np.asarray(s.pt), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(m.delp), np.asarray(s.delp), rtol=1e-12
    )


def test_fused_multi_step_radiation_interval():
    """Cached-heating radiation sub-stepping stays finite and close to the
    every-step solution over a short window."""
    from fv3net_tpu.dycore import DycoreConfig
    from fv3net_tpu.dycore.core import GridArrays
    from fv3net_tpu.runtime.fused import build_fused_multi_step

    grid = make_grid(6)
    g = GridArrays.from_grid(grid, dtype=jnp.float64)
    state, ak, bk = init_state(grid, nz=10, dtype=jnp.float64,
                               perturbation=2.0)
    akj, bkj = jnp.asarray(ak), jnp.asarray(bk)
    dyn_cfg = DycoreConfig(dt=900.0, n_split=2)
    phys_cfg = PhysicsConfig()
    sst = jnp.full_like(g.lat, 300.0)
    cosz = jnp.full_like(g.lat, 0.3)

    every = build_fused_multi_step(
        g, akj, bkj, dyn_cfg, phys_cfg, n_steps=4, radiation_interval=1
    )(state, 0, sst, cosz)
    cached = build_fused_multi_step(
        g, akj, bkj, dyn_cfg, phys_cfg, n_steps=4, radiation_interval=4
    )(state, 0, sst, cosz)
    assert np.isfinite(np.asarray(cached.pt)).all()
    # heating rates drift slowly: 4 steps of reuse moves T by < 0.1 K
    dT = np.abs(np.asarray(cached.pt) - np.asarray(every.pt))
    assert dT.max() < 0.1
