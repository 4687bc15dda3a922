"""Multi-device sharding correctness: the sharded model step must equal
the single-device step (the DummyComm-style test of SURVEY §4, on the
virtual 8-device CPU mesh)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.dycore import DycoreConfig, dynamics_step, init_state
from fv3net_tpu.dycore.core import GridArrays
from fv3net_tpu.parallel import sharded
from fv3net_tpu.parallel.halo import halo_append
from fv3net_tpu.physics import PhysicsConfig, physics_step
from fv3net_tpu.runtime.loop import aquaplanet_sst

requires_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@requires_devices
def test_halo_append_matches_under_sharding():
    mesh = sharded.make_mesh(8)
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.rand(6, 3, 8, 8), jnp.float32)
    want = np.asarray(halo_append(field, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P

    fs = jax.device_put(
        field, NamedSharding(mesh, P(None, None, sharded.FV_AXIS, None))
    )
    got = np.asarray(jax.jit(lambda x: halo_append(x, 1))(fs))
    np.testing.assert_array_equal(got, want)


@requires_devices
def test_dynamics_step_matches_under_sharding():
    grid = make_grid(8)
    g = GridArrays.from_grid(grid)
    state, ak, bk = init_state(grid, nz=8, perturbation=3.0)
    cfg = DycoreConfig(dt=900.0, n_split=1)
    akj = jnp.asarray(ak, jnp.float32)
    bkj = jnp.asarray(bk, jnp.float32)

    out_single = dynamics_step(state, g, akj, bkj, cfg)

    mesh = sharded.make_mesh(8)
    state_s = sharded.shard_state(state, mesh)
    g_r = sharded.replicate(g, mesh)
    out_sharded = dynamics_step(
        state_s, g_r, sharded.replicate(akj, mesh),
        sharded.replicate(bkj, mesh), cfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.pt), np.asarray(out_single.pt), rtol=2e-6,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.delp), np.asarray(out_single.delp), rtol=2e-6
    )


@requires_devices
def test_physics_step_matches_under_sharding():
    grid = make_grid(8)
    g = GridArrays.from_grid(grid)
    state, *_ = init_state(grid, nz=8)
    sst = aquaplanet_sst(g.lat)
    cosz = jnp.full_like(sst, 0.3)
    out_single, _ = physics_step(state, sst, cosz, g.lat, 900.0,
                                 PhysicsConfig())

    mesh = sharded.make_mesh(8)
    state_s = sharded.shard_state(state, mesh)
    out_sharded, _ = physics_step(
        state_s,
        sharded.shard_field2d(sst, mesh),
        sharded.shard_field2d(cosz, mesh),
        sharded.replicate(g, mesh).lat,
        900.0,
        PhysicsConfig(),
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.pt), np.asarray(out_single.pt), rtol=2e-6,
        atol=1e-5,
    )
