"""Per-host sharded zarr IO on the virtual 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fv3net_tpu.core.sharded_io import read_sharded, write_sharded
from fv3net_tpu.core.zarrio import ZarrGroup, open_zarr
from fv3net_tpu.parallel.sharded import FV_AXIS, FV_X_AXIS, make_mesh


def test_write_and_read_sharded_roundtrip(tmp_path):
    mesh = make_mesh(8)  # (4, 2) 2-D layout
    rng = np.random.RandomState(0)
    full = rng.randn(6, 4, 16, 8).astype(np.float32)  # [tile, z, y, x]
    sharding = NamedSharding(mesh, P(None, None, FV_AXIS, FV_X_AXIS))
    arr = jax.device_put(jnp.asarray(full), sharding)
    assert len(arr.addressable_shards) == 8

    group = ZarrGroup.create(str(tmp_path / "s.zarr"))
    za = write_sharded(group, "delp", arr, dims=("tile", "z", "y", "x"))
    # chunks align with shard boundaries -> lock-free parallel writes
    assert za.chunks == (6, 4, 4, 4)

    # a plain (unsharded) reader sees the full array
    ds = open_zarr(str(tmp_path / "s.zarr"))
    np.testing.assert_array_equal(np.asarray(ds["delp"].values), full)

    # distributed read reconstructs the sharded array
    back = read_sharded(group, "delp", sharding)
    assert back.sharding.is_equivalent_to(sharding, ndim=4)
    np.testing.assert_array_equal(np.asarray(back), full)


def test_write_sharded_replicated_array(tmp_path):
    """Replicated arrays write each region exactly once (replica 0)."""
    mesh = make_mesh(8)
    full = np.arange(24, dtype=np.float32).reshape(6, 4)
    arr = jax.device_put(jnp.asarray(full), NamedSharding(mesh, P()))
    group = ZarrGroup.create(str(tmp_path / "r.zarr"))
    write_sharded(group, "area", arr, dims=("tile", "x"))
    ds = open_zarr(str(tmp_path / "r.zarr"))
    np.testing.assert_array_equal(np.asarray(ds["area"].values), full)


def test_incremental_overwrite(tmp_path):
    """Second write to an existing array updates regions in place (the
    ZarrMonitor store-per-step pattern)."""
    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P(None, FV_AXIS))
    group = ZarrGroup.create(str(tmp_path / "t.zarr"))
    a = jax.device_put(jnp.zeros((6, 16), jnp.float32), sharding)
    write_sharded(group, "v", a, dims=("tile", "y"))
    b = jax.device_put(jnp.ones((6, 16), jnp.float32), sharding)
    write_sharded(group, "v", b, dims=("tile", "y"))
    ds = open_zarr(str(tmp_path / "t.zarr"))
    np.testing.assert_array_equal(np.asarray(ds["v"].values), 1.0)
