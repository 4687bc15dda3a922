"""Wind staggering/rotation ingestion helpers + obs-nudging mapper."""
import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.ops import winds


def test_center_d_grid_winds():
    x_wind = np.arange(12.0).reshape(3, 4)  # [ny+1=3, nx=4] -> ny=2
    y_wind = np.arange(15.0).reshape(3, 5)  # [ny=3, nx+1=5] -> nx=4
    xc, yc = winds.center_d_grid_winds(jnp.asarray(x_wind), jnp.asarray(y_wind))
    assert xc.shape == (2, 4) and yc.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(xc)[0, 0], 0.5 * (0 + 4))
    np.testing.assert_allclose(np.asarray(yc)[0, 0], 0.5 * (0 + 1))


def test_rotation_identity_coefficients():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3))
    y = jnp.asarray(np.random.RandomState(1).rand(2, 3))
    one = jnp.ones((2, 3))
    zero = jnp.zeros((2, 3))
    e, n = winds.rotate_xy_winds(x, y, one, zero, zero, one)
    np.testing.assert_allclose(np.asarray(e), np.asarray(x))
    np.testing.assert_allclose(np.asarray(n), np.asarray(y))


def test_cartesian_local_roundtrip():
    from fv3net_tpu.grid.geometry import make_grid

    grid = make_grid(6)
    east = jnp.asarray(np.moveaxis(grid.east, -1, 0))
    north = jnp.asarray(np.moveaxis(grid.north, -1, 0))
    rng = np.random.RandomState(2)
    u = jnp.asarray(rng.randn(6, 6, 6))
    v = jnp.asarray(rng.randn(6, 6, 6))
    xyz = winds.local_to_cartesian(u, v, east, north)
    u2, v2 = winds.cartesian_to_local(xyz, east, north)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-6)


def test_open_nudge_to_obs(tmp_path):
    from fv3net_tpu.loaders.mappers import open_nudge_to_obs

    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "air_temperature": Quantity(
                rng.rand(2, 6, 3, 4, 4).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            ),
            "t_dt_nudge": Quantity(
                rng.rand(2, 6, 3, 4, 4).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            ),
        }
    )
    p = str(tmp_path / "obs.zarr")
    zarrio.to_zarr(ds, p)
    mapper = open_nudge_to_obs(p)
    out = mapper["0"]
    assert "dQ1" in out and "air_temperature" in out
