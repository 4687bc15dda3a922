"""Cube -> lat-lon regrid tests (fregrid replacement)."""
import numpy as np
import jax
import jax.numpy as jnp

from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.ops.regrid_latlon import CubeToLatLon

jax.config.update("jax_enable_x64", True)


def test_constant_field_preserved():
    grid = make_grid(16)
    r = CubeToLatLon(grid, nlat=45, nlon=90)
    out = np.asarray(r(jnp.full((6, 16, 16), 5.0)))
    valid = ~np.isnan(out)
    assert valid.mean() > 0.99  # nearly all boxes covered
    np.testing.assert_allclose(out[valid], 5.0, rtol=1e-12)


def test_global_conservation():
    grid = make_grid(16)
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.rand(6, 16, 16))
    r = CubeToLatLon(grid, nlat=45, nlon=90, subsample=2)
    total_src = float((np.asarray(field) * grid.area).sum())
    total_dst = float(np.asarray(r.conservative_sum(field)).sum())
    np.testing.assert_allclose(total_dst, total_src, rtol=1e-12)


def test_zonal_structure_recovered():
    grid = make_grid(24)
    field = jnp.asarray(np.sin(grid.lat))  # f(lat)
    r = CubeToLatLon(grid, nlat=30, nlon=60, subsample=3)
    out = np.asarray(r(field))
    lat = np.deg2rad(r.lat)
    want = np.sin(lat)[:, None]
    valid = ~np.isnan(out)
    err = np.abs(out - want)[valid]
    assert err.max() < 0.12  # first-order accuracy at C24/6-deg boxes
    assert np.median(err) < 0.03


def test_batched_leading_dims():
    grid = make_grid(8)
    r = CubeToLatLon(grid, nlat=20, nlon=40)
    field = jnp.asarray(np.random.RandomState(1).rand(3, 6, 8, 8))
    out = np.asarray(r(field))
    assert out.shape == (3, 20, 40)
    single = np.asarray(r(field[0]))
    np.testing.assert_allclose(out[0][~np.isnan(single)],
                               single[~np.isnan(single)])
