"""Jacobian diagnostics, streamfunction, point sampling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model
from fv3net_tpu.fit.jacobian import compute_jacobians
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.ops import thermo
from fv3net_tpu.ops.regrid_latlon import CubeToLatLon

jax.config.update("jax_enable_x64", True)


def test_jacobian_of_linear_model_recovers_weights():
    rng = np.random.RandomState(0)
    n, nz = 4000, 4
    a = rng.randn(n, nz)
    # out = A @ a with known A
    A = np.array(
        [[2.0, 0, 0, 0], [0, -1.0, 0, 0], [0.5, 0, 1.0, 0], [0, 0, 0, 3.0]]
    )
    out = a @ A.T
    ds = Dataset(
        {
            "a": Quantity(jnp.asarray(a), ("sample", "z")),
            "out": Quantity(jnp.asarray(out), ("sample", "z")),
        }
    )
    hp = DenseHyperparameters(
        input_variables=["a"], output_variables=["out"],
        hidden_layers=1, width=64, epochs=60, learning_rate=5e-3,
    )
    model = train_dense_model(hp, [ds])
    # a ReLU net's pointwise Jacobian is piecewise constant; average over
    # base points drawn from the input distribution
    Js = []
    for k in range(16):
        J = compute_jacobians(model, {"a": a[k]})
        Js.append(np.asarray(J["out"]["a"]))
    got = np.mean(Js, axis=0)
    assert got.shape == (nz, nz)
    np.testing.assert_allclose(got, A, atol=0.3)


def test_mass_streamfunction_shape_and_sign():
    nlat, nlev = 10, 8
    pressure = np.linspace(1e4, 1e5, nlev)
    lat = np.linspace(-80, 80, nlat)[:, None]
    v = np.ones((nlat, nlev))
    psi = np.asarray(thermo.mass_streamfunction(v, pressure, lat, axis=-1))
    assert psi.shape == (nlat, nlev)
    # positive v -> psi increases with depth; scaled by cos(lat)
    assert (np.diff(psi, axis=-1) >= 0).all()
    assert abs(psi[0, -1]) < abs(psi[nlat // 2, -1])


def test_sample_points_nearest():
    grid = make_grid(16)
    r = CubeToLatLon(grid, nlat=10, nlon=20)
    field = jnp.asarray(np.sin(grid.lat))
    lat = np.array([0.0, 45.0, -60.0])
    lon = np.array([10.0, 100.0, 250.0])
    out = np.asarray(r.sample_points(field, lat, lon))
    want = np.sin(np.deg2rad(lat))
    np.testing.assert_allclose(out, want, atol=0.06)
