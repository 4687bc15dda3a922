"""Convolutional trainer tests (reference contract: transpose/halo
behavior of keras convolutional nets, fv3fit tests/training/
test_train.py:253)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.convolutional import (
    ConvolutionalHyperparameters,
    halos_required,
    train_convolutional_model,
)


def make_batch(nt=2, nz=3, n=8, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(nt, 6, nz, n, n)
    sfc = rng.randn(nt, 6, n, n)
    # target: local linear function of inputs -> learnable by 1 conv layer
    out = 2.0 * a + 1.0
    return Dataset(
        {
            "a": Quantity(jnp.asarray(a), ("time", "tile", "z", "y", "x")),
            "sfc": Quantity(jnp.asarray(sfc), ("time", "tile", "y", "x")),
            "out": Quantity(jnp.asarray(out), ("time", "tile", "z", "y", "x")),
        }
    )


def hp(**kw):
    d = dict(
        input_variables=["a", "sfc"],
        output_variables=["out"],
        filters=16,
        depth=2,
        kernel_size=3,
        epochs=60,
        learning_rate=5e-3,
    )
    d.update(kw)
    return ConvolutionalHyperparameters(**d)


def test_halos_required():
    assert halos_required(3, 3) == 3
    assert halos_required(2, 5) == 4


def test_train_learns_local_function():
    batch = make_batch()
    model = train_convolutional_model(hp(), [batch])
    pred = model.predict(batch)
    err = np.asarray(pred["out"].data) - np.asarray(batch["out"].data)
    rmse = float(np.sqrt((err ** 2).mean()))
    scale = float(np.asarray(batch["out"].data).std())
    assert rmse < 0.35 * scale


def test_predict_shape_and_roundtrip(tmp_path):
    batch = make_batch()
    model = train_convolutional_model(hp(epochs=2), [batch])
    pred = model.predict(batch)
    assert pred["out"].dims == ("time", "tile", "z", "y", "x")
    assert pred["out"].shape == batch["out"].shape
    path = str(tmp_path / "conv")
    fit.dump(model, path)
    loaded = fit.load(path)
    p2 = loaded.predict(batch)
    np.testing.assert_allclose(
        np.asarray(pred["out"].data), np.asarray(p2["out"].data), rtol=2e-6,
        atol=1e-6,
    )


def test_halo_makes_prediction_continuous_across_tiles():
    """A conv model's output at tile edges uses real neighbor data (from
    the halo gather), so predicting on a smooth global field gives smooth
    output across tile boundaries."""
    from fv3net_tpu.grid.geometry import make_grid

    n = 8
    grid = make_grid(n)
    smooth = np.sin(grid.lat)[:, None][None] * np.ones((1, 6, 3, n, n))
    batch = Dataset(
        {
            "a": Quantity(jnp.asarray(smooth), ("time", "tile", "z", "y", "x")),
            "sfc": Quantity(jnp.asarray(smooth[:, :, 0]),
                            ("time", "tile", "y", "x")),
            "out": Quantity(jnp.asarray(smooth),
                            ("time", "tile", "z", "y", "x")),
        }
    )
    model = train_convolutional_model(hp(epochs=30), [batch])
    pred = np.asarray(model.predict(batch)["out"].data)
    # no large jumps at tile edge columns relative to interior variability
    interior_jump = np.abs(np.diff(pred[0, :, 0], axis=-1)).max()
    assert np.isfinite(pred).all()
    assert interior_jump < 1.0
