"""Per-output-variable prediction limiting (OutputLimitConfig).

Reference semantics: external/fv3fit/fv3fit/keras/_models/shared/
output_limit.py:11-71 — a zero-slope piecewise clamp applied to named
trainer outputs, configured per output variable, carried through
dump/load.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.config import OutputLimit, OutputLimitConfig


def test_output_limit_validation():
    with pytest.raises(ValueError):
        OutputLimit(min=1.0, max=0.0)
    with pytest.raises(ValueError):
        OutputLimit(min=1.0, max=1.0)


def test_output_limit_clamp_semantics():
    """Zero-slope clamp: below-min -> min, at/above-max -> max,
    interior passes through unchanged (reference _limit_activation)."""
    lim = OutputLimit(min=-1.0, max=2.0)
    x = jnp.asarray(np.array([-5.0, -1.0, 0.5, 2.0, 9.0], np.float32))
    out = np.asarray(lim.limit_array(x))
    np.testing.assert_allclose(out, [-1.0, -1.0, 0.5, 2.0, 2.0])
    # zero slope outside the bounds, unit slope inside (exactly AT a
    # bound the clip subgradient is 0.5 — probe strictly inside/outside)
    probe = jnp.asarray(np.array([-5.0, -0.9, 0.5, 1.9, 9.0], np.float32))
    g = jax.grad(lambda v: lim.limit_array(v).sum())(probe)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])
    # one-sided limits leave the other side open
    assert float(OutputLimit(min=0.0).limit_array(jnp.asarray(1e9))) == 1e9
    assert float(OutputLimit(max=0.0).limit_array(jnp.asarray(-1e9))) == -1e9
    # no-op config returns input unchanged
    assert OutputLimit().limit_array(x) is x


def test_output_limit_config_named_outputs():
    cfg = OutputLimitConfig(
        limits={"a": {"min": 0.0}, "b": OutputLimit(max=1.0)}
    )
    outs = {
        "a": jnp.asarray(np.array([-1.0, 2.0], np.float32)),
        "b": jnp.asarray(np.array([-1.0, 2.0], np.float32)),
        "c": jnp.asarray(np.array([-1.0, 2.0], np.float32)),
    }
    lim = cfg.apply_limits(outs)
    np.testing.assert_allclose(np.asarray(lim["a"]), [0.0, 2.0])
    np.testing.assert_allclose(np.asarray(lim["b"]), [-1.0, 1.0])
    # unlisted outputs pass through untouched
    np.testing.assert_allclose(np.asarray(lim["c"]), [-1.0, 2.0])


def test_output_limit_packed():
    cfg = OutputLimitConfig(limits={"q": {"min": 0.0, "max": 1.0}})
    info = fit.packer.PackingInfo(names=["t", "q"], features=[2, 3])
    Y = jnp.asarray(
        np.array([[-9.0, 9.0, -9.0, 0.5, 9.0]], np.float32)
    )
    out = np.asarray(cfg.limit_packed(Y, info))
    np.testing.assert_allclose(out, [[-9.0, 9.0, 0.0, 0.5, 1.0]])


def _train_identity_dense(tmp_path, output_limit_config):
    rng = np.random.RandomState(0)
    n = 256
    x = rng.uniform(-2, 2, size=(n,)).astype(np.float32)
    ds = Dataset(
        {
            "feature": Quantity(jnp.asarray(x), ("sample",)),
            "target": Quantity(jnp.asarray(x), ("sample",)),
        }
    )
    hp = fit.DenseHyperparameters(
        input_variables=["feature"],
        output_variables=["target"],
        hidden_layers=1,
        width=16,
        epochs=20,
        output_limit_config=output_limit_config,
    )
    train = fit.get_training_function("dense")
    return train(hp, [ds]), ds


def test_dense_trainer_output_limit_round_trip(tmp_path):
    """Config-driven limiting mirrors the reference: train-on-identity
    with a clamp, predictions obey the bounds, and the bounds survive
    fv3fit-style dump/load."""
    model, ds = _train_identity_dense(
        tmp_path, {"target": {"min": -0.5, "max": 0.5}}
    )
    pred = np.asarray(model.predict(ds)["target"].data)
    assert pred.min() >= -0.5 - 1e-6
    assert pred.max() <= 0.5 + 1e-6
    # identity mapping inside the bounds still learned
    x = np.asarray(ds["feature"].data)
    interior = np.abs(x) < 0.3
    assert np.abs(pred[interior] - x[interior]).max() < 0.2

    path = str(tmp_path / "model")
    fit.dump(model, path)
    loaded = fit.load(path)
    pred2 = np.asarray(loaded.predict(ds)["target"].data)
    np.testing.assert_allclose(pred2, pred, rtol=1e-6, atol=1e-6)


def test_dense_trainer_without_limits_unbounded(tmp_path):
    model, ds = _train_identity_dense(tmp_path, None)
    pred = np.asarray(model.predict(ds)["target"].data)
    assert pred.max() > 0.5  # identity fit exceeds the clamp range
    assert model.output_limits is None
