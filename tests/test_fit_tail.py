"""Tests for the fv3fit API tail: optimizer/schedule/regularizer configs,
network-builder configs + fused training loop, input sensitivity, and
the dataset-loader registry (FromBatches / WindowedZarrLoader /
SyntheticNoise).

Reference semantics: external/fv3fit/fv3fit/{_shared/config.py,
_shared/input_sensitivity.py,keras/_models/shared/*,data/*}.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.zarrio import to_zarr
from fv3net_tpu import fit


def test_optimizer_config_instance():
    opt = fit.OptimizerConfig("adam", {"learning_rate": 1e-2}).instance
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    grads = {"w": jnp.ones(3)}
    updates, _ = opt.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    with pytest.raises(ValueError):
        fit.OptimizerConfig("definitely_not_an_optimizer").instance


def test_learning_rate_schedule_config():
    sched = fit.LearningRateScheduleConfig(
        "exponential_decay",
        {"init_value": 1e-3, "transition_steps": 10, "decay_rate": 0.5},
    ).instance
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(5e-4)
    opt = fit.OptimizerConfig(
        "sgd",
        learning_rate_schedule=fit.LearningRateScheduleConfig(
            "constant_schedule", {"value": 0.1}
        ),
    ).instance
    assert opt.init({"w": jnp.ones(2)}) is not None


def test_regularizer_config_penalty():
    params = [{"w": jnp.ones((2, 2)), "b": jnp.ones(2)}]
    assert float(fit.RegularizerConfig("none").penalty(params)) == 0.0
    l2 = fit.RegularizerConfig("l2", {"l2": 0.5}).penalty(params)
    assert float(l2) == pytest.approx(0.5 * 4.0)  # biases excluded
    l1l2 = fit.RegularizerConfig("l1_l2", {"l1": 1.0, "l2": 1.0}).penalty(params)
    assert float(l1l2) == pytest.approx(4.0 + 4.0)


def test_dense_network_config_build_and_apply():
    cfg = fit.DenseNetworkConfig(width=16, depth=3)
    net = cfg.build(jax.random.PRNGKey(0), n_features_in=4, n_features_out=2)
    assert len(net.params) == 3  # 2 hidden + output
    y = net(jnp.ones((7, 4)))
    assert y.shape == (7, 2)


def test_convolutional_network_halos_and_apply():
    cfg = fit.ConvolutionalNetworkConfig(filters=4, depth=3, kernel_size=3)
    assert cfg.halos_required == 2
    net = cfg.build(jax.random.PRNGKey(0), n_channels_in=2, n_channels_out=1)
    x = jnp.ones((1, 10, 10, 2))
    y = net(x)
    assert y.shape == (1, 6, 6, 1)  # two valid 3x3 convs eat 2 cells/side


def test_loss_config_scalings():
    std = jnp.array([1.0, 2.0])
    pred = jnp.array([[1.0, 2.0]])
    target = jnp.zeros((1, 2))
    mse_u = fit.LossConfig("mse", "standard_uniform").loss(std)(pred, target)
    assert float(mse_u) == pytest.approx(((1 / 1.5) ** 2 + (2 / 1.5) ** 2) / 2)
    mse_s = fit.LossConfig("mse", "standard").loss(std)(pred, target)
    assert float(mse_s) == pytest.approx((1.0 + 1.0) / 2)
    mae = fit.LossConfig("mae", "standard", weight=2.0).loss(std)(pred, target)
    assert float(mae) == pytest.approx(2.0 * (1.0 + 1.0) / 2)


def test_training_loop_learns_linear_map():
    rng = np.random.RandomState(0)
    W = np.array([[2.0], [-1.0]])
    X = rng.randn(256, 2).astype(np.float32)
    y = X @ W
    params = {"w": jnp.zeros((2, 1))}

    def loss_fn(p, xb, yb):
        return jnp.mean((xb @ p["w"] - yb) ** 2)

    seen = []
    loop = fit.TrainingLoopConfig(epochs=20, batch_size=32)
    trained, results = loop.fit_loop(
        loss_fn,
        params,
        jnp.asarray(X),
        jnp.asarray(y),
        optimizer=fit.OptimizerConfig("adam", {"learning_rate": 0.05}).instance,
        validation_data=(X[:16], y[:16]),
        callbacks=[lambda r: seen.append(r.epoch)],
    )
    assert seen == list(range(20))
    assert results[-1].epoch_logs["loss"] < results[0].epoch_logs["loss"]
    assert results[-1].epoch_logs["val_loss"] < 1e-2
    np.testing.assert_allclose(np.asarray(trained["w"]), W, atol=0.1)


def _train_tiny_dense(tmp_path):
    rng = np.random.RandomState(0)
    shape = (32, 5)
    ds = Dataset(
        {
            "a": Quantity(rng.rand(*shape).astype(np.float32), ("sample", "z")),
            "b": Quantity(rng.rand(*shape).astype(np.float32), ("sample", "z")),
        }
    )
    hp = fit.DenseHyperparameters(
        input_variables=["a"], output_variables=["b"], epochs=2, width=8
    )
    train = fit.get_training_function("dense")
    return train(hp, [ds], None)


def test_input_sensitivity_jacobian(tmp_path):
    model = _train_tiny_dense(tmp_path)
    sens = fit.input_sensitivity(model, {"a": np.zeros(5, np.float32)})
    assert sens.rf_feature_importances is None
    assert set(sens.jacobians) == {"b"}
    assert sens.jacobians["b"]["a"].shape == (5, 5)


def test_input_sensitivity_random_forest():
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "a": Quantity(rng.rand(64, 3).astype(np.float32), ("sample", "z")),
            "b": Quantity(rng.rand(64).astype(np.float32), ("sample",)),
        }
    )
    hp_cls = fit.get_hyperparameter_class("sklearn_random_forest")
    hp = hp_cls(
        input_variables=["a"], output_variables=["b"], n_estimators=3, max_depth=3
    )
    model = fit.get_training_function("sklearn_random_forest")(hp, [ds], None)
    sens = fit.input_sensitivity(model, {})
    imp = sens.rf_feature_importances
    assert imp is not None and "a" in imp
    assert len(imp["a"].mean_importances) == 3
    total = sum(v for k in imp for v in imp[k].mean_importances)
    assert total == pytest.approx(1.0, abs=1e-6)


def test_from_batches_loader(tmp_path):
    path = str(tmp_path / "state.zarr")
    rng = np.random.RandomState(0)
    to_zarr(
        Dataset(
            {
                "air_temperature": Quantity(
                    rng.rand(2, 6, 3, 4, 4).astype(np.float32),
                    ("time", "tile", "z", "y", "x"),
                    "K",
                )
            }
        ),
        path,
    )
    loader = fit.tfdataset_loader_from_dict(
        {
            "mapper_config": {
                "function": "open_nudge_to_fine",
                "kwargs": {"state_zarr": path},
            },
            "timesteps_per_batch": 1,
        }
    )
    assert isinstance(loader, fit.FromBatches)
    seq = loader.open_tfdataset(None, ["air_temperature"])
    assert len(seq) == 2
    assert seq[0]["air_temperature"].dims == ("sample", "z")


def test_windowed_zarr_loader(tmp_path):
    path = str(tmp_path / "run.zarr")
    rng = np.random.RandomState(0)
    to_zarr(
        Dataset(
            {
                "T": Quantity(
                    rng.rand(10, 6, 4, 4, 3).astype(np.float32),
                    ("time", "tile", "y", "x", "z"),
                    "K",
                )
            }
        ),
        path,
    )
    loader = fit.tfdataset_loader_from_dict(
        {
            "data_path": path,
            "unstacked_dims": ["z"],
            "window_size": 4,
            "batch_size": 5,
            "time_stride": 2,
            "n_windows": 3,
        }
    )
    assert isinstance(loader, fit.WindowedZarrLoader)
    seq = loader.open_tfdataset(None, ["T"])
    assert len(seq) == 3
    rec = seq[0]
    assert rec["T"].dims == ("sample", "window", "z")
    assert rec["T"].shape == (5, 4, 3)


def test_synthetic_noise_loader():
    loader = fit.tfdataset_loader_from_dict(
        {"nsamples": 2, "nbatch": 3, "ntime": 4, "nx": 5, "nz": 6}
    )
    seq = loader.open_tfdataset(None, ["a", "b"])
    assert len(seq) == 2
    assert seq[1]["b"].shape == (3, 4, 5, 6)
