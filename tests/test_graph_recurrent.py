"""Graph network + autoregressive (FMR) trainer tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.graph import GraphHyperparameters, train_graph_network
from fv3net_tpu.fit.recurrent import (
    RecurrentHyperparameters,
    train_autoregressive_model,
)


def test_graph_learns_neighbor_average(tmp_path):
    """Target = neighbor mean of input: exactly representable by one
    message-passing layer."""
    from fv3net_tpu.fit.graph import _neighbor_mean

    rng = np.random.RandomState(0)
    nt, nz, n = 2, 2, 8
    a = jnp.asarray(rng.randn(nt, 6, nz, n, n))
    # build target via the same aggregation (channels last)
    ach = jnp.moveaxis(a, 2, -1)
    out = jnp.stack([_neighbor_mean(ach[t]) for t in range(nt)])
    out = jnp.moveaxis(out, -1, 2)
    ds = Dataset(
        {
            "a": Quantity(a, ("time", "tile", "z", "y", "x")),
            "out": Quantity(out, ("time", "tile", "z", "y", "x")),
        }
    )
    hp = GraphHyperparameters(
        input_variables=["a"], output_variables=["out"],
        hidden_width=32, n_message_passing=2, epochs=120,
        learning_rate=4e-3,
    )
    model = train_graph_network(hp, [ds])
    pred = model.predict(ds)
    err = np.asarray(pred["out"].data) - np.asarray(out)
    rmse = float(np.sqrt((err ** 2).mean()))
    assert rmse < 0.3 * float(np.asarray(out).std())
    # roundtrip
    path = str(tmp_path / "graph")
    fit.dump(model, path)
    p2 = fit.load(path).predict(ds)
    np.testing.assert_allclose(
        np.asarray(pred["out"].data), np.asarray(p2["out"].data), atol=1e-5
    )


def test_fmr_learns_linear_dynamics(tmp_path):
    """s_{t+1} = 0.9 s_t: learnable exactly by the residual MLP."""
    rng = np.random.RandomState(0)
    # short windows from many random initial states so the training data
    # covers state space uniformly
    nt, ns, nz = 6, 1000, 3
    s0 = rng.randn(ns, nz)
    series = np.stack([s0 * 0.9 ** t for t in range(nt)])
    ds = Dataset(
        {"T": Quantity(jnp.asarray(series), ("time", "sample", "z"))}
    )
    hp = RecurrentHyperparameters(
        state_variables=["T"], hidden_layers=1, width=64,
        train_window=3, epochs=150, learning_rate=5e-3,
    )
    model = train_autoregressive_model(hp, [ds])
    # one-step prediction: RMSE well below the state scale
    X = Dataset({"T": Quantity(jnp.asarray(series[0]), ("sample", "z"))})
    pred = np.asarray(model.predict(X)["T"].data)
    rmse = float(np.sqrt(((pred - series[1]) ** 2).mean()))
    assert rmse < 0.08
    # multi-step rollout stays close
    from fv3net_tpu.fit import packer

    S0, _ = packer.pack({"T": jnp.asarray(series[0])}, ["T"])
    traj = np.asarray(model.rollout(S0, 5))
    roll_rmse = float(
        np.sqrt(((traj[4] - series[5].reshape(ns, nz)) ** 2).mean())
    )
    assert roll_rmse < 0.25
    # roundtrip
    path = str(tmp_path / "fmr")
    fit.dump(model, path)
    loaded = fit.load(path)
    np.testing.assert_allclose(
        np.asarray(loaded.predict(X)["T"].data), pred, atol=1e-6
    )
