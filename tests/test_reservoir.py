"""Reservoir computing tests: ESN properties + training + stepper FSM."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.reservoir import (
    ReservoirHyperparameters,
    build_reservoir_matrices,
    train_hybrid_reservoir_model,
    train_reservoir_model,
)
from fv3net_tpu.runtime.steppers.reservoir import (
    TimeAverageInputs,
    _FiniteStateMachine,
)


def lorenz_series(n=2000, dt=0.01):
    """Chaotic test series (standard reservoir benchmark)."""
    xyz = np.array([1.0, 1.0, 1.0])
    out = np.empty((n, 3))
    for i in range(n):
        x, y, z = xyz
        d = np.array([10 * (y - x), x * (28 - z) - y, x * y - 8 / 3 * z])
        xyz = xyz + dt * d
        out[i] = xyz
    return (out - out.mean(0)) / out.std(0)


def test_spectral_radius_scaling():
    hp = ReservoirHyperparameters(state_size=100, spectral_radius=0.5, seed=1)
    _, W = build_reservoir_matrices(3, hp)
    eigs = np.abs(np.linalg.eigvals(np.asarray(W)))
    np.testing.assert_allclose(eigs.max(), 0.5, rtol=0.05)


def test_reservoir_predicts_chaotic_series_one_step():
    series = lorenz_series()
    u = series[:-1]
    y = series[1:]
    ds = Dataset(
        {
            "inputs": Quantity(jnp.asarray(u, jnp.float32), ("time", "f")),
            "outputs": Quantity(jnp.asarray(y, jnp.float32), ("time", "f")),
        }
    )
    hp = ReservoirHyperparameters(
        state_size=300, spectral_radius=0.9, leakage=0.8, n_burn=100, seed=0
    )
    model = train_hybrid_reservoir_model(hp, [ds])
    pred = np.asarray(model.predict(ds)["outputs"].data)
    err = pred[100:] - y[100:]
    rmse = float(np.sqrt((err ** 2).mean()))
    assert rmse < 0.1  # one-step-ahead on normalized Lorenz


def test_pure_vs_hybrid_and_roundtrip(tmp_path):
    series = lorenz_series(500)
    ds = Dataset(
        {
            "inputs": Quantity(jnp.asarray(series[:-1], jnp.float32),
                               ("time", "f")),
            "outputs": Quantity(jnp.asarray(series[1:], jnp.float32),
                                ("time", "f")),
        }
    )
    hp = ReservoirHyperparameters(state_size=200, n_burn=50)
    pure = train_reservoir_model(hp, [ds])
    hybrid = train_hybrid_reservoir_model(hp, [ds])
    p1 = np.asarray(pure.predict(ds)["outputs"].data)
    p2 = np.asarray(hybrid.predict(ds)["outputs"].data)
    assert p1.shape == p2.shape
    for model, name in ((pure, "pure"), (hybrid, "hybrid")):
        path = str(tmp_path / name)
        fit.dump(model, path)
        loaded = fit.load(path)
        out = np.asarray(loaded.predict(ds)["outputs"].data)
        want = np.asarray(model.predict(ds)["outputs"].data)
        np.testing.assert_allclose(out, want, rtol=1e-6)


def test_finite_state_machine_enforces_order():
    fsm = _FiniteStateMachine()
    with pytest.raises(ValueError, match="incremented before"):
        fsm(fsm.PREDICT)
    fsm(fsm.INCREMENT)
    fsm(fsm.PREDICT)
    with pytest.raises(ValueError):
        fsm(fsm.PREDICT)  # two predicts without a new increment
    assert fsm.completed_increments == 1


def test_time_average_inputs():
    avg = TimeAverageInputs(["a"])
    avg.increment({"a": jnp.asarray(1.0)})
    avg.increment({"a": jnp.asarray(3.0)})
    out = avg.get_averages()
    np.testing.assert_allclose(float(out["a"]), 2.0)
    with pytest.raises(ValueError):
        avg.get_averages()  # buffer was reset
