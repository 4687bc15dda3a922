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
    ReservoirConfig,
    ReservoirIncrementOnlyStepper,
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


def test_incrementer_time_averages_at_reservoir_cadence():
    """The incrementer accumulates model-step inputs and fires the
    reservoir with their average every reservoir_timestep_seconds."""
    import datetime

    fired = []

    class FakeSpatialModel:
        divider = object()  # marks the model as spatial/subdomain
        input_variables = ["a"]

        def increment(self, u):
            fired.append(np.asarray(u))

    model = FakeSpatialModel()
    rc = ReservoirConfig(reservoir_timestep_seconds=1800.0)
    inc = ReservoirIncrementOnlyStepper(model, rc)
    t0 = datetime.datetime(2020, 1, 1)
    dt = datetime.timedelta(seconds=900)

    def state_with(value):
        arr = jnp.full((6, 4, 4), value)  # [tile, y, x]
        return {"a": Quantity(arr, ("tile", "y", "x"))}

    inc(t0, state_with(1.0))          # first call always fires
    assert len(fired) == 1
    np.testing.assert_allclose(fired[0], 1.0)
    inc(t0 + dt, state_with(2.0))     # accumulates (900 < 1800 elapsed)
    assert len(fired) == 1
    inc(t0 + 2 * dt, state_with(4.0))  # 1800 s elapsed: fires the average
    assert len(fired) == 2
    np.testing.assert_allclose(fired[1], 3.0)  # mean of 2.0 and 4.0
    assert inc.completed_sync_steps == 2
    assert inc._fsm.pending_predict


# ----------------------------------------------------- subdomain reservoir
def _cube_series(nt=240, n=8, nf=2, seed=0):
    """Smooth traveling pattern on the cube (learnable one-step map)."""
    rng = np.random.RandomState(seed)
    base = rng.randn(6, n, n, nf).astype(np.float32)
    out = np.empty((nt, 6, n, n, nf), np.float32)
    for t in range(nt):
        out[t] = np.roll(base, t, axis=2) + 0.01 * rng.randn(6, n, n, nf)
    return out


def test_subdomain_reservoir_train_predict_roundtrip(tmp_path):
    from fv3net_tpu.fit.reservoir import (
        SubdomainReservoirHyperparameters,
        SubdomainReservoirModel,
        train_subdomain_reservoir,
    )

    series = _cube_series()
    u, y = series[:-1], series[1:]
    ds = Dataset(
        {
            "inputs": Quantity(jnp.asarray(u), ("time", "tile", "y", "x", "f")),
            "outputs": Quantity(jnp.asarray(y), ("time", "tile", "y", "x", "f")),
        }
    )
    hp = SubdomainReservoirHyperparameters(
        subdomain_layout=(2, 2),
        overlap=1,
        reservoir=ReservoirHyperparameters(
            state_size=100, seed=3, l2_regularization=1e-3
        ),
        hybrid=True,
    )
    model = train_subdomain_reservoir(hp, [ds])
    assert model.divider.n_subdomains == 24
    # stateful increment/predict on cube fields
    model.reset_state()
    for t in range(10):
        model.increment(jnp.asarray(series[t]))
    pred = model.predict_from_state(jnp.asarray(series[9]))
    assert pred.shape == (6, 8, 8, 2)
    # the one-step map is learnable: beat the persistence baseline
    err = float(jnp.abs(pred - series[10]).mean())
    persist = float(jnp.abs(series[9] - series[10]).mean())
    assert err < persist
    # dump/load roundtrip preserves predictions
    fit.dump(model, str(tmp_path / "m"))
    loaded = fit.load(str(tmp_path / "m"))
    assert isinstance(loaded, SubdomainReservoirModel)
    loaded.reset_state()
    for t in range(10):
        loaded.increment(jnp.asarray(series[t]))
    pred2 = loaded.predict_from_state(jnp.asarray(series[9]))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2), atol=1e-6)


def test_subdomain_reservoir_steppers_in_loop():
    """Spatial reservoir increment/predict through the runtime steppers."""
    from fv3net_tpu.fit.reservoir import (
        SubdomainReservoirHyperparameters,
        train_subdomain_reservoir,
    )
    from fv3net_tpu.runtime import TimeLoop
    from fv3net_tpu.runtime.config import NamelistConfig, UserConfig
    from fv3net_tpu.runtime.steppers.reservoir import (
        ReservoirConfig,
        ReservoirIncrementOnlyStepper,
        ReservoirPredictStepper,
    )

    nz = 8
    rng = np.random.RandomState(0)
    nt, n = 20, 6
    series = rng.randn(nt, 6, n, n, nz).astype(np.float32) * 0.01 + 250.0
    ds = Dataset(
        {
            "inputs": Quantity(
                jnp.asarray(series[:-1]), ("time", "tile", "y", "x", "f")
            ),
            "outputs": Quantity(
                jnp.asarray(series[1:]), ("time", "tile", "y", "x", "f")
            ),
        }
    )
    hp = SubdomainReservoirHyperparameters(
        input_variables=["air_temperature"],
        output_variables=["air_temperature"],
        subdomain_layout=(1, 1),
        overlap=1,
        reservoir=ReservoirHyperparameters(state_size=64, seed=0),
    )
    model = train_subdomain_reservoir(hp, [ds])
    cfg = UserConfig(
        namelist=NamelistConfig(npx=n, npz=nz), duration_seconds=1800.0
    )
    rc = ReservoirConfig(synchronize_steps=1)
    inc = ReservoirIncrementOnlyStepper(model, rc)
    pred = ReservoirPredictStepper(model, rc)

    loop = TimeLoop(cfg, prephysics_steppers=[inc], postphysics_stepper=pred)
    for _, diags in loop:
        pass
    assert inc.completed_sync_steps == 2


def test_reservoir_config_new_options(tmp_path):
    """rename_mapping / diagnostic_only / warm_start (reference
    reservoir.py:47-50 ReservoirConfig attributes)."""
    import datetime
    import os

    from fv3net_tpu.runtime.steppers.reservoir import (
        ReservoirPredictStepper,
        save_reservoir_state,
    )

    nz = 4

    class FakeModel:
        input_variables = ["T_model"]
        output_variables = ["T_model"]
        output_features = [nz]
        state = jnp.zeros((6 * 3 * 3, 16), jnp.float32)

        def reset_state(self, batch_shape=()):
            self.state = jnp.zeros(batch_shape + (16,), jnp.float32)

        def increment(self, u):
            pass

        def predict_from_state(self, u):
            return jnp.full((u.shape[0], nz), 5.0, jnp.float32)

    model = FakeModel()
    # warm_start: save a state, configure, and check it loads + skips sync
    model_dir = str(tmp_path)
    model.state = jnp.ones((6 * 3 * 3, 16), jnp.float32) * 7.0
    save_reservoir_state(model, model_dir)
    model.reset_state((6 * 3 * 3,))
    rc = ReservoirConfig(
        model_path=model_dir,
        synchronize_steps=100,  # would normally gate prediction off
        rename_mapping={"T_model": "air_temperature"},
        diagnostic_only=True,
        warm_start=True,
    )
    inc = ReservoirIncrementOnlyStepper(model, rc)
    pred = ReservoirPredictStepper(model, rc)
    assert float(np.asarray(model.state)[0, 0]) == 7.0  # restored
    t0 = datetime.datetime(2020, 1, 1)
    state = {
        "air_temperature": Quantity(
            jnp.full((6, nz, 3, 3), 250.0), ("tile", "z", "y", "x")
        ),
        "pressure_thickness_of_atmospheric_layer": Quantity(
            jnp.full((6, nz, 3, 3), 100.0), ("tile", "z", "y", "x")
        ),
    }
    inc(t0, state)  # pulls the RENAMED input without KeyError
    tend, diags, updates = pred(t0, state)
    # diagnostic_only: prediction lands in diags under the run-side name
    assert updates == {}
    assert "air_temperature_reservoir_prediction" in diags
    q = diags["air_temperature_reservoir_prediction"]
    assert q.data.shape == (6, nz, 3, 3)
    np.testing.assert_allclose(np.asarray(q.data), 5.0)


def test_latent_subdomain_reservoir(tmp_path):
    """Latent-space reservoir: ESN trained on PCA-encoded features,
    predictions decoded back (reference reservoir/transformers usage)."""
    from fv3net_tpu.fit import io as fit_io
    from fv3net_tpu.fit.reservoir import (
        SubdomainReservoirHyperparameters,
        train_subdomain_reservoir,
    )
    from fv3net_tpu.fit.transformers import PCATransformer

    series = _cube_series(nt=200, n=8, nf=6, seed=0)  # [t, 6, y, x, 6]
    # fit a transformer on the raw features (rank ~<= 6 here)
    pca = PCATransformer.fit([series.reshape(-1, 6)], n_components=4)
    tpath = str(tmp_path / "pca")
    fit_io.dump(pca, tpath)

    hp = SubdomainReservoirHyperparameters(
        subdomain_layout=(2, 2),
        overlap=1,
        reservoir=ReservoirHyperparameters(state_size=128, seed=0),
        transformer_path=tpath,
    )
    ds = Dataset(
        {
            "inputs": Quantity(
                jnp.asarray(series[:-1]), ("time", "tile", "y", "x", "f")
            ),
            "outputs": Quantity(
                jnp.asarray(series[1:]), ("time", "tile", "y", "x", "f")
            ),
        }
    )
    model = train_subdomain_reservoir(hp, [ds])
    assert model.n_features_out == 4  # latent width
    # online-style increment + predict returns RAW feature width
    model.reset_state()
    for t in range(20):
        model.increment(jnp.asarray(series[t]))
    pred = model.predict_from_state()
    assert pred.shape == (6, 8, 8, 6)
    target = series[20]
    base_err = float(np.mean((series[19] - target) ** 2))
    err = float(np.mean((np.asarray(pred) - target) ** 2))
    assert err < base_err, (err, base_err)  # beats persistence
    # dump/load roundtrip preserves the transformer
    mdir = str(tmp_path / "model")
    fit_io.dump(model, mdir)
    back = fit_io.load(mdir)
    assert back.transformer is not None
    back.reset_state()
    for t in range(20):
        back.increment(jnp.asarray(series[t]))
    np.testing.assert_allclose(
        np.asarray(back.predict_from_state()), np.asarray(pred), rtol=1e-5,
        atol=1e-6,
    )
