"""scream_run driver: config surface, qv constraint, CLI end-to-end."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.scream_run import (
    MachineLearningConfig,
    ScreamConfig,
    predict_with_qv_constraint,
)
from fv3net_tpu.scream_run.ml import enforce_non_negative_humidity


def test_scream_config_surface():
    cfg = ScreamConfig.from_dict(
        {
            "CASE_NAME": "c1",
            "RESOLUTION": "ne4pg2_ne4pg2",
            "ATM_NCPL": 96,
            "RUNTIME": {"STOP_OPTION": "nsteps", "STOP_N": 3},
        }
    )
    assert cfg.npx == 8
    assert cfg.dt_atmos == 900.0
    assert cfg.duration_seconds == 2700.0
    with pytest.raises(ValueError):
        ScreamConfig(initial_conditions_type="cloud")


def test_qv_constraint_prevents_negative_humidity():
    q = jnp.full((4, 5), 1e-4)
    dq2 = jnp.full((4, 5), -1e-6)  # would drive qv negative in 900 s
    state = {"qv": Quantity(q, ("y", "z"))}
    pred = Dataset({"dQ2": Quantity(dq2, ("y", "z")),
                    "dQ1": Quantity(jnp.zeros_like(dq2), ("y", "z"))})
    out = enforce_non_negative_humidity(pred, state, dt=900.0)
    q_after = q + 900.0 * jnp.asarray(out["dQ2"].data)
    assert float(q_after.min()) >= -1e-12
    # MSE-conserving limiter moved the trimmed moistening into heating
    assert float(jnp.abs(jnp.asarray(out["dQ1"].data)).max()) > 0.0


def test_write_rundir_and_run_cli(tmp_path):
    from fv3net_tpu import fit
    from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model
    from fv3net_tpu.scream_run.cli import main

    # train a tiny SCREAM-named corrective model
    rng = np.random.RandomState(0)
    n, nz = 128, 8
    batch = Dataset(
        {
            "T_mid": Quantity(
                jnp.asarray(260 + 20 * rng.rand(n, nz), jnp.float32),
                ("sample", "z"),
            ),
            "qv": Quantity(
                jnp.asarray(1e-3 * rng.rand(n, nz), jnp.float32),
                ("sample", "z"),
            ),
            "dQ1": Quantity(
                jnp.asarray(1e-6 * rng.randn(n, nz), jnp.float32),
                ("sample", "z"),
            ),
            "dQ2": Quantity(
                jnp.asarray(1e-9 * rng.randn(n, nz), jnp.float32),
                ("sample", "z"),
            ),
        }
    )
    hp = DenseHyperparameters(
        input_variables=["T_mid", "qv"],
        output_variables=["dQ1", "dQ2"],
        hidden_layers=1,
        width=16,
        epochs=1,
    )
    model = train_dense_model(hp, [batch])
    model_path = str(tmp_path / "model")
    fit.dump(model, model_path)

    cfg = {
        "CASE_NAME": "tpu_case",
        "RESOLUTION": "ne3pg2_ne3pg2",
        "ATM_NCPL": 96,
        "npz": nz,
        "RUNTIME": {"STOP_OPTION": "nsteps", "STOP_N": 2},
        "machine_learning": {"models": [model_path]},
    }
    cfg_path = str(tmp_path / "scream.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    rundir = str(tmp_path / "rundir")
    assert main(["write-rundir", cfg_path, rundir]) == 0
    assert os.path.exists(os.path.join(rundir, "scream_config.yaml"))
    assert os.path.exists(os.path.join(rundir, "run_case.sh"))

    assert main(["run", os.path.join(rundir, "scream_config.yaml"),
                 rundir]) == 0


def test_output_scaling_applied_before_constraint():
    """MachineLearningConfig.scaling factors multiply the named outputs
    (previously a silently ignored config key)."""
    from fv3net_tpu.scream_run.ml import predict

    class FakeModel:
        input_variables = ["qv"]
        output_variables = ["dQ1", "dQ2"]

        def predict(self, X):
            shape = jnp.asarray(X["qv"].data).shape
            return Dataset({
                "dQ1": Quantity(jnp.full(shape, 2.0), ("y", "z")),
                "dQ2": Quantity(jnp.full(shape, 4.0), ("y", "z")),
            })

    state = {"qv": Quantity(jnp.full((3, 5), 1e-3), ("y", "z"))}
    out = predict(FakeModel(), state, scaling={"dQ2": 0.5})
    np.testing.assert_allclose(np.asarray(out["dQ1"].data), 2.0)
    np.testing.assert_allclose(np.asarray(out["dQ2"].data), 2.0)
