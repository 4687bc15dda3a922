"""Hyperparameter sweep (the wandb-sweep analog)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.sweep import expand_sweep, run_sweep


def test_expand_grid():
    trials = expand_sweep(
        {
            "method": "grid",
            "parameters": {
                "hyperparameters.width": {"values": [8, 16]},
                "hyperparameters.hidden_layers": {"values": [1, 2, 3]},
            },
        }
    )
    assert len(trials) == 6
    assert {t["hyperparameters.width"] for t in trials} == {8, 16}


def test_expand_random_log_uniform():
    trials = expand_sweep(
        {
            "method": "random",
            "count": 20,
            "parameters": {
                "hyperparameters.learning_rate": {
                    "min": 1e-4, "max": 1e-1,
                    "distribution": "log_uniform",
                },
                "hyperparameters.width": {"values": [8, 16]},
            },
        },
        seed=1,
    )
    assert len(trials) == 20
    lrs = [t["hyperparameters.learning_rate"] for t in trials]
    assert all(1e-4 <= v <= 1e-1 for v in lrs)
    # reproducible under the same seed
    again = expand_sweep(
        {
            "method": "random",
            "count": 20,
            "parameters": {
                "hyperparameters.learning_rate": {
                    "min": 1e-4, "max": 1e-1,
                    "distribution": "log_uniform",
                },
                "hyperparameters.width": {"values": [8, 16]},
            },
        },
        seed=1,
    )
    assert again == trials
    with pytest.raises(ValueError, match="unknown sweep method"):
        expand_sweep({"method": "bayes", "parameters": {}})


def test_run_sweep_trains_each_trial(tmp_path):
    from fv3net_tpu import fit

    rng = np.random.RandomState(0)
    n, nz = 64, 4
    batch = Dataset(
        {
            "air_temperature": Quantity(
                jnp.asarray(260 + 20 * rng.rand(n, nz), jnp.float32),
                ("sample", "z"),
            ),
            "dQ1": Quantity(
                jnp.asarray(1e-6 * rng.randn(n, nz), jnp.float32),
                ("sample", "z"),
            ),
        }
    )
    base = {
        "model_type": "dense",
        "hyperparameters": {
            "input_variables": ["air_temperature"],
            "output_variables": ["dQ1"],
            "width": 8,
            "hidden_layers": 1,
            "epochs": 1,
        },
    }
    results = run_sweep(
        base,
        {"method": "grid",
         "parameters": {"hyperparameters.width": {"values": [4, 8]}}},
        [batch],
        str(tmp_path),
    )
    assert all(r.ok for r in results)
    paths = sorted(r.value for r in results)
    assert len(paths) == 2
    for p in paths:
        model = fit.load(p)
        assert model.input_variables == ["air_temperature"]
