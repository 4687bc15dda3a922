"""End-to-end chain: train -> ML-corrected prognostic run -> diagnostics
report (the reference's integration-test shape,
tests/end_to_end_integration/argo.yaml:1-80, run locally)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.workflows import DiagnosticsJob, EndToEnd, PrognosticJob, TrainingJob


@pytest.mark.slow
def test_full_chain(tmp_path):
    rng = np.random.RandomState(0)
    nz = 10
    n = 256
    batch = Dataset(
        {
            "air_temperature": Quantity(
                jnp.asarray(250 + 40 * rng.rand(n, nz)), ("sample", "z")
            ),
            "specific_humidity": Quantity(
                jnp.asarray(0.01 * rng.rand(n, nz)), ("sample", "z")
            ),
            "dQ1": Quantity(jnp.asarray(1e-6 * rng.randn(n, nz)),
                            ("sample", "z")),
            "dQ2": Quantity(jnp.asarray(1e-9 * rng.randn(n, nz)),
                            ("sample", "z")),
        }
    )
    train_cfg = {
        "model_type": "dense",
        "hyperparameters": {
            "input_variables": ["air_temperature", "specific_humidity"],
            "output_variables": ["dQ1", "dQ2"],
            "hidden_layers": 1,
            "width": 32,
            "epochs": 2,
        },
    }
    run_cfg = {
        "namelist": {"npx": 6, "npz": nz, "dt_atmos": 900.0, "n_split": 2},
        "duration_seconds": 1800.0,
        "scikit_learn": {"model": ["__MODEL__"]},
        "diagnostics": [
            {
                "name": "diags.zarr",
                "variables": [
                    "PRATEsfc",
                    "ULWRFtoa",
                    "dQ1_machine_learning",
                ],
                "times": {"kind": "every"},
            }
        ],
    }

    ws = str(tmp_path / "ws")
    train = TrainingJob("train-dq", train_cfg, "model", train_batches=[batch])
    model_path = train.run(ws)
    run_cfg["scikit_learn"]["model"] = [model_path]

    chain = EndToEnd(
        [PrognosticJob("run1", run_cfg), DiagnosticsJob("run1")], ws
    )
    outputs = chain.run()
    report_dir = outputs[-1]
    html = open(os.path.join(report_dir, "index.html")).read()
    assert "PRATEsfc" in html
    # the ML tendency was applied and recorded
    from fv3net_tpu.core import zarrio

    seg = sorted(
        os.listdir(os.path.join(ws, "run1", "artifacts"))
    )[0]
    ds = zarrio.open_zarr(
        os.path.join(ws, "run1", "artifacts", seg, "diags.zarr")
    )
    assert "dQ1_machine_learning" in ds
    assert np.isfinite(ds["dQ1_machine_learning"].values).all()
