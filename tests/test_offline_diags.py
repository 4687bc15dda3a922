"""Offline ML evaluation pipeline end-to-end (VERDICT r1 #7: offline
compute + views with an HTML report generated from synthetic data)."""
import json
import os

import numpy as np
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics.offline import (
    compute_offline_diags,
    input_sensitivity,
    offline_report,
)
from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model


def _batch(n=128, nz=6, seed=0):
    rng = np.random.RandomState(seed)
    T = 260 + 30 * rng.rand(n, nz)
    q = 0.01 * rng.rand(n, nz)
    return Dataset(
        {
            "air_temperature": Quantity(
                jnp.asarray(T, jnp.float32), ("sample", "z")
            ),
            "specific_humidity": Quantity(
                jnp.asarray(q, jnp.float32), ("sample", "z")
            ),
            "pressure_thickness_of_atmospheric_layer": Quantity(
                jnp.full((n, nz), 1e4, jnp.float32), ("sample", "z")
            ),
            # learnable targets: linear functions of the inputs
            "dQ1": Quantity(
                jnp.asarray(1e-5 * (T - 280.0) / 30.0, jnp.float32),
                ("sample", "z"),
            ),
            "dQ2": Quantity(
                jnp.asarray(1e-8 * q / 0.01, jnp.float32), ("sample", "z")
            ),
        }
    )


def _model():
    hp = DenseHyperparameters(
        input_variables=["air_temperature", "specific_humidity"],
        output_variables=["dQ1", "dQ2"],
        hidden_layers=1,
        width=32,
        epochs=400,
    )
    return train_dense_model(hp, [_batch(seed=0)])


def test_offline_diags_and_report(tmp_path):
    model = _model()
    test_batches = [_batch(seed=1), _batch(seed=2)]
    diags = compute_offline_diags(model, test_batches)

    # scalar + profile + density + column-integrated metrics all present
    assert float(np.asarray(diags["dQ1_r2"].data)) > 0.5
    assert diags["dQ1_r2_profile"].data.shape == (6,)
    assert diags["dQ1_density"].data.shape == (40, 40)
    assert "column_integrated_dQ1_r2" in diags
    assert float(np.asarray(diags["n_test_samples"].data)) == 256

    sens = input_sensitivity(model, test_batches[0])
    assert "dQ1__air_temperature" in sens
    assert "dQ2__specific_humidity" in sens
    assert sens["dQ1__air_temperature"].shape == (6, 6)
    assert all(np.isfinite(m).all() for m in sens.values())
    assert any(np.abs(m).max() > 0 for m in sens.values())

    out = str(tmp_path / "report")
    path = offline_report(diags, out, sensitivities=sens)
    html = open(path).read()
    assert "dQ1_r2" in html
    assert "Input sensitivity" in html
    assert "Predicted vs target" in html


def test_offline_cli(tmp_path):
    import yaml

    from fv3net_tpu import fit
    from fv3net_tpu.core import zarrio
    from fv3net_tpu.diagnostics.offline import main

    model = _model()
    mpath = str(tmp_path / "model")
    fit.dump(model, mpath)

    # a time-keyed zarr like a nudged-run store (batches_from_config)
    rng = np.random.RandomState(3)
    nt, nz, n = 2, 6, 4
    T = 260 + 30 * rng.rand(nt, 6, nz, n, n)
    q = 0.01 * rng.rand(nt, 6, nz, n, n)
    dims = ("time", "tile", "z", "y", "x")
    ds = Dataset({
        "air_temperature": Quantity(jnp.asarray(T, jnp.float32), dims),
        "specific_humidity": Quantity(jnp.asarray(q, jnp.float32), dims),
        "dQ1": Quantity(
            jnp.asarray(1e-5 * (T - 280.0) / 30.0, jnp.float32), dims
        ),
        "dQ2": Quantity(jnp.asarray(1e-8 * q / 0.01, jnp.float32), dims),
    })
    zpath = str(tmp_path / "data.zarr")
    zarrio.to_zarr(ds, zpath)
    cfg = {
        "kind": "zarr",
        "path": zpath,
        "variables": [
            "air_temperature", "specific_humidity", "dQ1", "dQ2"
        ],
    }
    cfg_path = str(tmp_path / "data.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "diags")
    assert main([mpath, cfg_path, out]) == 0
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert any(k.endswith("_r2") for k in metrics)
    assert os.path.exists(os.path.join(out, "index.html"))
