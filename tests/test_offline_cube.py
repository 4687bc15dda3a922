"""Cube-shaped offline ML evaluation (diagnostics/offline package).

Reference surface: workflows/diagnostics/fv3net/diagnostics/offline/
compute.py:61-426 + compute_diagnostics.py:55-566 (mask families,
pressure-level regrids, diurnal cycles, transects, scalar-metrics JSON,
HTML report).
"""
import json
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics.offline import (
    compute_diagnostics,
    insert_r2,
    insert_rmse,
    meridional_transect,
    select_snapshot,
)

N = 6
NT = 8
NZ = 4


def _grid():
    from fv3net_tpu.grid.geometry import make_grid

    g = make_grid(N)
    lsm = np.zeros((6, N, N))
    lsm[0] = 1.0  # tile 0 is land
    return {
        "lat": np.rad2deg(g.lat),
        "lon": np.rad2deg(g.lon),
        "area": g.area,
        "land_sea_mask": lsm,
    }


@pytest.fixture(scope="module")
def cube_data():
    rng = np.random.RandomState(0)
    tgt2d = np.asarray(280 + rng.rand(NT, 6, N, N) * 5, np.float32)
    tgt3d = np.asarray(rng.rand(NT, 6, NZ, N, N), np.float32)
    delp = np.full((NT, 6, NZ, N, N), 900e2 / NZ, np.float32)
    target = Dataset(
        {
            "t2m": Quantity(tgt2d, ("time", "tile", "y", "x"), "K"),
            "dQ1": Quantity(tgt3d, ("time", "tile", "z", "y", "x"),
                            "K/s"),
        },
        coords={"time": np.arange(NT) * 3.0},
    )
    pred = Dataset(
        {
            "t2m": Quantity(tgt2d + 1.0, ("time", "tile", "y", "x"),
                            "K"),
            "dQ1": Quantity(tgt3d * 0.5, ("time", "tile", "z", "y", "x"),
                            "K/s"),
        },
        coords={"time": np.arange(NT) * 3.0},
    )
    return pred, target, delp


def test_compute_diagnostics_families(cube_data):
    pred, target, delp = cube_data
    diags = compute_diagnostics(pred, target, _grid(), delp)
    # constant +1 bias on t2m, everywhere
    assert np.isclose(
        float(np.asarray(diags["t2m_bias_2d_global"].data)), 1.0,
        atol=1e-5,
    )
    assert np.isclose(
        float(np.asarray(diags["t2m_bias_2d_land"].data)), 1.0,
        atol=1e-5,
    )
    assert np.isclose(
        float(np.asarray(diags["t2m_mse_2d_global"].data)), 1.0,
        atol=1e-5,
    )
    # variance of the target is positive; r2 for the biased-but-
    # correlated 2d field: 1 - 1/var
    var = float(np.asarray(diags["t2m_variance_2d_global"].data))
    assert var > 0
    diags = insert_r2(diags)
    r2 = float(np.asarray(diags["t2m_r2_2d_global"].data))
    assert np.isclose(r2, 1.0 - 1.0 / var, rtol=1e-5)
    diags = insert_rmse(diags)
    assert np.isclose(
        float(np.asarray(diags["t2m_rmse_2d_global"].data)), 1.0,
        atol=1e-5,
    )
    # model-level profiles exist with a z axis
    prof = diags["dQ1_mse_model_level_global"]
    assert prof.dims == ("z",)
    assert np.asarray(prof.data).shape == (NZ,)
    # pressure-level families exist (delp provided)
    assert "dQ1_mse_pressure_level_global" in diags
    # zonal bias hovmoller-style output
    zb = diags["t2m_bias_2d_zonal_avg_global"]
    assert zb.dims == ("latitude",)
    finite = np.isfinite(np.asarray(zb.data))
    assert finite.any()
    np.testing.assert_allclose(
        np.asarray(zb.data)[finite], 1.0, atol=1e-4
    )
    # diurnal cycle carries both derivations
    dc = diags["t2m_diurnal_cycle_global"]
    assert dc.dims == ("local_time", "derivation")
    arr = np.asarray(dc.data)
    ok = np.isfinite(arr).all(axis=1)
    np.testing.assert_allclose(
        arr[ok, 1] - arr[ok, 0], 1.0, atol=1e-4
    )
    # time-domain means of both derivations
    tm = diags["t2m_time_domain_mean_2d_global"]
    vals = np.asarray(tm.data)
    assert np.isclose(vals[1] - vals[0], 1.0, atol=1e-5)


def test_snapshot_and_transect(cube_data):
    pred, target, delp = cube_data
    snap = select_snapshot(pred, 6.0)
    assert snap["t2m"].dims == ("tile", "y", "x")
    assert snap.coords["time_snapshot"] == 6.0
    tr = meridional_transect(snap, _grid(), lon=0.0, n=36)
    assert "t2m" in tr
    assert tr["t2m"].dims[-1] == "transect"
    assert np.asarray(tr["t2m"].data).shape[-1] == 36
    assert np.isfinite(np.asarray(tr["t2m"].data)).all()
    # 3-D variable keeps its level axis ahead of the transect axis
    assert np.asarray(tr["dQ1"].data).shape == (NZ, 36)


def test_offline_cli_end_to_end(tmp_path, cube_data):
    """Train a tiny dense model, write cube zarr test data, run the
    offline compute CLI, check report + metrics artifacts (reference
    compute.py main flow)."""
    import yaml

    from fv3net_tpu import fit
    from fv3net_tpu.core import zarrio
    from fv3net_tpu.diagnostics.offline.compute import main

    pred, target, delp = cube_data
    # training data: stacked samples mapping t2m -> dQ1 column
    x = np.asarray(target["t2m"].data).reshape(-1).astype(np.float32)
    y3 = np.moveaxis(np.asarray(target["dQ1"].data), 2, -1).reshape(
        -1, NZ
    ).astype(np.float32)
    ds_train = Dataset(
        {
            "t2m": Quantity(jnp.asarray(x), ("sample",)),
            "dQ1": Quantity(jnp.asarray(y3), ("sample", "z")),
        }
    )
    hp = fit.DenseHyperparameters(
        input_variables=["t2m"],
        output_variables=["dQ1"],
        hidden_layers=1,
        width=8,
        epochs=2,
    )
    model = fit.get_training_function("dense")(hp, [ds_train])
    model_path = str(tmp_path / "model")
    fit.dump(model, model_path)

    data = Dataset(
        {
            "t2m": target["t2m"],
            "dQ1": target["dQ1"],
            "pressure_thickness_of_atmospheric_layer": Quantity(
                delp, ("time", "tile", "z", "y", "x"), "Pa"
            ),
        },
        coords={"time": np.arange(NT) * 3.0},
    )
    data_path = str(tmp_path / "data.zarr")
    zarrio.to_zarr(data, data_path)
    cfg_path = str(tmp_path / "data.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"path": data_path, "grid": f"c{N}"}, f)

    out_dir = str(tmp_path / "offline")
    rc = main([model_path, cfg_path, out_dir])
    assert rc == 0
    with open(os.path.join(out_dir, "scalar_metrics.json")) as f:
        metrics = json.load(f)
    assert any("mse" in k for k in metrics)
    assert any("_r2_" in k for k in metrics)
    with open(os.path.join(out_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["model_path"] == model_path
    assert os.path.exists(os.path.join(out_dir, "index.html"))
    html = open(os.path.join(out_dir, "index.html")).read()
    assert "dQ1" in html
    assert os.path.exists(
        os.path.join(out_dir, "offline_diagnostics.zarr")
    )
    assert os.path.exists(os.path.join(out_dir, "transect_lon0.zarr"))
