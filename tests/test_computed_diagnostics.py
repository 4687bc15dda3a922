"""Multi-run computed-diagnostics collections + comparison report.

Reference semantics: workflows/diagnostics/fv3net/diagnostics/
prognostic_run/computed_diagnostics.py.
"""
import json
import os

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.zarrio import to_zarr
from fv3net_tpu.diagnostics.computed import (
    RunDiagnostics,
    RunMetrics,
    detect_folders,
    load_diagnostics,
    load_metrics,
)


def _make_bucket(tmp_path, runs=("baseline", "ml-run")):
    for i, run in enumerate(runs):
        d = tmp_path / run
        os.makedirs(d)
        data = {
            "air_temperature_spatial_mean_global": Quantity(
                np.full(5, 280.0 + i, np.float32), ("time",), "K"
            ),
        }
        if i == 0:  # only the baseline has this one
            data["pwat_rms_global"] = Quantity(
                np.ones(5, np.float32), ("time",), "mm"
            )
        to_zarr(Dataset(data, attrs={"run": run}), str(d / "diags.zarr"))
        with open(d / "metrics.json", "w") as f:
            json.dump(
                {"rmse_5day/air_temperature": {"value": 1.0 + i, "units": "K"}},
                f,
            )
    return str(tmp_path)


def test_detect_folders_and_loaders(tmp_path):
    bucket = _make_bucket(tmp_path)
    folders = detect_folders(bucket)
    assert sorted(folders) == ["baseline", "ml-run"]
    assert folders["baseline"].run == "baseline"
    diags = load_diagnostics(bucket)
    assert sorted(diags.runs) == ["baseline", "ml-run"]
    metrics = load_metrics(bucket)
    assert not metrics.empty


def test_run_diagnostics_missing_variable_nan_fill(tmp_path):
    diags = load_diagnostics(_make_bucket(tmp_path))
    # present in baseline only -> NaN-filled for ml-run, same shape
    q = diags.get_variable("ml-run", "pwat_rms_global")
    assert q.shape == (5,)
    assert np.isnan(np.asarray(q.data)).all()
    present = diags.get_variable("baseline", "pwat_rms_global")
    assert not np.isnan(np.asarray(present.data)).any()
    assert "pwat_rms_global" in diags.variables
    assert diags.matching_variables("_rms_global") == {"pwat_rms_global"}
    ds = diags.get_variables("ml-run", ["air_temperature_spatial_mean_global"])
    assert "air_temperature_spatial_mean_global" in ds


def test_run_metrics_queries(tmp_path):
    metrics = load_metrics(_make_bucket(tmp_path))
    assert metrics.types == {"rmse_5day"}
    assert metrics.get_metric_variables("rmse_5day") == {"air_temperature"}
    assert metrics.get_metric_value("rmse_5day", "air_temperature", "ml-run") == 2.0
    assert metrics.get_metric_units("rmse_5day", "air_temperature", "baseline") == "K"
    assert np.isnan(metrics.get_metric_value("rmse_5day", "nope", "baseline"))
    assert len(metrics.get_metric_all_runs("rmse_5day", "air_temperature")) == 2


def test_comparison_report_cli(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from fv3net_tpu.diagnostics.cli import main

    bucket = _make_bucket(tmp_path / "bucket")
    out = str(tmp_path / "report")
    rc = main(["report", bucket, out])
    assert rc == 0
    html = open(os.path.join(out, "index.html")).read()
    assert "baseline" in html and "comparison of 2 runs" in html
    assert "rmse_5day/air_temperature" in html
