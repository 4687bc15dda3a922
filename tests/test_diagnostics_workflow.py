"""Diagnostics workflow: statistics ops, registry compute, metrics,
HTML report, viz (mirrors reference test strategy for
workflows/diagnostics)."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics.prognostic import compute as dg
from fv3net_tpu.diagnostics.prognostic.metrics import compute_metrics
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.ops import statistics as stats

jax.config.update("jax_enable_x64", True)


def test_r2_and_rmse():
    rng = np.random.RandomState(0)
    truth = rng.randn(1000)
    np.testing.assert_allclose(float(stats.r2_score(truth, truth)), 1.0)
    assert float(stats.r2_score(truth, np.zeros_like(truth))) < 0.01
    np.testing.assert_allclose(
        float(stats.root_mean_squared_error(truth, truth + 1.0)), 1.0
    )
    np.testing.assert_allclose(float(stats.bias(truth, truth + 2.0)), 2.0)


def test_classification_metrics():
    truth = np.array([True, True, False, False])
    pred = np.array([True, False, True, False])
    np.testing.assert_allclose(float(stats.precision(truth, pred)), 0.5)
    np.testing.assert_allclose(float(stats.recall(truth, pred)), 0.5)
    np.testing.assert_allclose(float(stats.accuracy(truth, pred)), 0.5)


def test_histogram():
    counts, bins = stats.histogram(np.array([0.5, 1.5, 1.7, 2.5]),
                                   np.array([0.0, 1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(np.asarray(counts), [1, 2, 1])


def test_zonal_average_recovers_zonally_symmetric_field():
    grid = make_grid(16)
    lat_deg = np.rad2deg(grid.lat)
    field = jnp.asarray(np.sin(np.deg2rad(lat_deg)) ** 2)  # fn of lat only
    zm, centers = stats.zonal_average_approximate(
        field, jnp.asarray(lat_deg), jnp.asarray(grid.area),
        bins_deg=np.arange(-90, 91, 10.0),
    )
    zm = np.asarray(zm)
    want = np.sin(np.deg2rad(centers)) ** 2
    valid = ~np.isnan(zm)
    np.testing.assert_allclose(zm[valid], want[valid], atol=0.02)


def test_mask_to_surface_type():
    mask = jnp.asarray([0.0, 1.0, 2.0])
    field = jnp.asarray([10.0, 20.0, 30.0])
    out = np.asarray(stats.mask_to_surface_type(field, mask, "land"))
    assert np.isnan(out[0]) and out[1] == 20.0 and np.isnan(out[2])


@pytest.fixture(scope="module")
def run_data():
    grid = make_grid(8)
    rng = np.random.RandomState(0)
    nt = 3
    ds = Dataset(
        {
            "PRATEsfc": Quantity(
                jnp.asarray(rng.rand(nt, 6, 8, 8) * 1e-4),
                ("time", "tile", "y", "x"), "kg/m^2/s",
            ),
            "air_temperature": Quantity(
                jnp.asarray(250 + rng.rand(nt, 6, 4, 8, 8) * 40),
                ("time", "tile", "z", "y", "x"), "degK",
            ),
        }
    )
    grid_dict = {
        "lat": np.rad2deg(grid.lat),
        "lon": np.rad2deg(grid.lon),
        "area": grid.area,
        "land_sea_mask": np.zeros_like(grid.area),
    }
    return ds, grid_dict


def test_compute_all_diagnostics(run_data):
    ds, grid = run_data
    diags = dg.compute_all(ds, grid, verification=ds)
    assert "PRATEsfc_spatial_mean_global" in diags
    assert diags["PRATEsfc_spatial_mean_global"].dims == ("time",)
    assert "PRATEsfc_zonal_and_time_mean" in diags
    assert "PRATEsfc_time_mean_value" in diags
    assert "air_temperature_pressure_level_zonal_time_mean" in diags
    assert diags["air_temperature_pressure_level_zonal_time_mean"].dims == (
        "z", "latitude",
    )
    # run-vs-itself: zero RMSE/bias
    np.testing.assert_allclose(
        np.asarray(diags["PRATEsfc_rms_global"].data), 0.0, atol=1e-12
    )
    metrics = compute_metrics(diags)
    assert metrics["rmse_of_PRATEsfc"]["value"] == pytest.approx(0.0, abs=1e-12)
    assert "drift_of_PRATEsfc" in metrics


def test_report_and_viz(tmp_path, run_data):
    import matplotlib

    matplotlib.use("Agg")
    from fv3net_tpu.core import zarrio
    from fv3net_tpu.diagnostics.cli import report_cmd
    from fv3net_tpu.viz import plot_cube

    ds, grid = run_data
    diags = dg.compute_all(ds, grid)
    out = Dataset({k: v for k, v in diags.items()})
    diags_path = str(tmp_path / "diags.zarr")
    zarrio.to_zarr(out, diags_path)
    report_dir = str(tmp_path / "report")
    report_cmd(diags_path, report_dir)
    html = open(os.path.join(report_dir, "index.html")).read()
    assert "PRATEsfc" in html
    assert "data:image/png;base64" in html

    # direct plotting API
    g = make_grid(8)
    fig, ax, mesh = plot_cube(g, np.asarray(ds["PRATEsfc"].data)[0])
    assert mesh is not None


def test_new_registry_diagnostics(tmp_path):
    """histogram, time-mean bias maps, and the diurnal-cycle composite."""
    import numpy as np
    import jax.numpy as jnp

    from fv3net_tpu.core.dataset import Dataset
    from fv3net_tpu.core.quantity import Quantity
    from fv3net_tpu.diagnostics.prognostic.compute import compute_all

    rng = np.random.RandomState(0)
    nt, n = 8, 6
    grid = {
        "lat": np.zeros((6, n, n)),
        "lon": np.linspace(0, 345, 6 * n * n).reshape(6, n, n),
        "area": np.ones((6, n, n)),
        "land_sea_mask": np.zeros((6, n, n)),
    }
    precip = 10 ** rng.uniform(-9, -3, (nt, 6, n, n))
    pred = Dataset(
        {
            "PRATEsfc": Quantity(
                jnp.asarray(precip, jnp.float32), ("time", "tile", "y", "x")
            )
        },
        coords={"time": np.arange(nt) * 3.0},  # 3-hourly
    )
    verif = Dataset(
        {
            "PRATEsfc": Quantity(
                jnp.asarray(precip * 1.1, jnp.float32),
                ("time", "tile", "y", "x"),
            )
        }
    )
    out = compute_all(pred, grid, verification=verif)
    hist = out["PRATEsfc_histogram"]
    np.testing.assert_allclose(float(np.asarray(hist.data).sum()), 1.0,
                               rtol=1e-5)
    assert len(hist.attrs["bin_edges"]) == 51
    bias_map = out["PRATEsfc_time_mean_bias_value"]
    assert np.asarray(bias_map.data).shape == (6, n, n)
    assert float(np.asarray(bias_map.data).mean()) < 0  # pred < verif
    dc = out["PRATEsfc_diurnal_cycle"]
    assert np.asarray(dc.data).shape == (24,)
    assert np.isfinite(np.asarray(dc.data)).all()


def test_viz_helpers(tmp_path):
    """fv3viz-analog helpers (reference _plot_helpers/_styles/
    _plot_diagnostics/_timestep_histograms)."""
    import datetime

    import matplotlib

    matplotlib.use("Agg")
    import numpy as np

    from fv3net_tpu.grid.geometry import make_grid
    from fv3net_tpu.viz import (
        infer_cmap_params,
        get_var_label,
        plot_cube_faceted,
        plot_daily_and_hourly_hist,
        plot_diurnal_cycle,
        plot_time_series,
        use_colorblind_friendly_style,
    )

    use_colorblind_friendly_style()
    # diverging detection + symmetric limits
    vmin, vmax, cmap = infer_cmap_params(np.array([-1.0, 3.0]))
    assert (vmin, vmax, cmap) == (-3.0, 3.0, "RdBu_r")
    vmin, vmax, cmap = infer_cmap_params(np.array([1.0, 3.0]))
    assert (vmin, vmax, cmap) == (1.0, 3.0, "viridis")
    # robust percentiles clip outliers
    data = np.concatenate([np.zeros(98), [1000.0, 2000.0]])
    vmin, vmax, _ = infer_cmap_params(data, robust=True)
    assert vmax < 1000.0

    label = get_var_label(
        {"long_name": "a very long descriptive variable name indeed",
         "units": "W/m^2"}, "x", max_line_length=20)
    assert "\n" in label

    grid = make_grid(6)
    rng = np.random.RandomState(0)
    fig, axes = plot_cube_faceted(
        grid, rng.randn(3, 6, 6, 6), labels=["a", "b", "c"]
    )
    assert axes.shape == (2, 2)

    ax = plot_diurnal_cycle(
        np.arange(24), {"run": np.sin(np.arange(24) / 24 * 6.28)},
        ylabel="P",
    )
    assert ax.get_xlabel() == "local solar hour"
    ax = plot_time_series(
        np.arange(10), {"run": np.arange(10.0), "verif": np.ones(10)}
    )
    assert len(ax.get_lines()) == 2
    times = [
        datetime.datetime(2016, 8, 1 + d, h)
        for d in range(3) for h in (0, 6, 12)
    ]
    fig, _ = plot_daily_and_hourly_hist(times)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close("all")
