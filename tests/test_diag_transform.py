"""Composable diagnostics input transforms (diagnostics/transform.py).

Reference semantics: workflows/diagnostics/fv3net/diagnostics/_shared/
transform.py:35-365 (resample_time / daily_mean / subset_variables /
mask_to_sfc_type / mask_area chains) as used by
prognostic_run/compute.py:252-481.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.diagnostics import transform
from fv3net_tpu.diagnostics.prognostic.compute import (
    DiagArg,
    TRANSFORM_CHAIN,
    compute_all,
    set_transform_chain,
)


def _grid(n=4):
    return {
        "lat": np.linspace(-60, 60, 6 * n * n).reshape(6, n, n),
        "lon": np.linspace(0, 350, 6 * n * n).reshape(6, n, n),
        "area": np.ones((6, n, n)),
        "land_sea_mask": np.tile(
            np.array([0.0, 1.0, 2.0, 0.0]), (6, n, 1)
        ),
    }


def _run(nt=16, n=4, dt_hours=1.0, seed=0):
    rng = np.random.RandomState(seed)
    ds = Dataset(
        {
            "t2m": Quantity(
                np.asarray(280 + rng.rand(nt, 6, n, n), np.float32),
                ("time", "tile", "y", "x"),
                "K",
            ),
            "scalar": Quantity(
                np.arange(nt, dtype=np.float32), ("time",), ""
            ),
        },
        coords={"time": np.arange(nt) * dt_hours},
    )
    return ds


def _arg(nt=16, dt_hours=1.0):
    ds = _run(nt=nt, dt_hours=dt_hours)
    return DiagArg(prediction=ds, verification=ds, grid=_grid())


def test_resample_time_nearest_downsample_only():
    arg = _arg(nt=12, dt_hours=1.0)
    out = transform.resample_time(3.0, arg, time_slice=slice(None))
    times = np.asarray(out.prediction.coords["time"])
    # right-labeled 3-hour windows pick the last sample of each window
    np.testing.assert_allclose(times, [0.0, 3.0, 6.0, 9.0, 11.0])
    # data follows the picked indices
    np.testing.assert_allclose(
        np.asarray(out.prediction["scalar"].data), [0, 3, 6, 9, 11]
    )
    # already-coarser data is untouched (downsample-only)
    coarse = transform.resample_time(1.0, _arg(nt=5, dt_hours=3.0),
                                     time_slice=slice(None))
    assert np.asarray(coarse.prediction["scalar"].data).size == 5


def test_resample_time_mean_and_final_time_drop():
    arg = _arg(nt=12, dt_hours=1.0)
    out = transform.resample_time(3.0, arg, method="mean")
    # default reference time_slice drops the final (possibly partial)
    # window
    sc = np.asarray(out.prediction["scalar"].data)
    np.testing.assert_allclose(sc[1], np.mean([1, 2, 3]))
    times = np.asarray(out.prediction.coords["time"])
    assert times.size == sc.shape[0]


def test_resample_time_inner_join():
    pred = _run(nt=10)
    verif = _run(nt=6)
    arg = DiagArg(prediction=pred, verification=verif, grid=_grid())
    out = transform.resample_time(
        1.0, arg, time_slice=slice(None), inner_join=True
    )
    tp = np.asarray(out.prediction.coords["time"])
    tv = np.asarray(out.verification.coords["time"])
    np.testing.assert_array_equal(tp, tv)
    assert tp.max() == 5.0


def test_daily_mean_splits_after_threshold():
    # 3-hourly run for 4 days; daily means after day 2
    arg = _arg(nt=32, dt_hours=3.0)
    out = transform.daily_mean(48.0, arg)
    times = np.asarray(out.prediction.coords["time"])
    # head keeps 3-hourly cadence through 48 h, tail is daily
    assert (np.diff(times[times <= 48.0]) == 3.0).all()
    assert (np.diff(times[times > 48.0]) == 24.0).all()
    sc = np.asarray(out.prediction["scalar"].data)
    assert sc.shape[0] == times.size
    # daily-mean values average the source samples in each 24 h window
    tail = sc[times > 48.0]
    src = np.arange(32, dtype=np.float64)
    src_t = src * 3.0
    first_tail = src[(src_t > 48.0) & (src_t <= 48.0 + 24.0)].mean()
    np.testing.assert_allclose(tail[0], first_tail)


def test_subset_and_select_variables():
    arg = _arg()
    out = transform.subset_variables(["t2m", "missing_var"], arg)
    assert set(out.prediction.keys()) == {"t2m"}
    out2 = transform.select_2d_variables(arg)
    assert "t2m" in out2.prediction
    out3 = transform.select_3d_variables(arg)
    assert len(out3.prediction) == 0


def test_mask_to_sfc_type():
    arg = _arg()
    out = transform.mask_to_sfc_type("land", arg)
    field = np.asarray(out.prediction["t2m"].data)
    lsm = np.round(arg.grid["land_sea_mask"]).astype(int)
    assert np.isnan(field[:, lsm != 1]).all()
    assert np.isfinite(field[:, lsm == 1]).all()
    # non-spatial variables pass through untouched
    np.testing.assert_array_equal(
        np.asarray(out.prediction["scalar"].data), np.arange(16)
    )
    with pytest.raises(ValueError):
        transform.mask_to_sfc_type("moon", arg)


def test_mask_area_zeroes_weights_outside_region():
    arg = _arg()
    out = transform.mask_area("tropics20", arg)
    area = np.asarray(out.grid["area"])
    lat = arg.grid["lat"]
    assert (area[np.abs(lat) > 20.0] == 0).all()
    assert (area[np.abs(lat) <= 20.0] == 1).all()
    # original grid untouched (the reference copies the grid)
    assert (np.asarray(arg.grid["area"]) == 1).all()
    sea = transform.mask_area("sea", arg)
    lsm = np.round(arg.grid["land_sea_mask"]).astype(int)
    assert (np.asarray(sea.grid["area"])[lsm == 1] == 0).all()
    with pytest.raises(ValueError):
        transform.mask_area("atlantis", arg)


def test_apply_decorator_chain():
    calls = {}

    @transform.apply("resample_time", 3.0, time_slice=slice(None))
    @transform.apply("subset_variables", ["scalar"])
    def diag(arg):
        calls["n_times"] = np.asarray(
            arg.prediction["scalar"].data
        ).size
        calls["vars"] = set(arg.prediction.keys())
        return {}

    diag(_arg(nt=12, dt_hours=1.0))
    assert calls["vars"] == {"scalar"}
    assert calls["n_times"] == 5


def test_compute_all_daily_mean_config_side():
    """Time-frequency splitting via the registry chains: a 20-day
    3-hourly run collapses to daily means after the configured split."""
    nt = 20 * 8  # 20 days at 3-hourly
    ds = _run(nt=nt, dt_hours=3.0)
    grid = _grid()
    old = dict(TRANSFORM_CHAIN)
    try:
        set_transform_chain(daily_mean_split_hours=10 * 24.0)
        out = compute_all(ds, grid)
        series = np.asarray(out["t2m_spatial_mean_global"].data)
        # 10 days of 3-hourly (80 and the boundary sample) + ~10 daily
        assert series.shape[0] < nt * 0.6
        hov = np.asarray(out["t2m_zonal_mean_value"].data)
        assert hov.shape[0] == series.shape[0]
        # with an effectively-infinite split the full cadence returns
        set_transform_chain(daily_mean_split_hours=1e9)
        out2 = compute_all(ds, grid)
        assert np.asarray(
            out2["t2m_spatial_mean_global"].data
        ).shape[0] == nt
    finally:
        TRANSFORM_CHAIN.update(old)
    with pytest.raises(KeyError):
        set_transform_chain(bogus=1)
