"""Tests for the vcm public-API tail: vertical flux reconstruction,
histogram2d / region averages / local_time, in-cloud condensate algebra,
ZarrMapping, open_delayed, interpolate_unstructured, CDL parsing,
standardize_metadata / dump_nc / shift_timestamp.

Reference semantics: external/vcm/vcm/__init__.py exports (calc/
vertical_flux.py, calc/clouds.py, calc/histogram.py, select.py,
_zarr_mapping.py, xarray_loaders.py, cdl/generate.py, convenience.py).
"""
import io
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core.convenience import shift_timestamp
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.netcdfio import dump_nc, open_netcdf, standardize_metadata
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.zarrio import ZarrMapping, open_delayed, open_zarr
from fv3net_tpu.derived import (
    gridcell_to_incloud_condensate,
    incloud_to_gridcell_condensate,
)
from fv3net_tpu.ops import statistics as st
from fv3net_tpu.ops import vertical_flux as vf
from fv3net_tpu.ops.regrid_latlon import interpolate_unstructured
from fv3net_tpu.synth import cdl_to_dataset


# -- vertical flux ----------------------------------------------------------


def test_fit_field_as_flux_matches_lstsq_oracle():
    rng = np.random.RandomState(7)
    nz = 19
    field = rng.randn(11, nz)
    delp = rng.rand(11, nz) + 0.5
    first = rng.randn(11)
    last = rng.randn(11)
    F = np.asarray(vf.fit_field_as_flux(field, delp, first, last))
    M = np.zeros((nz, nz - 1))
    M[0, 0] = -1.0
    M[-1, -1] = 1.0
    for i in range(1, nz - 1):
        M[i, i] = -1.0
        M[i, i - 1] = 1.0
    rhs = field * delp
    rhs[:, 0] -= first
    rhs[:, -1] += last
    mid = np.linalg.lstsq(M, rhs.T, rcond=None)[0].T
    oracle = np.concatenate([first[:, None], mid, last[:, None]], axis=1)
    np.testing.assert_allclose(F, oracle, rtol=1e-4, atol=1e-5)
    # boundary conditions are exact
    np.testing.assert_array_equal(F[:, 0], first.astype(F.dtype))
    np.testing.assert_array_equal(F[:, -1], last.astype(F.dtype))


def test_convergence_center_and_interface():
    rng = np.random.RandomState(3)
    eddy = rng.randn(4, 12)
    delp = rng.rand(4, 12) + 0.5
    c = np.asarray(vf.convergence_cell_center(eddy, delp))
    pad = np.concatenate(
        [2 * eddy[:, :1] - eddy[:, 1:2], eddy, 2 * eddy[:, -1:] - eddy[:, -2:-1]],
        axis=1,
    )
    iface = 0.5 * (pad[:, :-1] + pad[:, 1:])
    np.testing.assert_allclose(c, -np.diff(iface, axis=1) / delp, rtol=1e-5)
    flux = rng.randn(4, 13)
    ci = np.asarray(vf.convergence_cell_interface(flux, delp))
    np.testing.assert_allclose(ci, (flux[:, :-1] - flux[:, 1:]) / delp, rtol=1e-5)


def test_flux_roundtrip_recovers_column_integral():
    # -dF/dp integrates back to the boundary flux difference
    rng = np.random.RandomState(11)
    field = rng.randn(6, 15)
    delp = rng.rand(6, 15) + 0.5
    first = rng.randn(6)
    last = rng.randn(6)
    F = vf.fit_field_as_flux(field, delp, first, last)
    recon = np.asarray(vf.convergence_cell_interface(F, delp))
    np.testing.assert_allclose(
        (recon * delp).sum(axis=1), first - last, rtol=1e-3, atol=1e-4
    )


# -- statistics -------------------------------------------------------------


def test_histogram2d_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(500)
    y = rng.randn(500)
    bx = np.linspace(-3, 3, 7)
    by = np.linspace(-3, 3, 5)
    counts, _, _ = st.histogram2d(x, y, bx, by)
    oracle, _, _ = np.histogram2d(x, y, bins=[bx, by])
    np.testing.assert_array_equal(np.asarray(counts), oracle.astype(np.int32))


def test_region_of_interest_average():
    lat = np.array([[10.0, 10.0], [50.0, 50.0]])
    lon = np.array([[20.0, 200.0], [20.0, 200.0]])
    area = np.ones((2, 2))
    field = np.array([[1.0, 2.0], [3.0, 4.0]])
    roi = st.RegionOfInterest((0.0, 30.0), (0.0, 100.0))
    assert float(roi.average(field, lat, lon, area)) == pytest.approx(1.0)
    # box crossing the 0-meridian
    roi2 = st.RegionOfInterest((0.0, 90.0), (-30.0, 30.0))
    assert float(roi2.average(field, lat, lon, area)) == pytest.approx(2.0)


def test_weighted_average_ignores_nan_weights():
    f = np.array([1.0, 2.0, 3.0])
    w = np.array([1.0, np.nan, 1.0])
    assert float(st.weighted_average(f, w)) == pytest.approx(2.0)


def test_local_time():
    out = np.asarray(st.local_time(12.0, np.array([0.0, 180.0, -180.0])))
    np.testing.assert_allclose(out, [12.0, 0.0, 0.0])


# -- condensate algebra -----------------------------------------------------


def test_incloud_roundtrip_and_limits():
    frac = np.array([5e-4, 2e-2, 0.5])
    gridcell = np.array([1e-5, 1e-5, 1e-5])
    incloud = np.asarray(gridcell_to_incloud_condensate(frac, gridcell))
    # below climit1: unchanged; between: scaled by 1/climit2; above: /frac
    np.testing.assert_allclose(
        incloud, [1e-5, 1e-5 / 5e-2, 1e-5 / 0.5], rtol=1e-6
    )
    back = np.asarray(incloud_to_gridcell_condensate(frac, incloud))
    np.testing.assert_allclose(back, gridcell, rtol=1e-6)


# -- ZarrMapping ------------------------------------------------------------


def test_zarr_mapping_keyed_inserts(tmp_path):
    template = Dataset(
        {"a": Quantity(np.ones((3, 4), np.float32), ("y", "x"), "K")}
    )
    path = str(tmp_path / "map.zarr")
    m = ZarrMapping.from_schema(
        path, template, ["time"], {"time": np.array([0.0, 1.0, 2.0])}
    )
    for t in range(3):
        m[(t * 1.0,)] = Dataset(
            {"a": Quantity(np.full((3, 4), t, np.float32), ("y", "x"), "K")}
        )
    out = open_zarr(path)
    assert out["a"].dims == ("time", "y", "x")
    np.testing.assert_array_equal(
        np.asarray(out["a"].data)[:, 0, 0], [0.0, 1.0, 2.0]
    )


def test_zarr_mapping_string_keys(tmp_path):
    template = Dataset({"a": Quantity(np.zeros(2, np.float64), ("x",))})
    times = np.array(["20160801.000000", "20160801.001500"])
    m = ZarrMapping.from_schema(str(tmp_path / "m.zarr"), template, ["time"], {"time": times})
    m["20160801.001500"] = Dataset({"a": Quantity(np.array([5.0, 6.0]), ("x",))})
    out = open_zarr(str(tmp_path / "m.zarr"))
    np.testing.assert_array_equal(np.asarray(out["a"].data)[1], [5.0, 6.0])


# -- open_delayed -----------------------------------------------------------


def test_open_delayed_lazy_and_validated():
    calls = []

    def loader():
        calls.append(1)
        return Dataset({"a": Quantity(np.arange(4.0), ("x",), "m")})

    schema = Dataset({"a": Quantity(np.zeros(4), ("x",), "m")})
    lazy = open_delayed(loader, schema)
    assert not calls  # nothing loaded yet
    assert lazy["a"].values.tolist() == [0.0, 1.0, 2.0, 3.0]
    assert calls == [1]
    lazy["a"]
    assert calls == [1]  # cached


# -- interpolate_unstructured -------------------------------------------------


def test_interpolate_unstructured_nearest():
    f = np.arange(12.0).reshape(3, 4)
    lat = np.repeat(np.arange(3.0)[:, None], 4, axis=1)
    lon = np.tile(np.arange(4.0), (3, 1))
    out = np.asarray(
        interpolate_unstructured(
            f, (lat, lon), (np.array([1.1, 0.2]), np.array([2.9, 0.1]))
        )
    )
    np.testing.assert_array_equal(out, [7.0, 0.0])


def test_interpolate_unstructured_batched():
    f = np.stack([np.arange(6.0).reshape(2, 3), -np.arange(6.0).reshape(2, 3)])
    yy = np.repeat(np.arange(2.0)[:, None], 3, axis=1)
    xx = np.tile(np.arange(3.0), (2, 1))
    out = np.asarray(
        interpolate_unstructured(f, (yy, xx), (np.array([0.0]), np.array([2.0])))
    )
    np.testing.assert_array_equal(out, [[2.0], [-2.0]])


# -- CDL ----------------------------------------------------------------------


def test_cdl_to_dataset():
    ds = cdl_to_dataset(
        """
        netcdf Some Data {
        dimensions:
            time = 3;
            x = 4;
        variables:
            int time(time);
            int b;
            double a(time, x);
                a:_FillValue = 0;
                a:foo = "bar";
        // a comment
            :title = "global";
        data:
            time = 1,2,3;
            b = 3;
        }
        """
    )
    assert ds["a"].dims == ("time", "x")
    assert np.all(np.isnan(np.asarray(ds["a"].data)))
    assert ds.coords["time"].tolist() == [1, 2, 3]
    assert ds["a"].attrs["foo"] == "bar"
    assert int(np.asarray(ds["b"].data)) == 3
    assert ds.attrs["title"] == "global"


def test_cdl_data_fill_and_units():
    ds = cdl_to_dataset(
        """
        netcdf t {
        dimensions: x = 3;
        variables:
            float rh(x);
                rh:units = "percent";
        data:
            rh = 2, NaN, 5;
        }
        """
    )
    assert ds["rh"].units == "percent"
    vals = np.asarray(ds["rh"].data)
    assert vals[0] == pytest.approx(2.0) and vals[2] == pytest.approx(5.0)
    assert np.isnan(vals[1])


# -- netcdf/convenience tail ---------------------------------------------------


def test_standardize_metadata_drops_time_and_renames():
    ds = Dataset(
        {
            "T": Quantity(
                np.zeros((1, 5, 6, 6), np.float32),
                ("Time", "zaxis_1", "yaxis_2", "xaxis_1"),
                "K",
            )
        }
    )
    out = standardize_metadata(ds)
    assert out["T"].dims == ("z", "y", "x")
    assert out["T"].shape == (5, 6, 6)


def test_dump_nc_roundtrip(tmp_path):
    ds = Dataset({"a": Quantity(np.arange(6, dtype=np.float32).reshape(2, 3), ("y", "x"), "m")})
    buf = io.BytesIO()
    dump_nc(ds, buf)
    path = os.path.join(tmp_path, "out.nc")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    back = open_netcdf(path)
    np.testing.assert_array_equal(np.asarray(back["a"].data), np.asarray(ds["a"].data))
    assert back["a"].units == "m"


def test_shift_timestamp():
    assert shift_timestamp("20160801.000000", 900) == "20160801.001500"
    assert shift_timestamp("20160801.000000", -60) == "20160731.235900"
