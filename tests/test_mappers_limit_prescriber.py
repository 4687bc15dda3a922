"""Mappers, quantile limiter, tendency prescriber, time interpolation."""
import datetime

import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.loaders.mappers import (
    Approach,
    KeyMap,
    MergedMapper,
    MultiDatasetMapper,
    SubsetTimes,
    ValMap,
    open_fine_resolution,
    open_nudge_to_fine,
)
from fv3net_tpu.ops.limit import DatasetQuantileLimiter
from fv3net_tpu.runtime.interpolate import time_interpolate_func

DIMS = ("time", "tile", "z", "y", "x")


def write_zarr(path, names, nt=3, nz=2, n=2, seed=0):
    rng = np.random.RandomState(seed)
    ds = Dataset(
        {
            name: Quantity(rng.rand(nt, 6, nz, n, n).astype(np.float32), DIMS)
            for name in names
        }
    )
    zarrio.to_zarr(ds, path)
    return ds


def test_open_nudge_to_fine(tmp_path):
    state_p = str(tmp_path / "state.zarr")
    nudge_p = str(tmp_path / "nudge.zarr")
    write_zarr(state_p, ["air_temperature", "specific_humidity"])
    write_zarr(
        nudge_p,
        [
            "air_temperature_tendency_due_to_nudging",
            "specific_humidity_tendency_due_to_nudging",
        ],
        seed=1,
    )
    mapper = open_nudge_to_fine(state_p, nudge_p)
    assert len(mapper) == 3
    ds = mapper["0"]
    assert "dQ1" in ds and "dQ2" in ds and "air_temperature" in ds


def test_open_fine_resolution(tmp_path):
    budget_p = str(tmp_path / "budget.zarr")
    write_zarr(budget_p, ["Q1", "Q2", "dQ1", "dQ2"])
    mapper = open_fine_resolution(budget_p)
    assert "dQ1" in mapper["1"]

    nudge_p = str(tmp_path / "nudge.zarr")
    write_zarr(nudge_p, ["air_temperature_tendency_due_to_nudging"], seed=2)
    hybrid = open_fine_resolution(
        budget_p,
        Approach.apparent_sources_plus_nudging_tendencies,
        nudging_zarr=nudge_p,
    )
    base = np.asarray(mapper["1"]["dQ1"].data)
    nudged = np.asarray(hybrid["1"]["dQ1"].data)
    assert not np.allclose(base, nudged)


def test_open_fine_resolution_extend_lower(tmp_path):
    """extend_lower overrides the bottom 2 layers of the heating source
    with the level just above (reference _fine_res.py:181-200)."""
    budget_p = str(tmp_path / "budget4.zarr")
    write_zarr(budget_p, ["Q1", "Q2", "dQ1", "dQ2"], nz=5)
    mapper = open_fine_resolution(
        budget_p, Approach.apparent_sources_extend_lower
    )
    plain = open_fine_resolution(budget_p)
    q1 = np.asarray(mapper["0"]["Q1"].data)
    q1_base = np.asarray(plain["0"]["Q1"].data)
    z = list(mapper["0"]["Q1"].dims).index("z")

    def lev(a, k):
        return np.take(a, k, axis=z)

    # upper levels untouched
    np.testing.assert_array_equal(lev(q1, 0), lev(q1_base, 0))
    np.testing.assert_array_equal(lev(q1, 2), lev(q1_base, 2))
    # lowest two levels replaced by level -3
    np.testing.assert_array_equal(lev(q1, 3), lev(q1_base, 2))
    np.testing.assert_array_equal(lev(q1, 4), lev(q1_base, 2))
    # Q2/moisture untouched (the reference only extends Q1)
    np.testing.assert_array_equal(
        np.asarray(mapper["0"]["Q2"].data),
        np.asarray(plain["0"]["Q2"].data),
    )


def test_open_fine_resolution_dynamics_difference(tmp_path):
    """Q = fine storage - fine nudging - coarse dynamics tendency
    (reference DynamicsDifferenceApparentSource:98-125 budget algebra)."""
    budget_p = str(tmp_path / "budget5.zarr")
    names = [
        "T_storage", "sphum_storage", "t_dt_nudge_coarse",
        "tendency_of_air_temperature_due_to_dynamics",
        "tendency_of_specific_humidity_due_to_dynamics",
    ]
    ds = write_zarr(budget_p, names)
    mapper = open_fine_resolution(
        budget_p, Approach.dynamics_difference,
        include_temperature_nudging=False,
    )
    out = mapper["0"]
    want_q1 = (
        np.asarray(ds["T_storage"].data)[0]
        - np.asarray(ds["t_dt_nudge_coarse"].data)[0]
        - np.asarray(
            ds["tendency_of_air_temperature_due_to_dynamics"].data
        )[0]
    )
    want_q2 = (
        np.asarray(ds["sphum_storage"].data)[0]
        - np.asarray(
            ds["tendency_of_specific_humidity_due_to_dynamics"].data
        )[0]
    )
    np.testing.assert_allclose(
        np.asarray(out["Q1"].data), want_q1, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["Q2"].data), want_q2, rtol=1e-6
    )
    # with temperature nudging included, the nudging term is NOT removed
    incl = open_fine_resolution(
        budget_p, Approach.dynamics_difference,
        include_temperature_nudging=True,
    )
    np.testing.assert_allclose(
        np.asarray(incl["0"]["Q1"].data),
        want_q1 + np.asarray(ds["t_dt_nudge_coarse"].data)[0],
        rtol=1e-6,
    )


def test_mapper_transforms(tmp_path):
    p = str(tmp_path / "a.zarr")
    write_zarr(p, ["T"], nt=5)
    from fv3net_tpu.loaders import ZarrMapper

    m = ZarrMapper(p)
    sub = SubsetTimes(1, 2, m)
    assert list(sub.keys()) == ["1", "2"]
    with pytest.raises(KeyError):
        sub["0"]
    km = KeyMap(lambda k: f"t{k}", m)
    assert "t0" in km.keys()
    vm = ValMap(lambda ds: ds.rename({"T": "temp"}), m)
    assert "temp" in vm["0"]
    multi = MultiDatasetMapper([m, m])
    ds = multi["0"]
    assert ds["T"].dims[0] == "dataset"
    assert ds["T"].shape[0] == 2


def test_quantile_limiter():
    rng = np.random.RandomState(0)
    arr = rng.randn(1000)
    ds = Dataset({"a": Quantity(jnp.asarray(arr), ("sample",))})
    lim = DatasetQuantileLimiter(0.9, 0.1).fit(ds)
    out = np.asarray(lim.transform(ds)["a"].data)
    lo, hi = np.quantile(arr, [0.1, 0.9])
    assert out.min() >= lo - 1e-6 and out.max() <= hi + 1e-6
    # interior values unchanged
    inside = (arr > lo) & (arr < hi)
    np.testing.assert_allclose(out[inside], arr[inside])


def test_tendency_prescriber_applies_and_limits():
    from fv3net_tpu.runtime.steppers.tendency_prescriber import (
        TendencyPrescriber,
    )

    tend = np.zeros((6, 2, 2, 2))
    tend[0, 0, 0, 0] = 100.0  # extreme outlier
    data = Dataset(
        {"dQ1": Quantity(jnp.asarray(tend), ("tile", "z", "y", "x"))}
    )
    stepper = TendencyPrescriber(
        lambda t: data, ["dQ1"],
        limit_quantiles={"lower": 0.01, "upper": 0.99},
    )
    tendencies, _, _ = stepper(None, None)
    arr = np.asarray(tendencies["dQ1"].data)
    assert arr.max() < 100.0  # outlier clipped


def test_time_interpolate_func():
    t0 = datetime.datetime(2016, 8, 1)
    freq = datetime.timedelta(hours=1)

    def getter(time):
        hours = (time - t0).total_seconds() / 3600.0
        return Dataset({"a": Quantity(jnp.asarray([hours]), ("x",))})

    f = time_interpolate_func(getter, freq, t0)
    mid = t0 + datetime.timedelta(minutes=30)
    np.testing.assert_allclose(float(f(mid)["a"].data[0]), 0.5)
    np.testing.assert_allclose(float(f(t0)["a"].data[0]), 0.0)
