"""Tests for the loaders API completion: lazy sequences (Map/Take/Local/
shuffle/OneAheadIterator), function registries + config dataclasses,
batches_from_netcdf, and the multiple-datasets / high-res-diags / hybrid
mappers.

Reference semantics: external/loaders/loaders/{batches/_sequences.py,
_one_ahead.py,_config.py,mappers/_hybrid.py,mappers/_high_res_diags.py,
mappers/_nudged/_nudged.py:188-213}.
"""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.netcdfio import write_netcdf
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.core.zarrio import to_zarr
from fv3net_tpu import loaders
from fv3net_tpu.loaders import (
    BatchesConfig,
    BatchesFromMapperConfig,
    BatchesLoader,
    Local,
    Map,
    MapperConfig,
    OneAheadIterator,
    batches_from_netcdf,
    open_fine_resolution_nudging_hybrid,
    open_high_res_diags,
    open_nudge_to_fine_multiple_datasets,
    shuffle,
    to_local,
)


def _dataset(value: float, n: int = 4) -> Dataset:
    return Dataset(
        {"a": Quantity(np.full((n, n), value, np.float32), ("y", "x"), "K")}
    )


# -- sequences ----------------------------------------------------------------


def test_map_take_and_slice():
    seq = Map(lambda i: i * 10, list(range(6)))
    assert len(seq) == 6 and seq[2] == 20
    sub = seq[1:4]
    assert isinstance(sub, Map) and len(sub) == 3 and sub[0] == 10
    taken = sub.take(2)
    assert len(taken) == 2 and taken[1] == 20
    mapped = taken.map(lambda x: x + 1)
    assert mapped[1] == 21


def test_shuffle_is_permutation():
    seq = Map(lambda i: i, list(range(10)))
    sh = shuffle(seq, seed=0)
    vals = sorted(sh[i] for i in range(len(sh)))
    assert vals == list(range(10))


def test_local_roundtrip(tmp_path):
    seq = Map(_dataset, [1.0, 2.0, 3.0])
    local = to_local(seq, str(tmp_path / "seq"))
    assert len(local) == 3
    out = local[1]
    np.testing.assert_array_equal(np.asarray(out["a"].data), 2.0)
    assert out["a"].dims == ("y", "x") and out["a"].units == "K"
    # .local() combinator on a BaseSequence
    local2 = seq.local(str(tmp_path / "seq2"), n_jobs=2)
    assert len(local2) == 3


def test_one_ahead_iterator():
    calls = []

    def load(i):
        calls.append(i)
        return i * 2

    it = OneAheadIterator([1, 2, 3], load)
    out = list(it)
    assert out == [2, 4, 6]
    assert calls == [1, 2, 3]
    assert len(it) == 3


# -- registries / configs -------------------------------------------------------


def test_mapper_config_validates_function_name():
    with pytest.raises(ValueError):
        MapperConfig(function="not_a_mapper", kwargs={})
    cfg = MapperConfig(function="open_nudge_to_fine", kwargs={})
    assert "open_nudge_to_fine" in repr(loaders.mapper_functions)
    assert cfg.function == "open_nudge_to_fine"


def test_batches_loader_from_dict_dispatch(tmp_path):
    path = str(tmp_path / "state.zarr")
    ds = Dataset(
        {
            "air_temperature": Quantity(
                np.random.rand(3, 6, 2, 4, 4).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
                "K",
            )
        }
    )
    to_zarr(ds, path)
    loader = BatchesLoader.from_dict(
        {
            "mapper_config": {
                "function": "open_nudge_to_fine",
                "kwargs": {"state_zarr": path},
            },
            "variable_names": ["air_temperature"],
            "timesteps_per_batch": 1,
        }
    )
    assert isinstance(loader, BatchesFromMapperConfig)
    batches = loader.load_batches()
    assert len(batches) == 3
    assert batches[0]["air_temperature"].dims == ("sample", "z")
    assert batches[0]["air_temperature"].shape == (6 * 4 * 4, 2)


def test_batches_config_roundtrip(tmp_path):
    ncdir = tmp_path / "ncs"
    os.makedirs(ncdir)
    for i in range(3):
        write_netcdf(_dataset(float(i)), str(ncdir / f"{i:02d}.nc"))
    cfg = BatchesConfig(
        function="batches_from_netcdf",
        kwargs={"path": str(ncdir), "variable_names": ["a"]},
    )
    batches = cfg.load_batches()
    assert len(batches) == 3
    np.testing.assert_array_equal(np.asarray(batches[2]["a"].data), 2.0)
    with pytest.raises(ValueError):
        BatchesConfig(function="nope", kwargs={})


def test_batches_from_netcdf_in_memory(tmp_path):
    for i in range(2):
        write_netcdf(_dataset(float(i)), str(tmp_path / f"{i}.nc"))
    seq = batches_from_netcdf(str(tmp_path), ["a"], in_memory=True)
    assert isinstance(seq, tuple) and len(seq) == 2


# -- new mappers ---------------------------------------------------------------


def _nudged_zarr(tmp_path, name, value):
    path = str(tmp_path / name)
    shape = (2, 6, 3, 4, 4)
    ds = Dataset(
        {
            "air_temperature": Quantity(
                np.full(shape, value, np.float32), ("time", "tile", "z", "y", "x"), "K"
            ),
            "air_temperature_tendency_due_to_nudging": Quantity(
                np.full(shape, 0.5 * value, np.float32),
                ("time", "tile", "z", "y", "x"),
                "K/s",
            ),
        }
    )
    to_zarr(ds, path)
    return path


def test_open_nudge_to_fine_multiple_datasets(tmp_path):
    p1 = _nudged_zarr(tmp_path, "a.zarr", 1.0)
    p2 = _nudged_zarr(tmp_path, "b.zarr", 2.0)
    m = open_nudge_to_fine_multiple_datasets(p1, [p2])
    key = sorted(m.keys())[0]
    ds = m[key]
    assert ds["air_temperature"].dims[0] == "dataset"
    assert ds["air_temperature"].shape[0] == 2
    np.testing.assert_array_equal(
        np.asarray(ds["dQ1"].data)[:, 0, 0, 0, 0], [0.5, 1.0]
    )


def test_open_high_res_diags(tmp_path):
    from fv3net_tpu.loaders.mappers import RENAMED_SHIELD_DIAG_VARS

    shape = (2, 6, 4, 4)
    data = {
        name: Quantity(
            np.full(shape, 100.0, np.float32), ("time", "tile", "y", "x"), "W/m^2"
        )
        for name in RENAMED_SHIELD_DIAG_VARS
    }
    # precip rate in kg/m^2/s
    data["PRATEsfc_coarse"] = Quantity(
        np.full(shape, 1e-4, np.float32), ("time", "tile", "y", "x"), "kg/m^2/s"
    )
    path = str(tmp_path / "diags.zarr")
    to_zarr(Dataset(data), path)
    m = open_high_res_diags(path)
    ds = m["0"]
    assert "net_heating" in ds and "net_precipitation" in ds
    assert "sensible_heat_flux" in ds
    assert "DSWRFtoa_coarse" not in ds
    # net precip = (P - E) mm/day with LHF=100 W/m2, P=1e-4 kg/m2/s
    v = float(np.asarray(ds["net_precipitation"].data)[0, 0, 0])
    assert 0.0 < v < 10.0


def test_open_fine_resolution_nudging_hybrid(tmp_path):
    shape = (2, 6, 3, 4, 4)
    dims = ("time", "tile", "z", "y", "x")
    ds = Dataset(
        {
            "Q1": Quantity(np.full(shape, 3.0, np.float32), dims, "K/s"),
            "Q2": Quantity(np.full(shape, 2.0, np.float32), dims, "kg/kg/s"),
            "tendency_of_air_temperature_due_to_fv3_physics": Quantity(
                np.full(shape, 1.0, np.float32), dims, "K/s"
            ),
            "tendency_of_specific_humidity_due_to_fv3_physics": Quantity(
                np.full(shape, 0.5, np.float32), dims, "kg/kg/s"
            ),
            "x_wind_tendency_due_to_nudging": Quantity(
                np.full(shape, 0.1, np.float32), dims, "m/s/s"
            ),
            "y_wind_tendency_due_to_nudging": Quantity(
                np.full(shape, 0.2, np.float32), dims, "m/s/s"
            ),
        }
    )
    path = str(tmp_path / "budget.zarr")
    to_zarr(ds, path)
    m = open_fine_resolution_nudging_hybrid(path, approach="apparent_sources_only")
    out = m["0"]
    np.testing.assert_allclose(np.asarray(out["dQ1"].data), 2.0)
    np.testing.assert_allclose(np.asarray(out["pQ1"].data), 1.0)
    np.testing.assert_allclose(np.asarray(out["dQ2"].data), 1.5)
    np.testing.assert_allclose(np.asarray(out["pQ2"].data), 0.5)
    np.testing.assert_allclose(np.asarray(out["dQxwind"].data), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["dQywind"].data), 0.2, rtol=1e-6)
