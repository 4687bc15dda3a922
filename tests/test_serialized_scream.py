"""SerializedSequence over StorageHook captures + SCREAM nudge mapper."""
import datetime

import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.emulation.hooks import StorageHook
from fv3net_tpu.loaders import SerializedSequence, open_nudge_to_fine_scream

T0 = datetime.datetime(2016, 8, 1)


def test_serialized_sequence_indexes_savepoints(tmp_path):
    path = str(tmp_path / "capture.zarr")
    hook = StorageHook(path, output_freq_sec=900.0,
                       variables=["air_temperature", "specific_humidity"])
    rng = np.random.RandomState(0)
    states = []
    t = T0
    for i in range(3):
        s = {
            "air_temperature": rng.randn(8, 4).astype(np.float32) + 270.0,
            "specific_humidity": rng.rand(8, 4).astype(np.float32) * 1e-3,
        }
        states.append(s)
        hook(s, t)
        t += datetime.timedelta(seconds=900)

    seq = SerializedSequence(path)
    assert len(seq) == 3
    ds = seq[1]
    np.testing.assert_allclose(
        np.asarray(ds["air_temperature"].data),
        states[1]["air_temperature"],
        rtol=1e-6,
    )
    # negative index + bounds
    np.testing.assert_allclose(
        np.asarray(seq[-1]["specific_humidity"].data),
        states[2]["specific_humidity"],
        rtol=1e-6,
    )
    with pytest.raises(IndexError):
        seq[3]
    flat = seq.flatten()
    assert flat["air_temperature"].shape == (3 * 8, 4)
    # variable subset selection
    sub = SerializedSequence(path, variables=["air_temperature"])
    assert list(sub[0].keys()) == ["air_temperature"]


def test_open_nudge_to_fine_scream(tmp_path):
    nt, nz = 3, 5
    rng = np.random.RandomState(1)
    t_mid = rng.randn(nt, 6, 2, 2, nz).astype(np.float32) + 260.0
    qv = rng.rand(nt, 6, 2, 2, nz).astype(np.float32) * 1e-3
    dT = rng.randn(nt, 6, 2, 2, nz).astype(np.float32) * 1e-5
    dq = rng.randn(nt, 6, 2, 2, nz).astype(np.float32) * 1e-8
    dims = ("time", "tile", "y", "x", "z")
    ds = Dataset(
        {
            "T_mid": Quantity(jnp.asarray(t_mid), dims),
            "qv": Quantity(jnp.asarray(qv), dims),
            "T_mid_tendency_due_to_nudging": Quantity(jnp.asarray(dT), dims),
            "qv_tendency_due_to_nudging": Quantity(jnp.asarray(dq), dims),
        },
        coords={"time": np.arange(nt)},
    )
    path = str(tmp_path / "scream.zarr")
    zarrio.to_zarr(ds, path)
    mapper = open_nudge_to_fine_scream(path, physics_timestep_seconds=900.0)
    keys = sorted(mapper.keys())
    assert len(keys) == nt
    sample = mapper[keys[1]]
    # SCREAM names mapped to fv3 training names
    assert "dQ1" in sample and "dQ2" in sample
    assert "air_temperature" in sample and "specific_humidity" in sample
    # pre-nudging state: T_mid - dT*dt
    np.testing.assert_allclose(
        np.asarray(sample["air_temperature"].data),
        t_mid[1] - dT[1] * 900.0,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sample["dQ1"].data), dT[1], rtol=1e-6
    )
