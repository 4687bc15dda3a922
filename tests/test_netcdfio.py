"""NetCDF-3 tile ingestion tests."""
import numpy as np
import pytest

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.netcdfio import open_netcdf, open_restarts, open_tiles, write_netcdf
from fv3net_tpu.core.quantity import Quantity


def test_netcdf_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "T": Quantity(
                rng.rand(3, 4, 4).astype(np.float32), ("z", "y", "x"), "degK"
            )
        },
        coords={"z": np.arange(3.0)},
    )
    path = str(tmp_path / "a.nc")
    write_netcdf(ds, path)
    back = open_netcdf(path)
    np.testing.assert_allclose(back["T"].values, ds["T"].values, rtol=1e-6)
    assert back["T"].units == "degK"
    np.testing.assert_allclose(back.coords["z"], [0, 1, 2])


def test_open_tiles_and_restarts(tmp_path):
    rng = np.random.RandomState(1)
    for t in range(1, 7):
        ds = Dataset(
            {
                "sphum": Quantity(
                    np.full((2, 4, 4), float(t), np.float32),
                    ("zaxis_1", "yaxis_1", "xaxis_1"),
                )
            }
        )
        write_netcdf(ds, str(tmp_path / f"fv_tracer.res.tile{t}.nc"))
    tiles = open_tiles(str(tmp_path / "fv_tracer.res"))
    assert tiles["sphum"].shape == (6, 2, 4, 4)
    np.testing.assert_allclose(tiles["sphum"].values[2], 3.0)
    restarts = open_restarts(str(tmp_path))
    assert "fv_tracer.res" in restarts
