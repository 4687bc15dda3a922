"""Native chunk assembler vs pure-python zarr reads."""
import os

import numpy as np
import pytest

from fv3net_tpu import native
from fv3net_tpu.core import zarrio
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


@needs_native
@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize(
    "shape,chunks",
    [((6, 8, 8), (2, 8, 8)), ((7, 5), (3, 2)), ((10,), (4,))],
)
def test_native_read_matches_written_data(tmp_path, compress, shape, chunks):
    rng = np.random.RandomState(0)
    data = rng.rand(*shape).astype(np.float32)
    path = str(tmp_path / "a")
    arr = zarrio.ZarrArray.create(
        path, shape=shape, dtype="<f4", chunks=chunks, compress=compress
    )
    arr[tuple(slice(0, s) for s in shape)] = data
    out = zarrio.ZarrArray(path).read()
    np.testing.assert_array_equal(out, data)


@needs_native
def test_native_missing_chunks_fill(tmp_path):
    path = str(tmp_path / "a")
    arr = zarrio.ZarrArray.create(
        path, shape=(4, 4), dtype="<f8", chunks=(2, 4), fill_value=np.nan
    )
    arr[(slice(0, 2), slice(0, 4))] = 1.0  # only the first chunk written
    out = zarrio.ZarrArray(path).read()
    np.testing.assert_array_equal(out[:2], 1.0)
    assert np.isnan(out[2:]).all()


@needs_native
def test_native_faster_reads_consistent_via_dataset(tmp_path):
    rng = np.random.RandomState(1)
    ds = Dataset(
        {
            "T": Quantity(
                rng.rand(4, 6, 5, 8, 8).astype(np.float32),
                ("time", "tile", "z", "y", "x"),
            )
        }
    )
    p = str(tmp_path / "d.zarr")
    zarrio.to_zarr(ds, p, chunks={"time": 1}, compress=True)
    back = zarrio.open_zarr(p)
    np.testing.assert_array_equal(back["T"].values, ds["T"].values)


def test_native_write_chunks_roundtrip(tmp_path):
    """write_chunks (threaded deflate+write) produces chunks the reader
    roundtrips, for both compressed and raw stores."""
    import numpy as np
    from fv3net_tpu import native
    from fv3net_tpu.core import zarrio

    rng = np.random.RandomState(0)
    for compressed in (True, False):
        path = str(tmp_path / f"arr_{compressed}")
        za = zarrio.ZarrArray.create(
            path,
            shape=(8, 16, 16),
            chunks=(2, 16, 16),
            dtype="float32",
            dims=("time", "y", "x"),
            compress=compressed,
        )
        data = rng.rand(8, 16, 16).astype(np.float32)
        za[:, :, :] = data  # 4 chunks -> native batch path
        back = zarrio.ZarrArray(path).read()
        np.testing.assert_array_equal(back, data)


def test_native_write_chunks_direct(tmp_path):
    import numpy as np
    from fv3net_tpu import native

    if native.get_lib() is None:
        return  # toolchain-free environment: python fallback covers it
    bufs = [np.arange(100, dtype=np.float64) + i for i in range(6)]
    paths = [str(tmp_path / f"c{i}") for i in range(6)]
    assert native.write_chunks(paths, bufs, compress_level=0)
    for p, b in zip(paths, bufs):
        got = np.frombuffer(open(p, "rb").read(), np.float64)
        np.testing.assert_array_equal(got, b)
