import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fv3net_tpu.core import Quantity, Dataset, to_zarr, open_zarr, where


def test_quantity_basic():
    q = Quantity(np.arange(12.0).reshape(3, 4), ("y", "x"), units="m")
    assert q.sizes == {"y": 3, "x": 4}
    assert q.get_axis_num("x") == 1
    np.testing.assert_allclose((q + 1).values, q.values + 1)


def test_quantity_dim_aligned_broadcast():
    a = Quantity(np.ones((3, 4)), ("y", "x"))
    b = Quantity(np.arange(4.0), ("x",))
    c = a * b
    assert c.dims == ("y", "x")
    np.testing.assert_allclose(c.values, np.broadcast_to(np.arange(4.0), (3, 4)))
    # reversed order of dims
    d = Quantity(np.arange(3.0), ("y",))
    e = b + d  # -> dims (x, y)
    assert e.dims == ("x", "y")
    np.testing.assert_allclose(e.values, np.arange(4.0)[:, None] + np.arange(3.0))


def test_quantity_reductions():
    q = Quantity(np.arange(24.0).reshape(2, 3, 4), ("z", "y", "x"))
    s = q.sum("z")
    assert s.dims == ("y", "x")
    m = q.mean(("y", "x"))
    assert m.dims == ("z",)
    c = q.cumsum("z")
    assert c.shape == q.shape


def test_quantity_isel_transpose():
    q = Quantity(np.arange(24.0).reshape(2, 3, 4), ("z", "y", "x"))
    assert q.isel(z=0).dims == ("y", "x")
    assert q.isel(z=slice(0, 1)).dims == ("z", "y", "x")
    t = q.transpose("x", "z", "y")
    assert t.shape == (4, 2, 3)


def test_quantity_pytree():
    q = Quantity(jnp.ones((2, 3)), ("y", "x"), units="K")

    @jax.jit
    def f(q):
        return q.with_data(q.data * 2)

    out = f(q)
    assert out.dims == ("y", "x")
    assert out.units == "K"
    np.testing.assert_allclose(np.asarray(out.data), 2.0)


def test_where():
    a = Quantity(np.array([1.0, -1.0, 2.0]), ("x",))
    out = where(a > 0, a, 0.0)
    np.testing.assert_allclose(out.values, [1.0, 0.0, 2.0])


def test_dataset_basics():
    ds = Dataset(
        {
            "t": Quantity(np.ones((2, 3)), ("y", "x"), units="K"),
            "p": Quantity(np.zeros((3,)), ("x",), units="Pa"),
        }
    )
    assert set(ds.keys()) == {"t", "p"}
    assert ds.dims == {"y": 2, "x": 3}
    sub = ds.isel(x=0)
    assert sub["t"].dims == ("y",)
    renamed = ds.rename({"t": "temperature"})
    assert "temperature" in renamed


def test_dataset_pytree():
    ds = Dataset({"a": Quantity(jnp.ones(3), ("x",))})

    @jax.jit
    def f(ds):
        return ds.map(lambda q: q.with_data(q.data + 1))

    out = f(ds)
    np.testing.assert_allclose(np.asarray(out["a"].data), 2.0)


def test_zarr_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ds = Dataset(
        {
            "temp": Quantity(
                rng.rand(2, 3, 4).astype(np.float32), ("time", "y", "x"), units="K"
            ),
            "ps": Quantity(rng.rand(2, 4), ("time", "x"), units="Pa"),
        },
        coords={"time": np.array([0.0, 1.0])},
        attrs={"title": "test"},
    )
    path = str(tmp_path / "test.zarr")
    to_zarr(ds, path, chunks={"time": 1})
    back = open_zarr(path)
    assert back.attrs["title"] == "test"
    np.testing.assert_array_equal(back["temp"].values, ds["temp"].values)
    np.testing.assert_array_equal(back["ps"].values, ds["ps"].values)
    assert back["temp"].dims == ("time", "y", "x")
    assert back["temp"].units == "K"
    np.testing.assert_array_equal(back.coords["time"], [0.0, 1.0])


def test_zarr_region_write(tmp_path):
    from fv3net_tpu.core.zarrio import ZarrArray

    path = str(tmp_path / "arr")
    arr = ZarrArray.create(path, shape=(4, 6), dtype="f4", chunks=(2, 3))
    data = np.arange(24.0, dtype=np.float32).reshape(4, 6)
    # write in two non-chunk-aligned regions
    arr[0:3, 0:6] = data[0:3]
    arr[3:4, 0:6] = data[3:4]
    np.testing.assert_array_equal(ZarrArray(path).read(), data)


def test_zarr_compressed_roundtrip(tmp_path):
    from fv3net_tpu.core.zarrio import ZarrArray

    path = str(tmp_path / "arr")
    arr = ZarrArray.create(path, shape=(5, 5), dtype="f8", chunks=(5, 5),
                           compress=True)
    data = np.eye(5)
    arr[:, :] = data
    np.testing.assert_array_equal(ZarrArray(path).read(), data)


def test_zarr_null_fill_value_and_negative_index(tmp_path):
    """External zarrs may carry fill_value: null; negative int indices
    must address from the end (both previously crashed/no-opped)."""
    import json

    from fv3net_tpu.core import zarrio

    path = str(tmp_path / "a")
    arr = zarrio.ZarrArray.create(path, shape=(4, 3), dtype="<f4",
                                  chunks=(2, 3))
    # simulate an externally written store with a null fill value
    meta_path = path + "/.zarray"
    meta = json.load(open(meta_path))
    meta["fill_value"] = None
    json.dump(meta, open(meta_path, "w"))
    arr = zarrio.ZarrArray(path)
    arr[(-1,)] = np.arange(3, dtype=np.float32)
    out = arr.read()
    np.testing.assert_array_equal(out[3], [0, 1, 2])
    np.testing.assert_array_equal(out[:3], 0.0)
