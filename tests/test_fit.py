"""fv3net_tpu.fit trainer contracts (mirrors reference test strategy:
external/fv3fit/tests/training/test_train.py — train-on-identity RMSE
bound, dump/load round-trip, seed determinism, no input mutation)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu import fit
from fv3net_tpu.fit import packer
from fv3net_tpu.fit.dense import DenseHyperparameters, train_dense_model


def make_batch(n=2048, nz=8, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, nz)
    b = rng.randn(n)
    return Dataset(
        {
            "a": Quantity(jnp.asarray(a), ("sample", "z")),
            "b": Quantity(jnp.asarray(b), ("sample",)),
            # target: identity of a plus scalar broadcast
            "out": Quantity(jnp.asarray(a + b[:, None]), ("sample", "z")),
        }
    )


def hyperparams(**kw):
    defaults = dict(
        input_variables=["a", "b"],
        output_variables=["out"],
        hidden_layers=2,
        width=64,
        epochs=40,
        learning_rate=2e-3,
        batch_size=512,
    )
    defaults.update(kw)
    return DenseHyperparameters(**defaults)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    data = {
        "x": jnp.asarray(rng.randn(10, 4)),
        "y": jnp.asarray(rng.randn(10)),
    }
    X, info = packer.pack(data, ["x", "y"])
    assert X.shape == (10, 5)
    out = packer.unpack(X, info)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(data["x"]))
    np.testing.assert_array_equal(np.asarray(out["y"]), np.asarray(data["y"]))


def test_stack_columns_roundtrip():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(6, 5, 4, 4))
    s = packer.stack_columns(f)
    assert s.shape == (6 * 16, 5)
    back = packer.unstack_columns(s, (6, 4, 4))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(f))


def test_train_identity_rmse():
    batch = make_batch()
    model = train_dense_model(hyperparams(), [batch])
    pred = model.predict(batch)
    err = np.asarray(pred["out"].data) - np.asarray(batch["out"].data)
    rmse = np.sqrt((err ** 2).mean())
    scale = np.asarray(batch["out"].data).std()
    assert rmse < 0.3 * scale  # learnable identity mapping


def test_training_is_deterministic():
    batch = make_batch()
    m1 = train_dense_model(hyperparams(epochs=3), [batch])
    m2 = train_dense_model(hyperparams(epochs=3), [batch])
    for l1, l2 in zip(m1.params, m2.params):
        np.testing.assert_array_equal(np.asarray(l1["w"]), np.asarray(l2["w"]))


def test_training_does_not_mutate_inputs():
    batch = make_batch()
    before = {k: np.asarray(v.data).copy() for k, v in batch.items()}
    train_dense_model(hyperparams(epochs=1), [batch])
    for k, v in batch.items():
        np.testing.assert_array_equal(np.asarray(v.data), before[k])


def test_dump_load_roundtrip(tmp_path):
    batch = make_batch()
    model = train_dense_model(hyperparams(epochs=2), [batch])
    path = str(tmp_path / "model")
    fit.dump(model, path)
    loaded = fit.load(path)
    p1 = model.predict(batch)
    p2 = loaded.predict(batch)
    np.testing.assert_allclose(
        np.asarray(p1["out"].data), np.asarray(p2["out"].data), rtol=1e-6
    )
    import os
    assert open(os.path.join(path, "name")).read() == "dense"


def test_constant_output_predictor(tmp_path):
    from fv3net_tpu.fit.testing import ConstantOutputPredictor

    m = ConstantOutputPredictor(["a"], ["dQ1", "dQ2"])
    m.set_outputs(dQ1=np.full(5, 0.1), dQ2=np.full(5, -1e-7))
    batch = Dataset({"a": Quantity(jnp.zeros((7, 5)), ("sample", "z"))})
    out = m.predict(batch)
    assert out["dQ1"].shape == (7, 5)
    np.testing.assert_allclose(np.asarray(out["dQ1"].data), 0.1)
    path = str(tmp_path / "const")
    fit.dump(m, path)
    loaded = fit.load(path)
    out2 = loaded.predict(batch)
    np.testing.assert_allclose(np.asarray(out2["dQ2"].data), -1e-7)


def test_batches_from_mapper_synthetic(tmp_path):
    """loaders path: write a small zarr, map over time, stack batches."""
    from fv3net_tpu.core import zarrio
    from fv3net_tpu.core.quantity import Quantity as Q
    from fv3net_tpu.loaders import ZarrMapper, batches_from_mapper

    rng = np.random.RandomState(0)
    nt, nz, n = 4, 3, 4
    ds = Dataset(
        {
            "T": Q(rng.randn(nt, 6, nz, n, n), ("time", "tile", "z", "y", "x")),
            "dQ1": Q(rng.randn(nt, 6, nz, n, n), ("time", "tile", "z", "y", "x")),
        }
    )
    path = str(tmp_path / "data.zarr")
    zarrio.to_zarr(ds, path)
    mapper = ZarrMapper(path)
    assert len(mapper) == nt
    batches = batches_from_mapper(
        mapper, ["T", "dQ1"], timesteps_per_batch=2
    )
    assert len(batches) == 2
    assert batches[0]["T"].shape == (2 * 6 * n * n, nz)
    # content check: first batch first timestep equals stacked source
    first = np.asarray(batches[0]["T"].data)[: 6 * n * n]
    want = np.moveaxis(np.asarray(ds["T"].data)[0], 1, -1).reshape(-1, nz)
    np.testing.assert_allclose(first, want)
