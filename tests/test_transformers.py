"""Latent transformers, dataset-predictor, constant-output novelty.

Reference semantics: external/fv3fit/fv3fit/reservoir/transformers/
{transformer.py,sk_transformer.py}, _shared/xr_prediction.py,
fv3fit/testing.py.
"""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import fv3net_tpu.fit as fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit import io


def test_do_nothing_transformer_roundtrip(tmp_path):
    dn = fit.DoNothingAutoencoder([3, 2])
    latent = dn.encode([jnp.ones((5, 3)), 2 * jnp.ones((5, 2))])
    assert latent.shape == (5, 5)
    parts = dn.decode(latent)
    assert parts[0].shape == (5, 3)
    assert float(parts[1][0, 0]) == 2.0
    io.dump(dn, str(tmp_path))
    assert io.load(str(tmp_path)).n_latent_dims == 5


def test_pca_transformer_recovers_low_rank(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.randn(200, 4) @ rng.randn(4, 10)
    pca = fit.PCATransformer.fit([X[:, :6], X[:, 6:]], n_components=4)
    rec = pca.predict([jnp.asarray(X[:, :6]), jnp.asarray(X[:, 6:])])
    assert float(jnp.abs(jnp.concatenate(rec, -1) - X).max()) < 1e-3
    io.dump(pca, str(tmp_path))
    back = io.load(str(tmp_path))
    assert back.n_latent_dims == 4
    rec2 = back.predict([jnp.asarray(X[:, :6]), jnp.asarray(X[:, 6:])])
    np.testing.assert_allclose(
        np.asarray(rec[0]), np.asarray(rec2[0]), rtol=1e-6
    )


def test_pca_transformer_positive_outputs():
    rng = np.random.RandomState(1)
    X = np.abs(rng.randn(100, 6))
    pca = fit.PCATransformer.fit([X], n_components=2, enforce_positive_outputs=True)
    rec = pca.predict([jnp.asarray(X)])
    assert float(jnp.min(rec[0])) >= 0.0


def test_dataset_predictor_wraps_and_roundtrips(tmp_path):
    rng = np.random.RandomState(0)
    q = rng.rand(64, 5).astype(np.float32)
    ds = Dataset(
        {"a": Quantity(q, ("sample", "z")), "b": Quantity(2 * q, ("sample", "z"))}
    )
    hp = fit.DenseHyperparameters(
        input_variables=["a"], output_variables=["b"], epochs=5
    )
    dense = fit.get_training_function("dense")(hp, [ds], None)
    dp = fit.DatasetPredictor(["a"], ["b"], dense)
    out = dp.predict(Dataset({"a": Quantity(q[:4], ("sample", "z"))}))
    assert out["b"].shape == (4, 5)
    io.dump(dp, str(tmp_path))
    dp2 = io.load(str(tmp_path))
    out2 = dp2.predict(Dataset({"a": Quantity(q[:4], ("sample", "z"))}))
    np.testing.assert_allclose(
        np.asarray(out["b"].data), np.asarray(out2["b"].data)
    )


def test_constant_output_novelty(tmp_path):
    from fv3net_tpu.fit.novelty import ConstantOutputNoveltyDetector

    cn = ConstantOutputNoveltyDetector(["a"], score=1.5)
    q = np.zeros((8, 3), np.float32)
    diags = cn.predict(Dataset({"a": Quantity(q, ("sample", "z"))}))
    assert float(np.asarray(diags["novelty_score"].data)[0]) == 1.5
    assert float(np.asarray(diags["is_novelty"].data)[0]) == 1.0  # 1.5 > 0
    io.dump(cn, str(tmp_path))
    assert io.load(str(tmp_path)).score == 1.5
