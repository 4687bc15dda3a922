"""CycleGAN trainer: learns a simple domain shift; dump/load roundtrip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.cyclegan import CycleGANHyperparameters, train_cyclegan

DIMS = ("time", "tile", "z", "y", "x")


def make_domains(nt=4, nz=2, n=8, shift=3.0, seed=0):
    """Domain B = domain A + constant shift (plus fresh noise)."""
    rng = np.random.RandomState(seed)
    a = rng.randn(nt, 6, nz, n, n)
    b = rng.randn(nt, 6, nz, n, n) + shift
    return (
        Dataset({"T": Quantity(jnp.asarray(a), DIMS)}),
        Dataset({"T": Quantity(jnp.asarray(b), DIMS)}),
    )


@pytest.mark.slow
def test_cyclegan_learns_distribution_shift(tmp_path):
    ds_a, ds_b = make_domains()
    hp = CycleGANHyperparameters(
        state_variables=["T"],
        generator_filters=16,
        generator_depth=2,
        discriminator_filters=16,
        discriminator_depth=2,
        epochs=30,
    )
    model = train_cyclegan(hp, [(ds_a, ds_b)])
    out = model.predict(ds_a)
    # translated A should land near B's mean (shift ~ 3)
    mean_out = float(np.asarray(out["T"].data).mean())
    assert 2.0 < mean_out < 4.0
    # reverse translation goes back toward A's mean (~0)
    back = model.reverse(ds_b)
    assert abs(float(np.asarray(back["T"].data).mean())) < 1.0
    # roundtrip
    path = str(tmp_path / "cgan")
    fit.dump(model, path)
    loaded = fit.load(path)
    out2 = loaded.predict(ds_a)
    np.testing.assert_allclose(
        np.asarray(out["T"].data), np.asarray(out2["T"].data), atol=1e-5
    )


def test_cyclegan_registered():
    from fv3net_tpu.fit.train import training_function_names

    assert "cyclegan" in training_function_names()
