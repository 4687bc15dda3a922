"""CycleGAN trainer: learns a simple domain shift; dump/load roundtrip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu import fit
from fv3net_tpu.core.dataset import Dataset
from fv3net_tpu.core.quantity import Quantity
from fv3net_tpu.fit.cyclegan import (
    CycleGANHyperparameters,
    DiscriminatorConfig,
    GeneratorConfig,
    train_cyclegan,
)

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
        generator=GeneratorConfig(
            n_convolutions=2, n_resnet=1, max_filters=32
        ),
        discriminator=DiscriminatorConfig(
            n_convolutions=2, max_filters=32
        ),
        image_pool_size=4,
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


def test_image_pool_semantics():
    """In-graph replay pool follows the reference rule (image_pool.py):
    fill-then-return while filling; once full, ~50% return a stored
    image and swap the current one in."""
    import jax
    from fv3net_tpu.fit.cyclegan import pool_query

    P = 4
    pool = jnp.zeros((P, 2))
    count = jnp.int32(0)
    key = jax.random.PRNGKey(0)
    # filling phase: every query returns the current image and inserts
    for i in range(P):
        key, k = jax.random.split(key)
        img = jnp.full((2,), float(i + 1))
        pool, count, ret = pool_query(pool, count, k, img)
        np.testing.assert_array_equal(np.asarray(ret), np.asarray(img))
    assert int(count) == P
    np.testing.assert_array_equal(
        np.asarray(pool[:, 0]), [1.0, 2.0, 3.0, 4.0]
    )
    # full phase: returns are either the current image or a pool member,
    # and both branches occur over many draws
    used_old = used_new = 0
    for i in range(64):
        key, k = jax.random.split(key)
        img = jnp.full((2,), 100.0 + i)
        before = np.asarray(pool).copy()
        pool, count, ret = pool_query(pool, count, k, img)
        r = float(np.asarray(ret)[0])
        if r == 100.0 + i:
            used_new += 1
            np.testing.assert_array_equal(np.asarray(pool), before)
        else:
            used_old += 1
            assert r in before[:, 0]  # returned a stored image
            assert 100.0 + i in np.asarray(pool)[:, 0]  # swapped in
    assert used_old > 10 and used_new > 10
    assert int(count) == P


def test_generator_shapes_and_resolution_pyramid():
    """The ResNet encoder/decoder halves and restores resolution through
    the strided pyramid, with cube-seam-consistent convs at every
    level."""
    import jax
    from fv3net_tpu.fit.cyclegan import (
        apply_generator,
        apply_discriminator,
        init_discriminator,
        init_generator,
        _geo_features,
    )

    n, C = 8, 3
    gcfg = GeneratorConfig(n_convolutions=2, n_resnet=2, max_filters=16)
    dcfg = DiscriminatorConfig(n_convolutions=2, max_filters=16)
    geo = _geo_features(n)
    gp = init_generator(jax.random.PRNGKey(0), gcfg, C, n)
    dp = init_discriminator(jax.random.PRNGKey(1), dcfg, C)
    x = jnp.asarray(np.random.RandomState(0).randn(6, n, n, C), jnp.float32)
    y = apply_generator(gp, gcfg, geo, x)
    assert y.shape == (6, n, n, C)
    # PatchGAN: a per-patch score MAP, not a scalar
    d = apply_discriminator(dp, dcfg, geo, x)
    assert d.shape == (6, n // 4, n // 4, 1)
