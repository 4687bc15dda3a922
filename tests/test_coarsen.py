"""Block coarsening op tests against direct numpy computations."""
import numpy as np
import pytest
import jax

from fv3net_tpu.ops import coarsen

jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def np_block_reduce(x, f, fn):
    ny, nx = x.shape[-2:]
    out = np.empty(x.shape[:-2] + (ny // f, nx // f))
    for i in range(ny // f):
        for j in range(nx // f):
            out[..., i, j] = fn(
                x[..., i * f : (i + 1) * f, j * f : (j + 1) * f], axis=(-2, -1)
            )
    return out


@pytest.mark.parametrize("method,npfn", [
    ("sum", np.sum), ("mean", np.mean), ("median", np.median),
    ("min", np.min), ("max", np.max),
])
def test_block_reductions(rng, method, npfn):
    x = rng.randn(3, 12, 8)
    got = np.asarray(coarsen.block_coarsen(x, 4, method))
    want = np_block_reduce(x, 4, npfn)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_weighted_block_average(rng):
    x = rng.randn(2, 8, 8)
    w = rng.uniform(0.5, 2.0, (8, 8))
    got = np.asarray(coarsen.weighted_block_average(x, w, 2))
    want = np_block_reduce(x * w, 2, np.sum) / np_block_reduce(
        np.broadcast_to(w, x.shape), 2, np.sum
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # constant field invariant under weighting
    const = np.full((8, 8), 7.0)
    np.testing.assert_allclose(
        np.asarray(coarsen.weighted_block_average(const, w, 4)), 7.0, rtol=1e-12
    )


def test_edge_weighted_block_average_x(rng):
    # x-edge variable on (ny+1, nx) grid: coarsen x, subsample y
    x = rng.randn(9, 8)
    sp = rng.uniform(0.5, 2.0, (9, 8))
    got = np.asarray(coarsen.edge_weighted_block_average(x, sp, 2, edge="x"))
    assert got.shape == (5, 4)
    want00 = (x[0, :2] * sp[0, :2]).sum() / sp[0, :2].sum()
    np.testing.assert_allclose(got[0, 0], want00, rtol=1e-12)
    # subsampled rows are 0, 2, 4, ...
    want20 = (x[4, 2:4] * sp[4, 2:4]).sum() / sp[4, 2:4].sum()
    np.testing.assert_allclose(got[2, 1], want20, rtol=1e-12)


def test_edge_weighted_block_average_y(rng):
    x = rng.randn(8, 9)
    sp = rng.uniform(0.5, 2.0, (8, 9))
    got = np.asarray(coarsen.edge_weighted_block_average(x, sp, 2, edge="y"))
    assert got.shape == (4, 5)
    want00 = (x[:2, 0] * sp[:2, 0]).sum() / sp[:2, 0].sum()
    np.testing.assert_allclose(got[0, 0], want00, rtol=1e-12)


def test_block_edge_sum(rng):
    x = rng.randn(9, 8)
    got = np.asarray(coarsen.block_edge_sum(x, 2, edge="x"))
    assert got.shape == (5, 4)
    np.testing.assert_allclose(got[0, 0], x[0, :2].sum(), rtol=1e-12)
    np.testing.assert_allclose(got[1, 1], x[2, 2:4].sum(), rtol=1e-12)


def test_block_mode(rng):
    x = np.array([
        [1.0, 1.0, 2.0, 3.0],
        [1.0, 2.0, 3.0, 3.0],
        [5.0, 5.0, 0.0, 0.0],
        [5.0, 6.0, 0.0, 7.0],
    ])
    got = np.asarray(coarsen.block_mode(x, 2))
    np.testing.assert_allclose(got, [[1.0, 3.0], [5.0, 0.0]])
    # tie-break toward smallest value, like scipy.stats.mode
    tie = np.array([[1.0, 2.0], [2.0, 1.0]])
    np.testing.assert_allclose(np.asarray(coarsen.block_mode(tie, 2)), [[1.0]])


def test_block_upsample_roundtrip(rng):
    x = rng.randn(4, 4)
    up = np.asarray(coarsen.block_upsample(x, 3))
    assert up.shape == (12, 12)
    np.testing.assert_allclose(np.asarray(coarsen.block_mean(up, 3)), x, rtol=1e-12)


def test_mass_conservation_weighted_average(rng):
    """Area-weighted coarse mean times coarse area == fine integral."""
    x = rng.randn(8, 8)
    area = rng.uniform(0.5, 2.0, (8, 8))
    coarse = np.asarray(coarsen.weighted_block_average(x, area, 4))
    coarse_area = np.asarray(coarsen.block_sum(area, 4))
    np.testing.assert_allclose(
        (coarse * coarse_area).sum(), (x * area).sum(), rtol=1e-12
    )


def test_indivisible_raises():
    with pytest.raises(ValueError):
        coarsen.block_sum(np.zeros((7, 8)), 2)
