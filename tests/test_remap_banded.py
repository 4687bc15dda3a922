"""Banded-window remap path equals the full search on nearby grids."""
import numpy as np
import pytest
import jax

from fv3net_tpu.ops import remap

jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("iv,kord", [(1, 1), (0, 9), (2, 9), (-1, 9)])
def test_banded_matches_full_for_nearby_grids(iv, kord):
    rng = np.random.RandomState(0)
    n, km = 40, 24
    pe1 = np.sort(rng.uniform(300, 1e5, (n, km + 1)), axis=-1)
    pe1[:, 0] = 300.0
    dp = np.diff(pe1, axis=-1)
    # target edges displaced by up to 40% of the local layer thickness
    shift = 0.4 * dp.min(axis=-1, keepdims=True) * rng.uniform(
        -1, 1, (n, km + 1)
    )
    pe2 = pe1 + shift
    pe2[:, 0] = pe1[:, 0]
    pe2[:, -1] = pe1[:, -1]
    pe2 = np.sort(pe2, axis=-1)
    q1 = rng.uniform(0.1, 10.0, (n, km))
    full = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=iv, kord=kord))
    banded = np.asarray(
        remap.remap_ppm(pe1, q1, pe2, iv=iv, kord=kord, window=2)
    )
    np.testing.assert_allclose(banded, full, rtol=1e-10)


def test_banded_ignored_for_mismatched_sizes():
    rng = np.random.RandomState(1)
    pe1 = np.sort(rng.uniform(300, 1e5, (5, 21)), axis=-1)
    q1 = rng.rand(5, 20)
    pe2 = np.sort(rng.uniform(300, 1e5, (5, 11)), axis=-1)
    a = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=1))
    b = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=1, window=2))
    np.testing.assert_allclose(a, b)


def test_shared_search_matches_remap_ppm():
    """banded_search + remap_apply == the one-shot banded remap_ppm for
    every iv/kord and for leading-axis field stacks (the dycore fast
    path: one search shared by all remapped fields)."""
    import numpy as np
    import jax.numpy as jnp
    from fv3net_tpu.ops import remap as rm

    rng = np.random.RandomState(7)
    shape, km = (6, 5, 5), 24
    pe1 = np.cumsum(np.abs(rng.rand(*shape, km + 1)) + 1.0, -1) * 300.0
    pe2 = pe1.copy()
    pe2[..., 1:-1] += (
        0.3 * np.diff(pe1, axis=-1)[..., :-1] * rng.randn(*shape, km - 1)
    )
    pe2.sort(-1)
    pe2[..., 0] = pe1[..., 0]
    pe2[..., -1] = pe1[..., -1]
    pe1j, pe2j = jnp.asarray(pe1), jnp.asarray(pe2)
    search = rm.banded_search(pe1j, pe2j, window=2)
    for iv in (1, 2, 0, -1):
        for kord in (9, 7):
            q = jnp.asarray(rng.rand(*shape, km) + 0.1)
            want = rm.remap_ppm(pe1j, q, pe2j, iv=iv, kord=kord, window=2)
            got = rm.remap_apply(search, q, iv=iv, kord=kord)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-10
            )
    qb = jnp.asarray(rng.rand(4, *shape, km))
    want = rm.remap_ppm(pe1j[None], qb, pe2j[None], iv=1, kord=9, window=2)
    got = rm.remap_apply(search, qb, iv=1, kord=9)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-10
    )
