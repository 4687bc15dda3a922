"""iv=-2 (vertical velocity) remap variant (reference mappm.f90:153-176,617).

The w-variant pins the bottom reconstruction edge to a prescribed surface
value ``qs`` and solves a symmetric tridiagonal system for the interior
edge estimates.  The oracle here assembles that tridiagonal system
explicitly and solves it with ``np.linalg.solve`` — an independent check
of the scan-based Thomas elimination in ``cs_profile``.
"""
import numpy as np
import pytest
import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.ops import remap  # noqa: E402


def oracle_w_edges(q, delp, qs):
    """Solve the iv=-2 edge system directly: unknowns qe[0..km-1], with
    qe[km] = qs.  Rows (derived from the published elimination
    coefficients): 2*qe0 + qe1 = 3*q0; for j in [1, km-2]:
    qe[j-1] + (2+2g)qe[j] + g*qe[j+1] = 3(q[j-1]+q[j]), g=dp[j-1]/dp[j];
    bottom row folds the known qe[km]=qs into the RHS."""
    km = q.shape[-1]
    A = np.zeros((km, km))
    d = np.zeros(km)
    A[0, 0], A[0, 1], d[0] = 2.0, 1.0, 3.0 * q[0]
    for j in range(1, km - 1):
        g = delp[j - 1] / delp[j]
        A[j, j - 1] = 1.0
        A[j, j] = 2.0 + 2.0 * g
        if j < km - 1:
            A[j, j + 1] = g
        d[j] = 3.0 * (q[j - 1] + q[j])
    g = delp[km - 2] / delp[km - 1]
    A[km - 1, km - 2] = 1.0
    A[km - 1, km - 1] = 2.0 + 2.0 * g
    d[km - 1] = 3.0 * (q[km - 2] + q[km - 1]) - g * qs
    qe = np.linalg.solve(A, d)
    return np.concatenate([qe, [qs]])


def test_cs_profile_w_edges_match_tridiagonal_oracle():
    rng = np.random.RandomState(3)
    n, km = 12, 24
    q = rng.randn(n, km)
    delp = rng.uniform(0.5, 3.0, (n, km))
    qs = rng.randn(n)
    # |kord| > 16: unlimited linear path -> al/ar are the raw edges
    al, ar, a6 = remap.cs_profile(
        jax.numpy.asarray(q), jax.numpy.asarray(delp), iv=-2, kord=17,
        qs=jax.numpy.asarray(qs),
    )
    al, ar = np.asarray(al), np.asarray(ar)
    for i in range(n):
        edges = oracle_w_edges(q[i], delp[i], qs[i])
        np.testing.assert_allclose(al[i], edges[:-1], rtol=1e-12)
        np.testing.assert_allclose(ar[i], edges[1:], rtol=1e-12)
    # the bottom edge IS the prescribed surface value
    np.testing.assert_allclose(ar[:, -1], qs, rtol=1e-14)


@pytest.mark.parametrize("kord", [9, 17])
def test_w_remap_conserves_mass_and_identity(kord):
    rng = np.random.RandomState(5)
    n, km = 20, 32
    pe1 = np.sort(rng.uniform(300, 1e5, (n, km + 1)), axis=-1)
    pe1[:, 0] = 300.0
    dp = np.diff(pe1, axis=-1)
    shift = 0.4 * dp.min(-1, keepdims=True) * rng.uniform(-1, 1, (n, km + 1))
    pe2 = np.sort(pe1 + shift, axis=-1)
    pe2[:, 0] = pe1[:, 0]
    pe2[:, -1] = pe1[:, -1]
    w1 = rng.randn(n, km)
    qs = rng.randn(n)
    # identity remap returns the field unchanged
    same = np.asarray(remap.remap_ppm(pe1, w1, pe1, iv=-2, kord=kord, qs=qs))
    np.testing.assert_allclose(same, w1, rtol=1e-9, atol=1e-12)
    # mass (integral of w dp) is conserved on the common domain
    w2 = np.asarray(remap.remap_ppm(pe1, w1, pe2, iv=-2, kord=kord, qs=qs))
    m1 = (w1 * np.diff(pe1, axis=-1)).sum(-1)
    m2 = (w2 * np.diff(pe2, axis=-1)).sum(-1)
    np.testing.assert_allclose(m1, m2, rtol=1e-10)


def test_w_remap_default_qs_zero():
    """qs=None means a rigid lower boundary (w=0 at the surface)."""
    rng = np.random.RandomState(9)
    km = 16
    pe1 = np.linspace(300.0, 1e5, km + 1)
    w1 = rng.randn(km)
    a = np.asarray(remap.remap_ppm(pe1, w1, pe1, iv=-2, kord=17))
    b = np.asarray(
        remap.remap_ppm(pe1, w1, pe1, iv=-2, kord=17, qs=np.zeros(()))
    )
    np.testing.assert_allclose(a, b, rtol=1e-14)


def test_banded_apply_matches_remap_ppm_for_w():
    """banded_search + remap_apply == one-shot remap_ppm at iv=-2."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    shape, km = (6, 4, 4), 24
    pe1 = np.cumsum(np.abs(rng.rand(*shape, km + 1)) + 1.0, -1) * 300.0
    pe2 = pe1.copy()
    pe2[..., 1:-1] += (
        0.3 * np.diff(pe1, axis=-1)[..., :-1] * rng.randn(*shape, km - 1)
    )
    pe2.sort(-1)
    pe2[..., 0] = pe1[..., 0]
    pe2[..., -1] = pe1[..., -1]
    pe1j, pe2j = jnp.asarray(pe1), jnp.asarray(pe2)
    search = remap.banded_search(pe1j, pe2j, window=2)
    w = jnp.asarray(rng.randn(*shape, km))
    qs = jnp.asarray(rng.randn(*shape))
    want = remap.remap_ppm(pe1j, w, pe2j, iv=-2, kord=9, window=2, qs=qs)
    got = remap.remap_apply(search, w, iv=-2, kord=9, qs=qs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-10
    )
