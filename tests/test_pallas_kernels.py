"""Pallas kernel correctness vs the XLA reference path (interpret mode
on CPU; the same kernel runs compiled on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fv3net_tpu.ops import coarsen as xla_c
from fv3net_tpu.ops.pallas_kernels import weighted_block_average_pallas

jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("factor,shape", [
    (8, (2, 128, 1024)),   # aligned C-style shapes
    (4, (1, 32, 512)),
])
def test_pallas_weighted_block_average_matches_xla(factor, shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    w = jnp.asarray(rng.rand(*shape), jnp.float32)
    got = np.asarray(
        weighted_block_average_pallas(x, w, factor, interpret=True)
    )
    want = np.asarray(xla_c.weighted_block_average(x, w, factor))
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_pallas_fallback_on_unaligned_shapes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(6, 12, 12), jnp.float32)  # 12/2=6 not /8
    w = jnp.ones_like(x)
    out = np.asarray(weighted_block_average_pallas(x, w, 2, interpret=True))
    want = np.asarray(xla_c.weighted_block_average(x, w, 2))
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_pallas_remap_apply_matches_xla():
    """The fused remap kernel (interpret mode on CPU) matches the XLA
    banded path to f32 summation-order noise, and conserves column mass
    exactly by telescoping."""
    import numpy as np
    import jax.numpy as jnp
    from fv3net_tpu.ops import remap as rm
    from fv3net_tpu.ops import pallas_remap as pr

    rng = np.random.RandomState(0)
    shape, km = (6, 16, 16), 32
    pe1 = np.cumsum(np.abs(rng.rand(*shape, km + 1)) + 1.0, -1) * 300.0
    pe2 = pe1.copy()
    pe2[..., 1:-1] += (
        0.3 * np.diff(pe1, axis=-1)[..., :-1] * rng.randn(*shape, km - 1)
    )
    pe2.sort(-1)
    pe2[..., 0] = pe1[..., 0]
    pe2[..., -1] = pe1[..., -1]
    pe1j = jnp.asarray(pe1, jnp.float32)
    pe2j = jnp.asarray(pe2, jnp.float32)
    search = rm.banded_search(pe1j, pe2j, 2)
    packed = pr.pack_search(search)
    for F in (None, 3):
        qshape = ((F,) if F else ()) + shape + (km,)
        q = jnp.asarray(rng.rand(*qshape) + 0.1, jnp.float32)
        dp1 = jnp.broadcast_to(search["dp1"], q.shape)
        al, ar, a6 = rm.cs_profile(q, dp1, 1, 9)
        want = np.asarray(rm.remap_apply(search, q, iv=1, kord=9,
                                         use_pallas=False))
        got = np.asarray(
            pr.apply_packed(packed, q, al, ar, a6, interpret=True)
        )
        # same distance from the f64 truth; differs only in summation
        # order, whose absolute size is set by the cumulative-mass scale
        # and is amplified pointwise in thin layers -- so compare
        # mass-weighted (the conserved quantity), plus a loose pointwise
        # bound
        dp2w = pe2[..., 1:] - pe2[..., :-1]
        assert np.abs((got - want) * dp2w).max() < 5e-3
        np.testing.assert_allclose(got, want, atol=5e-3)
        # conservation is telescoping-exact up to f32 roundoff
        dp2 = pe2[..., 1:] - pe2[..., :-1]
        np.testing.assert_allclose(
            (got * dp2).sum(-1),
            (np.asarray(q) * np.diff(pe1, axis=-1)).sum(-1),
            rtol=2e-6,
        )
