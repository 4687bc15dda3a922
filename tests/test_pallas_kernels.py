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
