"""Explicit shard_map+ppermute halo vs the single-process oracle.

VERDICT r1 #2: the hand-written corner-aware multi-device halo path,
bit-compared against the (f64-exact numpy) gather-table halo.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fv3net_tpu.parallel.halo import halo_append_numpy
from fv3net_tpu.parallel.shardmap_halo import (
    block_slice,
    blocks_to_global,
    halo_blocks_shardmap,
)


def _mesh(p):
    devs = jax.devices()
    if len(devs) < p * p:
        pytest.skip(f"needs {p * p} devices")
    return Mesh(np.array(devs[: p * p]).reshape(p, p), ("fv", "fv_x"))


@pytest.mark.parametrize("p,n,h", [(2, 12, 2), (2, 8, 1), (1, 6, 2)])
def test_shardmap_halo_matches_numpy_oracle(p, n, h):
    mesh = _mesh(p)
    rng = np.random.default_rng(0)
    field = rng.standard_normal((6, 3, n, n)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(field),
        NamedSharding(mesh, P(None, None, "fv", "fv_x")),
    )
    blocks = np.asarray(halo_blocks_shardmap(sharded, h, mesh))

    ext = halo_append_numpy(field.astype(np.float64), h).astype(np.float32)
    m = n // p
    for r in range(p):
        for c in range(p):
            want = block_slice(ext, r, c, m, h)
            np.testing.assert_array_equal(
                blocks[:, :, r, c], want,
                err_msg=f"block ({r},{c})",
            )
    # interiors reassemble to the original field
    np.testing.assert_array_equal(
        np.asarray(blocks_to_global(jnp.asarray(blocks), h)), field
    )


def test_shardmap_halo_under_jit():
    mesh = _mesh(2)
    rng = np.random.default_rng(1)
    n, h = 8, 2
    field = rng.standard_normal((6, 2, n, n)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(field),
        NamedSharding(mesh, P(None, None, "fv", "fv_x")),
    )
    fn = jax.jit(lambda x: halo_blocks_shardmap(x, h, mesh))
    blocks = np.asarray(fn(sharded))
    ext = halo_append_numpy(field.astype(np.float64), h).astype(np.float32)
    m = n // 2
    for r in range(2):
        for c in range(2):
            np.testing.assert_array_equal(
                blocks[:, :, r, c], block_slice(ext, r, c, m, h)
            )


def test_rectangular_layout_rejected():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("fv", "fv_x"))
    field = jnp.zeros((6, 1, 8, 8))
    with pytest.raises(ValueError, match="square"):
        halo_blocks_shardmap(field, 1, mesh)
