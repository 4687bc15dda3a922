"""Explicit shard_map+ppermute halo vs the single-process oracle.

VERDICT r1 #2 / r2 #5: the hand-written corner-aware multi-device halo
path — now generalized to RECTANGULAR (py, px) layouts and promoted to
the default multi-device backend of ``halo_append`` — bit-compared
against the (f64-exact numpy) gather-table halo.
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
    halo_append_shardmap,
    halo_blocks_shardmap,
)


def _mesh(py, px):
    devs = jax.devices()
    if len(devs) < py * px:
        pytest.skip(f"needs {py * px} devices")
    return Mesh(np.array(devs[: py * px]).reshape(py, px), ("fv", "fv_x"))


@pytest.mark.parametrize(
    "py,px,n,h",
    [
        (2, 2, 12, 2),
        (2, 2, 8, 1),
        (1, 1, 6, 2),
        # rectangular layouts: rotated cube edges need multi-source
        # assembly (r2 verdict #5 generalization)
        (4, 2, 8, 2),
        (2, 4, 8, 2),
        (4, 2, 12, 3),
        (8, 1, 8, 1),
        (1, 8, 8, 1),
    ],
)
def test_shardmap_halo_matches_numpy_oracle(py, px, n, h):
    mesh = _mesh(py, px)
    rng = np.random.default_rng(0)
    field = rng.standard_normal((6, 3, n, n)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(field),
        NamedSharding(mesh, P(None, None, "fv", "fv_x")),
    )
    blocks = np.asarray(halo_blocks_shardmap(sharded, h, mesh))

    ext = halo_append_numpy(field.astype(np.float64), h).astype(np.float32)
    my, mx = n // py, n // px
    for r in range(py):
        for c in range(px):
            want = block_slice(ext, r, c, my, h, mx)
            np.testing.assert_array_equal(
                blocks[:, :, r, c], want,
                err_msg=f"block ({r},{c})",
            )
    # interiors reassemble to the original field
    np.testing.assert_array_equal(
        np.asarray(blocks_to_global(jnp.asarray(blocks), h)), field
    )


@pytest.mark.parametrize("py,px,n,h", [(2, 2, 8, 2), (4, 2, 8, 2)])
def test_halo_append_shardmap_matches_extended_oracle(py, px, n, h):
    """The drop-in halo_append form: full extended global array."""
    mesh = _mesh(py, px)
    rng = np.random.default_rng(3)
    field = rng.standard_normal((6, 2, n, n)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(field),
        NamedSharding(mesh, P(None, None, "fv", "fv_x")),
    )
    got = np.asarray(halo_append_shardmap(sharded, h, mesh))
    want = halo_append_numpy(field.astype(np.float64), h).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_shardmap_halo_under_jit():
    mesh = _mesh(2, 2)
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


def test_halo_append_defaults_to_explicit_exchange():
    """With a registered active mesh, multi-device halo_append routes
    through the explicit ppermute path (r2 verdict #5) — and still
    matches the f64 numpy oracle bit-for-bit."""
    from fv3net_tpu.parallel import halo as halo_mod
    from fv3net_tpu.parallel import sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    prev = halo_mod.active_mesh()
    try:
        mesh = sharded.make_mesh(8)  # registers the mesh
        assert halo_mod.active_mesh() is mesh
        rng = np.random.default_rng(5)
        field = jnp.asarray(
            rng.standard_normal((6, 3, 8, 8)).astype(np.float32)
        )
        fs = jax.device_put(
            field,
            NamedSharding(mesh, P(None, None, "fv", "fv_x")),
        )
        got = np.asarray(jax.jit(lambda x: halo_mod.halo_append(x, 2))(fs))
        want = halo_append_numpy(
            np.asarray(field, np.float64), 2
        ).astype(np.float32)
        np.testing.assert_array_equal(got, want)
        # an ineligible grid (not divisible by the layout) falls back
        odd = jnp.zeros((6, 1, 6, 6), jnp.float32)  # 6 % 4 != 0
        out = halo_mod.halo_append(odd, 1)
        assert out.shape == (6, 1, 8, 8)
    finally:
        halo_mod.set_active_mesh(prev)
