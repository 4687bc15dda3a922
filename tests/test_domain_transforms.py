"""Subdomain divider + emulation tensor transforms."""
import numpy as np
import pytest
import jax.numpy as jnp

from fv3net_tpu.emulation.transforms import (
    ComposedTransform,
    Difference,
    LimitValueTransform,
    LogTransform,
)
from fv3net_tpu.fit.domain import CubeXYDivider


def test_divider_roundtrip_no_overlap():
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.rand(6, 8, 8, 3))
    div = CubeXYDivider((2, 2), overlap=0, rank_extent=(8, 8))
    subs = div.get_subdomains(field)
    assert subs.shape == (24, 4, 4, 3)
    back = div.merge_subdomains(subs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(field))


def test_divider_overlap_interiors_match():
    rng = np.random.RandomState(1)
    field = jnp.asarray(rng.rand(6, 8, 8))
    div = CubeXYDivider((2, 2), overlap=2, rank_extent=(8, 8))
    subs = np.asarray(div.get_subdomains(field))
    assert subs.shape == (24, 8, 8)
    # interior of each subdomain equals the corresponding tile block
    interior = subs[:, 2:-2, 2:-2]
    back = np.asarray(div.merge_subdomains(jnp.asarray(interior)))
    np.testing.assert_allclose(back, np.asarray(field))
    # flattened features
    flat = div.flatten_subdomain_features(jnp.asarray(subs))
    assert flat.shape == (24, 64)


def test_divider_overlap_is_neighbor_data():
    """Overlap cells within a tile equal the adjacent subdomain's edge."""
    field = jnp.asarray(
        np.arange(6 * 8 * 8, dtype=float).reshape(6, 8, 8)
    )
    div = CubeXYDivider((2, 2), overlap=1, rank_extent=(8, 8))
    subs = np.asarray(div.get_subdomains(field))
    f = np.asarray(field)
    # subdomain (j=0,i=0) of tile 0 is index 0; its east overlap column
    # equals tile 0 column 4 rows 0..3
    np.testing.assert_allclose(subs[0, 1:-1, -1], f[0, 0:4, 4])


def test_log_transform_roundtrip():
    t = LogTransform("cloud", epsilon=1e-20)
    x = {"cloud": jnp.asarray([1e-5, 2e-3, 0.0])}
    f = t.forward(x)
    assert "log_cloud" in f
    b = t.backward({"log_cloud": f["log_cloud"]})
    np.testing.assert_allclose(
        np.asarray(b["cloud"]), [1e-5, 2e-3, 1e-20], rtol=1e-5
    )


def test_difference_and_compose():
    # backward runs in reverse order: the limiter is placed first so it
    # clips T_out after Difference.backward reconstructs it
    chain = ComposedTransform(
        [
            LimitValueTransform("T_out", lower=0.0),
            Difference(to="dT", before="T_in", after="T_out"),
        ]
    )
    x = {"T_in": jnp.asarray([1.0, 2.0]), "T_out": jnp.asarray([1.5, 1.0])}
    f = chain.forward(x)
    np.testing.assert_allclose(np.asarray(f["dT"]), [0.5, -1.0])
    # backward from a predicted difference
    y = {"T_in": x["T_in"], "dT": jnp.asarray([0.5, -5.0])}
    b = chain.backward(y)
    np.testing.assert_allclose(np.asarray(b["T_out"]), [1.5, 0.0])
