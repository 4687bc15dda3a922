import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.grid.geometry import make_grid, _face_xyz, NUM_TILES
from fv3net_tpu.parallel.halo import halo_append, build_halo_tables


@pytest.fixture(scope="module")
def grid12():
    return make_grid(12)


def test_total_area(grid12):
    total = grid12.area.sum()
    assert abs(total / (4 * np.pi * grid12.radius ** 2) - 1) < 1e-12


def test_topology_reciprocity(grid12):
    for (t, e), m in grid12.topology.items():
        back = grid12.topology[(m.neighbor_tile, m.neighbor_edge)]
        assert back.neighbor_tile == t
        assert back.neighbor_edge == e
        assert back.reversed == m.reversed
    assert len(grid12.topology) == 24


def test_edge_lengths_positive(grid12):
    assert (grid12.edge_len_x > 0).all()
    assert (grid12.edge_len_y > 0).all()


def test_normals_unit_and_tangent(grid12):
    g = grid12
    assert np.abs((g.normal_x ** 2).sum(-1) - 1).max() < 1e-12
    assert np.abs((g.normal_y ** 2).sum(-1) - 1).max() < 1e-12
    # east/north orthonormal to khat
    assert np.abs((g.east * g.khat).sum(-1)).max() < 1e-12
    assert np.abs((g.north * g.khat).sum(-1)).max() < 1e-12
    assert np.abs((g.east * g.north).sum(-1)).max() < 1e-12


def _gnomonic_extension_positions(n, h):
    """Cell centers extended beyond each face by continuing the equiangular
    coordinate (approximates where halo cells 'should' be)."""
    ang = np.linspace(-np.pi / 4, np.pi / 4, n + 1)
    d = ang[1] - ang[0]
    ang_ext = np.concatenate(
        [ang[0] - d * np.arange(h, 0, -1), ang, ang[-1] + d * np.arange(1, h + 1)]
    )
    mid = 0.5 * (ang_ext[:-1] + ang_ext[1:])
    Xm = np.tan(mid)
    out = []
    for t in range(NUM_TILES):
        XX, YY = np.meshgrid(Xm, Xm, indexing="xy")
        out.append(_face_xyz(t, XX, YY))
    return np.stack(out)


@pytest.mark.parametrize("h", [1, 3])
def test_halo_geometric_adjacency(h):
    """Halo cells must be geometrically close to the continued coordinate
    positions: within ~1.2 cell widths on edges (grids are discontinuous
    across tile edges by O(dx))."""
    n = 12
    g = make_grid(n)
    tables = build_halo_tables(g.topology, n, h)

    # a gather of positions themselves: exchange each xyz component
    ext = np.stack(
        [
            np.asarray(halo_append(jnp.asarray(g.centers_xyz[..., c]), h, tables))
            for c in range(3)
        ],
        axis=-1,
    )
    expected = _gnomonic_extension_positions(n, h)
    cell_width = np.pi / 2 / n  # radians
    for t in range(NUM_TILES):
        for sl in [
            (slice(h, h + n), slice(0, h)),
            (slice(h, h + n), slice(h + n, None)),
            (slice(0, h), slice(h, h + n)),
            (slice(h + n, None), slice(h, h + n)),
        ]:
            got = ext[t][sl]
            want = expected[t][sl]
            dist = np.arccos(
                np.clip((got * want).sum(-1) / np.linalg.norm(got, axis=-1), -1, 1)
            )
            assert dist.max() < 1.2 * cell_width * h, (t, sl, dist.max())


def test_halo_interior_preserved():
    n, h = 12, 2
    g = make_grid(n)
    field = np.sin(3 * g.centers_xyz[..., 0]) * g.centers_xyz[..., 2]
    ext = np.asarray(halo_append(jnp.asarray(field), h))
    np.testing.assert_allclose(ext[:, h : h + n, h : h + n], field, rtol=1e-6)


def test_halo_corners_filled():
    n, h = 12, 2
    g = make_grid(n)
    field = 1.0 + np.cos(g.centers_xyz[..., 1])
    ext = np.asarray(halo_append(jnp.asarray(field), h))
    # corner blocks must contain data (filled through the N/S neighbor)
    for t in range(NUM_TILES):
        for sl in [
            (slice(0, h), slice(0, h)),
            (slice(0, h), slice(h + n, None)),
            (slice(h + n, None), slice(0, h)),
            (slice(h + n, None), slice(h + n, None)),
        ]:
            assert np.abs(ext[t][sl]).min() > 0.5  # field is >= 1 everywhere... 2-cos<=2


def test_halo_leading_dims():
    n, h = 6, 1
    g = make_grid(n)
    field = np.random.RandomState(0).rand(NUM_TILES, 4, n, n)
    ext = np.asarray(halo_append(jnp.asarray(field), h))
    assert ext.shape == (NUM_TILES, 4, n + 2 * h, n + 2 * h)
    # each level exchanged independently
    single = np.asarray(halo_append(jnp.asarray(field[:, 2]), h))
    np.testing.assert_allclose(ext[:, 2], single, rtol=1e-6)


def test_halo_smooth_function_convergence():
    """Halo mismatch vs continued-coordinate prediction should shrink ~1/n."""
    errs = []
    for n in (8, 16):
        h = 1
        g = make_grid(n)
        field = np.sin(3 * g.centers_xyz[..., 0]) + np.cos(
            2 * g.centers_xyz[..., 1]
        ) * g.centers_xyz[..., 2]
        ext = np.asarray(halo_append(jnp.asarray(field), h))
        pos = _gnomonic_extension_positions(n, h)
        expected = np.sin(3 * pos[..., 0]) + np.cos(2 * pos[..., 1]) * pos[..., 2]
        err = 0.0
        for t in range(NUM_TILES):
            for sl in [
                (slice(h, h + n), slice(0, h)),
                (slice(h, h + n), slice(h + n, None)),
                (slice(0, h), slice(h, h + n)),
                (slice(h + n, None), slice(h, h + n)),
            ]:
                err = max(err, np.abs(ext[t][sl] - expected[t][sl]).max())
        errs.append(err)
    assert errs[1] < 0.65 * errs[0]


def test_halo_impls_bit_identical():
    """concat (single-device default), slices, and gather (multi-device
    default) must agree bitwise — the dycore relies on exchanging them
    freely between single-chip and sharded runs."""
    from fv3net_tpu.parallel.halo import (
        halo_append_concat,
        halo_append_gather,
        halo_append_numpy,
    )

    rng = np.random.RandomState(7)
    for n, h, lead in [(12, 3, (4,)), (8, 1, ()), (6, 2, (3, 2))]:
        fj = jnp.asarray(rng.randn(6, *lead, n, n))
        # oracle on the device dtype (x64 on/off agnostic)
        want = halo_append_numpy(np.asarray(fj), h)
        for got in (
            np.asarray(halo_append_concat(fj, h)),
            np.asarray(halo_append_gather(fj, h)),
            np.asarray(halo_append(fj, h, impl="slices")),
        ):
            assert np.array_equal(want, got), (n, h)
