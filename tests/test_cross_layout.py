"""Cross-layout assembly and small cubedsphere utility tests.

Reference semantics: external/vcm/vcm/cubedsphere/{cross.py,coarsen.py,
grid_metadata.py}.
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from fv3net_tpu.grid import CROSS_LAYOUT, GridMetadata, to_cross
from fv3net_tpu.grid.geometry import make_grid
from fv3net_tpu.ops.coarsen import (
    coarsen_coords,
    horizontal_block_reduce,
    shift_edge_var_to_center,
)


def test_to_cross_shape_and_fill():
    field = np.arange(6 * 4 * 4, dtype=np.float32).reshape(6, 4, 4)
    out = to_cross(field)
    assert out.shape == (12, 16)
    # placed blocks carry the data
    for tile, (row, col) in CROSS_LAYOUT.items():
        np.testing.assert_array_equal(
            out[row * 4 : (row + 1) * 4, col * 4 : (col + 1) * 4], field[tile]
        )
    # unplaced blocks are NaN
    assert np.isnan(out[0, 15])


def test_to_cross_edge_continuity_on_real_grid():
    """The physical test: neighboring blocks in the cross must be
    spatially continuous (distance between adjacent cell centers across
    a seam ~ one grid spacing)."""
    grid = make_grid(12)
    xyz = grid.centers_xyz  # [6, n, n, 3]
    cross = to_cross(np.moveaxis(xyz, -1, 0))  # [3, 3n, 4n]
    n = 12
    spacing = 2.0 / n  # rough chord spacing on the unit sphere ~ (pi/2)/n

    def gap(a, b):
        return np.linalg.norm(a - b, axis=0).max()

    # equatorial ring seams: tiles 0|1, 1|2, 2|3
    for col in (1, 2, 3):
        left = cross[:, n : 2 * n, col * n - 1]
        right = cross[:, n : 2 * n, col * n]
        assert gap(left, right) < spacing, f"seam at col {col}"
    # tile 4 above tile 0, tile 5 below tile 0
    assert gap(cross[:, 2 * n - 1, :n], cross[:, 2 * n, :n]) < spacing
    assert gap(cross[:, n - 1, :n], cross[:, n, :n]) < spacing


def test_to_cross_batched():
    field = np.random.rand(2, 6, 3, 3).astype(np.float32)
    out = to_cross(field)
    assert out.shape == (2, 9, 12)


def test_shift_edge_var_to_center_axes():
    x = np.arange(20.0).reshape(4, 5)
    np.testing.assert_allclose(
        np.asarray(shift_edge_var_to_center(x, axis=-1)),
        0.5 * (x[:, :-1] + x[:, 1:]),
    )
    np.testing.assert_allclose(
        np.asarray(shift_edge_var_to_center(x, axis=0)),
        0.5 * (x[:-1] + x[1:]),
    )


def test_coarsen_coords_and_reduce_alias():
    np.testing.assert_array_equal(coarsen_coords(4, 12), [1, 2, 3])
    x = np.ones((6, 8, 8))
    out = np.asarray(horizontal_block_reduce(x, 4))
    assert out.shape == (6, 2, 2)
    np.testing.assert_allclose(out, 16.0)


def test_grid_metadata_defaults():
    md = GridMetadata()
    assert md.dims == ("tile", "y", "x")
    assert md.x_interface == "x_interface"
